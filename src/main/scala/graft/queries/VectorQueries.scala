package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Multimodal, Similarity}

/** Similarity search over the embeddings table (64-dim float vectors) and
  * multimodal binary-column plumbing.
  */
object VectorQueries {

  private val Dim = 64

  private[queries] def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    queryVecAt(s, dir, 0L)

  // memoized per (session, dir, id): a dozen gates re-collect the same
  // fixed query vector — one Spark job per gate per bench pass for an
  // immutable value (graft.core.SessionMemo, plain-value form)
  private val queryVecs =
    new graft.core.SessionMemo[(String, Long), Seq[Double]]

  private def queryVecAt(s: org.apache.spark.sql.SparkSession, dir: String,
      id: Long): Seq[Double] =
    queryVecs.getOrElseUpdate(s, (dir, id)) {
      Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") === id)
        .select("embedding").collect()(0)
        .getSeq[Float](0).toSeq.map(_.toDouble)
    }

  // memoized PQ codebooks per (session, dir): q221/q224 probe AGAINST the
  // trained index — retraining per probe is not what the read path does
  // at scale. q220 is the build gate and trains fresh (bench=true there
  // keeps the training cost a measured artifact, the q255/q306 split).
  private val pqBooksMemo =
    new graft.core.SessionMemo[String, IndexedSeq[IndexedSeq[Seq[Double]]]]

  private def pqBooks(s: org.apache.spark.sql.SparkSession,
      dir: String): IndexedSeq[IndexedSeq[Seq[Double]]] =
    pqBooksMemo.getOrElseUpdate(s, dir) {
      Similarity.pqCodebooks(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        m = 4, ks = 8, iters = 2)
    }

  /** Left-fold dot of two vector columns — identical FP op order to
    * Similarity's zip-multiply-fold expressions (DuckDB list_reduce folds
    * left from the first element; Spark folds from 0.0 — equal for
    * doubles since 0.0 + x == x). */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${Dim + 1}),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""

  /** DuckDB twin of Similarity.cosineLit / cosineCols. */
  private def cosSql(vecExpr: String, qExpr: String): String =
    s"""(FLOOR((${dotSql(vecExpr, qExpr)} /
        (sqrt(${dotSql(vecExpr, vecExpr)}) * sqrt(${dotSql(qExpr, qExpr)})))
        * 1000000.0E0 + 0.5E0) / 1000000.0E0)"""

  /** Dot of a vector column with a literal hyperplane — the plane doubles
    * are embedded E0-formatted (fmtD) so DuckDB parses the exact binary
    * values Spark's lit() carries. */
  private def dotPlaneSql(vecExpr: String, p: Seq[Double]): String = {
    val lits = p.map(graft.score.ScoreEngine.fmtD).mkString("[", ", ", "]")
    s"""list_reduce(list_transform(range(1, ${Dim + 1}),
        i -> CAST($vecExpr[i] AS DOUBLE) * ($lits)[i]), (x, y) -> x + y)"""
  }

  /** DuckDB twin of Similarity.lshBucket: sum of distinct powers of two
    * equals the bitwise OR the Spark expression builds. */
  private def bucketSql(vecExpr: String, bits: Int, seed: Int = 42): String =
    (0 until bits).map { b =>
      s"""(CASE WHEN ${dotPlaneSql(vecExpr, Similarity.plane(seed, b, Dim))} >= 0
          THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"""
    }.mkString("(", " + ", ")")

  /** One oracle for sign-bucket semantic dedup over any corpus subquery
    * (q200 one-shot, q320 streamed ingest — the streamed union must
    * equal exactly this batch semantics). eb is referenced three times
    * → MATERIALIZED per the CTE-inlining rule. */
  private[queries] def semDedupCellsOracleSql(corpus: String): String =
    s"""WITH eb AS MATERIALIZED (SELECT vec_id, embedding,
          ${bucketSql("embedding", 10)} AS bucket FROM $corpus),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${cosSql("a.embedding", "b.embedding")} AS cos
        FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
      drops AS (SELECT DISTINCT id_b FROM p WHERE cos >= 0.95E0)
    SELECT eb.vec_id, eb.bucket AS cluster, (d.id_b IS NULL) AS is_kept
    FROM eb LEFT JOIN drops d ON d.id_b = eb.vec_id"""

  /** One oracle for both LSH probes (q34 scan-time, q70 materialized):
    * the pruning is the same hamming ≤ 1 bucket set; only the Spark-side
    * I/O differs. */
  private[queries] val lshTopKOracle: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        eb AS (SELECT vec_id, embedding, ${bucketSql("embedding", 8)} AS bucket
               FROM embeddings),
        qb AS (SELECT ${bucketSql("qv", 8)} AS qbucket FROM q)
        SELECT vec_id, cos FROM (
          SELECT eb.vec_id, ${cosSql("eb.embedding", "q.qv")} AS cos
          FROM eb, q, qb
          WHERE bit_count(xor(eb.bucket, qb.qbucket)) <= 1)
        ORDER BY cos DESC, vec_id ASC LIMIT 10"""

  /** The materialized ANN index builds ONCE per sf dir (the serve path is
    * what q70 times — with the memo warm, Bench measures probes against a
    * standing index, the actual production shape). */
  private val annIdxCache =
    scala.collection.mutable.HashMap.empty[String, org.apache.spark.sql.DataFrame]
  private def annIndex(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    annIdxCache.synchronized {
      annIdxCache.getOrElseUpdate(dir, {
        val path = java.nio.file.Files.createTempDirectory("graft-annidx")
          .resolve("idx").toString
        graft.operators.AnnIndex.build(
          Tables.load(s, dir, "embeddings").select("vec_id", "embedding"),
          "vec_id", "embedding", path, Dim, bits = 8)
        graft.operators.AnnIndex.load(s, path)
      })
    }

  private def annRecallOracle(radius: Int): String =
    s"""SELECT $radius AS radius, qid, n_hits, recall FROM (
        WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id % 50 = 0),
        brute AS (SELECT qid, vid FROM (
            SELECT q.qid, e.vec_id AS vid,
              row_number() OVER (PARTITION BY q.qid
                ORDER BY ${cosSql("e.embedding", "q.qv")} DESC,
                  e.vec_id ASC) AS r
            FROM embeddings e, q) WHERE r <= 10),
        eb AS (SELECT vec_id, embedding,
            ${bucketSql("embedding", 8)} AS bucket FROM embeddings),
        qb AS (SELECT qid, qv, ${bucketSql("qv", 8)} AS qbucket FROM q),
        lsh AS (SELECT qid, vid FROM (
            SELECT qb.qid, eb.vec_id AS vid,
              row_number() OVER (PARTITION BY qb.qid
                ORDER BY ${cosSql("eb.embedding", "qb.qv")} DESC,
                  eb.vec_id ASC) AS r
            FROM eb JOIN qb
              ON bit_count(xor(eb.bucket, qb.qbucket)) <= $radius)
          WHERE r <= 10),
        hits AS (SELECT b.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM brute b JOIN lsh l ON l.qid = b.qid AND l.vid = b.vid
          GROUP BY 1)
        SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits,
          CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10.0E0 AS recall
        FROM q LEFT JOIN hits h ON h.qid = q.qid)"""

  /** DuckDB twin of the q154 multi-table sweep: per-table bucket exprs
    * with [[Similarity.tableSeed]] seeds; t_min via first-true CASE.
    * `probeMod` samples the probe set (q154 uses 50; the sf3 stress
    * gate q319 uses 500 — the brute ground-truth leg is |q|·|corpus|
    * BY DESIGN, so stress scale bounds |q| instead of dropping the
    * family from the sf3 table). q and cand are multi-referenced →
    * MATERIALIZED (the r11 inlining rule). */
  private def annMultiTableOracle(tables: Int, bits: Int = 8,
      probeMod: Int = 50): String = {
    def seedT(t: Int) = Similarity.tableSeed(42, t)
    val ebCols = (0 until tables).map(t =>
      s"${bucketSql("embedding", bits, seedT(t))} AS b$t").mkString(", ")
    val qbCols = (0 until tables).map(t =>
      s"${bucketSql("qv", bits, seedT(t))} AS q$t").mkString(", ")
    val matchT = (t: Int) => s"bit_count(xor(eb.b$t, qb.q$t)) <= 1"
    val tMin = "CASE " + (0 until tables).map(t =>
      s"WHEN ${matchT(t)} THEN $t").mkString(" ") + " END"
    val anyMatch = (0 until tables).map(matchT).mkString(" OR ")
    s"""WITH q AS MATERIALIZED (
          SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id % $probeMod = 0),
        brute AS (SELECT qid, vid FROM (
            SELECT q.qid, e.vec_id AS vid,
              row_number() OVER (PARTITION BY q.qid
                ORDER BY ${cosSql("e.embedding", "q.qv")} DESC,
                  e.vec_id ASC) AS r
            FROM embeddings e, q) WHERE r <= 10),
        eb AS (SELECT vec_id, embedding, $ebCols FROM embeddings),
        qb AS (SELECT qid, qv, $qbCols FROM q),
        matched AS (SELECT qb.qid, eb.vec_id AS vid, $tMin AS t_min,
            ${cosSql("eb.embedding", "qb.qv")} AS cos
          FROM eb JOIN qb ON ($anyMatch)),
        cand AS MATERIALIZED (
          SELECT CAST(r.l AS INTEGER) AS l_tables, m.qid, m.vid, m.cos
          FROM matched m, range(1, ${tables + 1}) r(l) WHERE m.t_min < r.l),
        cost AS (SELECT l_tables, qid, CAST(COUNT(*) AS BIGINT) AS n_candidates
          FROM cand GROUP BY 1, 2),
        lsh AS (SELECT l_tables, qid, vid FROM (
            SELECT l_tables, qid, vid, row_number()
              OVER (PARTITION BY l_tables, qid
                ORDER BY cos DESC, vid ASC) AS r
            FROM cand) WHERE r <= 10),
        hits AS (SELECT l.l_tables, l.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM lsh l JOIN brute b ON b.qid = l.qid AND b.vid = l.vid
          GROUP BY 1, 2),
        grid AS (SELECT CAST(r.l AS INTEGER) AS l_tables, q.qid
          FROM q, range(1, ${tables + 1}) r(l))
        SELECT g.l_tables, g.qid,
          COALESCE(c.n_candidates, 0) AS n_candidates,
          COALESCE(h.n_hits, 0) AS n_hits,
          CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10.0E0 AS recall
        FROM grid g
        LEFT JOIN cost c ON c.l_tables = g.l_tables AND c.qid = g.qid
        LEFT JOIN hits h ON h.l_tables = g.l_tables AND h.qid = g.qid"""
  }

  /** DuckDB twin of Similarity.annNdcg (radius-2 probe, NDCG@10), probe
    * set sampled at `probeMod` (q182 = 50, the sf3 stress gate q323 =
    * 500). q is referenced three times and brute twice — MATERIALIZED
    * so the |q|·|corpus| brute window runs once, not per reference. */
  private def annNdcgOracle(probeMod: Int): String = {
    val k = 10
    val ws = Similarity.dcgWeights8(k)
      .map(_.toPlainString).mkString("[", ", ", "]")
    s"""WITH q AS MATERIALIZED (
          SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id % $probeMod = 0),
        brute AS MATERIALIZED (SELECT qid, vid, r FROM (
            SELECT q.qid, e.vec_id AS vid,
              row_number() OVER (PARTITION BY q.qid
                ORDER BY ${cosSql("e.embedding", "q.qv")} DESC,
                  e.vec_id ASC) AS r
            FROM embeddings e, q) WHERE r <= $k),
        eb AS (SELECT vec_id, embedding,
            ${bucketSql("embedding", 8)} AS bucket FROM embeddings),
        qb AS (SELECT qid, qv, ${bucketSql("qv", 8)} AS qbucket FROM q),
        lsh AS (SELECT qid, vid, r AS pos FROM (
            SELECT qb.qid, eb.vec_id AS vid,
              row_number() OVER (PARTITION BY qb.qid
                ORDER BY ${cosSql("eb.embedding", "qb.qv")} DESC,
                  eb.vec_id ASC) AS r
            FROM eb JOIN qb
              ON bit_count(xor(eb.bucket, qb.qbucket)) <= 2)
          WHERE r <= $k),
        idcg AS (SELECT qid,
            SUM((${k + 1} - r) * ($ws)[r]) AS idcg8
          FROM brute GROUP BY 1),
        dcg AS (SELECT l.qid,
            SUM(COALESCE(${k + 1} - b.r, 0) * ($ws)[l.pos]) AS dcg8
          FROM lsh l LEFT JOIN brute b
            ON b.qid = l.qid AND b.vid = l.vid
          GROUP BY 1)
        SELECT q.qid, CAST(COALESCE(d.dcg8, 0) AS DOUBLE) AS dcg,
          CAST(COALESCE(d.dcg8, 0) AS DOUBLE) / CAST(i.idcg8 AS DOUBLE)
            AS ndcg
        FROM q
        JOIN idcg i ON i.qid = q.qid
        LEFT JOIN dcg d ON d.qid = q.qid"""
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q154_ann_multitable_recall",
      (s, dir) => {
        // the AND-OR operating grid: each (bits, tables) point is a
        // bands×tables configuration with radius-1 probes per table —
        // (8 bits, L≤3) is the selective/cheap corner (~0.36 recall),
        // (6 bits, L≤6) widens the bands and ORs more tables to reach
        // the ≥0.6-recall regime a deployment would actually pick. One
        // corpus scan and ONE shared brute ground-truth pass feed every
        // point; n_candidates is the probe cost each point pays.
        Similarity.annRecallOperatingPoints(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 50 === 0, dim = Dim, k = 10,
          configs = Seq((8, 3), (6, 6)))
      },
      Some(s"""SELECT CAST(8 AS INTEGER) AS bits, o.*
          FROM (${annMultiTableOracle(3, 8)}) o
        UNION ALL
        SELECT CAST(6 AS INTEGER) AS bits, o2.*
          FROM (${annMultiTableOracle(6, 6)}) o2"""),
      bench = true),

    GraftQuery(
      "q319_ann_recall_probe_sample",
      (s, dir) => {
        // q154's operating grid with a SAMPLED probe set (every 500th
        // vector): the brute ground-truth leg is |probes|·|corpus| BY
        // DESIGN, so the stress-scale (sf3) hash row bounds |probes|
        // instead of exempting the ANN-recall family from the sf3 table
        // (verdict r11 task 7). The full q154 stays the small-SF gate.
        Similarity.annRecallOperatingPoints(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 500 === 0, dim = Dim, k = 10,
          configs = Seq((8, 3), (6, 6)))
      },
      Some(s"""SELECT CAST(8 AS INTEGER) AS bits, o.*
          FROM (${annMultiTableOracle(3, 8, probeMod = 500)}) o
        UNION ALL
        SELECT CAST(6 AS INTEGER) AS bits, o2.*
          FROM (${annMultiTableOracle(6, 6, probeMod = 500)}) o2""")),

    GraftQuery(
      "q182_ann_ndcg",
      (s, dir) => {
        // ranking quality of the LSH probe, not just set recall: NDCG@10
        // against the brute-force ideal ordering. DCG weights are
        // scale-8 decimals computed on the driver (log2 never reaches an
        // engine), so the discounted sums are exact decimal arithmetic
        // and even the metric hash-gates.
        Similarity.annNdcg(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 50 === 0, dim = Dim, k = 10, bits = 8,
          probeRadius = 2)
      },
      Some(annNdcgOracle(50))),

    GraftQuery(
      "q323_ann_ndcg_probe_sample",
      (s, dir) => {
        // q182's NDCG audit with a SAMPLED probe set (every 500th
        // vector): the brute ideal-ordering leg is |probes|·|corpus| BY
        // DESIGN, and q182's full-probe oracle OOMs DuckDB at sf3 (the
        // q154/q138 class, r12 sweep) — this bounds |probes| so the
        // NDCG family has a stress-scale hash row (the q319 precedent).
        // The full-probe q182 stays the small-SF gate.
        Similarity.annNdcg(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 500 === 0, dim = Dim, k = 10, bits = 8,
          probeRadius = 2)
      },
      Some(annNdcgOracle(500))),

    GraftQuery(
      "q138_ann_recall",
      (s, dir) => {
        // the recall/cost curve of the LSH index, measured distributed:
        // radius-2 probing (37 of 256 buckets) must strictly dominate
        // radius-1 (9 buckets) — the tuning loop an ANN deployment runs.
        def run(radius: Int) = Similarity.annRecall(
            Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
            col("vec_id") % 50 === 0, dim = Dim, k = 10, bits = 8,
            probeRadius = radius)
          .select(lit(radius).as("radius"), col("qid"), col("n_hits"),
            col("recall"))
        run(1).unionByName(run(2))
      },
      Some(s"${annRecallOracle(1)} UNION ALL ${annRecallOracle(2)}")),

    GraftQuery(
      "q33_cosine_topk",
      (s, dir) => Similarity.cosineTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10),
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, ${cosSql("embedding", "qv")} AS cos
        FROM embeddings, q
        ORDER BY cos DESC, vec_id ASC LIMIT 10"""),
      bench = true),

    // LSH/IVF oracles mirror the pruning itself: the hyperplanes are
    // deterministic literals (Similarity.plane) embedded in the SQL, the
    // centroids are data-derived in SQL exactly as ivfTopK derives them.
    GraftQuery(
      "q34_lsh_cosine_topk",
      (s, dir) => Similarity.lshCosineTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10, bits = 8),
      Some(lshTopKOracle),
      bench = true),

    GraftQuery(
      "q70_ann_index_topk",
      (s, dir) => graft.operators.AnnIndex.topK(
        annIndex(s, dir), "vec_id", "embedding",
        queryVec(s, dir), k = 10, bits = 8),
      Some(lshTopKOracle),
      bench = true),

    GraftQuery(
      "q35_ivf_topk",
      (s, dir) => Similarity.ivfTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10, nCells = 16, nProbe = 4, iters = 2),
      // the coarse quantizer is Lloyd-TRAINED (kmeansCte at k=16): the
      // oracle replays init → assign → recompute → assign, reads the
      // trained centroids from c1 for the probe list and the final
      // assignment from a2 for the cell filter — a drifted centroid or
      // differently-tied assignment flips the probed set and the hash.
      Some(s"""WITH ${kmeansCte("embeddings", 16)},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qcells AS (
          SELECT c1.cell AS cell
          FROM c1 CROSS JOIN q
          ORDER BY -(${dotSql("q.qv", "c1.v")}) /
                   (sqrt(${dotSql("c1.v", "c1.v")}) * sqrt(${dotSql("q.qv", "q.qv")})),
                   c1.cell
          LIMIT 4)
        SELECT vec_id, cos FROM (
          SELECT em.vec_id, ${cosSql("em.embedding", "q.qv")} AS cos
          FROM embeddings em
          JOIN a2 ON em.vec_id = a2.vec_id
          JOIN qcells ON a2.cell = qcells.cell
          CROSS JOIN q)
        ORDER BY cos DESC, vec_id ASC LIMIT 10""")),

    GraftQuery(
      "q233_semantic_decontam",
      (s, dir) => {
        // embedding-space benchmark decontamination: every 7th vector
        // doubles as a "benchmark item" (distinct id space), so the
        // planted contamination is exact (cos 1.0, same LSH bucket by
        // construction — the broadcast bucket probe can't miss it) and
        // the 0.25 threshold also surfaces genuine in-bucket near
        // matches, exercising the per-corpus-id argmax.
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val bench = e.filter(col("vec_id") % 7 === 0)
          .select((col("vec_id") + 5000000L).as("bench_id"), col("embedding"))
        graft.operators.Similarity.semanticContamination(
          e, "vec_id", "embedding", bench, "bench_id", "embedding",
          Dim, bits = 6, threshold = 0.25)
      },
      Some(s"""WITH bench AS (SELECT vec_id + 5000000 AS bench_id, embedding
              FROM embeddings WHERE vec_id % 7 = 0),
          cb AS (SELECT vec_id, embedding, ${bucketSql("embedding", 6)} AS b
            FROM embeddings),
          bb AS (SELECT bench_id, embedding, ${bucketSql("embedding", 6)} AS b
            FROM bench),
          cand AS (SELECT cb.vec_id, bb.bench_id,
              ${cosSql("cb.embedding", "bb.embedding")} AS cos
            FROM cb JOIN bb ON cb.b = bb.b),
          r AS (SELECT vec_id, bench_id, cos,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY cos DESC, bench_id ASC) AS rk
            FROM cand WHERE cos >= 0.25E0)
        SELECT vec_id, bench_id, cos FROM r WHERE rk = 1""")),

    GraftQuery(
      "q235_rag_context",
      (s, dir) => {
        // retrieval-augmented context assembly: every 100th vector is a
        // "prompt", candidates come from its LSH bucket (16 buckets →
        // ~30 candidates each), and the cosine-ranked prefix that fits
        // a 300-token budget is the assembled context. Token counts
        // join in from the documents table on the shared id space.
        import graft.functions.TextFunctions
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val d = Tables.load(s, dir, "documents").select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_toks"))
        val corpus = e.join(d, e("vec_id") === d("doc_id"))
          .select(col("vec_id"), col("embedding"), col("n_toks"))
        val qs = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("embedding"))
        graft.operators.Similarity.retrieveContext(
          corpus, "vec_id", "embedding", "n_toks",
          qs, "qid", "embedding", Dim, bits = 4, budgetTokens = 300L)
      },
      Some {
        val toks =
          """len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))"""
        s"""WITH tk AS (SELECT doc_id, CAST($toks AS BIGINT) AS n_tokens
              FROM documents),
          cb AS (SELECT e.vec_id, e.embedding, tk.n_tokens,
              ${bucketSql("e.embedding", 4)} AS b
            FROM embeddings e JOIN tk ON e.vec_id = tk.doc_id),
          qb AS (SELECT vec_id AS qid, embedding,
              ${bucketSql("embedding", 4)} AS b
            FROM embeddings WHERE vec_id % 100 = 0),
          cand AS (SELECT qb.qid, cb.vec_id, cb.n_tokens,
              ${cosSql("cb.embedding", "qb.embedding")} AS cos
            FROM cb JOIN qb ON cb.b = qb.b),
          r AS (SELECT qid, vec_id, cos, n_tokens,
              CAST(row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rk,
              SUM(n_tokens) OVER (PARTITION BY qid
                ORDER BY cos DESC, vec_id ASC
                ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM cand)
        SELECT qid, vec_id, cos, rk, n_tokens,
          CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM r WHERE cum_tokens <= 300"""
      }),

    GraftQuery(
      "q206_hard_negatives",
      (s, dir) => {
        // contrastive-training mining: per anchor, the 3 most-similar
        // in-bucket vectors below the near-dup line — LSH blocks the
        // candidates (one bucket shuffle, Σ n_b² pairs, never corpus²),
        // a per-anchor window ranks them. The oracle replays the same
        // buckets, cosines, and ties.
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        graft.operators.Similarity.hardNegatives(
          e, "vec_id", "embedding", Dim, bits = 8, lo = 0.0, hi = 0.95, m = 3)
      },
      Some(s"""WITH eb AS (SELECT vec_id, embedding,
            ${bucketSql("embedding", 8)} AS bucket FROM embeddings),
          cand AS (SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
              ${cosSql("a.embedding", "b.embedding")} AS cos
            FROM eb a JOIN eb b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          ranked AS (SELECT anchor_id, neg_id, cos,
              CAST(row_number() OVER (PARTITION BY anchor_id
                ORDER BY cos DESC, neg_id ASC) AS INTEGER) AS rk
            FROM cand WHERE cos >= 0.0E0 AND cos < 0.95E0)
        SELECT anchor_id, neg_id, cos, rk FROM ranked WHERE rk <= 3""")),

    GraftQuery(
      "q37_embedding_near_dup",
      (s, dir) => {
        // dup-guaranteed corpus (id-shifted copy) so pairs exist at every
        // SF; brute-force pass = the oracle-checkable baseline. The gate
        // corpus is CAPPED at the first 2000 vectors (a no-op through
        // sf0.1): both this O(n²) pass and its pairwise SQL oracle grow
        // quadratically with SF while verifying the same semantics — the
        // scale path for real corpora is q38's LSH blocking.
        val e = Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") < 2000).select("vec_id", "embedding")
        val corpus = e.unionByName(
          e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        graft.operators.Dedup.embeddingNearDups(corpus, "vec_id", "embedding", 0.95)
      },
      Some {
        val corpus = s"""(SELECT vec_id, embedding FROM embeddings
            WHERE vec_id < 2000
          UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding
            FROM embeddings WHERE vec_id < 2000)"""
        s"""SELECT id_a, id_b, cos FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ${cosSql("a.embedding", "b.embedding")} AS cos
          FROM $corpus a JOIN $corpus b ON a.vec_id < b.vec_id)
          WHERE cos >= 0.95E0"""
      }),

    GraftQuery(
      "q38_embedding_near_dup_lsh",
      (s, dir) => {
        // the scale path: LSH sign-bucket blocking, exact verify in-bucket.
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val corpus = e.unionByName(
          e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        graft.operators.Dedup.embeddingNearDupsLsh(
          corpus, "vec_id", "embedding", Dim, threshold = 0.95, bits = 12)
      },
      Some {
        val corpus = s"""(SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings)"""
        s"""WITH eb AS (SELECT vec_id, embedding,
              ${bucketSql("embedding", 12)} AS bucket FROM $corpus)
          SELECT id_a, id_b, cos FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              ${cosSql("a.embedding", "b.embedding")} AS cos
            FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
          WHERE cos >= 0.95E0"""
      },
      bench = true),

    GraftQuery(
      "q36_multimodal_meta",
      (s, dir) => {
        // binary media column + stub decode through the real mapPartitions
        // batch plumbing (size-binned partitioning, typed meta schema).
        val d = Multimodal.withBinaryFromText(
          Tables.load(s, dir, "documents"), "text")
        Multimodal.decodeMeta(d, "doc_id", "media_bytes")
      },
      Some("""SELECT doc_id AS media_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'jpeg'
             WHEN octet_length(encode(text)) % 3 = 1 THEN 'png'
             ELSE 'webp' END AS format,
        CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
        CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
        CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames,
        CAST(octet_length(encode(text)) * 40 AS BIGINT) AS duration_ms
        FROM documents"""))
    ,

    GraftQuery(
      "q194_image_decode_stats",
      (s, dir) => {
        // REAL image decode, distributed: one genuine PNG per document
        // (encoded on the executors, dims + solid fill derived from the
        // id), then javax.imageio decode → (dims, per-channel means)
        // through the size-binned mapPartitions seam. The oracle can't
        // decode PNG — it predicts the decoded stats arithmetically from
        // the same id derivation, so any decode fault (wrong dims,
        // swapped channels, bad color space) breaks the hash.
        val d = Tables.load(s, dir, "documents").select("doc_id")
        Multimodal.decodeImageStats(
          Multimodal.attachSyntheticPng(d, "doc_id"),
          "media_id", "media_bytes")
      },
      Some("""SELECT doc_id AS media_id,
        CAST(doc_id % 16 + 1 AS INTEGER) AS width,
        CAST(doc_id % 8 + 1 AS INTEGER) AS height,
        CAST(doc_id * 7 % 256 AS DOUBLE) AS mean_r,
        CAST(doc_id * 13 % 256 AS DOUBLE) AS mean_g,
        CAST(doc_id * 29 % 256 AS DOUBLE) AS mean_b
        FROM documents""")),

    GraftQuery(
      "q236_png_header_dims",
      (s, dir) => {
        // zero-decode dimension census over REAL PNG payloads: the dims
        // come from a 24-byte codegen'd header peek, never a decode —
        // the oracle predicts them from the same id derivation, so an
        // offset slip or endianness error breaks the hash. Same
        // synthetic blobs as q194; the two gates together prove the
        // header peek agrees with the full decode.
        val d = Tables.load(s, dir, "documents").select("doc_id")
        Multimodal.pngHeaderDims(
          Multimodal.attachSyntheticPng(d, "doc_id"),
          "media_id", "media_bytes")
      },
      Some("""SELECT doc_id AS media_id,
        CAST(doc_id % 16 + 1 AS BIGINT) AS width,
        CAST(doc_id % 8 + 1 AS BIGINT) AS height,
        CAST((1000 * (doc_id % 16 + 1)) // (doc_id % 8 + 1) AS BIGINT)
          AS aspect_milli
        FROM documents""")),

    GraftQuery(
      "q209_audio_decode_stats",
      (s, dir) => {
        // REAL audio decode, distributed: one genuine RIFF/WAV payload
        // per document (PCM samples derived from the id), parsed back
        // through javax.sound.sampled on the executors → (rate, length,
        // Σamp, Σamp²) as exact integer sums. The oracle replays the
        // sample formula arithmetically — a header misparse, byte-order
        // slip, or sign error breaks the hash. Closes the audio leg of
        // the image/audio/video column family.
        val d = Tables.load(s, dir, "documents").select("doc_id")
        Multimodal.decodeAudioStats(
          Multimodal.attachSyntheticWav(d, "doc_id"),
          "media_id", "media_bytes")
      },
      Some("""WITH g AS (SELECT doc_id,
            CAST(doc_id % 32 + 16 AS BIGINT) AS n FROM documents),
          s AS (SELECT g.doc_id, g.n,
              ((i.i * 37 + g.doc_id * 11) % 2003) - 1001 AS v
            FROM g, range(0, 48) i(i) WHERE i.i < g.n),
          a AS (SELECT doc_id, MAX(n) AS n, SUM(v) AS sa, SUM(v * v) AS sq
            FROM s GROUP BY doc_id)
        SELECT doc_id AS media_id, CAST(8000 AS INTEGER) AS sample_rate,
          n AS n_samples, CAST(sa AS BIGINT) AS sum_amp,
          CAST(sq AS BIGINT) AS sum_sq
        FROM a""")),

    GraftQuery(
      "q219_video_frame_sample",
      (s, dir) => {
        // REAL video frame sampling, distributed — the video leg of the
        // image/audio/video column family: one GMJ1 container per
        // document (id%6+2 genuine PNG frames, encoded on the
        // executors), every 2nd frame decoded into (dims, per-channel
        // means) — one row per SAMPLED frame, unsampled frames skipped
        // at the container level via the length prefix (never decoded).
        // The oracle can't parse the container — it predicts each
        // sampled frame's stats arithmetically from the same (id, f)
        // derivation, so a frame-indexing slip, off-by-one in the
        // sampling stride, or decode fault breaks the hash.
        val d = Tables.load(s, dir, "documents").select("doc_id")
        Multimodal.sampleFrameStats(
          Multimodal.attachSyntheticVideo(d, "doc_id"),
          "media_id", "media_bytes", everyN = 2)
      },
      Some("""WITH v AS (SELECT doc_id,
            CAST(doc_id % 6 + 2 AS INTEGER) AS n FROM documents),
          f AS (SELECT doc_id, n,
              CAST(unnest(range(0, n)) AS INTEGER) AS fi FROM v)
        SELECT doc_id AS media_id, n AS n_frames, fi AS frame_idx,
          CAST(doc_id % 8 + 2 AS INTEGER) AS width,
          CAST(doc_id % 4 + 2 AS INTEGER) AS height,
          CAST((doc_id * 7 + fi * 11) % 256 AS DOUBLE) AS mean_r,
          CAST((doc_id * 13 + fi * 3) % 256 AS DOUBLE) AS mean_g,
          CAST((doc_id * 29 + fi * 5) % 256 AS DOUBLE) AS mean_b
        FROM f WHERE fi % 2 = 0""")),

    GraftQuery(
      "q207_image_resize_stats",
      (s, dir) => {
        // REAL resize through the codec seam: gradient PNGs (per-pixel
        // variation, so the sampling grid matters), decode + nearest-
        // neighbor resample to 4×4, resized channel means. The oracle
        // replays the integer sampling arithmetic — a wrong sample
        // coordinate, channel order, or rounding mode breaks the hash.
        // 4×4 target → means divide by 16, a power of two, so even the
        // final division is FP-exact on both engines.
        val d = Tables.load(s, dir, "documents").select("doc_id")
        Multimodal.resizeImageStats(
          Multimodal.attachSyntheticGradientPng(d, "doc_id"),
          "media_id", "media_bytes", targetW = 4, targetH = 4)
      },
      Some("""WITH g AS (SELECT doc_id,
            CAST(doc_id % 12 + 4 AS INTEGER) AS sw,
            CAST(doc_id % 6 + 3 AS INTEGER) AS sh
          FROM documents),
        px AS (SELECT g.doc_id, g.sw, g.sh,
            (x.i * g.sw) // 4 AS sx, (y.i * g.sh) // 4 AS sy
          FROM g, range(0, 4) x(i), range(0, 4) y(i)),
        sums AS (SELECT doc_id, sw, sh,
            SUM((sx * 31 + sy * 7 + doc_id) % 256) AS sr,
            SUM((sx * 13 + doc_id * 3) % 256) AS sg,
            SUM((sy * 11 + doc_id * 5) % 256) AS sb
          FROM px GROUP BY 1, 2, 3)
      SELECT doc_id AS media_id, sw AS src_width, sh AS src_height,
        CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
        CAST(sr AS DOUBLE) / 16 AS mean_r,
        CAST(sg AS DOUBLE) / 16 AS mean_g,
        CAST(sb AS DOUBLE) / 16 AS mean_b
      FROM sums""")),

    GraftQuery(
      "q195_image_meta_real",
      (s, dir) => {
        // ImageIoCodec through the decodeMeta plumbing: real PNG payloads,
        // real decode, magic-byte format sniff. byte_len is projected out
        // (PNG encoder output size isn't oracle-predictable); everything
        // the DECODER reports is gated.
        val d = Tables.load(s, dir, "documents").select("doc_id")
        Multimodal.decodeMeta(
          Multimodal.attachSyntheticPng(d, "doc_id"),
          "media_id", "media_bytes", codec = Multimodal.ImageIoCodec)
          .select("media_id", "format", "width", "height", "n_frames",
            "duration_ms")
      },
      Some("""SELECT doc_id AS media_id, 'png' AS format,
        CAST(doc_id % 16 + 1 AS INTEGER) AS width,
        CAST(doc_id % 8 + 1 AS INTEGER) AS height,
        CAST(1 AS INTEGER) AS n_frames,
        CAST(NULL AS BIGINT) AS duration_ms
        FROM documents"""))
    ,

    GraftQuery(
      "q68_centroids",
      (s, dir) => {
        // per-group mean embedding (class prototypes); the gate flattens
        // the centroid arrays so the compare is scalar-typed.
        val cents = Similarity.centroids(
          Tables.load(s, dir, "embeddings")
            .withColumn("label", col("vec_id") % 10),
          "label", "embedding")
        cents.select(col("label"),
          posexplode(col("centroid")).as(Seq("pos", "mean")))
          .select(col("label"), col("pos").cast("long").as("pos"), col("mean"))
      },
      Some {
        val rounded = graft.functions.SafeMath.roundHalfUpSql(
          "CAST(g.s.v AS DOUBLE)", 10)
        s"""WITH g AS (
            SELECT vec_id % 10 AS label,
              unnest(list_transform(range(1, ${Dim + 1}),
                i -> struct_pack(pos := i - 1, v := embedding[i]))) AS s
            FROM embeddings)
          SELECT label, CAST(g.s.pos AS BIGINT) AS pos,
            (CAST(SUM(CAST($rounded AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)) AS mean
          FROM g GROUP BY 1, 2"""
      }),

    GraftQuery(
      "q78_kmeans",
      (s, dir) => Similarity.kmeans(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2),
      Some(s"""WITH ${kmeansCte("embeddings")}
          SELECT vec_id, cell AS cluster FROM a2"""),
      bench = true),

    GraftQuery(
      "q97_semdedup",
      (s, dir) => {
        // SemDedup over a dup-guaranteed corpus (id-shifted copy): the
        // exact duplicates MUST come back is_kept=false; the k-means
        // cells and the greedy in-cluster drop decision both hash-match
        // the unrolled oracle.
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val corpus = e.unionByName(
          e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        Similarity.semDedup(corpus, "vec_id", "embedding",
          k = 8, iters = 2, threshold = 0.95)
      },
      Some {
        val corpus = s"""(SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings)"""
        s"""WITH ${kmeansCte(corpus)},
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              ${cosSql("ea.v", "eb.v")} AS cos
            FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
            JOIN e ea ON ea.vec_id = a.vec_id
            JOIN e eb ON eb.vec_id = b.vec_id),
          drops AS (SELECT DISTINCT id_b FROM p WHERE cos >= 0.95E0)
        SELECT a2.vec_id, a2.cell AS cluster, (d.id_b IS NULL) AS is_kept
        FROM a2 LEFT JOIN drops d ON d.id_b = a2.vec_id"""
      }),

    GraftQuery(
      "q200_semdedup_lsh",
      (s, dir) => {
        // q97's scale wall removed: fixed k=8 Lloyd cells make per-cell
        // pair volume grow (n/k)² (measured 5.1× runtime on 3× data at
        // sf3), while sign-bucket cells keep it flat — 2^bits cells for
        // O(bits·dim)/row, no iteration, bits ≈ log2(n/cellSize) at any
        // corpus. Same dup-guaranteed corpus and keep/drop contract as
        // q97; the exact duplicates land in identical buckets by
        // construction, so every one MUST come back is_kept=false.
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val corpus = e.unionByName(
          e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        Similarity.semDedupLsh(corpus, "vec_id", "embedding", Dim,
          bits = 10, threshold = 0.95)
      },
      Some(semDedupCellsOracleSql(
        s"""(SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings)"""))),

    GraftQuery(
      "q324_semantic_mutation_recall",
      (s, dir) => {
        // the semantic analog of q321: semDedupLsh's cell-collision
        // recall on GRADED embedding perturbations instead of
        // clique-world exact copies. Each vector gets three variants
        // e'_i = e_i · (1 + s·±1) with a deterministic per-(id, dim,
        // variant) sign pattern at s = 0.1 / 0.3 / 0.5 — cosines land
        // ≈0.995 / ≈0.96 / ≈0.89, straddling the 0.95 threshold, and a
        // 10-bit sign bucket has a real per-hyperplane flip probability
        // at each angle. Truth = exact cosine ≥ 0.95 per (orig,
        // variant) KEYED pair (never all-pairs); detected = same
        // 10-bit bucket (the exact collision event semDedupLsh's cell
        // join prunes by). Output: per variant, n_true / n_detected /
        // recall — the measured per-angle recall curve of the semantic
        // dedup operating point.
        val W = 1000000L
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val base = e.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        def pert(v: Int, sTxt: String) = e.select(
          (col("vec_id") + v * W).as("vec_id"),
          transform(col("embedding"), (x, di) =>
            x.cast("double") * (lit(1.0) + lit(sTxt.toDouble) *
              when(pmod(col("vec_id") + di + lit(v), lit(2)) === 0, lit(1.0))
                .otherwise(lit(-1.0)))).as("embedding"))
        val mc = base.unionByName(pert(1, "0.1"))
          .unionByName(pert(2, "0.3")).unionByName(pert(3, "0.5"))
        val wc = mc.select(col("vec_id"), col("embedding"),
          Similarity.lshBucket(col("embedding"), Dim, 10).as("bucket"))
        val aLeg = wc.filter(col("vec_id") < W)
          .select(col("vec_id").as("orig"), col("bucket").as("ba"),
            col("embedding").as("va"))
        val bLeg = wc.filter(col("vec_id") >= W)
          .select(pmod(col("vec_id"), lit(W)).as("orig"),
            expr(s"vec_id div $W").as("variant"),
            col("bucket").as("bb"), col("embedding").as("vb"))
        aLeg.join(bLeg, Seq("orig"))
          .select(col("variant"), col("orig"),
            (col("ba") === col("bb")).as("same_bucket"),
            Similarity.cosineCols(col("va"), col("vb"), 6).as("cos"))
          .filter(col("cos") >= 0.95)
          .groupBy("variant")
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("same_bucket"), 1L).otherwise(0L)).as("n_detected"))
          .select(col("variant"), col("n_true"), col("n_detected"),
            graft.functions.SafeMath.roundHalfUp(
              col("n_detected") / col("n_true"), 6).as("recall"))
      },
      Some {
        def pertSql(v: Int, sTxt: String) =
          s"""SELECT vec_id + ${v * 1000000L} AS vec_id,
              list_transform(range(1, ${Dim + 1}),
                di -> CAST(embedding[di] AS DOUBLE) * (1.0E0 + ${sTxt}E0 *
                  CASE WHEN (vec_id + (di - 1) + $v) % 2 = 0
                    THEN 1.0E0 ELSE -1.0E0 END)) AS embedding
            FROM embeddings"""
        val hitSum =
          "CAST(SUM(CASE WHEN same_bucket THEN 1 ELSE 0 END) AS BIGINT)"
        s"""WITH mc AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
            FROM embeddings
            UNION ALL ${pertSql(1, "0.1")}
            UNION ALL ${pertSql(2, "0.3")}
            UNION ALL ${pertSql(3, "0.5")}),
          wc AS MATERIALIZED (SELECT vec_id, embedding,
            ${bucketSql("embedding", 10)} AS bucket FROM mc),
          pr AS (SELECT y.vec_id // 1000000 AS variant, x.vec_id AS orig,
              (x.bucket = y.bucket) AS same_bucket,
              ${cosSql("x.embedding", "y.embedding")} AS cos
            FROM wc x JOIN wc y ON y.vec_id % 1000000 = x.vec_id
              AND x.vec_id < 1000000 AND y.vec_id >= 1000000)
        SELECT variant, COUNT(*) AS n_true, $hitSum AS n_detected,
          ${graft.functions.SafeMath.roundHalfUpSql(
            s"(CAST($hitSum AS DOUBLE) / COUNT(*))", 6)} AS recall
        FROM pr WHERE cos >= 0.95E0
        GROUP BY variant"""
      }),

    GraftQuery(
      "q220_pq_encode",
      (s, dir) => {
        // product-quantization index build: 4 subspaces × 8-entry
        // codebooks (one-round Lloyd per subspace, all trained in one
        // scan), every vector compressed to 4 int codes — the 64×
        // compression write of a PQ ANN index. The oracle re-trains the
        // same codebooks via unrolled CTEs, so a drifted centroid, a
        // wrong slice boundary, or a tie-broken-differently assignment
        // all flip the hash.
        val e = Tables.load(s, dir, "embeddings")
        val books = Similarity.pqCodebooks(e, "vec_id", "embedding",
          m = 4, ks = 8, iters = 2)
        Similarity.pqEncode(e, "vec_id", "embedding", books)
      },
      Some(s"""WITH ${pqCte("embeddings")}
        SELECT vec_id, code_0, code_1, code_2, code_3 FROM enc"""),
      bench = true),

    GraftQuery(
      "q221_pq_adc_topk",
      (s, dir) => {
        // the PQ read path: asymmetric-distance top-10 — the query
        // decomposes into 4 lookup tables on the driver and every
        // encoded vector is scored by 4 literal-array lookups; the raw
        // embedding column is never read after the encode. Approximate
        // by construction (codebook granularity), exact to gate: the
        // oracle rebuilds codebooks+codes+luts and must land the same
        // ranked 10.
        val e = Tables.load(s, dir, "embeddings")
        Similarity.pqAdcTopKWith(e, "vec_id", "embedding",
          queryVec(s, dir), topK = 10, pqBooks(s, dir))
      },
      Some(s"""WITH ${pqCte("embeddings")},
          ${pqLutsSql()},
          sc AS (SELECT enc.vec_id,
              (((l0.lv + l1.lv) + l2.lv) + l3.lv) AS s
            FROM enc $pqLutJoins)
          SELECT vec_id,
            ${graft.functions.SafeMath.roundHalfUpSql("s", 6)} AS score
          FROM sc ORDER BY score DESC, vec_id ASC LIMIT 10"""),
      bench = true),

    GraftQuery(
      "q223_ivf_pq_topk",
      (s, dir) => {
        // the production vector-store layout end-to-end: coarse IVF
        // cells prune the read to 4 of 16 cells, PQ codes compress the
        // in-cell scan to 4 bytes/vector, ADC luts score without
        // touching a raw float. The oracle replays cells, probe list,
        // codebooks, codes, and luts independently — so the composition
        // (not just each part) is what's gated.
        val e = Tables.load(s, dir, "embeddings")
        Similarity.ivfPqTopK(e, "vec_id", "embedding", queryVec(s, dir),
          topK = 10, nCells = 16, nProbe = 4, m = 4, ks = 8, iters = 2)
      },
      Some(ivfPqTopKOracle)),

    GraftQuery(
      "q224_pq_recall",
      (s, dir) => {
        // the compression-loss + cell-skew audit a vector-index rollout
        // ships with: recall@10 of the ADC scan against the exact
        // cosine top-10 (the operating-point number that decides m/ks
        // before a 100 TB re-encode), stamped onto the trained IVF
        // coarse quantizer's per-cell census — cell sizes are what
        // decide whether nProbe/nCells pruning is real, so skew is a
        // MEASURED, gated artifact, not an assumption. One row per
        // cell; the scalar recall broadcasts into the census (a one-row
        // build side — O(n), the q76/q180/q204 pattern).
        val e = Tables.load(s, dir, "embeddings")
        val q = queryVec(s, dir)
        val exact = Similarity.cosineTopK(e, "vec_id", "embedding", q, 10)
          .select("vec_id")
        val adc = Similarity.pqAdcTopKWith(e, "vec_id", "embedding", q,
          topK = 10, pqBooks(s, dir)).select("vec_id")
        val recall = exact.join(adc, "vec_id")
          .agg((count(lit(1)).cast("double") / 10).as("recall_at_10"))
        val census = Similarity.ivfCellCensus(e, "vec_id", "embedding",
          nCells = 16, iters = 2)
        census.crossJoin(broadcast(recall))
          .select(col("cell"), col("n_vecs"), col("recall_at_10"))
      },
      Some(s"""WITH ${kmeansCte("embeddings", 16)},
          ${pqCte("embeddings")},
          ${pqLutsSql()},
          qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
          sc AS (SELECT enc.vec_id,
              (((l0.lv + l1.lv) + l2.lv) + l3.lv) AS s
            FROM enc $pqLutJoins),
          adc AS (SELECT vec_id FROM sc
            ORDER BY ${graft.functions.SafeMath.roundHalfUpSql("s", 6)} DESC,
              vec_id ASC LIMIT 10),
          exact AS (SELECT e.vec_id FROM embeddings e, qv
            ORDER BY ${cosSql("e.embedding", "qv.v")} DESC, e.vec_id ASC
            LIMIT 10),
          r AS (SELECT CAST(COUNT(*) AS DOUBLE) / 10 AS recall_at_10
            FROM exact JOIN adc ON exact.vec_id = adc.vec_id),
          census AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
            FROM a2 GROUP BY cell)
        SELECT census.cell, census.n_vecs, r.recall_at_10
        FROM census CROSS JOIN r""")),

    GraftQuery(
      "q222_image_dhash_near_dup",
      (s, dir) => {
        // visual near-dup over REAL decoded images: every document's
        // gradient PNG plus a byte-identical copy at id+1M. The copies
        // MUST collapse into their base's distinct-hash group (so no
        // hamming-0 pair may appear), and the released pairs are the
        // rep-level dHashes within hamming ≤ 3 — which the 4-band
        // pigeonhole join finds EXACTLY. The oracle never decodes a
        // pixel: it replays the 9×8 nearest-neighbor grid, the integer
        // luma, and all 64 gradient-sign bits arithmetically from the
        // same (x, y, seed) formulas, so a resample off-by-one, a luma
        // weight slip, or a band-packing bug flips the hash.
        val d = Tables.load(s, dir, "documents").select(col("doc_id"))
        val ids = d.select(col("doc_id").as("id"))
          .unionByName(d.select((col("doc_id") + 1000000L).as("id")))
          .withColumn("seed", col("id") % 1000000L)
        val imgs = Multimodal.attachSyntheticGradientPng(ids, "id",
          seedCol = Some("seed"))
        Multimodal.imageNearDupPairs(
          Multimodal.dHashBands(imgs, "media_id", "media_bytes"),
          maxHamming = 3)
      },
      Some(s"""WITH ids AS (SELECT doc_id AS id FROM documents
          UNION ALL SELECT doc_id + 1000000 AS id FROM documents),
        v AS (SELECT id, id % 1000000 AS sid,
            (id % 1000000) % 12 + 4 AS w, (id % 1000000) % 6 + 3 AS h
          FROM ids),
        hs AS (SELECT id,
            ${(0 until 4).map(j =>
              s"CAST(${dHashBandSql(j)} AS INTEGER) AS b$j").mkString(", ")}
          FROM v),
        reps AS (SELECT b0, b1, b2, b3, MIN(id) AS rep FROM hs
          GROUP BY 1, 2, 3, 4),
        banded AS (SELECT rep, b0, b1, b2, b3, j.j AS j,
            CASE j.j WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2
              ELSE b3 END AS bv
          FROM reps, (SELECT unnest(range(0, 4)) AS j) j),
        p AS (SELECT DISTINCT x.rep AS id_a, y.rep AS id_b,
            (((bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)))
              + bit_count(xor(x.b2, y.b2))) + bit_count(xor(x.b3, y.b3)))
              AS hamming
          FROM banded x JOIN banded y
            ON x.j = y.j AND x.bv = y.bv AND x.rep < y.rep)
        SELECT id_a, id_b, CAST(MIN(hamming) AS INTEGER) AS hamming
        FROM p WHERE hamming <= 3 GROUP BY 1, 2""")),

    GraftQuery(
      "q226_audio_envelope_near_dup",
      (s, dir) => {
        // audio near-dup over REAL decoded WAVs — the audio leg of the
        // near-dup family (text minhash / embedding LSH / image dHash /
        // THIS): every document's synthetic WAV plus a byte-identical
        // copy at id+1M; copies MUST collapse into their base's
        // distinct-envelope group, and released pairs are envelope reps
        // within hamming ≤ 1, found exactly by the 2-band pigeonhole.
        // The oracle replays the 16-frame integer energy envelope and
        // all 15 gradient-sign bits from the same sample formula — a
        // frame-boundary off-by-one, abs slip, or band-packing bug
        // flips the hash.
        val d = Tables.load(s, dir, "documents").select(col("doc_id"))
        val ids = d.select(col("doc_id").as("id"))
          .unionByName(d.select((col("doc_id") + 1000000L).as("id")))
          .withColumn("seed", col("id") % 1000000L)
        val wavs = Multimodal.attachSyntheticWav(ids, "id",
          seedCol = Some("seed"))
        Multimodal.audioNearDupPairs(
          Multimodal.audioEnvelopeBands(wavs, "media_id", "media_bytes"),
          maxHamming = 1)
      },
      Some {
        def bandSum(lo: Int, hi: Int, shift: Int) =
          (lo until hi).map(t =>
            s"(CASE WHEN es[${t + 2}] > es[${t + 1}] THEN ${1 << (t - shift)} ELSE 0 END)")
            .mkString("(", " + ", ")")
        s"""WITH ids AS (SELECT doc_id AS id FROM documents
            UNION ALL SELECT doc_id + 1000000 AS id FROM documents),
          v AS (SELECT id, id % 1000000 AS sid,
              CAST((id % 1000000) % 32 + 16 AS BIGINT) AS n FROM ids),
          smp AS (SELECT id, n, i.i AS i,
              ((i.i * 37 + sid * 11) % 2003) - 1001 AS sv
            FROM v, range(0, 48) i(i) WHERE i.i < n),
          fr AS (SELECT v.id, f.f AS f, v.n FROM v, range(0, 16) f(f)),
          e AS (SELECT fr.id, fr.f, SUM(abs(smp.sv)) AS en
            FROM fr JOIN smp ON smp.id = fr.id
              AND smp.i >= (fr.f * fr.n) // 16
              AND smp.i < ((fr.f + 1) * fr.n) // 16
            GROUP BY 1, 2),
          le AS (SELECT id, list(en ORDER BY f) AS es FROM e GROUP BY id),
          hs AS (SELECT id,
              CAST(${bandSum(0, 8, 0)} AS INTEGER) AS b0,
              CAST(${bandSum(8, 15, 8)} AS INTEGER) AS b1
            FROM le),
          reps AS (SELECT b0, b1, MIN(id) AS rep FROM hs GROUP BY 1, 2),
          banded AS (SELECT rep, b0, b1, j.j AS j,
              CASE j.j WHEN 0 THEN b0 ELSE b1 END AS bv
            FROM reps, (SELECT unnest(range(0, 2)) AS j) j),
          p AS (SELECT DISTINCT x.rep AS id_a, y.rep AS id_b,
              (bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)))
                AS hamming
            FROM banded x JOIN banded y
              ON x.j = y.j AND x.bv = y.bv AND x.rep < y.rep)
        SELECT id_a, id_b, CAST(MIN(hamming) AS INTEGER) AS hamming
        FROM p WHERE hamming <= 1 GROUP BY 1, 2"""
      }),

    GraftQuery(
      "q227_multimodal_curation",
      (s, dir) => {
        // the image-text curation pipeline composed end-to-end — the
        // multimodal q92: decode every document's image (REAL PNG
        // decode) and filter on a decoded feature (mean red ≥ 64),
        // visually dedup by dHash (keep each distinct hash's min-id
        // representative), and keep only documents with ≥ 10 text
        // tokens. The oracle replays decode stats, all 64 dHash bits,
        // and the token rule arithmetically — any stage drifting (or
        // the stages composing in the wrong order) breaks the hash.
        val d = Tables.load(s, dir, "documents").select("doc_id", "text")
        val imgs = Multimodal.attachSyntheticGradientPng(d, "doc_id")
        val stats = Multimodal.decodeImageStats(imgs, "media_id", "media_bytes")
        val hashes = Multimodal.dHashBands(imgs, "media_id", "media_bytes")
        val keep = hashes.filter(col("b0").isNotNull)
          .groupBy("b0", "b1", "b2", "b3")
          .agg(min(col("media_id")).as("media_id"))
          .select("media_id")
        val txt = d.select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast("long").as("n_tokens"))
          .filter(col("n_tokens") >= 10)
        stats.filter(col("mean_r") >= 64.0)
          .join(keep, "media_id")
          .join(txt, col("media_id") === col("doc_id"))
          .select(col("doc_id"), col("n_tokens"), col("width"), col("height"))
      },
      Some(s"""WITH v AS (SELECT doc_id AS id, doc_id AS sid,
            doc_id % 12 + 4 AS w, doc_id % 6 + 3 AS h FROM documents),
        px AS (SELECT id, w, h, x.x AS x, y.y AS y
          FROM v, range(0, 16) x(x), range(0, 9) y(y)
          WHERE x.x < w AND y.y < h),
        st AS (SELECT id, MAX(w) AS w, MAX(h) AS h,
            CAST(SUM((31 * x + 7 * y + id) % 256) AS DOUBLE)
              / (MAX(w) * MAX(h)) AS mean_r
          FROM px GROUP BY id),
        hs AS (SELECT id,
            ${(0 until 4).map(j =>
              s"CAST(${dHashBandSql(j)} AS INTEGER) AS b$j").mkString(", ")}
          FROM v),
        reps AS (SELECT MIN(id) AS id FROM hs GROUP BY b0, b1, b2, b3),
        tok AS (SELECT doc_id, CAST(len(
            list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
            AS BIGINT) AS n_tokens
          FROM documents)
        SELECT st.id AS doc_id, tok.n_tokens,
          CAST(st.w AS INTEGER) AS width, CAST(st.h AS INTEGER) AS height
        FROM st
        JOIN reps ON reps.id = st.id
        JOIN tok ON tok.doc_id = st.id
        WHERE st.mean_r >= 64.0E0 AND tok.n_tokens >= 10""")),

    GraftQuery(
      "q230_mmr_select",
      (s, dir) => Similarity.mmrSelect(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 5, poolSize = 32, lambdaTenths = 7),
      Some {
        // the greedy selection unrolls to k CTE steps (the kmeans/PQ
        // oracle discipline: deterministic iteration count, no recursive
        // CTE); all scores are integer micro-units with id tie-breaks,
        // so the argmax per step is engine-exact.
        val L = 7; val k = 5; val M = 32
        def microSql(a: String, b: String): String =
          s"""CAST(FLOOR((${dotSql(a, b)} /
            (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))
            * 1000000.0E0 + 0.5E0) AS BIGINT)"""
        val steps = (2 to k).map { i =>
          s"""s$i AS (
              SELECT p.id, p.reli,
                $L * p.reli - ${10 - L} * (
                  SELECT MAX(s.simi) FROM sims s
                  JOIN sel${i - 1} t ON s.ib = t.id
                  WHERE s.ia = p.id) AS mmr
              FROM pool p WHERE p.id NOT IN (SELECT id FROM sel${i - 1})
              ORDER BY mmr DESC, p.id ASC LIMIT 1),
            sel$i AS (SELECT * FROM sel${i - 1}
              UNION ALL SELECT $i AS rank, id, reli, mmr FROM s$i)"""
        }.mkString(",\n")
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          pool AS (
            SELECT vec_id AS id, embedding AS v,
              ${microSql("embedding", "qv")} AS reli
            FROM embeddings, q
            ORDER BY reli DESC, id ASC LIMIT $M),
          sims AS (
            SELECT a.id AS ia, b.id AS ib, ${microSql("a.v", "b.v")} AS simi
            FROM pool a JOIN pool b ON a.id <> b.id),
          s1 AS (SELECT id, reli, $L * reli AS mmr FROM pool
            ORDER BY reli DESC, id ASC LIMIT 1),
          sel1 AS (SELECT 1 AS rank, id, reli, mmr FROM s1),
          $steps
          SELECT rank, id AS vec_id, reli AS rel_micro, mmr AS mmr_score
          FROM sel$k"""
      }),

    GraftQuery(
      "q240_pc1_projection",
      (s, dir) => graft.operators.Spectral.pc1Projection(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", Dim),
      // the oracle replays the ENTIRE pipeline: exact nano-unit moment
      // sums, the 4-round driver power iteration (left folds, max-abs
      // normalization, scale-6 snap per round — all mirrored IEEE), and
      // the final left-fold projection. Any divergence in the moment
      // scan, the iteration arithmetic, or the dot fold flips the hash.
      Some(pc1OracleSql(Dim, iters = 4, snap = 9, scale = 6)),
      bench = true),

    GraftQuery(
      "q241_random_projection",
      // gate emits SCALAR rows (vec_id, component, value): the driver's
      // checker sorts the RAW frame, and an array<double> cell is
      // unsortable/unhashable there (r08's one red row). posexplode sees
      // the already-built array, so the 16 dots evaluate once per input
      // row, not once per exploded element.
      (s, dir) => graft.operators.Spectral.randomProject(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        Dim, outDim = 16)
        .select(col("vec_id"),
          posexplode(col("proj")).as(Seq("component", "value")))
        .select(col("vec_id"), col("component").cast("long").as("component"),
          col("value")),
      // 16 seeded-hyperplane dots per vector, each rounded after the
      // 1/outDim scaling — plane literals embedded E0-exact; DuckDB's
      // parallel unnests zip, so range(0,16) pairs positionally with proj
      Some {
        val comps = (0 until 16).map { b =>
          val d = dotPlaneSql("embedding", Similarity.plane(7, b, Dim))
          graft.functions.SafeMath.roundHalfUpSql(s"($d) / 16.0E0", 6)
        }.mkString("[", ",\n          ", "]")
        s"""WITH p AS (SELECT vec_id, $comps AS proj FROM embeddings)
          SELECT vec_id, unnest(range(0, 16)) AS component,
            unnest(proj) AS value FROM p"""
      }),


    GraftQuery(
      "q308_hybrid_retrieval",
      (s, dir) => {
        // the production retrieval stack q167 only sketched: a REAL
        // lexical ranker (q307's zero-shuffle BM25) fused with the dense
        // cosine ranker via reciprocal-rank fusion — the standard RAG
        // hybrid. Each ranker ranks its own universe (all documents /
        // all embeddings) with GlobalSort (never a single-partition
        // window); the fuse inner-joins on id, so only ids present in
        // BOTH universes score. Top-50 by fused score.
        val lex = graft.operators.InvertedIndex.bm25Scores(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            Seq("join", "spark", "window"))
          .select(col("doc_id"), col("bm25").as("score"))
        val dense = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"),
            Similarity.cosineLit(col("embedding"), queryVec(s, dir))
              .as("score"))
        graft.operators.InvertedIndex.rrfFuse(
            Seq(lex, dense), "doc_id", "score")
          .orderBy(col("rrf").desc, col("doc_id")).limit(50)
      },
      // oracle: the full BM25 replay (shared builder) as one CTE, the
      // q33 scale-6 cosine as the other, per-ranker row_number ranks,
      // the same 1/(60+r) double fold at scale 8
      Some {
        val bm = TextQueries.bm25OracleSql(Seq("join", "spark", "window"))
        s"""WITH bm AS ($bm),
          q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          dn AS (SELECT vec_id AS doc_id, ${cosSql("embedding", "qv")}
              AS score
            FROM embeddings, q),
          r1 AS (SELECT doc_id, CAST(row_number() OVER (
              ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r1 FROM bm),
          r2 AS (SELECT doc_id, CAST(row_number() OVER (
              ORDER BY score DESC, doc_id) AS INTEGER) AS r2 FROM dn),
          f AS (SELECT r1.doc_id, r1.r1, r2.r2,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "1.0E0 / CAST(60 + r1 AS DOUBLE) + " +
                "1.0E0 / CAST(60 + r2 AS DOUBLE)", 8)} AS rrf
            FROM r1 JOIN r2 USING (doc_id))
        SELECT doc_id, r1, r2, rrf FROM f
        ORDER BY rrf DESC, doc_id LIMIT 50"""
      },
      bench = true),

    GraftQuery(
      "q310_silhouette",
      // cluster-quality audit of the q78 clustering: per-cluster mean
      // simplified silhouette (O(n·k) centroid form, one scan after
      // training) — the "are these cells real" check run before
      // trusting SemDedup cells or IVF lists
      (s, dir) => graft.operators.Similarity.simplifiedSilhouette(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2),
      // oracle: the SHARED Lloyd replay (kmeansCte — trained centroids
      // c1, final assignment a2), Euclidean distances as the mirrored
      // sqrt(max(v·v − 2·v·c + c·c, 0)) fold, a via the assigned cell,
      // b as the MIN over the other cells, per-point s rounded at 8 and
      // DECIMAL-summed (order-free), the mean at 6
      Some {
        val round8 = graft.functions.SafeMath.roundHalfUpSql(
          "(b - a) / GREATEST(a, b)", 8)
        val mean6 = graft.functions.SafeMath.roundHalfUpSql(
          "CAST(SUM(CAST(s AS DECIMAL(28,8))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 6)
        s"""WITH ${kmeansCte("embeddings")},
          dist AS (SELECT e.vec_id, c1.cell,
              sqrt(GREATEST(((${dotSql("e.v", "e.v")})
                - (2.0E0 * (${dotSql("e.v", "c1.v")})))
                + (${dotSql("c1.v", "c1.v")}), 0.0E0)) AS d
            FROM e, c1),
          ab AS (SELECT d.vec_id, a2.cell AS cluster,
              MAX(CASE WHEN d.cell = a2.cell THEN d.d END) AS a,
              MIN(CASE WHEN d.cell <> a2.cell THEN d.d END) AS b
            FROM dist d JOIN a2 ON a2.vec_id = d.vec_id
            GROUP BY 1, 2),
          sil AS (SELECT cluster,
              CASE WHEN GREATEST(a, b) = 0.0E0 THEN 0.0E0
                   WHEN isnan((b - a) / GREATEST(a, b)) THEN 0.0E0
                   ELSE $round8 END AS s
            FROM ab)
        SELECT cluster, COUNT(*) AS n, $mean6 AS mean_sil
        FROM sil GROUP BY 1"""
      }),

    GraftQuery(
      "q247_bitext_margin",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val xs = e.filter(col("vec_id") % 2 === 0)
        val ys = e.filter(col("vec_id") % 2 === 1)
        // count-driven blocking width (r09): fixed bits made the
        // blocked cross join quadratic in corpus size (5.6x on 3x data
        // in the sf3 sweep); the oracle mirrors the same thresholds
        val bits = Similarity.blockingBitsFor(
          math.max(xs.count(), ys.count()))
        Similarity.bitextMarginMine(
          xs, ys, "vec_id", "embedding", Dim, k = 4, threshold = 1.0,
          bits = bits)
      },
      // Artetxe-Schwenk margin mining between the two id-parity halves:
      // the oracle replays the identical sign-LSH blocking (adaptive
      // width: widest bucket reduced modulo the count-driven CASE —
      // planes land at low bits, so bucket(12) % 2^b == bucket(b)),
      // micro-unit cosines, per-endpoint top-k windows, and mirrored
      // margin division
      Some {
        val den = """((((CAST(sx AS DOUBLE) / CAST(nx AS DOUBLE)) +
          (CAST(sy AS DOUBLE) / CAST(ny AS DOUBLE)))) / 2.0E0)"""
        // identical thresholds to Similarity.blockingBitsFor(target=24,
        // lo=6, hi=12)
        val powCase = (6 until 12).map(b =>
          s"WHEN n <= ${24L * (1L << b)} THEN ${1L << b}")
          .mkString("(CASE ", " ", s" ELSE ${1L << 12} END)")
        s"""WITH cnt AS (SELECT GREATEST(
              (SELECT COUNT(*) FROM embeddings WHERE vec_id % 2 = 0),
              (SELECT COUNT(*) FROM embeddings WHERE vec_id % 2 = 1))
              AS n),
          bw AS (SELECT $powCase AS pow FROM cnt),
          x AS (SELECT vec_id AS x_id, embedding AS xv,
              (${bucketSql("embedding", 12)}) % (SELECT pow FROM bw) AS b
            FROM embeddings WHERE vec_id % 2 = 0),
          y AS (SELECT vec_id AS y_id, embedding AS yv,
              (${bucketSql("embedding", 12)}) % (SELECT pow FROM bw) AS b
            FROM embeddings WHERE vec_id % 2 = 1),
          cand AS (SELECT x_id, y_id,
              CAST(FLOOR((${cosSql("xv", "yv")}) * 1000000.0E0 + 0.5E0)
                AS BIGINT) AS cm
            FROM x JOIN y USING (b)),
          xt AS (SELECT x_id, y_id, cm, ROW_NUMBER() OVER
              (PARTITION BY x_id ORDER BY cm DESC, y_id ASC) AS rn
            FROM cand),
          xa AS (SELECT x_id, CAST(SUM(cm) AS BIGINT) AS sx,
              CAST(COUNT(*) AS BIGINT) AS nx
            FROM xt WHERE rn <= 4 GROUP BY 1),
          yt AS (SELECT y_id, x_id, cm, ROW_NUMBER() OVER
              (PARTITION BY y_id ORDER BY cm DESC, x_id ASC) AS rn
            FROM cand),
          ya AS (SELECT y_id, CAST(SUM(cm) AS BIGINT) AS sy,
              CAST(COUNT(*) AS BIGINT) AS ny
            FROM yt WHERE rn <= 4 GROUP BY 1),
          bst AS (SELECT x_id, y_id, cm FROM xt WHERE rn = 1),
          m AS (SELECT bst.x_id, bst.y_id, bst.cm AS cos_micro,
              ${graft.functions.SafeMath.roundHalfUpSql(
                s"""CASE WHEN $den = 0.0E0 THEN 0.0E0
                  ELSE CAST(bst.cm AS DOUBLE) / $den END""", 6)} AS margin
            FROM bst JOIN xa ON xa.x_id = bst.x_id
            JOIN ya ON ya.y_id = bst.y_id)
        SELECT x_id, y_id, cos_micro, margin FROM m
        WHERE margin >= 1.0E0"""
      },
      bench = true),

    GraftQuery(
      "q249_matryoshka_recall",
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.truncationRecall(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", subDim = 16, q, ks = Seq(5, 10, 20))
      },
      // recall@k of the 16-dim-prefix top-k vs the full 64-dim top-k for
      // the probe: both rankings replayed with the exact rounded-cosine
      // total order; ks with no common ids still emit a 0-recall row
      Some {
        def dotN(a: String, b: String, n: Int): String =
          s"""list_reduce(list_transform(range(1, ${n + 1}),
              i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
              (x, y) -> x + y)"""
        def cosN(v: String, q: String, n: Int): String =
          s"""(FLOOR((${dotN(v, q, n)} /
              (sqrt(${dotN(v, v, n)}) * sqrt(${dotN(q, q, n)})))
              * 1000000.0E0 + 0.5E0) / 1000000.0E0)"""
        s"""WITH q AS (SELECT embedding AS qv,
              list_slice(embedding, 1, 16) AS tq
            FROM embeddings WHERE vec_id = 0),
          fr AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
              ${cosN("embedding", "qv", Dim)} DESC, vec_id ASC) AS r
            FROM embeddings, q),
          tr AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
              ${cosN("list_slice(embedding, 1, 16)", "tq", 16)} DESC,
              vec_id ASC) AS r
            FROM embeddings, q),
          ks(k) AS (VALUES (5), (10), (20)),
          c AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n
            FROM fr JOIN tr USING (vec_id), ks
            WHERE fr.r <= ks.k AND tr.r <= ks.k GROUP BY ks.k)
        SELECT CAST(ks.k AS BIGINT) AS k,
          COALESCE(c.n, 0) AS n_common,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(ks.k AS DOUBLE)",
            6)} AS recall
        FROM ks LEFT JOIN c ON c.k = ks.k"""
      }),

    GraftQuery(
      "q260_cluster_balanced_sample",
      (s, dir) => {
        // Diversity-preserving subset selection: k-means cells bound the
        // semantic spread, exactly 25 vectors per cell chosen by
        // salted-hash order — the "balanced across the embedding space"
        // cut a uniform sample can't promise (it oversamples dense
        // regions proportionally). Both stages are already-gated library
        // calls (q78 kmeans, q176 exactKPerGroup); the composition is
        // what a curation run actually ships. Scale: the Lloyd loop is
        // broadcast-Lloyd (vectors never shuffle), the per-cell cut is
        // one shuffle on the cell key.
        val assigned = Similarity.kmeans(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 2)
        graft.operators.Curation.exactKPerGroup(
          assigned, "cluster", "vec_id", k = 25, salt = "graft-bal")
      },
      Some(s"""WITH ${kmeansCte("embeddings")}
        SELECT vec_id, cluster FROM (
          SELECT vec_id, cell AS cluster, row_number() OVER (
              PARTITION BY cell ORDER BY ${CurationQueries.md5Key60Sql(
                "'graft-bal' || CAST(vec_id AS VARCHAR)")} ASC,
              vec_id ASC) AS rn
          FROM a2) WHERE rn <= 25""")),

    GraftQuery(
      "q270_cluster_keywords",
      (s, dir) => {
        // topic labels for embedding clusters (the BERTopic c-TF-IDF
        // read-out): sign-bucket cells over the embeddings, then each
        // cell's top-5 tokens by tf × idf where idf discounts tokens
        // present in many CELLS (not many docs) — corpus-ubiquitous
        // words appear in all 2^bits cells and score near zero, so the
        // survivors are what makes a cluster a topic. idf is the scale-3
        // ln snap (the q82/q259 convention): tf·⌊ln((2^bits+1)/df)·10³⌉
        // — all-integer, bit-exact cross-engine. Scale: bucket assignment
        // is a projection, one (cell, token) count shuffle, the df frame
        // is token-keyed, and the rank window partitions per cell.
        val bits = 4
        val cells = Tables.load(s, dir, "embeddings").select(
          col("vec_id"),
          Similarity.lshBucket(col("embedding"), Dim, bits).as("cluster"))
        val toks = cells.join(
          Tables.load(s, dir, "documents").select(col("doc_id"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("tok")),
          cells("vec_id") === col("doc_id"))
        val tf = toks.groupBy(col("cluster"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val scored = tf.join(df, Seq("tok"))
          .withColumn("score3", col("tf") *
            floor(log(lit(((1 << bits) + 1).toDouble) /
              col("df").cast("double")) * 1000.0 + 0.5).cast("long"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster"))
          .orderBy(col("score3").desc, col("tok"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("cluster"), col("rank"), col("tok"), col("tf"),
            col("df"), col("score3"))
      },
      Some {
        val toks =
          """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
        s"""WITH eb AS (SELECT vec_id,
              ${bucketSql("embedding", 4)} AS cluster FROM embeddings),
          tk AS (SELECT eb.cluster, unnest($toks) AS tok
            FROM eb JOIN documents d ON eb.vec_id = d.doc_id),
          tf AS (SELECT cluster, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tk GROUP BY 1, 2),
          df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf
            GROUP BY 1),
          sc AS (SELECT cluster, tok, tf, df,
              tf * CAST(FLOOR(ln(17.0E0 / CAST(df AS DOUBLE)) * 1000.0E0
                + 0.5E0) AS BIGINT) AS score3
            FROM tf JOIN df USING (tok)),
          r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
              ORDER BY score3 DESC, tok) AS rank FROM sc)
        SELECT cluster, rank, tok, tf, df, score3 FROM r
        WHERE rank <= 5"""
      }),

    GraftQuery(
      "q275_rrf_fusion",
      (s, dir) => {
        // multi-query retrieval fused by reciprocal rank: two query
        // vectors each rank their cosine top-50, RRF merges the lists in
        // integer micro-points ([[Similarity.rrfFuse]]) — ids near the
        // top of BOTH lists beat a #1 that the other query never saw.
        // The rank windows run over the two 50-row limit frames (the
        // q163 bounded-window class); the fuse is a 100-row aggregate.
        val e = Tables.load(s, dir, "embeddings")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id"))
        def ranked(qid: Int) = Similarity.cosineTopK(
          e, "vec_id", "embedding", queryVecAt(s, dir, qid), k = 50)
          .withColumn("rank", row_number().over(w))
        Similarity.rrfFuse(Seq(ranked(0), ranked(1)),
          "vec_id", "rank", kConst = 60L, topK = 10)
      },
      Some {
        def rankCte(qid: Int, name: String) =
          s"""$name AS (SELECT vec_id, ROW_NUMBER() OVER (
              ORDER BY cos DESC, vec_id) AS rank
            FROM (SELECT e.vec_id,
                ${cosSql("e.embedding", "q.qv")} AS cos
              FROM embeddings e,
                (SELECT embedding AS qv FROM embeddings
                 WHERE vec_id = $qid) q)
            ORDER BY cos DESC, vec_id LIMIT 50)"""
        s"""WITH ${rankCte(0, "r0")}, ${rankCte(1, "r1")},
          u AS (SELECT vec_id, 1000000 // (60 + rank) AS s FROM r0
            UNION ALL SELECT vec_id, 1000000 // (60 + rank) AS s FROM r1)
        SELECT vec_id, CAST(SUM(s) AS BIGINT) AS rrf_micro,
          COUNT(*) AS n_lists
        FROM u GROUP BY vec_id
        ORDER BY rrf_micro DESC, vec_id LIMIT 10"""
      }),

    GraftQuery(
      "q305_mutual_nn",
      (s, dir) => {
        // mutual top-1 pairs across the q303 epoch halves
        // ([[Similarity.mutualNearestPairs]]): only vectors that pick
        // EACH OTHER survive — the symmetric filter that drops hub
        // vectors and is the precision step under margin-based bitext
        // mining. Gate caps both sides at vec_id < 4000 (bounded by
        // design, the q98 seed-cap class — at scale the candidates come
        // LSH-pruned, q38).
        val e = Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") < 4000)
        val a = e.filter(expr("(vec_id div 8) % 2 = 0"))
        val b = e.filter(expr("(vec_id div 8) % 2 = 1"))
        Similarity.mutualNearestPairs(a, b, "vec_id", "embedding")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id < 4000),
          a AS (SELECT * FROM e WHERE (vec_id // 8) % 2 = 0),
          b AS (SELECT * FROM e WHERE (vec_id // 8) % 2 = 1),
          sc AS (SELECT a.vec_id AS xid, b.vec_id AS yid,
              ${cosSql("a.embedding", "b.embedding")} AS c
            FROM a, b),
          fwd AS (SELECT xid, yid, c FROM (SELECT xid, yid, c,
              ROW_NUMBER() OVER (PARTITION BY xid
                ORDER BY c DESC, yid ASC) AS rn FROM sc)
            WHERE rn = 1),
          bwd AS (SELECT xid, yid FROM (SELECT xid, yid,
              ROW_NUMBER() OVER (PARTITION BY yid
                ORDER BY c DESC, xid ASC) AS rn FROM sc)
            WHERE rn = 1)
        SELECT f.xid AS x_id, f.yid AS y_id, f.c AS cos
        FROM fwd f JOIN bwd USING (xid, yid)""")),

    GraftQuery(
      "q303_embedding_drift",
      (s, dir) => {
        // embedding-SPACE drift per class — the representation-shift
        // meter beside the value-space family (KL/KS/χ²/EMD): exact
        // decimal-summed centroids per (label, epoch half), then the
        // cosine between a label's two epoch prototypes; a drifting
        // class pulls its cosine below the stable ones. Centroid means
        // via [[Similarity.centroids]]; the cosine is the ArrayDot left
        // fold both engines share.
        val e = Tables.load(s, dir, "embeddings")
          .withColumn("label", col("vec_id") % 8)
        def cent(epoch: Int) = Similarity.centroids(
          e.filter(expr("(vec_id div 8) % 2") === epoch), "label",
          "embedding")
          .select(col("label"), col("centroid").as(s"c$epoch"))
        cent(0).join(cent(1), "label")
          .select(col("label"),
            Similarity.cosineCols(col("c0"), col("c1")).as("drift_cos"))
      },
      Some {
        val rounded = graft.functions.SafeMath.roundHalfUpSql(
          "CAST(g.s.v AS DOUBLE)", 10)
        def meanCte(epoch: Int) =
          s"""g$epoch AS (
            SELECT vec_id % 8 AS label,
              unnest(list_transform(range(1, ${Dim + 1}),
                i -> struct_pack(pos := i - 1, v := embedding[i]))) AS s
            FROM embeddings WHERE (vec_id // 8) % 2 = $epoch),
          m$epoch AS (SELECT label, list(m ORDER BY pos) AS v
            FROM (SELECT label, g.s.pos AS pos,
                (CAST(SUM(CAST($rounded AS DECIMAL(28,10))) AS DOUBLE)
                  / COUNT(*)) AS m
              FROM g$epoch g GROUP BY 1, 2)
            GROUP BY label)"""
        s"""WITH ${meanCte(0)}, ${meanCte(1)}
          SELECT m0.label, ${cosSql("m0.v", "m1.v")} AS drift_cos
          FROM m0 JOIN m1 USING (label)"""
      }),

    GraftQuery(
      "q293_rbo",
      (s, dir) => {
        // rank-biased overlap between two query vectors' cosine top-20s
        // ([[Similarity.rboTruncated]], p = 0.9): the top-weighted
        // ranker-agreement score — integer micro arithmetic end to end,
        // weights driver-folded once and shared with the oracle.
        val e = Tables.load(s, dir, "embeddings")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id"))
        def ranked(qid: Int) = Similarity.cosineTopK(
          e, "vec_id", "embedding", queryVecAt(s, dir, qid), k = 20)
          .withColumn("rank", row_number().over(w))
        Similarity.rboTruncated(ranked(0), ranked(1), "vec_id", "rank",
          k = 20)
      },
      Some {
        def rankCte(qid: Int, name: String) =
          s"""$name AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (
              ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM (SELECT e.vec_id,
                ${cosSql("e.embedding", "q.qv")} AS cos
              FROM embeddings e,
                (SELECT embedding AS qv FROM embeddings
                 WHERE vec_id = $qid) q)
            ORDER BY cos DESC, vec_id LIMIT 20)"""
        val wts = Similarity.rboWeights(20, 9L, 10L)
          .map { case (d, pw) =>
            s"(CAST($d AS BIGINT), CAST($pw AS BIGINT))" }
          .mkString(", ")
        s"""WITH ${rankCte(0, "r0")}, ${rankCte(1, "r1")},
          m AS (SELECT GREATEST(r0.rank, r1.rank) AS m
            FROM r0 JOIN r1 USING (vec_id)
            WHERE GREATEST(r0.rank, r1.rank) <= 20),
          w(d, pw) AS (VALUES $wts),
          xd AS (SELECT w.d, w.pw,
              CAST(COALESCE(SUM(CASE WHEN m.m <= w.d THEN 1 END), 0)
                AS BIGINT) AS x
            FROM w LEFT JOIN m ON m.m <= w.d
            GROUP BY w.d, w.pw)
        SELECT CAST(20 AS INT) AS depth,
          MAX(CASE WHEN d = 20 THEN x END) AS overlap_at_k,
          CAST(SUM((pw * x) // d) // 10 AS BIGINT) AS rbo_micro
        FROM xd"""
      }),

    GraftQuery(
      "q276_k_center",
      (s, dir) => Similarity.kCenterSelect(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", k = 5),
      // the oracle REPLAYS the greedy farthest-first selection, unrolled
      // one CTE pair per round: c_r = argmax over d_{r-1}'s running min
      // squared-L2 (ties to the smaller id, prior picks excluded), d_r
      // folds center r into the running min. A drifted distance or tie
      // order flips a pick and every later round with it.
      Some {
        def dM(v: String, c: String) =
          s"""CAST(FLOOR(((${dotSql(v, v)} + ${dotSql(c, c)}) -
              2.0E0 * ${dotSql(v, c)}) * 1000000.0E0 + 0.5E0) AS BIGINT)"""
        val k = 5
        val ctes = new StringBuilder(
          "WITH e AS (SELECT vec_id, embedding FROM embeddings),\n")
        ctes ++= "c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1),\n"
        ctes ++= s"""d1 AS (SELECT e.vec_id, e.embedding,
            ${dM("e.embedding", "c1.embedding")} AS dmin FROM e, c1)"""
        for (r <- 2 to k) {
          val prior = (1 until r).map(i => s"SELECT vec_id FROM c$i")
            .mkString(" UNION ALL ")
          ctes ++= s""",\nc$r AS (SELECT vec_id, embedding, dmin
              FROM d${r - 1} WHERE vec_id NOT IN ($prior)
              ORDER BY dmin DESC, vec_id LIMIT 1)"""
          if (r < k)
            ctes ++= s""",\nd$r AS (SELECT d${r - 1}.vec_id,
                d${r - 1}.embedding, LEAST(d${r - 1}.dmin,
                ${dM(s"d${r - 1}.embedding", s"c$r.embedding")}) AS dmin
              FROM d${r - 1}, c$r)"""
        }
        val unions = (2 to k).map(r =>
          s"UNION ALL SELECT CAST($r AS INT), vec_id, dmin FROM c$r")
          .mkString("\n")
        s"""$ctes
          SELECT CAST(1 AS INT) AS round, vec_id,
            CAST(0 AS BIGINT) AS dist_micro FROM c1
          $unions"""
      },
      bench = true)
  )

  /** Generated oracle for q240: nano-unit upper-triangle moment sums →
    * symmetric matrix as a list-of-lists → `iters` unrolled power-iteration
    * CTEs (matrix-vector left folds, max-abs normalization with a 0.0
    * fold seed, per-round scale-6 snap) → per-vector projection. Mirrors
    * [[graft.operators.Spectral]] op for op. */
  private def pc1OracleSql(dim: Int, iters: Int, snap: Int,
      scale: Int): String = {
    val d1 = dim + 1
    s"""WITH ${pc1CtesSql(dim, iters, snap)}
        SELECT vec_id, ${graft.functions.SafeMath.roundHalfUpSql(
          s"""list_reduce(list_transform(range(1, $d1), j ->
            CAST(embedding[j] AS DOUBLE) * v[j]), (a, b) -> a + b)""",
          scale)} AS pc1
        FROM embeddings, v$iters"""
  }

  /** The shared CTE body of the power-iteration oracles (q240 batch
    * projection, q250 stream-maintained component): exact moment sums →
    * matrix-of-lists → `iters` unrolled rounds; the caller appends its
    * final SELECT over `v$iters`. */
  private[queries] def pc1CtesSql(dim: Int, iters: Int, snap: Int): String = {
    val d1 = dim + 1
    val pS = graft.score.ScoreEngine.fmtD(math.pow(10, snap))
    val rounds = (1 to iters).map { r =>
      s"""w$r AS (SELECT v, list_transform(range(1, $d1), i ->
            list_reduce(list_transform(range(1, $d1), j ->
              mm[i][j] * v[j]), (a, b) -> a + b)) AS w
          FROM mat, v${r - 1}),
        s$r AS (SELECT v, w,
            list_reduce(list_prepend(0.0E0, list_transform(w, x -> abs(x))),
              (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS s
          FROM w$r),
        v$r AS (SELECT CASE WHEN s = 0.0E0 THEN v ELSE
            list_transform(w, x ->
              FLOOR(((x / s) * 1000000.0E0) + 0.5E0) / 1000000.0E0) END AS v
          FROM s$r)"""
    }.mkString(",\n        ")
    s"""pr AS (SELECT a.i AS i, b.j AS j
            FROM range(0, $dim) a(i), range(0, $dim) b(j) WHERE b.j >= a.i),
        ms AS (SELECT pr.i, pr.j,
            CAST(SUM(CAST(FLOOR(((CAST(embedding[pr.i + 1] AS DOUBLE) *
                CAST(embedding[pr.j + 1] AS DOUBLE)) * $pS) + 0.5E0)
              AS BIGINT)) AS BIGINT) AS s
          FROM embeddings, pr GROUP BY 1, 2),
        f AS (SELECT i, j, CAST(s AS DOUBLE) / $pS AS m FROM ms
          UNION ALL
          SELECT j, i, CAST(s AS DOUBLE) / $pS FROM ms WHERE i <> j),
        rws AS (SELECT i, list(m ORDER BY j) AS r FROM f GROUP BY i),
        mat AS (SELECT list(r ORDER BY i) AS mm FROM rws),
        v0 AS (SELECT list_transform(range(0, $dim), x -> 1.0E0) AS v),
        $rounds"""
  }

  /** Unrolled two-iteration Lloyd twin of Similarity.kmeans over any
    * corpus relation: assignment = row_number over (dist, cell) — exactly
    * array_position's first-min — and the centroid recompute mirrors
    * q68's decimal-summed mean. Emits the CTE body (e, c0, d1, a1, f1,
    * c1, d2, a2); callers select from `a2` (final assignment), read the
    * trained centroids from `c1` (the IVF coarse-quantizer twin), and
    * may join vectors back from `e`. `k` parameterizes the cell count
    * (8 = the kmeans/semDedup gates, 16 = the IVF coarse quantizer). */
  private[queries] def kmeansCte(corpus: String, k: Int = 8): String = {
    val rounded = graft.functions.SafeMath.roundHalfUpSql("g.s.v", 10)
    def assign(d: String) =
      s"""SELECT vec_id, cell FROM (
          SELECT vec_id, cell, row_number()
            OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
          FROM $d) WHERE rn = 1"""
    def dists(c: String) =
      s"""SELECT e.vec_id, $c.cell,
          (-(${dotSql("e.v", s"$c.v")})) / sqrt(${dotSql(s"$c.v", s"$c.v")}) AS dist
        FROM e, $c"""
    s"""e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM $corpus),
      c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
            AS cell, v
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k)),
      d1 AS (${dists("c0")}),
      a1 AS (${assign("d1")}),
      f1 AS (SELECT a1.cell, g.s.pos AS pos,
          (CAST(SUM(CAST($rounded AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)) AS m
        FROM (SELECT vec_id, unnest(list_transform(range(1, ${Dim + 1}),
            i -> struct_pack(pos := i - 1, v := v[i]))) AS s FROM e) g
        JOIN a1 ON a1.vec_id = g.vec_id GROUP BY 1, 2),
      c1 AS (SELECT c0.cell, COALESCE(n.v, c0.v) AS v FROM c0
        LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS v FROM f1
          GROUP BY cell) n ON n.cell = c0.cell),
      d2 AS (${dists("c1")}),
      a2 AS (${assign("d2")})"""
  }

  /** One 16-bit dHash band as DuckDB integer arithmetic over the
    * synthetic-gradient pixel formulas — the oracle twin of
    * Multimodal.dHashBands ∘ attachSyntheticGradientPng. Operates on a
    * relation exposing (sid, w, h): gray(x, y) inlines the
    * nearest-neighbor source coordinates (⌊x·w/9⌋, ⌊y·h/8⌋) into the
    * per-channel formulas and the integer ITU-R 601 luma; band j packs
    * sign bits j·16..j·16+15 little-endian. */
  private def dHashBandSql(j: Int): String = {
    def gray(x: Int, y: Int): String = {
      val sx = s"(($x * w) // 9)"
      val sy = s"(($y * h) // 8)"
      s"""((((31 * $sx + 7 * $sy + sid) % 256) * 299
          + ((13 * $sx + 3 * sid) % 256) * 587
          + ((11 * $sy + 5 * sid) % 256) * 114) // 1000)"""
    }
    (0 until 16).map { t =>
      val i = j * 16 + t
      val (x, y) = (i % 8, i / 8)
      s"(CASE WHEN ${gray(x + 1, y)} > ${gray(x, y)} THEN ${1 << t} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** The q223 oracle, shared with the streamed-index parity gate
    * (q225): codebooks, codes, Lloyd-trained coarse cells (the k=16
    * kmeansCte ladder — probe list from the trained `c1` centroids,
    * cell filter from the final `a2` assignment), and luts all replayed
    * in unrolled CTEs, top-10 by ADC score. */
  private[queries] def ivfPqTopKOracle: String =
    s"""WITH ${kmeansCte("embeddings", 16)},
        ${pqCte("embeddings")},
        ${pqLutsSql()},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qcells AS (
          SELECT c1.cell AS cell
          FROM c1 CROSS JOIN q
          ORDER BY -(${dotSql("q.qv", "c1.v")}) /
              (sqrt(${dotSql("c1.v", "c1.v")}) * sqrt(${dotSql("q.qv", "q.qv")})),
            c1.cell
          LIMIT 4),
        sc AS (SELECT enc.vec_id,
            (((l0.lv + l1.lv) + l2.lv) + l3.lv) AS s
          FROM enc
          JOIN a2 ON a2.vec_id = enc.vec_id
          JOIN qcells ON a2.cell = qcells.cell
          $pqLutJoins)
        SELECT vec_id,
          ${graft.functions.SafeMath.roundHalfUpSql("s", 6)} AS score
        FROM sc ORDER BY score DESC, vec_id ASC LIMIT 10"""

  /** Per-subspace ADC lookup tables: lut_j(cell) = q_j · c1_j(cell),
    * the query slice dotted with every trained centroid of subspace j —
    * the SQL twin of the driver-side luts in Similarity.adcScore. */
  private def pqLutsSql(m: Int = 4): String = {
    val sub = Dim / m
    (0 until m).map { j =>
      val lo = j * sub + 1
      s"""lut_$j AS (SELECT c1_$j.cell AS cell,
          ${dotSubSql(s"c1_$j.v", "q.v", sub)} AS lv
        FROM c1_$j, (SELECT list_transform(range($lo, ${lo + sub}),
            i -> CAST(embedding[i] AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id = 0) q)"""
    }.mkString(",\n")
  }

  /** The four lut equi-joins every ADC oracle shares. */
  private def pqLutJoins: String =
    (0 until 4).map(j =>
      s"JOIN lut_$j l$j ON l$j.cell = enc.code_$j").mkString(" ")

  /** Left-fold dot over a `n`-element subvector (the [[dotSql]] fold on a
    * subspace slice). */
  private def dotSubSql(a: String, b: String, n: Int): String =
    s"""list_reduce(list_transform(range(1, ${n + 1}),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""

  /** Unrolled product-quantization twin of Similarity.pqCodebooks +
    * pqEncode: per subspace j, slice [j·sub+1, (j+1)·sub] runs the exact
    * kmeansCte ladder (first-ks init in vec_id order, `-dot/|c|`
    * distances, first-min assignment via row_number, decimal-summed
    * centroid recompute), and `enc` joins the m final assignments into
    * (vec_id, code_0..code_{m-1}). Callers may also reference the
    * per-subspace trained codebooks `c1_j`. */
  private def pqCte(corpus: String, m: Int = 4, ks: Int = 8): String = {
    val sub = Dim / m
    val rounded = graft.functions.SafeMath.roundHalfUpSql("g.s.v", 10)
    def assign(d: String) =
      s"""SELECT vec_id, cell FROM (
          SELECT vec_id, cell, row_number()
            OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
          FROM $d) WHERE rn = 1"""
    val per = (0 until m).map { j =>
      val lo = j * sub + 1
      def dists(c: String) =
        s"""SELECT e$j.vec_id, $c.cell,
            (-(${dotSubSql(s"e$j.v", s"$c.v", sub)})) /
              sqrt(${dotSubSql(s"$c.v", s"$c.v", sub)}) AS dist
          FROM e$j, $c"""
      s"""e$j AS (SELECT vec_id, list_transform(range($lo, ${lo + sub}),
            i -> CAST(embedding[i] AS DOUBLE)) AS v FROM $corpus),
        c0_$j AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
              AS INTEGER) AS cell, v
          FROM (SELECT vec_id, v FROM e$j ORDER BY vec_id LIMIT $ks)),
        d1_$j AS (${dists(s"c0_$j")}),
        a1_$j AS (${assign(s"d1_$j")}),
        f1_$j AS (SELECT a1_$j.cell, g.s.pos AS pos,
            (CAST(SUM(CAST($rounded AS DECIMAL(28,10))) AS DOUBLE)
              / COUNT(*)) AS m
          FROM (SELECT vec_id, unnest(list_transform(range(1, ${sub + 1}),
              i -> struct_pack(pos := i - 1, v := v[i]))) AS s FROM e$j) g
          JOIN a1_$j ON a1_$j.vec_id = g.vec_id GROUP BY 1, 2),
        c1_$j AS (SELECT c0_$j.cell, COALESCE(n.v, c0_$j.v) AS v
          FROM c0_$j LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS v
            FROM f1_$j GROUP BY cell) n ON n.cell = c0_$j.cell),
        d2_$j AS (${dists(s"c1_$j")}),
        a2_$j AS (${assign(s"d2_$j")})"""
    }.mkString(",\n")
    val joins = (1 until m)
      .map(j => s"JOIN a2_$j ON a2_$j.vec_id = a2_0.vec_id").mkString(" ")
    s"""$per,
      enc AS (SELECT a2_0.vec_id,
          ${(0 until m).map(j => s"a2_$j.cell AS code_$j").mkString(", ")}
        FROM a2_0 $joins)"""
  }
}
