package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Deduplication operators gated over a corpus with guaranteed duplicates:
  * the documents table unioned with an id-shifted copy of itself, so exact
  * groups, Jaccard pairs, and LSH candidates are all non-trivial at every
  * scale factor (natural near-dups, if any, surface too).
  */
object DedupQueries {

  private[queries] val Shift = 1000000L

  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("doc_id", "text")
    d.unionByName(d.select((col("doc_id") + Shift).as("doc_id"), col("text")))
  }

  private val CorpusSql =
    s"""(SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + $Shift AS doc_id, text FROM documents)"""

  /** DuckDB twin of TextFunctions.shingles (k=3): same tokenization, same
    * slice windows, same separator. */
  private val ShinglesSql =
    """list_transform(
         range(0, greatest(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) - 2, 0)),
         i -> array_to_string(
           list_slice(list_filter(string_split_regex(text, '\s+'), x -> x <> ''), i + 1, i + 3), ' '))"""

  /** Shared CTE fragment: distinct (doc, shingle) inverted index over the
    * df-capped shingle universe — the twin of Dedup's shingleIndex +
    * hot-shingle drop (dfCap=100). */
  // MATERIALIZED: idx0 is referenced twice and idx three-plus times by
  // every consumer (sizes + both self-join legs) — plain CTEs inline
  // per reference, so an un-pinned idx re-runs the shingle explode per
  // leg; inside q312's RECURSIVE reach that re-evaluation repeats PER
  // ITERATION (measured: a >77 GB duckdb spill at sf3). Same results,
  // one evaluation.
  private val CappedIdxSql =
    s"""idx0 AS MATERIALIZED (
          SELECT DISTINCT doc_id AS doc, sh FROM (
            SELECT doc_id, unnest($ShinglesSql) AS sh FROM $CorpusSql)),
        idx AS MATERIALIZED (
          SELECT doc, sh FROM idx0
          WHERE sh NOT IN (SELECT sh FROM idx0 GROUP BY sh HAVING COUNT(*) > 100))"""

  /** DuckDB twin of TextFunctions.md5Key60 over a hex-string expression:
    * left fold acc*16+digit over the first 15 md5 hex chars. */
  private def md5FoldSql(hexExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, 16),
          j -> CAST(strpos('0123456789abcdef', substr($hexExpr, j, 1)) - 1 AS BIGINT))),
        (a, v) -> a * 16 + v)"""

  /** Shared connected-components oracle chain over the q47-style exact
    * Jaccard near-dup edges: edges → sym → RECURSIVE reach. Interpolate
    * right after `WITH RECURSIVE` and follow with a consumer of `reach`
    * (or of `cl` via [[JaccardClCteSql]]). Every multi-referenced CTE is
    * MATERIALIZED — plain CTEs inline per reference; this chain was
    * copy-pasted in four oracles and the MATERIALIZED fix had to land
    * four times (advice r11 — factored here, the KnNllCteSql precedent). */
  private val JaccardCcCteSql =
    s"""edges AS MATERIALIZED (
          SELECT doc_a, doc_b FROM (
            WITH $CappedIdxSql,
            sizes AS (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
            co AS (
              SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS inter
              FROM idx x JOIN idx y ON x.sh = y.sh AND x.doc < y.doc
              GROUP BY 1, 2)
            SELECT doc_a, doc_b
            FROM co JOIN sizes a ON a.doc = doc_a JOIN sizes b ON b.doc = doc_b
            WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0)),
        sym AS MATERIALIZED (
          SELECT doc_a AS src, doc_b AS dst FROM edges
          UNION SELECT doc_b, doc_a FROM edges),
        reach(src, dst) AS (
          SELECT src, dst FROM sym
          UNION
          SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)"""

  /** [[JaccardCcCteSql]] plus the min-id cluster census `cl`. */
  private val JaccardClCteSql =
    s"""$JaccardCcCteSql,
        cl AS (SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
          FROM reach GROUP BY src)"""

  /** Banded-minhash ingest oracle skeleton (shared by q215 and the
    * streamed q218): the q31 sig/band pipeline over `corpusSql`, with
    * candidate pairs filtered by `candWhere` (x = new side, y = old
    * side) instead of the self-join's x.doc < y.doc, verified with
    * exact Jaccard at 0.8. */
  private[queries] def bandedIngestOracleSql(corpusSql: String,
      candWhere: String): String =
    s"""WITH ${sigBandCtesSql(corpusSql)},
      cand AS MATERIALIZED (
        SELECT DISTINCT x.doc AS doc_new, y.doc AS doc_old
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.bh = y.bh
        WHERE $candWhere),
      idx AS MATERIALIZED (
        SELECT DISTINCT doc_id AS doc, sh FROM (
          SELECT doc_id, unnest($ShinglesSql) AS sh FROM $corpusSql)),
      sizes AS MATERIALIZED (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
      inter AS (
        SELECT c.doc_new, c.doc_old, COUNT(*) AS inter
        FROM cand c
        JOIN idx xa ON xa.doc = c.doc_new
        JOIN idx xb ON xb.doc = c.doc_old AND xa.sh = xb.sh
        GROUP BY 1, 2)
      SELECT doc_new, doc_old,
        CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) AS jaccard
      FROM inter
      JOIN sizes a ON a.doc = doc_new
      JOIN sizes b ON b.doc = doc_old
      WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0"""

  /** Shared sig/band CTE chain — shingled → keys → sigs → banded over
    * `corpusRef` (a prior CTE name or a parenthesized subquery). This is
    * THE twin of Dedup's 16-hash/4-band minhash signatures; it exists
    * once so a banding-constant change cannot silently diverge between
    * the q31/q322 self-join, the q215/q218 ingest, and the q321 recall
    * oracles (review r13). All MATERIALIZED: sigs is referenced once per
    * band and the chain's consumers re-reference banded per leg. */
  private def sigBandCtesSql(corpusRef: String): String = {
    val P = Dedup.MinhashP
    val numHashes = 16; val bands = 4; val rows = numHashes / bands
    val sigCols = (0 until numHashes).map(i =>
      s"MIN((key * ${Dedup.mhA(i)} + ${Dedup.mhB(i)}) % $P) AS s$i")
      .mkString(", ")
    def bh(j: Int): String =
      (0 until rows).foldLeft(s"CAST(${j + 1} AS BIGINT)")((acc, r) =>
        s"(($acc * ${Dedup.BandM} + s${j * rows + r}) % $P)")
    val bandSelects = (0 until bands).map(j =>
      s"SELECT doc, $j AS band, ${bh(j)} AS bh FROM sigs")
      .mkString(" UNION ALL ")
    s"""shingled AS MATERIALIZED (
        SELECT doc_id AS doc, unnest($ShinglesSql) AS sh FROM $corpusRef),
      keys AS MATERIALIZED (
        SELECT doc, (${md5FoldSql("h")}) % ${Dedup.MinhashP} AS key
        FROM (SELECT doc, md5(sh) AS h FROM shingled)),
      sigs AS MATERIALIZED (SELECT doc, $sigCols FROM keys GROUP BY doc),
      banded AS MATERIALIZED ($bandSelects)"""
  }

  /** The q31 banded-minhash SELF-JOIN oracle over any corpus subquery
    * (q31 raw, q322 composed-after-exact-dedup). MATERIALIZED
    * throughout: corp is scanned by shingled AND idx, sigs is referenced
    * once per band and idx three times — inlined re-evaluation re-ran
    * the shingle explode per reference (sf3: disk-filling spill, r11). */
  private[queries] def bandedSelfJoinOracleSql(corpusSql: String): String =
    s"""WITH corp AS MATERIALIZED (SELECT doc_id, text FROM $corpusSql),
      ${sigBandCtesSql("corp")},
      cand AS MATERIALIZED (
        SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.bh = y.bh AND x.doc < y.doc),
      idx AS MATERIALIZED (
        SELECT DISTINCT doc_id AS doc, sh FROM (
          SELECT doc_id, unnest($ShinglesSql) AS sh FROM corp)),
      sizes AS MATERIALIZED (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
      inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
        FROM cand c
        JOIN idx xa ON xa.doc = c.doc_a
        JOIN idx xb ON xb.doc = c.doc_b AND xa.sh = xb.sh
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) AS jaccard
      FROM inter
      JOIN sizes a ON a.doc = doc_a
      JOIN sizes b ON b.doc = doc_b
      WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0"""

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q29_exact_dedup",
      (s, dir) => Dedup.exactGroups(corpus(s, dir), "doc_id", "text"),
      Some(s"""SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
        MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        FROM $CorpusSql GROUP BY 1 HAVING COUNT(*) > 1"""),
      bench = true),

    GraftQuery(
      "q165_repeated_span_removal",
      (s, dir) => {
        // WITHIN-document repeated-span removal (the Gopher-style
        // repetition filter as an actual cleaner, not just q67's stats):
        // docs are salted with known repetitions — %3=1 docs fully
        // doubled, %3=0 docs re-append their first 10 tokens — and every
        // token covered by a non-first occurrence of its 4-gram is
        // dropped; the doubled tail must vanish, the untouched docs must
        // pass through with n_kept = n_tokens.
        val t = graft.functions.TextFunctions.tokens(col("text"))
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 3 === 1,
              concat_ws(" ", col("text"), col("text")))
            .when(col("doc_id") % 3 === 0, concat_ws(" ", col("text"),
              concat_ws(" ", slice(t, 1, 10))))
            .otherwise(col("text")).as("text"))
        Dedup.removeRepeatedSpans(docs, "doc_id", "text")
      },
      Some(s"""WITH t0 AS (SELECT doc_id, text,
            list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
          FROM documents),
        d0 AS (SELECT doc_id, CASE
            WHEN doc_id % 3 = 1 THEN text || ' ' || text
            WHEN doc_id % 3 = 0 THEN text || ' ' ||
              array_to_string(list_slice(tk, 1, 10), ' ')
            ELSE text END AS text FROM t0),
        d AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
          FROM d0),
        g AS (SELECT doc_id,
            unnest(range(0, greatest(len(toks) - 3, 0))) AS i,
            unnest(list_transform(range(0, greatest(len(toks) - 3, 0)),
              i -> array_to_string(list_slice(toks, i + 1, i + 4), chr(1))))
              AS gram
          FROM d),
        dup AS (SELECT doc_id, i FROM (
            SELECT doc_id, i, MIN(i) OVER (PARTITION BY doc_id, gram) AS mi
            FROM g) x WHERE i > mi),
        cov AS (SELECT DISTINCT doc_id, t FROM (
            SELECT doc_id, unnest(range(i, i + 4)) AS t FROM dup) u),
        tp AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt,
            unnest(range(0, len(toks))) AS t, unnest(toks) AS tok
          FROM d),
        kept AS (SELECT tp.doc_id, tp.nt, tp.t, tp.tok FROM tp
          LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.t = tp.t
          WHERE cov.doc_id IS NULL)
      SELECT doc_id, MAX(nt) AS n_tokens, CAST(COUNT(*) AS BIGINT) AS n_kept,
        array_to_string(list(tok ORDER BY t), ' ') AS cleaned
      FROM kept GROUP BY doc_id""")),

    GraftQuery(
      "q30_jaccard_pairs",
      (s, dir) => Dedup.jaccardPairs(corpus(s, dir), "doc_id", "text",
        k = 3, threshold = 0.8),
      Some(s"""WITH $CappedIdxSql,
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
        co AS (
          SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS inter
          FROM idx x JOIN idx y ON x.sh = y.sh AND x.doc < y.doc
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) AS jaccard
        FROM co
        JOIN sizes a ON a.doc = doc_a
        JOIN sizes b ON b.doc = doc_b
        WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0"""),
      bench = true),

    GraftQuery(
      "q47_dedup_clusters",
      (s, dir) => {
        // connected components over the near-dup pairs: each doc →
        // min-id of its component (the canonical survivor).
        val pairs = Dedup.jaccardPairs(corpus(s, dir), "doc_id", "text",
          k = 3, threshold = 0.8)
        Dedup.clusterAssignments(pairs)
      },
      Some(s"""WITH RECURSIVE
        $JaccardCcCteSql
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
        FROM reach GROUP BY src"""),
      bench = true),

    GraftQuery(
      "q87_dedup_apply",
      (s, dir) => {
        // the write side of dedup: keep each component's min-id canonical
        // plus all unclustered docs — pairs → components → anti-join.
        val c = corpus(s, dir)
        val pairs = Dedup.jaccardPairs(c, "doc_id", "text",
          k = 3, threshold = 0.8)
        Dedup.applyClusters(c, "doc_id", Dedup.clusterAssignments(pairs))
      },
      Some(s"""WITH RECURSIVE
        $JaccardClCteSql
        SELECT c.doc_id, c.text
        FROM $CorpusSql c LEFT JOIN cl ON cl.node = c.doc_id
        WHERE cl.node IS NULL OR cl.cluster = c.doc_id""")),

    GraftQuery(
      "q312_group_split",
      (s, dir) => {
        // leakage-free train/val/test split: near-dup GROUPS (q47's
        // components — here every doc pairs with its shifted copy) are
        // hashed to a split as a unit, so two near-copies can never
        // straddle the eval boundary; output is the 3-row split census
        val c = corpus(s, dir)
        val pairs = Dedup.jaccardPairs(c, "doc_id", "text",
          k = 3, threshold = 0.8)
        graft.operators.Curation.groupSplit(
          c, "doc_id", Dedup.clusterAssignments(pairs))
      },
      Some(s"""WITH RECURSIVE
        $JaccardClCteSql,
        asg AS (SELECT c.doc_id, cl.cluster,
            CAST(COALESCE(cl.cluster, c.doc_id) AS VARCHAR) AS grp
          FROM $CorpusSql c LEFT JOIN cl ON cl.node = c.doc_id),
        bkt AS (SELECT doc_id, cluster, grp,
            ${md5FoldSql("md5('graft' || grp)")} % 100 AS b
          FROM asg)
        SELECT CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
          CAST(SUM(CASE WHEN cluster IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clustered_docs
        FROM bkt GROUP BY 1""")),

    GraftQuery(
      "q114_containment_pairs",
      (s, dir) => Dedup.containmentPairs(corpus(s, dir), "doc_id", "text",
        k = 3, threshold = 0.9),
      Some(s"""WITH $CappedIdxSql,
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
        co AS (
          SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS inter
          FROM idx x JOIN idx y ON x.sh = y.sh AND x.doc < y.doc
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          CAST(inter AS DOUBLE) / least(a.n_sh, b.n_sh) AS containment
        FROM co
        JOIN sizes a ON a.doc = doc_a
        JOIN sizes b ON b.doc = doc_b
        WHERE CAST(inter AS DOUBLE) / least(a.n_sh, b.n_sh) >= 0.9E0""")),

    // MinHash + SimHash run on md5-derived integer keys and overflow-free
    // modular arithmetic, so DuckDB reproduces the exact signatures,
    // band keys, and fingerprints — full hash gates, not rows-only.
    GraftQuery(
      "q31_minhash_lsh",
      (s, dir) => Dedup.minhashLsh(corpus(s, dir), "doc_id", "text",
        numHashes = 16, bands = 4, k = 3, threshold = 0.8),
      Some(bandedSelfJoinOracleSql(CorpusSql)),
      bench = true),

    GraftQuery(
      "q322_dedup_then_neardup",
      (s, dir) => {
        // exact-dedup-FIRST composition: collapse the corpus to one
        // canonical doc per normalized fingerprint, THEN run banded
        // minhash over the survivors. This is the claim behind q31's
        // measured super-linear growth (5.8x at 3x data = pair OUTPUT
        // on a duplicate-amplified corpus): composed, the near-dup
        // stage's input is exact-deduped, clique pairs collapse to
        // their canonical representatives, and the stage's runtime and
        // output stay linear — measured beside the raw path in SF3.md.
        val c = corpus(s, dir)
        val ded = graft.operators.KeepLatest(
          c.withColumn("fp",
            graft.functions.TextFunctions.fingerprint(col("text"))),
          Seq("fp"), Seq(col("doc_id").asc))
          .select("doc_id", "text")
        Dedup.minhashLsh(ded, "doc_id", "text",
          numHashes = 16, bands = 4, k = 3, threshold = 0.8)
      },
      Some(bandedSelfJoinOracleSql(
        s"""(SELECT doc_id, text FROM (
            SELECT doc_id, text, row_number() OVER (
              PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
              ORDER BY doc_id) AS rn
            FROM $CorpusSql) WHERE rn = 1)"""))),

    GraftQuery(
      "q321_mutation_recall",
      (s, dir) => {
        // LSH recall on a corpus with GRADED near-dup structure, not
        // clique-world: every doc gets three mutated copies with every
        // p-th token substituted by a variant-unique marker (p = 64 /
        // 16 / 8 ≈ 1.6% / 6% / 12.5% edit rates — straddling the 0.8
        // Jaccard threshold, so truth pairs thin out and banding at
        // b=4, r=4 has a real miss probability). Truth = exact shingle
        // Jaccard per (orig, variant) via a KEYED join (each doc pairs
        // only with its own variants — never all-pairs); detected =
        // minhashLsh's verified pairs restricted to the same set.
        // Output: per variant, n_true / n_detected / recall — the
        // mutation-graded recall curve the clique corpora can't show.
        // spread BEFORE the token mutation (an interpreted HOF over a
        // 2-split scan leaves 30 of 32 cores idle — the q229 lesson),
        // and checkpoint the mutated corpus ONCE: both the LSH leg and
        // the truth leg consume it, and without the materialization the
        // per-token transform evaluates twice (measured 68.6 s at sf1
        // before, the mutation dominating)
        val d = graft.operators.Similarity.spread(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        def mutated(v: Int, p: Int) = d.select(
          (col("doc_id") + v * Shift).as("doc_id"),
          array_join(transform(
            graft.functions.TextFunctions.tokens(col("text")),
            (t, tix) => when(pmod(tix, lit(p)) === 0,
              concat(lit(s"zzmut${v}x"), tix)).otherwise(t)),
            " ").as("text"))
        val mc = d.unionByName(mutated(1, 64))
          .unionByName(mutated(2, 16)).unionByName(mutated(3, 8))
          .localCheckpoint()
        val detected = Dedup.minhashLsh(mc, "doc_id", "text",
            numHashes = 16, bands = 4, k = 3, threshold = 0.8)
          .filter(col("doc_a") < Shift && col("doc_b") >= Shift &&
            col("doc_a") === pmod(col("doc_b"), lit(Shift)))
          .select(expr(s"doc_b div $Shift").as("variant"),
            col("doc_a").as("orig"))
        // exact-truth leg: distinct shingles per doc, checkpointed once
        // (three consumers), then a join KEYED on (orig id, shingle) —
        // volume is linear in corpus size by construction
        val sh = graft.operators.Similarity.spread(mc)
          .select(col("doc_id"), explode(array_distinct(
            graft.functions.TextFunctions.shingles(col("text"), 3)))
            .as("sh"))
          .localCheckpoint()
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val aLeg = sh.filter(col("doc_id") < Shift)
          .select(col("doc_id").as("orig"), col("sh"))
        val bLeg = sh.filter(col("doc_id") >= Shift)
          .select(pmod(col("doc_id"), lit(Shift)).as("orig"),
            expr(s"doc_id div $Shift").as("variant"), col("sh"))
        val inter = aLeg.join(bLeg, Seq("orig", "sh"))
          .groupBy("orig", "variant").agg(count(lit(1)).as("inter"))
        val truth = inter
          .join(sizes.select(col("doc_id").as("orig"),
            col("n_sh").as("na")), "orig")
          .join(sizes.select(col("doc_id").as("bid"),
            col("n_sh").as("nb")),
            col("bid") === col("orig") + col("variant") * Shift)
          .filter(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")) >= 0.8)
          .select("variant", "orig")
        truth.join(detected.withColumn("hit", lit(true)),
            Seq("variant", "orig"), "left")
          .groupBy("variant")
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_detected"))
          .select(col("variant"), col("n_true"), col("n_detected"),
            graft.functions.SafeMath.roundHalfUp(
              col("n_detected") / col("n_true"), 6).as("recall"))
      },
      Some {
        def mutSql(v: Int, p: Int) =
          s"""SELECT doc_id + ${v * Shift} AS doc_id,
              array_to_string(list_transform(range(1, len(toks) + 1),
                tk -> CASE WHEN ((tk - 1) % $p) = 0
                  THEN 'zzmut${v}x' || CAST(tk - 1 AS VARCHAR)
                  ELSE toks[tk] END), ' ') AS text
            FROM (SELECT doc_id,
                list_filter(string_split_regex(text, '\\s+'),
                  x -> x <> '') AS toks
              FROM documents)"""
        val hitSum = "CAST(SUM(CASE WHEN d.orig IS NOT NULL " +
          "THEN 1 ELSE 0 END) AS BIGINT)"
        // the banding-candidate det needs no jaccard verification of its
        // own: hits are counted only on truth rows (LEFT JOIN), and
        // candidate ∧ jaccard≥0.8 IS the verified-detected set
        s"""WITH mc AS MATERIALIZED (
            SELECT doc_id, text FROM documents
            UNION ALL ${mutSql(1, 64)}
            UNION ALL ${mutSql(2, 16)}
            UNION ALL ${mutSql(3, 8)}),
          ${sigBandCtesSql("mc")},
          det AS MATERIALIZED (
            SELECT DISTINCT x.doc AS orig, y.doc // $Shift AS variant
            FROM banded x JOIN banded y
              ON x.band = y.band AND x.bh = y.bh
            WHERE x.doc < $Shift AND y.doc >= $Shift
              AND y.doc % $Shift = x.doc),
          idx AS MATERIALIZED (
            SELECT DISTINCT doc_id AS doc, sh FROM (
              SELECT doc_id, unnest($ShinglesSql) AS sh FROM mc)),
          sizes AS MATERIALIZED (
            SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
          tj AS (
            SELECT y.doc // $Shift AS variant, x.doc AS orig,
              COUNT(*) AS inter
            FROM idx x JOIN idx y ON x.sh = y.sh
              AND x.doc < $Shift AND y.doc >= $Shift
              AND y.doc % $Shift = x.doc
            GROUP BY 1, 2),
          truth AS MATERIALIZED (
            SELECT variant, orig FROM tj
            JOIN sizes sa ON sa.doc = orig
            JOIN sizes sb ON sb.doc = orig + variant * $Shift
            WHERE CAST(inter AS DOUBLE) /
              (sa.n_sh + sb.n_sh - inter) >= 0.8E0)
        SELECT t.variant, COUNT(*) AS n_true, $hitSum AS n_detected,
          ${graft.functions.SafeMath.roundHalfUpSql(
            s"(CAST($hitSum AS DOUBLE) / COUNT(*))", 6)} AS recall
        FROM truth t
        LEFT JOIN det d ON d.variant = t.variant AND d.orig = t.orig
        GROUP BY t.variant"""
      }),

    GraftQuery(
      "q215_minhash_ingest",
      (s, dir) => {
        // day-2 near-dup ingest: the new batch (a shifted re-send of the
        // corpus) pairs against the standing corpus via the banded
        // minhash index — candidates are a CROSS-side equi-join on
        // (band, bh), never a corpus self-join, so the standing corpus
        // is probed, not re-paired. Every new doc must find its day-1
        // twin (identical text → jaccard 1) plus the genuine cross-day
        // near-dups; corpus-internal dup pairs must NOT appear. The
        // oracle replays the banded join over the union corpus with the
        // cross-day id constraint.
        val d = Tables.load(s, dir, "documents").select("doc_id", "text")
        val incoming = d.select((col("doc_id") + Shift).as("doc_id"),
          col("text"))
        Dedup.minhashLshIngest(d, incoming, "doc_id", "text",
          numHashes = 16, bands = 4, k = 3, threshold = 0.8)
      },
      Some(bandedIngestOracleSql(CorpusSql,
        s"x.doc >= $Shift AND y.doc < $Shift")),
      bench = true),

    GraftQuery(
      "q32_simhash",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(col("doc_id"), Dedup.simhash(col("text")).as("simhash64"))
      },
      Some {
        val votes = (0 until Dedup.SimhashBits).map(j =>
          s"SUM(CASE WHEN (key & ${1L << j}) <> 0 THEN 1 ELSE -1 END) AS v$j")
          .mkString(", ")
        val bits = (0 until Dedup.SimhashBits).map(j =>
          s"(CASE WHEN coalesce(v$j, 0) > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
          .mkString(" + ")
        s"""WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t
            FROM documents),
          keys AS (
            SELECT doc_id, ${md5FoldSql("h")} AS key
            FROM (SELECT doc_id, md5(t) AS h FROM toks)),
          votes AS (SELECT doc_id, $votes FROM keys GROUP BY doc_id)
          SELECT d.doc_id, CAST(coalesce($bits, 0) AS BIGINT) AS simhash64
          FROM documents d LEFT JOIN votes v ON v.doc_id = d.doc_id"""
      }),

    GraftQuery(
      "q149_dedup_report",
      (s, dir) => {
        // per-source redundancy monitor over a corpus where every third
        // document is re-sent: dup rates land near 25% per source
        // (plus any natural dups), exercising the nonzero path.
        val d = Tables.load(s, dir, "documents")
          .select("doc_id", "source", "text")
        val resent = d.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + Shift).as("doc_id"),
            col("source"), col("text"))
        Dedup.dedupReport(d.unionByName(resent), "source", "text")
      },
      Some(s"""WITH c AS (SELECT source, text FROM documents
            UNION ALL SELECT source, text FROM documents
            WHERE doc_id % 3 = 0),
          fp AS (SELECT source,
              md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY 1, 2)
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_rows,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          CAST(SUM(n - 1) AS BIGINT) AS n_dup_rows,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "CAST(SUM(n - 1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)", 4)}
            AS dup_rate
        FROM fp GROUP BY source""")),

    GraftQuery(
      "q140_fuzzy_pairs",
      (s, dir) => Dedup.editOnePairs(
        Tables.load(s, dir, "customer"), "c_name"),
      Some("""WITH names AS (SELECT DISTINCT c_name AS name FROM customer),
          idx AS (SELECT name, unnest(list_prepend(name,
              list_transform(range(1, length(name) + 1),
                i -> substr(name, 1, i - 1) ||
                  substr(name, i + 1, length(name) - i)))) AS v
            FROM names),
          cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
            FROM idx a JOIN idx b ON a.v = b.v AND a.name < b.name)
        SELECT name_a, name_b,
          CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
        FROM cand WHERE levenshtein(name_a, name_b) <= 1""")),

    GraftQuery(
      "q185_entity_resolution",
      (s, dir) => {
        // entity resolution end-to-end: SymSpell edit-1 blocking (q140)
        // feeds connected components (q47's pointer-jumping machinery,
        // here over STRING labels — the changed-row convergence probe
        // path) and every record maps to its component's min-name
        // canonical entity. This is the composed artifact an MDM/dedupe
        // user actually consumes — match, cluster, survivorship in one
        // frame. Subset keyed on custkey so the oracle's recursive-CTE
        // twin stays bounded at 10× while the Spark path is the same
        // linear blocking + O(log d) rounds at any scale.
        val cust = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") % 100 < 10)
          .select(col("c_custkey"), col("c_name"))
        val pairs = Dedup.editOnePairs(cust, "c_name")
        val labels = Dedup.clusterAssignments(pairs, "name_a", "name_b")
        cust.join(labels.withColumnRenamed("node", "c_name"),
            Seq("c_name"), "left")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("cluster"), col("c_name")).as("entity"))
          .withColumn("is_canonical", col("entity") === col("c_name"))
      },
      Some("""WITH RECURSIVE
          cust AS (SELECT c_custkey, c_name FROM customer
            WHERE c_custkey % 100 < 10),
          names AS (SELECT DISTINCT c_name AS name FROM cust),
          idx AS (SELECT name, unnest(list_prepend(name,
              list_transform(range(1, length(name) + 1),
                i -> substr(name, 1, i - 1) ||
                  substr(name, i + 1, length(name) - i)))) AS v
            FROM names),
          cand AS (SELECT DISTINCT a.name AS a, b.name AS b
            FROM idx a JOIN idx b ON a.v = b.v AND a.name < b.name),
          edges AS (SELECT a, b FROM cand WHERE levenshtein(a, b) <= 1),
          sym AS (SELECT a AS src, b AS dst FROM edges
            UNION SELECT b, a FROM edges),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
          lab AS (SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
            FROM reach GROUP BY src)
        SELECT c.c_custkey, c.c_name,
          COALESCE(l.cluster, c.c_name) AS entity,
          COALESCE(l.cluster, c.c_name) = c.c_name AS is_canonical
        FROM cust c LEFT JOIN lab l ON l.node = c.c_name""")),

    GraftQuery(
      "q133_tfidf_cosine_pairs",
      (s, dir) => Dedup.tfidfCosinePairs(corpus(s, dir), "doc_id", "text",
        k = 2, threshold = 0.3, dfCap = 50),
      Some {
        val toks =
          """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
        val bigrams = s"""list_transform(
            range(0, greatest(len($toks) - 1, 0)),
            i -> array_to_string(list_slice($toks, i + 1, i + 2), ' '))"""
        val w8 = graft.functions.SafeMath.roundHalfUpSql(
          "CAST(tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(df AS DOUBLE))",
          4)
        val cos = graft.functions.SafeMath.roundHalfUpSql(
          "CAST(dot AS DOUBLE) / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE))",
          6)
        s"""WITH tf AS (SELECT doc, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id AS doc, unnest($bigrams) AS tok
              FROM $CorpusSql) GROUP BY 1, 2),
          dfx AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf
            GROUP BY tok HAVING COUNT(*) >= 2 AND COUNT(*) <= 50),
          n AS (SELECT CAST(COUNT(DISTINCT doc) AS BIGINT) AS n FROM tf),
          wtd AS (SELECT doc, tf.tok,
              CAST($w8 AS DECIMAL(18,4)) AS w
            FROM tf JOIN dfx USING (tok), n),
          norms AS (SELECT doc, SUM(w * w) AS n2 FROM wtd GROUP BY doc),
          dots AS (SELECT x.doc AS doc_a, y.doc AS doc_b,
              SUM(x.w * y.w) AS dot
            FROM wtd x JOIN wtd y ON x.tok = y.tok AND x.doc < y.doc
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, $cos AS cosine
        FROM dots
        JOIN norms a ON a.doc = doc_a
        JOIN norms b ON b.doc = doc_b
        WHERE $cos >= 0.3E0"""
      },
      bench = true),

    GraftQuery(
      "q132_source_overlap",
      (s, dir) => Dedup.sourceOverlap(
        Tables.load(s, dir, "documents"), "source", "text", k = 3),
      Some {
        val toks =
          """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
        val sh3 = s"""list_transform(
            range(0, greatest(len($toks) - 2, 0)),
            i -> array_to_string(list_slice($toks, i + 1, i + 3), ' '))"""
        s"""WITH idx AS (SELECT DISTINCT source,
              ${CurationQueries.md5Key60Sql("sh")} AS shk
            FROM (SELECT source, unnest(list_distinct($sh3)) AS sh
              FROM documents)),
          sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
            FROM idx GROUP BY source),
          co AS (SELECT x.source AS src_a, y.source AS src_b,
              CAST(COUNT(*) AS BIGINT) AS inter
            FROM idx x JOIN idx y
              ON x.shk = y.shk AND x.source < y.source
            GROUP BY 1, 2)
        SELECT co.src_a, co.src_b, co.inter,
          CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) AS jaccard
        FROM co
        JOIN sizes a ON a.source = co.src_a
        JOIN sizes b ON b.source = co.src_b"""
      }),

    GraftQuery(
      "q126_incremental_ingest",
      (s, dir) => {
        // day-2 ingestion: existing corpus = docs < 250; the incoming
        // batch re-sends 200-249 (content dups of existing — dropped),
        // brings 250-449 fresh, and double-sends 400-449 under a second
        // id (in-batch dups — collapsed to the min id).
        val d = Tables.load(s, dir, "documents").select("doc_id", "text")
        val existing = d.filter(col("doc_id") < 250)
        val incoming = d
          .filter(col("doc_id") >= 200 && col("doc_id") < 450)
          .select((col("doc_id") + 10000).as("doc_id"), col("text"))
          .unionByName(d
            .filter(col("doc_id") >= 400 && col("doc_id") < 450)
            .select((col("doc_id") + 20000).as("doc_id"), col("text")))
        Dedup.incrementalIngest(existing, incoming, "doc_id", "text")
      },
      Some("""WITH ex AS (SELECT DISTINCT
            md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE doc_id < 250),
        inc AS (
          SELECT doc_id + 10000 AS doc_id, text FROM documents
          WHERE doc_id >= 200 AND doc_id < 450
          UNION ALL
          SELECT doc_id + 20000 AS doc_id, text FROM documents
          WHERE doc_id >= 400 AND doc_id < 450),
        fps AS (SELECT doc_id, text,
            md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM inc),
        firsts AS (SELECT doc_id, text, fp FROM (
            SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
              AS rn FROM fps)
          WHERE rn = 1)
        SELECT doc_id, text FROM firsts
        WHERE fp NOT IN (SELECT fp FROM ex)""")),

    GraftQuery(
      "q121_url_dedup",
      (s, dir) => {
        // CommonCrawl-style URL dedup: synthesize raw URLs in four wire
        // variants per order (tracking params in two positions, a
        // fragment, a bare trailing-slash path), canonicalize, and
        // collapse to one row per canonical URL. Variants 0-2 of the
        // same (shop, item) MUST land on the same canonical key.
        val o = Tables.load(s, dir, "orders")
        val v = col("o_orderkey") % 4
        val raw = concat(
          lit("HTTP://Shop"), (col("o_custkey") % 20).cast("string"),
          lit(".Example.COM/item/"), (col("o_orderkey") % 500).cast("string"),
          when(v === 0, "?utm_source=news&ref=a")
            .when(v === 1, "?ref=a&utm_campaign=x")
            .when(v === 2, "?ref=a#frag")
            .otherwise("/"))
        o.select(
            graft.functions.TextFunctions.canonicalUrl(raw)
              .as("canonical_url"),
            col("o_orderkey"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_raw"), min("o_orderkey").as("first_key"))
      },
      Some("""WITH raw AS (SELECT o_orderkey,
            'HTTP://Shop' || (o_custkey % 20) || '.Example.COM/item/' ||
            (o_orderkey % 500) ||
            CASE o_orderkey % 4
              WHEN 0 THEN '?utm_source=news&ref=a'
              WHEN 1 THEN '?ref=a&utm_campaign=x'
              WHEN 2 THEN '?ref=a#frag'
              ELSE '/' END AS url
          FROM orders),
        s1 AS (SELECT o_orderkey,
            regexp_replace(url, '#.*$', '') AS u FROM raw),
        s2 AS (SELECT o_orderkey,
            regexp_replace(u, '([?&])(utm_[A-Za-z0-9_]+=[^&]*&)+', '\1', 'g')
              AS u FROM s1),
        s3 AS (SELECT o_orderkey,
            regexp_replace(u, '[?&]utm_[A-Za-z0-9_]+=[^&]*$', '') AS u FROM s2),
        s4 AS (SELECT o_orderkey,
            regexp_replace(u, '\?&', '?', 'g') AS u FROM s3),
        s5 AS (SELECT o_orderkey,
            regexp_replace(u, '\?$', '') AS u FROM s4),
        s6 AS (SELECT o_orderkey,
            lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0))
              || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
              AS u FROM s5),
        s7 AS (SELECT o_orderkey, regexp_replace(u, '/$', '') AS u FROM s6)
        SELECT u AS canonical_url, CAST(COUNT(*) AS BIGINT) AS n_raw,
          MIN(o_orderkey) AS first_key
        FROM s7 GROUP BY u""")),

    GraftQuery(
      "q99_duplicate_passages",
      (s, dir) => {
        // partial-copy detection: every group g of three docs plants one
        // 12-token group-specific passage into docs 3g+1 (appended) and
        // 3g+2 (prepended) — those pairs must surface with a shared run
        // of ≥ 8 shingles; natural shared passages in the raw text
        // surface too (mirrored by the oracle).
        val d = Tables.load(s, dir, "documents").select("doc_id", "text")
        val g = (col("doc_id") / 3).cast("long")
        val passage = concat_ws(" ",
          ('a' to 'l').map(c => concat(lit("p"), g, lit(c.toString))): _*)
        val text2 = when(col("doc_id") % 3 === 1,
            concat_ws(" ", col("text"), passage))
          .when(col("doc_id") % 3 === 2,
            concat_ws(" ", passage, col("text")))
          .otherwise(col("text"))
        Dedup.duplicatePassages(
          d.select(col("doc_id"), text2.as("text")), "doc_id", "text",
          k = 5, minRun = 3, dfCap = 50)
      },
      Some {
        val passage = ('a' to 'l')
          .map(c => s"'p' || (doc_id // 3) || '$c'").mkString(", ")
        val toks =
          """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
        s"""WITH c AS (SELECT doc_id,
              CASE WHEN doc_id % 3 = 1
                     THEN concat_ws(' ', text, concat_ws(' ', $passage))
                   WHEN doc_id % 3 = 2
                     THEN concat_ws(' ', concat_ws(' ', $passage), text)
                   ELSE text END AS text
            FROM documents),
          t AS (SELECT doc_id, $toks AS t FROM c),
          shx AS (SELECT doc_id AS doc,
              unnest(range(0, greatest(len(t) - 4, 0))) AS pos,
              unnest(list_transform(range(0, greatest(len(t) - 4, 0)),
                i -> ${md5FoldSql(
                  "md5(array_to_string(list_slice(t, i + 1, i + 5), ' '))")}))
                AS shk
            FROM t),
          cnt AS (SELECT shk, COUNT(*) AS df FROM shx GROUP BY 1),
          ok AS (SELECT doc, pos, shx.shk FROM shx JOIN cnt USING (shk)
            WHERE df BETWEEN 2 AND 50),
          m AS (SELECT a.doc AS doc_a, a.pos AS pos_a, b.doc AS doc_b,
              b.pos - a.pos AS diff
            FROM ok a JOIN ok b ON a.shk = b.shk AND a.doc < b.doc),
          isl AS (SELECT doc_a, doc_b, diff, pos_a,
              pos_a - row_number()
                OVER (PARTITION BY doc_a, doc_b, diff ORDER BY pos_a) AS grp
            FROM m),
          runs AS (SELECT doc_a, doc_b, MAX(run) AS max_run FROM (
              SELECT doc_a, doc_b, diff, grp, COUNT(*) AS run
              FROM isl GROUP BY 1, 2, 3, 4)
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, max_run, max_run + 4 AS shared_words
        FROM runs WHERE max_run >= 3"""
      }),

    GraftQuery(
      "q228_cross_doc_spans",
      (s, dir) => {
        // ExactSubstr-style cross-doc span coverage: corpus = documents
        // plus a half-truncated copy of each doc (id + Shift), so every
        // original shares its first ~half with its copy — originals land
        // near 50% coverage, copies near 100%, and natural cross-doc
        // boilerplate surfaces on top.
        val d = Tables.load(s, dir, "documents").select("doc_id", "text")
        val half = d.select((col("doc_id") + Shift).as("doc_id"),
          expr("substring(text, 1, CAST(floor(length(text) / 2) AS INT))")
            .as("text"))
        Dedup.crossDocSpanStats(d.unionByName(half), "doc_id", "text",
          n = 5, minDocs = 2)
      },
      Some {
        val toks =
          """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
        s"""WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + $Shift AS doc_id,
              substr(text, 1, CAST(floor(length(text) / 2) AS INT)) AS text
            FROM documents),
          t AS (SELECT doc_id, $toks AS t FROM corpus),
          grams AS (SELECT doc_id AS doc,
              unnest(range(0, greatest(len(t) - 4, 0))) AS i,
              unnest(list_transform(range(0, greatest(len(t) - 4, 0)),
                i -> ${md5FoldSql(
                  "md5(array_to_string(list_slice(t, i + 1, i + 5), ' '))")}))
                AS gk
            FROM t),
          dk AS (SELECT gk FROM grams GROUP BY gk
            HAVING COUNT(DISTINCT doc) >= 2),
          dup AS (SELECT doc, i FROM grams JOIN dk USING (gk)),
          isl AS (SELECT doc, i,
              CASE WHEN i > coalesce(max(i + 5)
                  OVER (PARTITION BY doc ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS ns
            FROM dup),
          isl2 AS (SELECT doc, i,
              SUM(ns) OVER (PARTITION BY doc ORDER BY i) AS island
            FROM isl),
          per_isl AS (SELECT doc, island, COUNT(*) AS nw,
              MAX(i) + 5 - MIN(i) AS cov
            FROM isl2 GROUP BY 1, 2),
          per_doc AS (SELECT doc,
              CAST(SUM(nw) AS BIGINT) AS dup_windows,
              CAST(COUNT(*) AS BIGINT) AS dup_spans,
              CAST(SUM(cov) AS BIGINT) AS dup_tokens
            FROM per_isl GROUP BY 1)
          SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_tokens,
            coalesce(pd.dup_windows, 0) AS dup_windows,
            coalesce(pd.dup_spans, 0) AS dup_spans,
            coalesce(pd.dup_tokens, 0) AS dup_tokens
          FROM t tk LEFT JOIN per_doc pd ON pd.doc = tk.doc_id"""
      },
      bench = true),

    GraftQuery(
      "q229_remove_cross_doc_spans",
      (s, dir) => {
        // the APPLY side of q228 over the same half-copy corpus:
        // originals are the global first occurrence of every shared gram
        // (smaller id), so they keep their text minus natural cross-doc
        // and intra-doc repeats; the truncated copies lose their whole
        // shared prefix and shrink toward the cut-token tail.
        val d = Tables.load(s, dir, "documents").select("doc_id", "text")
        val half = d.select((col("doc_id") + Shift).as("doc_id"),
          expr("substring(text, 1, CAST(floor(length(text) / 2) AS INT))")
            .as("text"))
        Dedup.removeCrossDocSpans(d.unionByName(half), "doc_id", "text",
          n = 5, minDocs = 2)
      },
      Some {
        val toks =
          """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
        s"""WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + $Shift AS doc_id,
              substr(text, 1, CAST(floor(length(text) / 2) AS INT)) AS text
            FROM documents),
          d AS (SELECT doc_id, $toks AS toks FROM corpus),
          g AS (SELECT doc_id AS doc,
              unnest(range(0, greatest(len(toks) - 4, 0))) AS i,
              unnest(list_transform(range(0, greatest(len(toks) - 4, 0)),
                i -> ${md5FoldSql(
                  "md5(array_to_string(list_slice(toks, i + 1, i + 5), ' '))")}))
                AS gk
            FROM d),
          f AS (SELECT gk, MIN(doc * 1048576 + i) AS fk FROM g
            GROUP BY gk HAVING COUNT(DISTINCT doc) >= 2),
          dup AS (SELECT doc, i FROM g JOIN f USING (gk)
            WHERE doc * 1048576 + i <> fk),
          cov AS (SELECT DISTINCT doc, t FROM (
              SELECT doc, unnest(range(i, i + 5)) AS t FROM dup) u),
          tp AS (SELECT doc_id AS doc,
              unnest(range(0, len(toks))) AS t, unnest(toks) AS tok
            FROM d),
          kept AS (SELECT tp.doc, tp.t, tp.tok FROM tp
            LEFT JOIN cov ON cov.doc = tp.doc AND cov.t = tp.t
            WHERE cov.doc IS NULL),
          ag AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_kept,
              array_to_string(list(tok ORDER BY t), ' ') AS cleaned
            FROM kept GROUP BY doc)
          SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
            coalesce(ag.n_kept, 0) AS n_kept,
            coalesce(ag.cleaned, '') AS cleaned
          FROM d LEFT JOIN ag ON ag.doc = d.doc_id"""
      },
      bench = true),

    GraftQuery(
      "q242_winnowing_fps",
      (s, dir) => Dedup.winnowingFingerprints(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 3, w = 4),
      // MOSS winnowing: min-of-window over (hash40, pos)-packed gram
      // hashes; the oracle replays the identical packing, window mins,
      // per-doc distinct, and cross-doc shared-hash census
      Some(s"""WITH t AS (SELECT doc_id, $ShinglesSql AS sh FROM documents),
          g AS (SELECT doc_id, len(sh) AS nsh,
              list_transform(range(0, len(sh)), i ->
                (${md5FoldSql("md5(sh[i + 1])")} % 1099511627776)
                  * 1048576 + i) AS pk
            FROM t),
          f AS (SELECT doc_id, nsh,
              list_distinct(list_transform(range(0, nsh - 3), i ->
                list_reduce(list_slice(pk, i + 1, i + 4),
                  (a, b) -> CASE WHEN b < a THEN b ELSE a END))) AS fps
            FROM g),
          u AS (SELECT doc_id, unnest(fps) AS fp FROM f),
          hs AS (SELECT fp // 1048576 AS h, COUNT(DISTINCT doc_id) AS nd
            FROM u GROUP BY 1),
          per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
              CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_shared
            FROM u JOIN hs ON hs.h = u.fp // 1048576 GROUP BY 1)
        SELECT g.doc_id, CAST(g.nsh AS BIGINT) AS n_grams,
          COALESCE(per.n_fps, 0) AS n_fps,
          COALESCE(per.n_shared, 0) AS n_shared_fps
        FROM g LEFT JOIN per ON per.doc_id = g.doc_id""")),

    GraftQuery(
      "q243_soft_dedup_weights",
      (s, dir) => {
        val c = corpus(s, dir)
        val pairs = Dedup.jaccardPairs(c, "doc_id", "text",
          k = 3, threshold = 0.8)
        Dedup.softDedupWeights(c, "doc_id", pairs)
      },
      // SoftDeDup: q47's component census extended with 1/|cluster|
      // training weights; singletons weigh 1.0
      Some(s"""WITH RECURSIVE
        $JaccardClCteSql,
        sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n
          FROM cl GROUP BY 1)
        SELECT i.doc_id, COALESCE(cl.cluster, i.doc_id) AS cluster,
          COALESCE(sz.n, 1) AS cluster_size,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "1.0E0 / CAST(COALESCE(sz.n, 1) AS DOUBLE)", 6)} AS weight
        FROM (SELECT doc_id FROM $CorpusSql) i
        LEFT JOIN cl ON cl.node = i.doc_id
        LEFT JOIN sz ON sz.cluster = cl.cluster""")),

    GraftQuery(
      "q254_minhash_recall",
      (s, dir) => Dedup.minhashRecallAudit(corpus(s, dir), "doc_id", "text",
        numHashes = 16, bands = 4, k = 3, threshold = 0.8),
      // the banding operating point measured on the real corpus: truth =
      // q30's capped exact pairs, found = q31's banded+verified pairs —
      // the oracle replays BOTH chains and the same count arithmetic
      Some {
        val P = Dedup.MinhashP
        val numHashes = 16; val bands = 4; val rows = numHashes / bands
        val sigCols = (0 until numHashes).map(i =>
          s"MIN((key * ${Dedup.mhA(i)} + ${Dedup.mhB(i)}) % $P) AS s$i")
          .mkString(", ")
        def bh(j: Int): String =
          (0 until rows).foldLeft(s"CAST(${j + 1} AS BIGINT)")((acc, r) =>
            s"(($acc * ${Dedup.BandM} + s${j * rows + r}) % $P)")
        val bandSelects = (0 until bands).map(j =>
          s"SELECT doc, $j AS band, ${bh(j)} AS bh FROM sigs")
          .mkString(" UNION ALL ")
        s"""WITH $CappedIdxSql,
          tsz AS (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
          tco AS (SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS inter
            FROM idx x JOIN idx y ON x.sh = y.sh AND x.doc < y.doc
            GROUP BY 1, 2),
          truth AS (SELECT doc_a, doc_b
            FROM tco JOIN tsz a ON a.doc = doc_a JOIN tsz b ON b.doc = doc_b
            WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0),
          shingled AS MATERIALIZED (
            SELECT doc_id AS doc, unnest($ShinglesSql) AS sh FROM $CorpusSql),
          keys AS MATERIALIZED (
            SELECT doc, (${md5FoldSql("h")}) % $P AS key
            FROM (SELECT doc, md5(sh) AS h FROM shingled)),
          sigs AS MATERIALIZED (SELECT doc, $sigCols FROM keys GROUP BY doc),
          banded AS MATERIALIZED ($bandSelects),
          cand AS MATERIALIZED (
            SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
            FROM banded x JOIN banded y
              ON x.band = y.band AND x.bh = y.bh AND x.doc < y.doc),
          uidx AS MATERIALIZED (SELECT DISTINCT doc, sh FROM shingled),
          usz AS MATERIALIZED (SELECT doc, COUNT(*) AS n_sh FROM uidx GROUP BY doc),
          uinter AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
            FROM cand c
            JOIN uidx xa ON xa.doc = c.doc_a
            JOIN uidx xb ON xb.doc = c.doc_b AND xa.sh = xb.sh
            GROUP BY 1, 2),
          found AS (
            SELECT doc_a, doc_b FROM uinter
            JOIN usz a ON a.doc = doc_a JOIN usz b ON b.doc = doc_b
            WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0),
          nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
          nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found FROM found),
          nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common
            FROM truth t JOIN found f
              ON f.doc_a = t.doc_a AND f.doc_b = t.doc_b)
        SELECT n_truth, n_found, n_common,
          CASE WHEN n_found = 0 THEN 0.0E0 ELSE ${
            graft.functions.SafeMath.roundHalfUpSql(
              "CAST(n_common AS DOUBLE) / CAST(n_found AS DOUBLE)", 6)} END
            AS pair_precision,
          CASE WHEN n_truth = 0 THEN 0.0E0 ELSE ${
            graft.functions.SafeMath.roundHalfUpSql(
              "CAST(n_common AS DOUBLE) / CAST(n_truth AS DOUBLE)", 6)} END
            AS pair_recall
        FROM nt, nf, nc"""
      })
  ,

    GraftQuery(
      "q299_dedup_savings",
      (s, dir) => {
        // threshold-tuning artifact for the near-dup family: ONE pair
        // scan at jaccard ≥ 0.5, then every candidate cutoff 50..95%
        // reads its pair count and docs-removed (distinct higher-id
        // partners) from the same frame — a per-pair array-filter
        // explode, never 10 re-scans and never a threshold join. This
        // curve is how a dedup run picks its threshold before paying
        // for the full apply pass.
        val pairs = Dedup.jaccardPairs(corpus(s, dir), "doc_id", "text",
          k = 3, threshold = 0.5)
        val ths = (50 to 95 by 5).map(lit(_))
        val hits = pairs
          .select(col("doc_b"), explode(filter(array(ths: _*),
            t => col("jaccard") >= t.cast("double") / lit(100.0)))
            .as("threshold_pct"))
          .groupBy("threshold_pct")
          .agg(count(lit(1)).as("pairs_over"),
            countDistinct(col("doc_b")).as("docs_removed"))
        s.range(50, 96, 5)
          .select(col("id").cast("int").as("threshold_pct"))
          .join(hits, Seq("threshold_pct"), "left")
          .select(col("threshold_pct"),
            coalesce(col("pairs_over"), lit(0L)).as("pairs_over"),
            coalesce(col("docs_removed"), lit(0L)).as("docs_removed"))
      },
      Some(s"""WITH $CappedIdxSql,
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
        co AS (
          SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS inter
          FROM idx x JOIN idx y ON x.sh = y.sh AND x.doc < y.doc
          GROUP BY 1, 2),
        pairs AS (SELECT doc_b,
            CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) AS jac
          FROM co
          JOIN sizes a ON a.doc = doc_a
          JOIN sizes b ON b.doc = doc_b
          WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter)
            >= 0.5E0),
        hits AS (SELECT CAST(t AS INTEGER) AS threshold_pct,
            CAST(COUNT(*) AS BIGINT) AS pairs_over,
            CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS docs_removed
          FROM (SELECT doc_b, unnest(list_filter(
              [50, 55, 60, 65, 70, 75, 80, 85, 90, 95],
              t -> jac >= CAST(t AS DOUBLE) / 100.0E0)) AS t
            FROM pairs)
          GROUP BY 1),
        grid AS (SELECT CAST(unnest(range(50, 96, 5)) AS INTEGER)
            AS threshold_pct)
      SELECT g.threshold_pct,
        COALESCE(h.pairs_over, 0) AS pairs_over,
        COALESCE(h.docs_removed, 0) AS docs_removed
      FROM grid g LEFT JOIN hits h USING (threshold_pct)"""))
  )
}
