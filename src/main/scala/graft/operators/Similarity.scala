package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - [[cosineTopK]]: brute-force scan — the correctness baseline. One
  *    codegen'd pass over the vectors, `TakeOrderedAndProject` for the
  *    top-k (no global sort); the query vector travels as a literal.
  *  - [[lshCosineTopK]]: the scale path — random-hyperplane LSH buckets
  *    (sign bits of random projections). Only same-bucket vectors are
  *    scored: at 1000 executors the bucket join prunes ~(1 - 1/2^bits)
  *    of the corpus per probe, trading recall for a ~2^bits speedup;
  *    multi-probe (flipping one bit) recovers most recall.
  *  - [[ivfTopK]]: inverted-file variant — k-means-ish coarse centroids
  *    picked by deterministic sampling; vectors assigned to nearest
  *    centroid once (one shuffle), queries scored only against the
  *    nProbe nearest cells.
  *
  * All dot products are double-cast before multiply-accumulate so results
  * are reproducible across engines and partitionings.
  */
object Similarity {

  /** Widen a narrow frame to the session's default parallelism. Small
    * corpora arrive as ONE parquet split, and the O(n·q) brute-force
    * joins below inherit the streamed side's partition count — a
    * single-split 20k-vector corpus turns a 32-core crossJoin into a
    * single-threaded nested loop (observed: 21+ min vs ~40 s at sf1).
    * The round-robin shuffle is negligible next to the scoring work; a
    * corpus scan that is already ≥ defaultParallelism partitions (any
    * real cluster read) passes through untouched. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Sequential-fold dot product of an array column with a literal
    * vector. Routed through the codegen'd [[graft.expressions.ArrayDot]]
    * (identical left-fold FP order to the former HOF chain — gated
    * values unchanged); the interpreted HOF version dominated runtime
    * in O(n²) pair joins and O(n·k) bucket/assignment scans. */
  def dotLit(vec: Column, q: Seq[Double]): Column =
    graft.expressions.ArrayDot.array_dot(vec, array(q.map(lit): _*))

  def normLit(q: Seq[Double]): Double = math.sqrt(q.map(x => x * x).sum)

  /** Sequential L2 norm of an array column (same fold as `dot(v, v)`). */
  def norm(vec: Column): Column =
    sqrt(graft.expressions.ArrayDot.array_dot(vec, vec))

  /** Cosine against a ZERO-NORM vector is NULL, explicitly: at corpus
    * scale zero embeddings (failed encoder calls, padded rows) DO occur,
    * a raw `x / 0.0` THROWS under Spark 4's default ANSI mode (found by
    * the r13 ingest property test), and NULL is the semantics every
    * comparison then handles sanely — `cos >= thr` is NULL → the zero
    * vector never matches anything and is never dropped. The CaseWhen
    * short-circuits per row, so the division only runs on live norms. */
  private def safeCos(dot: Column, denom: Column, scale: Int): Column =
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(graft.functions.SafeMath.roundHalfUp(dot / denom, scale))

  /** Cosine similarity against a literal query vector, rounded to `scale`
    * so downstream top-k cuts are reproducible. */
  def cosineLit(vec: Column, q: Seq[Double], scale: Int = 6): Column =
    safeCos(dotLit(vec, q), norm(vec) * lit(normLit(q)), scale)

  /** Cosine similarity of two array columns (same rounding contract). */
  def cosineCols(a: Column, b: Column, scale: Int = 6): Column =
    safeCos(graft.expressions.ArrayDot.array_dot(a, b),
      norm(a) * norm(b), scale)

  /** Brute-force cosine top-k: returns (idCol, cos) for the k nearest. */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    embeddings
      .select(col(idCol), cosineLit(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** Reciprocal-rank fusion (Cormack et al. 2009) — combine N rankers'
    * top lists without score calibration: each list contributes
    * 10⁶ div (k + rank) micro-points per id (integer division — no FP
    * in scoring or comparison, the DuckDB oracle lands the identical
    * fused order). The standard RAG move for multi-query retrieval and
    * for fusing lexical (BM25) with dense (cosine) rankers: rank-based
    * scores make incomparable scales fusible. Inputs are TOP-K frames
    * (already bounded); the fuse is a union + one tiny keyed aggregate
    * + a TakeOrdered — nothing corpus-sized. Ties break to the smaller
    * id. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      kConst: Long = 60L, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty && kConst >= 1)
    val scored = rankings
      .map(_.select(col(idCol), expr(
        s"1000000L div (${kConst}L + CAST($rankCol AS BIGINT))").as("__s")))
      .reduce(_ unionByName _)
    scored.groupBy(col(idCol))
      .agg(sum(col("__s")).as("rrf_micro"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_micro").desc, col(idCol)).limit(topK)
  }

  /** Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    * 1998): greedy reranking that trades query relevance against
    * redundancy with already-selected results — the retrieval/curation
    * tool for k REPRESENTATIVE results instead of k near-copies.
    * Selection i maximizes λ·rel(d) − (1−λ)·max over selected s of
    * sim(d, s); the first pick is the pure-relevance argmax.
    *
    * Scale shape: relevance is the distributed cosine scan with a
    * TakeOrderedAndProject top-`poolSize` — the only full-data pass; the
    * greedy loop runs on the collected pool, bounded by construction
    * (the percentile-cut rule — production rerankers work the same way:
    * ANN retrieves M, MMR reranks the M). Every comparison uses integer
    * micro-units (cos·10⁶ as BIGINT; the objective is scaled ×10 so λ
    * stays integral: mmr = λ₁₀·rel_micro − (10−λ₁₀)·maxSim_micro) with
    * ascending-id tie-breaks — engine-portable and hash-gateable.
    * Pairwise pool similarities fold left in element order with double
    * casts, matching the oracle's list_reduce exactly. Output:
    * (rank, idCol, rel_micro, mmr_score). */
  def mmrSelect(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, poolSize: Int = 32,
      lambdaTenths: Int = 7): DataFrame = {
    require(lambdaTenths >= 0 && lambdaTenths <= 10, "lambda in tenths")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pool: Array[(Long, Array[Float], Long)] = embeddings
      .select(col(idCol).cast("long"), col(vecCol),
        cosineLit(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        math.floor(r.getDouble(2) * 1e6 + 0.5).toLong))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def simMicro(a: Array[Float], b: Array[Float]): Long =
      math.floor(dot(a, b) /
        (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6 + 0.5).toLong
    val selected =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    val selectedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (selected.length < math.min(k, pool.length)) {
      val scored = remaining.map { case (id, vec, reli) =>
        val maxSim =
          if (selectedVecs.isEmpty) 0L
          else selectedVecs.map(sv => simMicro(vec, sv)).max
        (id, vec, reli,
          lambdaTenths * reli - (10L - lambdaTenths) * maxSim)
      }
      val best = scored.minBy { case (id, _, _, obj) => (-obj, id) }
      selected += ((selected.length + 1, best._1, best._3, best._4))
      selectedVecs += best._2
      remaining.remove(remaining.indexWhere(_._1 == best._1))
    }
    selected.toSeq.toDF("rank", idCol, "rel_micro", "mmr_score")
  }

  /** Farthest-first k-center selection (Gonzalez 1985) — the greedy
    * 2-approximation for the k-center coreset: pick the lowest-id vector,
    * then k−1 times the vector FARTHEST from every pick so far. The
    * standard diversity-maximizing subset for curation (seed vectors for
    * clustering, diverse eval panels, coverage probes) — where MMR
    * balances relevance against redundancy, k-center maximizes pure
    * spread.
    *
    * Scale shape: the running min-distance frame is updated
    * INCREMENTALLY — each round folds in only the newest center
    * (`least(dmin, d²(v, c))`) in one narrow corpus scan, then a global
    * TakeOrdered(1) picks the argmax; no pairwise join, no k-way
    * re-scan, state is localCheckpoint'd per round so lineage stays
    * O(1). Distances are squared-L2 in integer micro-units
    * (`floor(((v·v + c·c) − 2·v·c)·10⁶ + 0.5)`, every dot a left fold —
    * engine-portable, hash-gateable), ties break to the smaller id.
    * Output: (round, idCol, dist_micro) — the seed row carries 0, each
    * later row the distance that made it the farthest point, a
    * monotonically non-increasing sequence that doubles as the coreset
    * radius curve. */
  def kCenterSelect(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = embeddings.sparkSession
    import spark.implicits._
    def distMicro(v: Column, c: Array[Float]): Column = {
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i).toDouble * c(i).toDouble; i += 1 }
      floor((graft.expressions.ArrayDot.array_dot(v, v) + lit(cc) -
        lit(2.0) * dotLit(v, c.map(_.toDouble).toSeq)) * lit(1e6) +
        lit(0.5)).cast("long")
    }
    val base = embeddings
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
    val seed = base.orderBy(col("__id").asc).limit(1).collect().headOption
    if (seed.isEmpty) return Seq.empty[(Int, Long, Long)]
      .toDF("round", idCol, "dist_micro")
    val selected = scala.collection.mutable.ArrayBuffer(
      (1, seed.get.getLong(0), 0L))
    var lastVec = seed.get.getSeq[Float](1).toArray
    var state = base.withColumn("dmin", lit(Long.MaxValue))
    var round = 2
    var done = false
    while (round <= k && !done) {
      val next = state
        .withColumn("dmin", least(col("dmin"), distMicro(col("__v"), lastVec)))
        .localCheckpoint()
      state.unpersist(blocking = false)
      state = next
      val ids = selected.map(_._2).toSeq
      val best = state.filter(!col("__id").isin(ids: _*))
        .orderBy(col("dmin").desc, col("__id").asc).limit(1)
        .collect().headOption
      best match {
        case Some(r) =>
          selected += ((round, r.getLong(0), r.getLong(2)))
          lastVec = r.getSeq[Float](1).toArray
          round += 1
        case None => done = true
      }
    }
    state.unpersist(blocking = false)
    selected.toSeq.toDF("round", idCol, "dist_micro")
  }

  /** Truncated rank-biased overlap weights in micro-units: pw(d) =
    * p^(d−1)·10⁶ folded as pw(d+1) = (pw(d)·pNum) div pDen — driver-
    * computed ONCE so both engines embed identical integers (float
    * powers would drift). Public for the oracle builder. */
  def rboWeights(k: Int, pNum: Long, pDen: Long): Seq[(Int, Long)] = {
    var pw = 1000000L
    (1 to k).map { d =>
      val cur = d -> pw
      pw = pw * pNum / pDen
      cur
    }
  }

  /** Rank-biased overlap (Webber et al. 2010), truncated at depth k —
    * "do two rankers agree WHERE IT MATTERS": overlap at each depth d
    * weighted by p^(d−1), so the top of the list dominates (Kendall/
    * Jaccard treat rank 1 and rank 1000 alike; recall@k ignores order
    * inside k). The ranker-comparison gate for swapping retrievers.
    *
    * rbo·10⁶ = (Σ_d (pw(d) · X_d) div d) div (pDen div (pDen − pNum))
    * with X_d = |top-d(A) ∩ top-d(B)| and every step integer
    * (per-term truncation mirrored by the oracle). Both inputs are
    * bounded top-k frames; the depth join and cumulative overlap run on
    * ≤k-row frames (bounded exemption class). Output one row:
    * (depth, overlap_at_k, rbo_micro). */
  def rboTruncated(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String, k: Int, pNum: Long = 9L, pDen: Long = 10L): DataFrame = {
    require(k >= 1 && pNum >= 1 && pNum < pDen)
    require(pDen % (pDen - pNum) == 0,
      "1/(1-p) must be integral for the exact final division")
    val spark = a.sparkSession
    import spark.implicits._
    val m = a.select(col(idCol), col(rankCol).cast("long").as("__ra"))
      .join(b.select(col(idCol), col(rankCol).cast("long").as("__rb")),
        Seq(idCol))
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
      .filter(col("__m") <= k)
      .groupBy(col("__m")).agg(count(lit(1)).as("__c"))
    val weights = rboWeights(k, pNum, pDen).toDF("__d", "__pw")
    val xd = weights
      .join(m, col("__m") <= col("__d"), "left")
      .groupBy(col("__d"), col("__pw"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__x"))
    val oneMinusPInv = pDen / (pDen - pNum)
    xd.agg(
      max(when(col("__d") === k, col("__x"))).as("overlap_at_k"),
      expr(s"(sum((__pw * __x) div __d)) div ${oneMinusPInv}L")
        .as("rbo_micro"))
      .select(lit(k).as("depth"), col("overlap_at_k"), col("rbo_micro"))
  }

  /** Hyperplane `b` of the random-hyperplane LSH family: `dim` pseudo-random
    * coefficients in (-1, 1) derived deterministically from (seed, b, d).
    * Public so oracle SQL can embed the identical literals. */
  def plane(seed: Int, b: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      // deterministic pseudo-gaussian via hash → uniform(-1,1)
      val h = scala.util.hashing.MurmurHash3.productHash((seed, b, d))
      (h.toDouble / Int.MaxValue)
    }

  /** Random-hyperplane sign bucket for a vector column. */
  /** Sign-LSH blocking width sized to the corpus: the smallest b in
    * [lo, hi] with n ≤ target·2^b, so expected bucket occupancy stays
    * ≈ target as data grows — FIXED bits make blocked self/cross joins
    * quadratic in n (the r08 sf3 sweep measured 5.6× growth on 3× data
    * for q247's fixed 6 bits). Buckets are low-bit prefixes
    * ([[lshBucket]] puts plane i at bit i), so `bucket(hi) % 2^b`
    * equals `bucket(b)` — an oracle can mirror adaptive widths by
    * computing the widest bucket once and reducing modulo a
    * count-driven CASE over the same thresholds. */
  def blockingBitsFor(n: Long, target: Long = 24L, lo: Int = 6,
      hi: Int = 12): Int = {
    var b = lo
    while (b < hi && n > target * (1L << b)) b += 1
    b
  }

  def lshBucket(vec: Column, dim: Int, bits: Int, seed: Int = 42): Column =
    // ONE reference-object node (graft.expressions.SignBucket) — the
    // former when/shiftleft chain spelled bits×dim literals that the
    // driver re-analyzed and re-compiled per action, on BOTH sides of
    // every blocking join in the family (the q221/q310 compile class);
    // bit-for-bit including the null-dot → bucket-0 contract
    graft.expressions.SignBucket.sign_bucket(vec,
      (0 until bits).map(b => plane(seed, b, dim)))

  /** Same bucket computed driver-side for a known query vector — plain
    * Scala arithmetic with the exact FP fold order of [[dotLit]] (zip,
    * multiply, left-fold sum from 0.0), so it lands in the same bucket
    * the expression would. No Spark job for one vector. */
  def lshBucketLocal(q: Seq[Double], bits: Int, seed: Int = 42): Long =
    (0 until bits).foldLeft(0L) { (acc, b) =>
      val dot = q.zip(plane(seed, b, q.size)).map { case (x, w) => x * w }.sum
      if (dot >= 0) acc | (1L << b) else acc
    }

  /** LSH-bucketed cosine top-k: scores only vectors in the query's bucket
    * plus one-bit-flip probe buckets. */
  def lshCosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 8, seed: Int = 42): DataFrame = {
    val dim = query.size
    val qBucket = lshBucketLocal(query, bits, seed)
    val probes = qBucket +: (0 until bits).map(b => qBucket ^ (1L << b))
    embeddings
      .withColumn("__bucket", lshBucket(col(vecCol), dim, bits, seed))
      .filter(col("__bucket").isInCollection(probes))
      .select(col(idCol), cosineLit(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Multi-query ANN recall harness — measures the QUALITY of the LSH
    * index, not just its determinism: for every query vector, the exact
    * brute-force top-k and the LSH (hamming ≤ 1 probe) top-k are both
    * computed DISTRIBUTED — queries broadcast against the corpus scan,
    * never a per-query driver loop — and recall@k = |∩| / k per query.
    * The corpus is bucketed ONCE for all queries. Per-query top-k cuts
    * are row_number windows partitioned by query (parallel across
    * queries; for thousands of queries swap in a per-group bounded heap).
    * This is the evaluation loop an ANN deployment runs after every
    * index-parameter change. `probeRadius` widens the probe set
    * (hamming ≤ radius) — exactly the recall/cost knob a deployment
    * tunes, and this harness is how the tradeoff is measured
    * (radius 1 → 9 buckets of 256, radius 2 → 37). */
  /** Hard-negative mining for contrastive/embedding training: for each
    * anchor vector, the `m` most-similar IN-BUCKET neighbors whose
    * cosine falls in [lo, hi) — similar enough to be informative
    * training signal, below the near-dup line so they are genuinely
    * negative (the standard positives-come-from-dups /
    * negatives-come-from-neighbors mining loop). LSH sign buckets block
    * the candidates exactly like the near-dup path: pairs form only
    * inside a bucket (ONE shuffle on the bucket id), so candidate
    * volume is Σ n_b² over buckets, never corpus². The per-anchor top-m
    * is a window over those bounded in-bucket candidates — never a
    * global sort. Directed: each anchor ranks its own negatives, so a
    * pair can serve both ends. The bucketed projection is persisted so
    * the self-join scans the corpus once (the [[Dedup.embeddingNearDupsLsh]]
    * discipline; its hot-bucket sub-split applies the same way if a
    * degenerate sign pattern ever concentrates a corpus). */
  def hardNegatives(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, bits: Int = 8, lo: Double = 0.0, hi: Double = 0.95,
      m: Int = 3, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = spread(vecs.select(col(idCol).as("__id"), col(vecCol).as("__v")))
      .withColumn("__b", lshBucket(col("__v"), dim, bits, seed))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = bucketed.select(col("__id").as("anchor_id"),
        col("__v").as("__va"), col("__b"))
      val b = bucketed.select(col("__id").as("neg_id"),
        col("__v").as("__vb"), col("__b"))
      val w = Window.partitionBy(col("anchor_id"))
        .orderBy(col("cos").desc, col("neg_id").asc)
      a.join(b, Seq("__b"))
        .filter(col("anchor_id") =!= col("neg_id"))
        .withColumn("cos", cosineCols(col("__va"), col("__vb")))
        .filter(col("cos") >= lo && col("cos") < hi)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= m)
        .select(col("anchor_id"), col("neg_id"), col("cos"), col("rk"))
        .localCheckpoint()
    } finally bucketed.unpersist(blocking = false)
  }

  def annRecall(embeddings: DataFrame, idCol: String, vecCol: String,
      queryFilter: Column, dim: Int, k: Int = 10, bits: Int = 8,
      probeRadius: Int = 1, seed: Int = 42): DataFrame = {
    require(probeRadius == 1 || probeRadius == 2, "radius 1 or 2")
    import org.apache.spark.sql.expressions.Window
    val queries = embeddings.filter(queryFilter)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val corpus = spread(
      embeddings.select(col(idCol).as("vid"), col(vecCol).as("v")))
    val wnd = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vid").asc)
    def topK(scored: DataFrame): DataFrame = scored
      .withColumn("__r", row_number().over(wnd))
      .filter(col("__r") <= k).select("qid", "vid")
    val brute = topK(corpus.crossJoin(broadcast(queries))
      .select(col("qid"), col("vid"),
        cosineCols(col("v"), col("qv")).as("cos")))
    val cb = corpus.withColumn("__b", lshBucket(col("v"), dim, bits, seed))
    // one row per (query, probe bucket): the query's own bucket plus all
    // ≤radius-bit flips — the probe set becomes an EQUI-join key, so
    // bucket pruning is a hash join, not a per-pair predicate scan
    val flips: Seq[Long] = 0L +:
      ((0 until bits).map(b => 1L << b) ++
        (if (probeRadius >= 2)
          for (a <- 0 until bits; b <- a + 1 until bits)
            yield (1L << a) | (1L << b)
        else Seq.empty))
    val probes = queries
      .withColumn("__qb", lshBucket(col("qv"), dim, bits, seed))
      .select(col("qid"), col("qv"), explode(array(
        flips.map(f => col("__qb").bitwiseXOR(lit(f))): _*)).as("__b"))
    val probed = cb.join(broadcast(probes), Seq("__b"))
    val lsh = topK(probed.select(col("qid"), col("vid"),
      cosineCols(col("v"), col("qv")).as("cos")))
    val hits = brute.join(lsh, Seq("qid", "vid"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    queries.select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
  }

  /** Scale-8 decimal DCG weights 1/log2(i+1) for positions 1..k, computed
    * on the DRIVER so log2 never reaches either engine — the weights are
    * exact decimal literals on both sides and the whole DCG sum is
    * integer/decimal arithmetic (no libm ulp hazard, no FP sum order). */
  def dcgWeights8(k: Int): Seq[java.math.BigDecimal] =
    (1 to k).map { i =>
      val w = graft.functions.SafeMath.roundHalfUpD(
        1.0 / (math.log(i + 1.0) / math.log(2.0)), 8)
      new java.math.BigDecimal(f"$w%.8f")
    }

  /** NDCG@k of the LSH probe ranking against the brute-force ideal — the
    * ORDER-quality complement of [[annRecall]]'s set-quality: recall says
    * how many true neighbors surfaced; NDCG says whether they surfaced in
    * the right order (graded relevance k+1−brute_rank, position-discounted
    * by [[dcgWeights8]]). Same one-scan probe skeleton as annRecall; the
    * DCG/IDCG sums are exact decimals, the final ratio one IEEE division. */
  def annNdcg(embeddings: DataFrame, idCol: String, vecCol: String,
      queryFilter: Column, dim: Int, k: Int = 10, bits: Int = 8,
      probeRadius: Int = 1, seed: Int = 42): DataFrame = {
    require(probeRadius == 1 || probeRadius == 2, "radius 1 or 2")
    import org.apache.spark.sql.expressions.Window
    val queries = embeddings.filter(queryFilter)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val corpus = spread(
      embeddings.select(col(idCol).as("vid"), col(vecCol).as("v")))
    val wnd = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vid").asc)
    def ranked(scored: DataFrame, rank: String): DataFrame = scored
      .withColumn(rank, row_number().over(wnd))
      .filter(col(rank) <= k).select(col("qid"), col("vid"), col(rank))
    val brute = ranked(corpus.crossJoin(broadcast(queries))
      .select(col("qid"), col("vid"),
        cosineCols(col("v"), col("qv")).as("cos")), "r")
      .localCheckpoint() // feeds IDCG and the relevance lookup
    val flips: Seq[Long] = 0L +:
      ((0 until bits).map(b => 1L << b) ++
        (if (probeRadius >= 2)
          for (a <- 0 until bits; b <- a + 1 until bits)
            yield (1L << a) | (1L << b)
        else Seq.empty))
    val cb = corpus.withColumn("__b", lshBucket(col("v"), dim, bits, seed))
    val probes = queries
      .withColumn("__qb", lshBucket(col("qv"), dim, bits, seed))
      .select(col("qid"), col("qv"), explode(array(
        flips.map(f => col("__qb").bitwiseXOR(lit(f))): _*)).as("__b"))
    val lsh = ranked(cb.join(broadcast(probes), Seq("__b"))
      .select(col("qid"), col("vid"),
        cosineCols(col("v"), col("qv")).as("cos")), "pos")
    val wArr = array(dcgWeights8(k).map(lit(_)): _*)
    val idcg = brute.groupBy("qid")
      .agg(sum((lit(k + 1) - col("r")) * element_at(wArr, col("r")))
        .as("idcg8"))
    val dcg = lsh
      .join(brute.select(col("qid"), col("vid"), col("r")),
        Seq("qid", "vid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(lit(k + 1) - col("r"), lit(0L)) *
        element_at(wArr, col("pos"))).as("dcg8"))
    queries.select(col("qid"))
      .join(idcg, Seq("qid"), "left")
      .join(dcg, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("dcg8"), lit(0)).cast("double").as("dcg"),
        (coalesce(col("dcg8"), lit(0)).cast("double") /
          col("idcg8").cast("double")).as("ndcg"))
  }

  /** Seed of the `t`-th independent LSH table: t=0 is the base seed, so a
    * 1-table sweep reproduces the single-table family exactly. 1009 is an
    * arbitrary odd prime keeping table seeds off each other's (seed,b,d)
    * hash inputs. */
  def tableSeed(seed: Int, t: Int): Int = seed + 1009 * t

  /** OR-construction recall/cost sweep: `tables` INDEPENDENT hyperplane
    * families (one per seed), a vector matching a query in ANY table's
    * probe set (hamming ≤ 1 there) is a candidate. One 8-bit table tops
    * out around recall@10 ≈ 0.36 at radius 2 (measured by q138); L tables
    * is the standard recall lever — each table gives an independent
    * chance to co-locate a true neighbor, at L× index storage and ~L×
    * probe I/O. This harness measures the whole curve in ONE run:
    *
    *   - the corpus is scanned once, computing ALL L bucket columns;
    *   - candidates carry the MIN table index that matched (`t_min`), so
    *     the L-table candidate set is exactly `t_min < L` — the per-L
    *     results come from filters over one checkpointed candidate frame,
    *     never L re-scans;
    *   - brute-force ground truth is computed once and reused per L.
    *
    * Output: one row per (l_tables ∈ 1..tables, query) with the candidate
    * count (probe cost) and recall@k — the artifact a deployment reads to
    * pick L. Distributed exactly like [[annRecall]]: queries broadcast,
    * per-query windows, no driver loops. */
  def annRecallMultiTable(embeddings: DataFrame, idCol: String,
      vecCol: String, queryFilter: Column, dim: Int, k: Int = 10,
      bits: Int = 8, tables: Int = 4, seed: Int = 42): DataFrame =
    annRecallOperatingPoints(embeddings, idCol, vecCol, queryFilter, dim,
      k, Seq((bits, tables)), seed).drop("bits")

  /** The full AND-OR operating grid: each (bits, tables) config is a
    * bands×tables point — bits per band is the AND width (selectivity),
    * tables the OR width (recall) — and every config shares ONE corpus
    * scan for ground truth. Fewer bits per band raises per-table
    * collision probability, so e.g. (6 bits, 6 tables) reaches the
    * ≥0.6-recall regime a deployment would actually pick, where
    * (8 bits, 3 tables) bottoms out near 0.36; the cost column shows
    * what each point pays for it. Output adds a leading `bits` column to
    * the [[annRecallMultiTable]] schema. */
  def annRecallOperatingPoints(embeddings: DataFrame, idCol: String,
      vecCol: String, queryFilter: Column, dim: Int, k: Int,
      configs: Seq[(Int, Int)], seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = embeddings.sparkSession
    import sp.implicits._
    val queries = embeddings.filter(queryFilter)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val corpus = spread(
      embeddings.select(col(idCol).as("vid"), col(vecCol).as("v")))
    val wnd = Window.partitionBy(col("qid"), col("l_tables"))
      .orderBy(col("cos").desc, col("vid").asc)
    val bruteWnd = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vid").asc)
    // brute-force ground truth: ONE corpus pass shared by every config
    val brute = corpus.crossJoin(broadcast(queries))
      .select(col("qid"), col("vid"),
        cosineCols(col("v"), col("qv")).as("cos"))
      .withColumn("__r", row_number().over(bruteWnd))
      .filter(col("__r") <= k).select("qid", "vid")
      .localCheckpoint()
    val perConfig = configs.map { case (bits, tables) =>
      // corpus side: L bucket longs per vector, one scan; unpivoted to
      // (vid, v, table, bucket) — the same L× blow-up a materialized
      // OR-construction index pays on disk
      val cbWide = corpus.select(col("vid") +: col("v") +:
        (0 until tables).map(t =>
          lshBucket(col("v"), dim, bits, tableSeed(seed, t)).as(s"__b$t")): _*)
      val cb = cbWide.select(col("vid"), col("v"), explode(array(
          (0 until tables).map(t =>
            struct(lit(t).as("t"), col(s"__b$t").as("b"))): _*)).as("p"))
        .select(col("vid"), col("v"),
          col("p.t").as("__t"), col("p.b").as("__b"))
      // probe side (small, broadcast): per (query, table) the own bucket
      // plus 1-bit flips, as equi-join rows (table, bucket)
      val flips: Seq[Long] = 0L +: (0 until bits).map(b => 1L << b)
      val qbWide = queries.select(col("qid") +: col("qv") +:
        (0 until tables).map(t =>
          lshBucket(col("qv"), dim, bits, tableSeed(seed, t)).as(s"__q$t")): _*)
      val probes = qbWide.select(col("qid"), col("qv"), explode(array(
          (for (t <- 0 until tables; f <- flips) yield
            struct(lit(t).as("t"), col(s"__q$t").bitwiseXOR(lit(f)).as("b"))): _*))
          .as("p"))
        .select(col("qid"), col("qv"),
          col("p.t").as("__t"), col("p.b").as("__b"))
      // candidates: min matching table + cosine (identical across tables,
      // max() just picks it); checkpointed — every per-L pass below reads
      // this frame, not the corpus
      val matched = cb.join(broadcast(probes), Seq("__t", "__b"))
        .groupBy(col("qid"), col("vid"))
        .agg(min(col("__t")).as("t_min"),
          max(cosineCols(col("v"), col("qv"))).as("cos"))
        .localCheckpoint()
      // a candidate with min matching table t_min belongs to every
      // operating point l > t_min — ONE generator pass over the
      // checkpointed frame instead of L filter+union scans (the union
      // form re-read `matched` L times and stacked L plan branches).
      // sequence() is safe here: t_min+1 ≤ tables always (t_min is a
      // 0-based table index), so the range is never empty/descending.
      val perL = matched.withColumn("l_tables",
        explode(sequence(col("t_min") + lit(1), lit(tables))))
      val cost = perL.groupBy("l_tables", "qid")
        .agg(count(lit(1)).as("n_candidates"))
      val lshTop = perL
        .withColumn("__r", row_number().over(wnd))
        .filter(col("__r") <= k).select("l_tables", "qid", "vid")
      val hits = brute.join(lshTop, Seq("qid", "vid"))
        .groupBy("l_tables", "qid").agg(count(lit(1)).as("n_hits"))
      val grid = queries.select(col("qid"))
        .crossJoin((1 to tables).toDF("l_tables"))
      grid
        .join(cost, Seq("l_tables", "qid"), "left")
        .join(hits, Seq("l_tables", "qid"), "left")
        .select(lit(bits).as("bits"), col("l_tables"), col("qid"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble))
            .as("recall"))
    }
    perConfig.reduce(_ unionByName _)
  }

  /** Per-group mean embedding (class prototypes, IVF training step).
    * posexplode → per-(group, position) decimal-summed mean → reassemble
    * sorted — two keyed shuffles of (group, pos, value) triples with full
    * map-side partial aggregation; no collect_list of whole vectors ever
    * crosses the wire. Values are roundHalfUp'd before the DECIMAL cast
    * (per the cross-engine rules) so the partial-aggregation order can't
    * perturb the mean — the result is bit-identical on any partitioning
    * and reproducible by the DuckDB oracle. (Iterative/hot callers use
    * [[graft.expressions.VectorMeanAgg]] instead — same exact sums with
    * no dim× fan-out; this lazy form stays signature-free of `dim` for
    * one-shot prototype/drift composition.) */
  def centroids(embeddings: DataFrame, groupCol: String, vecCol: String,
      scale: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val flat = embeddings.select(col(groupCol).as("__g"),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
    val means = flat.groupBy("__g", "pos")
      .agg((sum(graft.functions.SafeMath.roundHalfUp(
          col("v").cast("double"), scale).cast(DecimalType(28, scale)))
        .cast("double") / count(lit(1))).as("m"))
    means.groupBy("__g")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
      .withColumnRenamed("__g", groupCol)
  }

  /** Lloyd's k-means over an embedding column, deterministic end-to-end:
    * initialization is the first `k` vectors by id order, assignment is a
    * flat distance array + argmin (cosine ordering, `-dot/|c|`; ties go to
    * the lowest cell, matching `array_position`'s first-match), and the
    * centroid recompute is the decimal-summed per-position mean of
    * [[centroids]], so the result is independent of partitioning AND
    * reproducible by an unrolled-CTE DuckDB oracle. Per iteration: one
    * scan of the cached projection + one (cell, pos) keyed shuffle with
    * full map-side combine; only k·dim doubles ever reach the driver (the
    * broadcast-Lloyd layout — vectors never shuffle). A cell that loses
    * all members carries its previous centroid forward. `iters` counts
    * assignment rounds: iters=2 ⇒ assign → recompute → assign. */
  def kmeans(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2, scale: Int = 10): DataFrame = {
    val e = embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .cache()
    val cents = lloydLoop(e, idCol, k, iters, scale)
    // materialize the assignment, then release the cached projection —
    // composed as a library call (semDedup, curriculum pipelines) a
    // pinned corpus-sized cache would otherwise leak per invocation
    // (the clusterAssignments checkpoint-then-unpersist discipline)
    val out = e
      .select(col(idCol), nearestCellExpr(cents)(col("__v")).as("cluster"))
      .localCheckpoint()
    e.unpersist(blocking = false)
    out
  }

  /** The deterministic Lloyd training loop shared by [[kmeans]] and the
    * IVF coarse quantizer ([[trainedCentroids]]): init = first `k`
    * vectors by id, assignment = [[nearestCellExpr]]'s first-min argmin,
    * recompute = decimal-summed per-position mean, an emptied cell
    * carries its previous centroid forward. `e` must be a cached
    * (idCol, __v: array<double>) projection; per round: one scan + one
    * (cell, pos) keyed shuffle with full map-side combine — only k·dim
    * doubles ever reach the driver (broadcast-Lloyd; vectors never
    * shuffle). */
  private def lloydLoop(e: DataFrame, idCol: String, k: Int, iters: Int,
      scale: Int): IndexedSeq[Seq[Double]] = {
    import org.apache.spark.sql.types.DecimalType
    graft.core.Adaptive.withSmallShuffleCoalesce(e.sparkSession) {
    var cents: IndexedSeq[Seq[Double]] = e.orderBy(col(idCol)).limit(k)
      .select(col("__v")).collect().toIndexedSeq
      .map(_.getSeq[Double](0).toSeq)
    require(cents.size == k, s"need at least $k vectors, got ${cents.size}")
    val dim = cents.head.size
    for (_ <- 1 until iters) {
      // the recompute is ONE custom aggregate per cell (VectorMeanAgg):
      // each row folds its snapped components into a per-task long[]
      // (BigInteger-banked — exact at any scale) instead of fanning out
      // dim× through posexplode + hash-update + Decimal sum per element.
      // The per-position mean finishes on the driver with the identical
      // IEEE ops the Column form used (Decimal→double, /count-as-double);
      // null cells (a malformed row the argmin rejects) are filtered —
      // the posexplode form crashed the collect on them.
      // (Historical trap, still load-bearing for any reformulation:
      // `select(expr, posexplode(...))` re-evaluates expr once per
      // exploded element — bind the cell below any generator.)
      val byCell = e
        .select(nearestCellExpr(cents)(col("__v")).as("__cell"), col("__v"))
        .filter(col("__cell").isNotNull)
        .groupBy("__cell")
        .agg(graft.expressions.VectorMeanAgg
          .vector_mean(col("__v"), dim, scale).as("__m"))
        .collect() // ≤ k rows (one per cell) — bounded by construction
        .map { r =>
          val m = r.getStruct(1)
          val sums = m.getSeq[java.math.BigDecimal](0)
          val counts = m.getSeq[Long](1)
          r.getInt(0) -> sums.indices.collect {
            case i if counts(i) > 0 => sums(i).doubleValue / counts(i).toDouble
          }.toSeq
        }.toMap
      cents = (0 until k).map(i => byCell.getOrElse(i, cents(i)))
    }
    cents
    }
  }

  /** Lloyd-TRAINED centroids over an embedding column — the coarse
    * quantizer trainer for [[ivfTopK]]/[[ivfPqTopK]]/[[PqIndex]]. A
    * first-k-by-id quantizer is deterministic but untrained: on a
    * skewed corpus most vectors land in a few cells, probe pruning
    * degrades toward a full scan, and a materialized index's cell
    * partitions skew on disk. Training runs the exact [[kmeans]]
    * machinery (so the unrolled-CTE oracle replays every centroid
    * bit-for-bit) and returns the centroid vectors instead of the
    * assignment. */
  private[operators] def trainedCentroids(embeddings: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int,
      scale: Int = 10): IndexedSeq[Seq[Double]] = {
    val e = embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .cache()
    try lloydLoop(e, idCol, k, iters, scale)
    finally e.unpersist(blocking = false)
  }

  /** Simplified-silhouette audit of the [[kmeans]] clustering — the
    * "did Lloyd produce real clusters" check run before trusting
    * SemDedup cells or IVF lists: per point, a = Euclidean distance to
    * its OWN trained centroid, b = the nearest OTHER centroid,
    * s = (b − a) / max(a, b) ∈ [−1, 1]; output one row per cluster
    * (cluster, n, mean_sil). The classic O(n²) silhouette is replaced by
    * the standard centroid form — O(n·k), one scan over the corpus after
    * training, so the audit costs no more than one extra assignment
    * round at any scale.
    *
    * Determinism/oracle discipline: assignment is the Lloyd argmin
    * (cosine ordering — the clustering being audited), distances are
    * `sqrt(max(v·v − 2·v·c + c·c, 0))` with the ArrayDot fold on both
    * engines (the max-0 clamp kills FP-cancellation NaNs when v ≈ c,
    * mirrored in SQL), per-point s is roundHalfUp'd at scale 8 and
    * summed as DECIMAL(28,8), the mean at `scale`. Duplicate centroids
    * (a cell that lost its members carries its previous centroid) give
    * a = b ⇒ s = 0, not an error. */
  def simplifiedSilhouette(embeddings: DataFrame, idCol: String,
      vecCol: String, k: Int = 8, iters: Int = 2,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(k >= 2, "silhouette needs k >= 2 (b = nearest OTHER centroid)")
    val cents = trainedCentroids(embeddings, idCol, vecCol, k, iters)
    val v = col(vecCol)
    // both the argmin and the score are single reference-object nodes
    // (never 2·k·dim literal CaseWhen chains — the q221 driver-compile
    // lesson; the Column form of this projection measured 26.7 s at sf1
    // vs 2.7 s for the identical Lloyd training, all of it Catalyst +
    // janino re-processing ~2k literal nodes per action)
    embeddings
      .select(
        graft.expressions.NearestCentroid.nearest_centroid(v, cents)
          .as("cluster"),
        graft.expressions.SilhouetteScore.silhouette_score(v, cents)
          .as("__s"))
      // malformed rows (null/short vector) assign to a null cluster —
      // drop them so the gated domain equals the oracle's assigned
      // universe (advice r10), matching the Lloyd trainer's own filter
      .filter(col("cluster").isNotNull)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        graft.functions.SafeMath.roundHalfUp(
          sum(col("__s").cast(DecimalType(28, 8))).cast("double") /
            count(lit(1)).cast("double"), scale).as("mean_sil"))
  }

  /** SemDedup-style semantic near-duplicate pairs: coarse [[kmeans]]
    * clustering, then pairwise cosine ONLY within a cluster. The cell
    * granularity bounds the quadratic term — at 100 TB pick `k` so the
    * largest cell's pair volume is shuffle-affordable (corpus/k vectors
    * per cell ⇒ (corpus/k)²/2 pairs); cross-cluster near-dups are traded
    * away exactly like LSH's cross-bucket misses. One shuffle keyed by
    * cluster on each side of the self-join; vectors never leave their
    * cell. */
  def semDedupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2, threshold: Double = 0.95,
      scale: Int = 6): DataFrame =
    pairsWithin(embeddings, idCol, vecCol,
      kmeans(embeddings, idCol, vecCol, k, iters), threshold, scale)

  private def pairsWithin(embeddings: DataFrame, idCol: String,
      vecCol: String, assign: DataFrame, threshold: Double,
      scale: Int): DataFrame = {
    val e = embeddings.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
    saltedCellPairs(e.join(assign, Seq(idCol)), idCol, threshold, scale)
  }

  /** Pairwise cosine within a cell over a (idCol, __v, cluster) frame.
    *
    * Salt the in-cluster self-join: a plain join on `cluster` has at
    * most k populated reduce keys, so k=8 caps the quadratic pair
    * scoring at 8 cores no matter how many executors exist. The a-side
    * splits into S deterministic salt lanes by id hash and the b-side
    * replicates ×S — identical pair set, k·S-way parallelism, and the
    * per-task pair count drops ×S (observed at sf1: 596 s → bounded by
    * cores, not clusters). S is fixed (not cores-dependent) so the
    * emitted pairs and their plan shape are reproducible everywhere. */
  private def saltedCellPairs(withCell: DataFrame, idCol: String,
      threshold: Double, scale: Int): DataFrame = {
    val S = 16
    val a = withCell.select(col("cluster"), col(idCol).as("id_a"),
      col("__v").as("__va"),
      pmod(xxhash64(col(idCol)), lit(S)).as("__salt"))
    val b = withCell.select(col("cluster"), col(idCol).as("id_b"),
      col("__v").as("__vb"),
      explode(array((0 until S).map(lit): _*)).as("__salt"))
    a.join(b, Seq("cluster", "__salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cluster"), col("id_a"), col("id_b"),
        cosineCols(col("__va"), col("__vb"), scale).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SemDedup keep/drop decision: a vector is DROPPED when some lower-id
    * vector in its cluster sits within the cosine threshold (greedy by id
    * — deterministic and single-pass; chains a~b~c drop both b and c,
    * the standard cheap approximation to one-per-component). Returns
    * (id, cluster, is_kept). The k-means assignment runs ONCE and feeds
    * both the pair generation and the output. */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2, threshold: Double = 0.95,
      scale: Int = 6): DataFrame = {
    val assign = kmeans(embeddings, idCol, vecCol, k, iters)
      .localCheckpoint()
    val pairs = pairsWithin(embeddings, idCol, vecCol, assign,
      threshold, scale)
    val dropped = pairs.select(col("id_b").as(idCol)).distinct()
      .withColumn("__d", lit(true))
    assign.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("__d"), lit(false)).unary_!.as("is_kept"))
  }

  /** [[semDedup]] with LSH sign-buckets as the cells instead of k-means
    * clusters — the operating point that stays linear as the corpus
    * grows. Broadcast-Lloyd cells have two fixed-k scale walls: per-cell
    * pair volume grows (n/k)² (measured 5.1× runtime on 3× data at
    * k=8), and raising k inflates the nearest-centroid expression until
    * it breaks whole-stage codegen. A sign-bucket cell is O(bits·dim)
    * per row with no iteration and no driver state, and `bits` scales
    * the cell count exponentially (2^bits) — pick
    * bits ≈ log2(n/targetCellSize) and per-cell pair volume stays flat
    * at any corpus size. The recall trade is the same one [[semDedup]]
    * already makes at cell granularity: near-dups across cells are
    * missed, and bucket cells make that trade per-hyperplane rather than
    * per-centroid. Output contract matches [[semDedup]]:
    * (id, cluster = bucket, is_kept) with the greedy lower-id keep. */
  def semDedupLsh(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, bits: Int, threshold: Double = 0.95, scale: Int = 6,
      seed: Int = 42): DataFrame = {
    val withCell = embeddings.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"),
      lshBucket(col(vecCol), dim, bits, seed).as("cluster"))
    val pairs = saltedCellPairs(withCell, idCol, threshold, scale)
    val dropped = pairs.select(col("id_b").as(idCol)).distinct()
      .withColumn("__d", lit(true))
    withCell.select(col(idCol), col("cluster"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("__d"), lit(false)).unary_!.as("is_kept"))
  }

  /** [[semDedupLsh]] for a STANDING corpus — the day-2/streamed form
    * (the [[Dedup.minhashLshIngest]] shape, semantic flavor): decide
    * keep/drop for the `batch` vectors only, against (a) the standing
    * cell store and (b) lower-id vectors of the same batch. When batch
    * ids are strictly greater than every standing id (the ingest
    * contract — wave-encoded ids), the union of per-wave results equals
    * one [[semDedupLsh]] over the whole corpus, without ever re-pairing
    * the standing corpus against itself.
    *
    * `standing` is the materialized cell store: (idCol, cluster, vec)
    * as written by previous waves — at 100 TB it lives
    * directory-partitioned by ingest batch, so the `batch < id` read
    * prunes to real predecessors and this call scans it exactly once.
    * Scale shape: the wave is SMALL relative to the store, so the
    * cross leg broadcasts the wave's cells against the store scan —
    * zero store shuffle, candidates only within matching buckets; the
    * in-wave leg reuses the salted cell-pair join on the wave alone.
    * Returns (id, cluster, is_kept) for the batch rows only. */
  def semDedupLshIngest(standing: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, dim: Int, bits: Int,
      threshold: Double = 0.95, scale: Int = 6, seed: Int = 42)
      : DataFrame = {
    val newCells = batch.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"),
      lshBucket(col(vecCol), dim, bits, seed).as("cluster"))
      .localCheckpoint()
    val store = standing.select(col("cluster"),
      col(vecCol).cast("array<double>").as("__sv"))
    // cross leg: any standing vector within the threshold drops the new
    // doc (standing ids are lower by the ingest contract — no id
    // comparison needed, and the store never joins itself)
    val crossDrops = store
      .join(broadcast(newCells.select(col(idCol), col("cluster"),
        col("__v"))), Seq("cluster"))
      .filter(cosineCols(col("__sv"), col("__v"), scale) >= threshold)
      .select(col(idCol))
    // in-wave leg: the same greedy lower-id-keeps rule as the batch form
    val waveDrops = saltedCellPairs(newCells, idCol, threshold, scale)
      .select(col("id_b").as(idCol))
    val dropped = crossDrops.unionByName(waveDrops).distinct()
      .withColumn("__d", lit(true))
    // materialize the (wave-sized) result so the newCells checkpoint can
    // be released here instead of leaking per micro-batch
    val out = newCells.select(col(idCol), col("cluster"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("__d"), lit(false)).unary_!.as("is_kept"))
      .localCheckpoint()
    newCells.unpersist(blocking = false)
    out
  }

  /** SEMANTIC benchmark decontamination — the embedding-space complement
    * of the n-gram overlap decontamination in
    * [[Curation.decontaminate]]: a paraphrased eval item shares no
    * 8-gram with its source but sits at cosine ~1 next to it. Flags
    * every corpus vector whose cosine against ANY benchmark vector
    * reaches `threshold`, reporting the best match (max cos, benchmark
    * id as tie-break): (corpusId, benchId, cos).
    *
    * Scale shape: the benchmark side is SMALL by nature (an eval suite
    * is thousands of items, the corpus is billions) — both sides take
    * the same `bits`-plane LSH sign bucket and the benchmark frame
    * broadcasts, so the corpus is ONE scan with a broadcast hash join
    * on the bucket key: zero corpus shuffle, candidates only within
    * matching buckets (identical vectors always collide; the recall
    * trade for paraphrases is per-hyperplane, as in [[semDedupLsh]]).
    * The per-corpus-id argmax window partitions on the corpus id —
    * bounded by that id's candidate count, never corpus-wide.
    * Requires `idCol` != `benchIdCol` (both appear in the output). */
  def semanticContamination(corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      dim: Int, bits: Int, threshold: Double, scale: Int = 6,
      seed: Int = 42): DataFrame = {
    require(idCol != benchIdCol,
      "corpus and benchmark id columns must have distinct names")
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"),
      lshBucket(col(vecCol), dim, bits, seed).as("__b"))
    val b = bench.select(col(benchIdCol),
      col(benchVecCol).cast("array<double>").as("__bv"),
      lshBucket(col(benchVecCol), dim, bits, seed).as("__b"))
    val cand = c.join(broadcast(b), Seq("__b"))
      .select(col(idCol), col(benchIdCol),
        cosineCols(col("__v"), col("__bv"), scale).as("cos"))
      .filter(col("cos") >= threshold)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos").desc, col(benchIdCol).asc)
    cand.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** RAG context assembly — retrieval plus token-budgeted packing in one
    * pass: for each query vector, rank same-LSH-bucket corpus candidates
    * by cosine (id tie-break) and keep the top-ranked PREFIX whose
    * cumulative token count fits `budgetTokens` (the standard
    * truncate-at-budget context window; deterministic, no sequential
    * skip-and-continue dependency). Output: (qid, id, cos, rk,
    * n_tokens, cum_tokens) for every kept candidate.
    *
    * Scale shape: the query set is small (a batch of prompts) and
    * BROADCASTS with its bucket key — the corpus is ONE scan + broadcast
    * hash join, zero corpus shuffle (the [[semanticContamination]]
    * layout). Ranking and the running token sum share one window
    * partitioned by qid, bounded by that query's bucket population —
    * never corpus-wide. `tokCol` is the corpus frame's per-doc token
    * count column. Requires `idCol` != `qidCol`. */
  def retrieveContext(corpus: DataFrame, idCol: String, vecCol: String,
      tokCol: String, queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, bits: Int, budgetTokens: Long, scale: Int = 6,
      seed: Int = 42): DataFrame = {
    require(idCol != qidCol,
      "corpus and query id columns must have distinct names")
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol), col(tokCol).as("n_tokens"),
      col(vecCol).cast("array<double>").as("__v"),
      lshBucket(col(vecCol), dim, bits, seed).as("__b"))
    val q = queries.select(col(qidCol),
      col(qvecCol).cast("array<double>").as("__qv"),
      lshBucket(col(qvecCol), dim, bits, seed).as("__b"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("cos").desc, col(idCol).asc)
    c.join(broadcast(q), Seq("__b"))
      .select(col(qidCol), col(idCol), col("n_tokens"),
        cosineCols(col("__v"), col("__qv"), scale).as("cos"))
      .withColumn("rk", row_number().over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(qidCol), col(idCol), col("cos"), col("rk"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Apply [[semanticContamination]]: the corpus minus flagged rows
    * (one broadcast-bucket probe + an anti-join on the id). */
  def semanticDecontaminate(corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      dim: Int, bits: Int, threshold: Double, scale: Int = 6,
      seed: Int = 42): DataFrame = {
    val flags = semanticContamination(corpus, idCol, vecCol,
      bench, benchIdCol, benchVecCol, dim, bits, threshold, scale, seed)
    corpus.join(flags.select(col(idCol)), Seq(idCol), "left_anti")
  }

  /** IVF: assign every vector to its nearest of `nCells` Lloyd-TRAINED
    * centroids ([[trainedCentroids]] — `iters` assignment rounds of the
    * deterministic kmeans machinery), then score only the `nProbe`
    * cells nearest the query. Returns the top-k within probed cells.
    * Training (vs the old first-k-by-id pick) is what keeps probe
    * pruning real on a skewed corpus — untrained cells degenerate
    * toward one hot cell and the probe re-scans the corpus. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    val cents = trainedCentroids(embeddings, idCol, vecCol, nCells, iters)
    val qCells = probeCells(cents, query, nProbe)
    embeddings
      .withColumn("__cell", nearestCellExpr(cents)(col(vecCol)))
      .filter(col("__cell").isin(qCells: _*))
      .select(col(idCol), cosineLit(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-cell population census of the trained IVF coarse quantizer —
    * the skew audit an IVF rollout ships with: cell sizes decide both
    * probe-pruning quality (a hot cell degrades nProbe/nCells pruning
    * toward a full scan) and on-disk partition balance of a
    * materialized index ([[PqIndex]]). One scan, one map-side-combined
    * aggregate of at most nCells rows. Output: (cell, n_vecs). */
  def ivfCellCensus(embeddings: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, iters: Int = 2): DataFrame = {
    val cents = trainedCentroids(embeddings, idCol, vecCol, nCells, iters)
    embeddings
      .select(nearestCellExpr(cents)(col(vecCol)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
  }

  /** Product-quantization codebooks — the compressed-index training step
    * for a 100 TB embedding store: the vector space is split into `m`
    * contiguous subspaces and each learns its own `ks`-entry codebook
    * with the SAME deterministic Lloyd machinery as [[kmeans]]
    * (init = subvectors of the first `ks` vectors by id, assignment =
    * flat `-dot/|c|` distance array + first-min argmin, recompute =
    * decimal-summed per-position mean, empty cells carry forward) — so
    * an unrolled-CTE oracle reproduces every codebook bit-for-bit.
    * All `m` subspaces train in ONE scan per round: each row computes
    * its m codes in a single projection (slices bound as their own
    * columns first — a slice referenced ks times otherwise re-copies per
    * dot), then positions explode ONCE and aggregate keyed by
    * (subspace, code, pos) with full map-side combine; only
    * m·ks·subDim doubles ever reach the driver. Returns
    * books(j)(code) = centroid of subspace j. */
  def pqCodebooks(embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, ks: Int = 8, iters: Int = 2, scale: Int = 10)
      : IndexedSeq[IndexedSeq[Seq[Double]]] = {
    import org.apache.spark.sql.types.DecimalType
    // the RAW vector column, no double-cast projection: a `transform`
    // cast is an interpreted lambda on every hot scan, and ArrayDot
    // widens float elements itself (bit-exactly — float→double is exact)
    val e = embeddings.select(col(idCol), col(vecCol).as("__v")).cache()
    val init = e.orderBy(col(idCol)).limit(ks)
      .select(col("__v")).collect().toIndexedSeq
      .map(_.getSeq[Any](0).toSeq
        .map { case n: java.lang.Number => n.doubleValue })
    require(init.size == ks, s"need at least $ks vectors, got ${init.size}")
    val dim = init.head.size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    var books: IndexedSeq[IndexedSeq[Seq[Double]]] =
      (0 until m).map(j => init.map(_.slice(j * sub, (j + 1) * sub)))
    for (_ <- 1 until iters) {
      val got = e
        .select(col("__v") +: (0 until m).map(j =>
          slice(col("__v"), j * sub + 1, sub).as(s"__s$j")): _*)
        .select(col("__v") +: (0 until m).map(j =>
          pqNearest(books(j))(col(s"__s$j")).as(s"__c$j")): _*)
        // codes are plain attributes by now, so the generator leaves
        // cheap references (not recomputed argmins) in the upper Project
        .select((0 until m).map(j => col(s"__c$j"))
          :+ posexplode(col("__v")).as(Seq("pos", "v")): _*)
        .select((col("pos") / lit(sub)).cast("int").as("j"),
          element_at(array((0 until m).map(j => col(s"__c$j")): _*),
            (col("pos") / lit(sub)).cast("int") + 1).as("code"),
          col("pos"), col("v"))
        .groupBy("j", "code", "pos")
        .agg((sum(graft.functions.SafeMath.roundHalfUp(
              col("v").cast("double"), scale)
            .cast(DecimalType(28, scale))).cast("double") / count(lit(1)))
          .as("m"))
        .collect() // ≤ m·ks·sub rows (codebook cells) — bounded by construction
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (jc, rs) =>
          jc -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      books = (0 until m).map(j =>
        (0 until ks).map(c => got.getOrElse((j, c), books(j)(c))))
    }
    e.unpersist(blocking = false)
    books
  }

  /** First-min argmin over one subspace's codebook — [[kmeans]]'s
    * `nearest` on a subvector column (ties to the lowest code, matching
    * `array_position` and the oracle's `row_number` order). Routed
    * through the native [[graft.expressions.NearestCentroid]] (identical
    * FP fold and ordering): the former literal-array form carried
    * ~2·ks·subDim Literal nodes per subspace, and the per-action driver
    * planning over those trees — not the executors — dominated the PQ
    * bench (q221 r09: 1.05 s wall vs 0.4 s of jobs). */
  private[operators] def pqNearest(cents: IndexedSeq[Seq[Double]])(sl: Column): Column =
    graft.expressions.NearestCentroid.nearest_centroid(sl, cents)

  /** PQ encode: every vector compressed to its m codebook codes
    * (`code_0..code_{m-1}` int columns) — m bytes of index payload per
    * vector vs 4·dim for the raw floats (64× at dim=64, m=4). One
    * codegen'd projection, zero shuffle: the codebooks travel as
    * literals, vectors never leave their partition — the write side of a
    * compressed ANN index build at any corpus size. */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
      books: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame = {
    val m = books.size
    val sub = books.head.head.size
    embeddings
      .select(col(idCol) +: (0 until m).map(j =>
        slice(col(vecCol), j * sub + 1, sub).as(s"__s$j")): _*)
      .select(col(idCol) +: (0 until m).map(j =>
        pqNearest(books(j))(col(s"__s$j")).as(s"code_$j")): _*)
  }

  /** ADC (asymmetric-distance) top-k over the PQ codes: the query is
    * decomposed once on the driver into m lookup tables
    * (lut_j(c) = q_j · books_j(c), the subspace inner products), and each
    * encoded vector is scored as the left-fold sum of its m table
    * lookups — approximating dot(q, x) without ever touching the raw
    * vectors. At scale this is the point of PQ: the scan reads m small
    * int codes per row (the 64×-compressed index), does m array lookups
    * (codegen'd literals, no join, no shuffle), and `TakeOrderedAndProject`
    * keeps the top-k — the raw embedding column is never read after the
    * one-time encode. */
  def pqAdcTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], topK: Int, m: Int = 4, ks: Int = 8,
      iters: Int = 2, scale: Int = 6): DataFrame =
    pqAdcTopKWith(embeddings, idCol, vecCol, query, topK,
      pqCodebooks(embeddings, idCol, vecCol, m, ks, iters), scale)

  /** ADC top-k over PRE-TRAINED codebooks — the probe path against a
    * built index artifact (training is the amortized build step at
    * 100 TB; a probe never retrains). */
  def pqAdcTopKWith(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], topK: Int,
      books: IndexedSeq[IndexedSeq[Seq[Double]]], scale: Int = 6): DataFrame = {
    pqEncode(embeddings, idCol, vecCol, books)
      .select(col(idCol),
        graft.functions.SafeMath.roundHalfUp(
          adcScore(books, query), scale).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** The ADC scoring column over `code_0..code_{m-1}`: query decomposed
    * into per-subspace inner-product lookup tables on the driver,
    * left-fold summed — literal arrays, no join, stays in codegen. */
  private[operators] def adcScore(books: IndexedSeq[IndexedSeq[Seq[Double]]],
      query: Seq[Double]): Column = {
    val m = books.size
    val sub = query.size / m
    val luts = (0 until m).map { j =>
      val qj = query.slice(j * sub, (j + 1) * sub)
      books(j).map(c => c.zip(qj).map { case (a, b) => a * b }.sum)
    }
    (0 until m).map(j =>
        element_at(array(luts(j).map(lit): _*), col(s"code_$j") + 1))
      .reduce(_ + _)
  }

  /** IVF-PQ — the layout a 100 TB vector store actually ships: a coarse
    * inverted file ([[ivfTopK]]'s deterministic centroids) prunes the
    * READ to the nProbe cells nearest the query, and within those cells
    * the scan runs over [[pqEncode]]'s m-byte codes via [[adcScore]]'s
    * lookup tables — I/O pruned by the cell list, bytes-per-row pruned
    * 64× by the codes, no join, no shuffle beyond the top-k. (In
    * production the (cell, codes) projection is the materialized,
    * cell-partitioned index — the [[AnnIndex]] pattern — so a probe
    * reads ONLY its cells' files; here it is computed inline from the
    * same deterministic arithmetic.) Non-residual PQ variant: one shared
    * codebook set across cells — one training pass, and the oracle can
    * replay codes independently of cell assignment. */
  /** The IVF coarse centroids: Lloyd-trained via [[trainedCentroids]]
    * (first-nCells-by-id init, `iters` deterministic rounds). */
  private[operators] def coarseCentroids(embeddings: DataFrame,
      idCol: String, vecCol: String, nCells: Int,
      iters: Int = 2): IndexedSeq[Seq[Double]] =
    trainedCentroids(embeddings, idCol, vecCol, nCells, iters)

  /** Coarse-cell assignment column (first-min argmin over the centroid
    * list) — the native [[graft.expressions.NearestCentroid]]: one tree
    * node instead of 2·k·dim literals, same FP fold, stays in
    * whole-stage codegen for the probe filter and index build. */
  private[operators] def nearestCellExpr(cents: IndexedSeq[Seq[Double]])(
      vec: Column): Column =
    graft.expressions.NearestCentroid.nearest_centroid(vec, cents)

  /** The nProbe cells nearest a query — driver arithmetic with the exact
    * FP fold of the cell-assignment expression (cosine distance to each
    * centroid; ties to the lowest cell via stable sort). */
  private[operators] def probeCells(cents: IndexedSeq[Seq[Double]],
      query: Seq[Double], nProbe: Int): Seq[Int] = {
    val qn = normLit(query)
    cents.zipWithIndex
      .map { case (c, i) =>
        val dot = query.zip(c).map { case (a, b) => a * b }.sum
        i -> -dot / (normLit(c) * qn)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
  }

  def ivfPqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], topK: Int, nCells: Int = 16, nProbe: Int = 4,
      m: Int = 4, ks: Int = 8, iters: Int = 2, scale: Int = 6): DataFrame = {
    // `iters` trains BOTH quantizers: the coarse cells and the subspace
    // codebooks run the same deterministic Lloyd round count
    val cents = coarseCentroids(embeddings, idCol, vecCol, nCells, iters)
    val qCells = probeCells(cents, query, nProbe)
    val books = pqCodebooks(embeddings, idCol, vecCol, m, ks, iters)
    val probed = embeddings
      .withColumn("__cell", nearestCellExpr(cents)(col(vecCol)))
      .filter(col("__cell").isin(qCells: _*))
    pqEncode(probed, idCol, vecCol, books)
      .select(col(idCol),
        graft.functions.SafeMath.roundHalfUp(
          adcScore(books, query), scale).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019) — the standard
    * parallel-corpus miner: for each source vector its best cross-side
    * neighbor, scored by cosine RELATIVE to both endpoints' k-NN
    * neighborhoods, `margin = cos(x,y) / ((avgₖ(x) + avgₖ(y)) / 2)` —
    * which suppresses hubs (vectors near everything) that absolute-cosine
    * mining drowns in. Candidates and neighborhoods come from the same
    * sign-LSH blocking as [[Dedup.embeddingNearDupsLsh]]: pairs form only
    * inside a shared bucket (one shuffle keyed by bucket; the corpus
    * never self-joins), so neighborhoods are LSH-local — the documented
    * recall trade of every blocked miner; raise `bits` resolution or add
    * multi-probe for denser corpora.
    *
    * Determinism/FP: cosines snap to integer micro-units before any
    * aggregate; k-NN averages are exact integer sums divided once; the
    * margin is mirrored IEEE division of those exact inputs, rounded at
    * scale 6. Windows partition by endpoint id (bucket-bounded frames,
    * never global). Output: (x_id, y_id, cos_micro, margin) with
    * margin ≥ `threshold`. */
  /** Matryoshka truncation audit: how much retrieval quality survives
    * cutting embeddings to their first `subDim` dimensions — recall@k of
    * the truncated-cosine top-k against the full-dimension top-k for a
    * probe vector, at several k. The decision artifact for "can we serve
    * the 16-dim prefix" (matryoshka-style storage cuts memory 4×; this
    * measures what it costs). Two TakeOrderedAndProject corpus scans
    * (full + truncated), both distributed; the ≤max(k)-row lists are
    * compared on the driver (bounded by construction, the MMR-pool
    * discipline). Output: (k, n_common, recall). */
  def truncationRecall(embeddings: DataFrame, idCol: String, vecCol: String,
      subDim: Int, query: Seq[Double], ks: Seq[Int],
      scale: Int = 6): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && subDim >= 1)
    val spark = embeddings.sparkSession
    val kMax = ks.max
    def ids(df: DataFrame): IndexedSeq[Long] =
      // ≤ kMax rows — each input is a cosineTopK limit(kMax) result,
      // bounded by construction (the MMR-pool discipline)
      df.select(col(idCol)).collect().map(_.getLong(0)).toIndexedSeq
    val full = ids(cosineTopK(embeddings, idCol, vecCol, query, kMax))
    val trunc = ids(cosineTopK(
      embeddings.select(col(idCol), slice(col(vecCol), 1, subDim).as("__t")),
      idCol, "__t", query.take(subDim), kMax))
    val rows = ks.sorted.map { k =>
      val common = full.take(k).toSet.intersect(trunc.take(k).toSet).size
      (k.toLong, common.toLong,
        graft.functions.SafeMath.roundHalfUpD(common.toDouble / k, scale))
    }
    spark.createDataFrame(rows).toDF("k", "n_common", "recall")
  }

  /** Mutual nearest-neighbor pairs across two vector sets — the
    * symmetric filter the margin miner rides on (Artetxe & Schwenk
    * 2019): keep (x, y) only when y is x's best match AND x is y's —
    * asymmetric hubs (one vector that everything points at) fall out,
    * which is most of the precision gap between raw top-1 and usable
    * bitext. Per-side argmax is ONE map-side-combined aggregate
    * (max(struct(cos, −partner)) — cos micro-rounded, ties to the
    * smaller partner id), never a window over the cross product. The
    * pair scoring here is the brute baseline (spread() keeps it
    * parallel; the q37 measurement class) — at corpus scale, LSH-prune
    * candidates first (q38) and feed the survivors through the same
    * mutual filter. Output: (x id, y id, cos). */
  def mutualNearestPairs(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val a = spread(xs.select(col(idCol).cast("long").as("__xid"),
      col(vecCol).as("__xv")))
    val b = ys.select(col(idCol).cast("long").as("__yid"),
      col(vecCol).as("__yv"))
    val scored = a.join(b)
      .select(col("__xid"), col("__yid"),
        cosineCols(col("__xv"), col("__yv")).as("__c"))
    val fwd = scored.groupBy(col("__xid"))
      .agg(max(struct(col("__c"), (-col("__yid")).as("__ny"))).as("__m"))
      .select(col("__xid"), (-col("__m.__ny")).as("__yid"),
        col("__m.__c").as("__cf"))
    val bwd = scored.groupBy(col("__yid"))
      .agg(max(struct(col("__c"), (-col("__xid")).as("__nx"))).as("__m"))
      .select(col("__yid"), (-col("__m.__nx")).as("__xid"))
    fwd.join(bwd, Seq("__xid", "__yid"))
      .select(col("__xid").as("x_id"), col("__yid").as("y_id"),
        col("__cf").as("cos"))
  }

  def bitextMarginMine(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int = 4, threshold: Double = 1.0,
      bits: Int = 6, seed: Int = 42): DataFrame = {
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val out = bitextMarginMinePlan(xs, ys, idCol, vecCol, dim, k,
      threshold, bits, seed,
      df => { val c = df.localCheckpoint(); pinned += c; c })
      .localCheckpoint()
    pinned.foreach(_.unpersist(blocking = false))
    out
  }

  /** The lazy plan behind [[bitextMarginMine]]: `pin` materializes the
    * two multiply-consumed intermediates (the candidate frame feeds both
    * neighborhood windows + the best-pair cut; the x-top frame feeds its
    * aggregate AND the rn=1 cut) — localCheckpoint in production,
    * identity for the plan book so the full join tree stays visible. */
  private[graft] def bitextMarginMinePlan(xs: DataFrame, ys: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int, threshold: Double,
      bits: Int, seed: Int, pin: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        lshBucket(col(vecCol), dim, bits, seed).as("bucket"))
    val cand = pin(
      side(xs, "x_id", "xv").join(side(ys, "y_id", "yv"), "bucket")
        .select(col("x_id"), col("y_id"),
          floor(cosineCols(col("xv"), col("yv")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("cos_micro")))
    val wx = Window.partitionBy(col("x_id"))
      .orderBy(col("cos_micro").desc, col("y_id").asc)
    val wy = Window.partitionBy(col("y_id"))
      .orderBy(col("cos_micro").desc, col("x_id").asc)
    val xtop = pin(cand.withColumn("rn", row_number().over(wx))
      .filter(col("rn") <= k))
    val xavg = xtop.groupBy("x_id")
      .agg(sum(col("cos_micro")).as("sx"), count(lit(1)).as("nx"))
    val yavg = cand.withColumn("rn", row_number().over(wy))
      .filter(col("rn") <= k)
      .groupBy("y_id")
      .agg(sum(col("cos_micro")).as("sy"), count(lit(1)).as("ny"))
    val denom = ((col("sx").cast("double") / col("nx").cast("double")) +
      (col("sy").cast("double") / col("ny").cast("double"))) / lit(2.0)
    xtop.filter(col("rn") === 1)
      .select(col("x_id"), col("y_id"), col("cos_micro"))
      .join(xavg, Seq("x_id"))
      .join(yavg, Seq("y_id"))
      .select(col("x_id"), col("y_id"), col("cos_micro"),
        graft.functions.SafeMath.roundHalfUp(
          when(denom === 0.0, lit(0.0))
            .otherwise(col("cos_micro").cast("double") / denom), 6)
          .as("margin"))
      .filter(col("margin") >= threshold)
  }
}
