package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Mergeable sketch structures for corpus statistics at 100 TB. The hash
  * family is the md5-derived 60-bit fold ([[TextFunctions.md5Key60]]), so
  * sketches are deterministic across engines, partitionings, and replays
  * — a DuckDB oracle reproduces the exact counters, and two sketches
  * built on different clusters merge by summing counters.
  */
object Sketches {

  /** Count-min sketch over a token column: `depth` hash rows × `width`
    * counters. One explode (×depth) + one (row, bucket) aggregation with
    * full map-side combine — output is depth×width rows regardless of
    * corpus size, and sketches MERGE by summing counters (the algebraic-
    * aggregate property [[IncrementalAgg.merge]] exploits). */
  def cmSketch(tokens: DataFrame, tokCol: String, width: Int = 1024,
      depth: Int = 4, salt: String = "graft-cms"): DataFrame = {
    val rows = explode(array((0 until depth).map(lit): _*)).as("j")
    tokens.select(col(tokCol).as("__t"), rows)
      .select(col("j"),
        (TextFunctions.md5Key60(
          concat(lit(salt), col("j"), col("__t"))) % width).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
  }

  /** HLL-style distinct-count estimate that is DETERMINISTIC and
    * engine-portable — unlike `approx_count_distinct`, whose sketch is
    * Spark-internal (q40 is rows-only for exactly that reason). Classic
    * register layout (m=256, register = max over a geometric bit
    * statistic of the md5 hash; trailing-zero run instead of canonical
    * leading-zero — same geometric law), harmonic-mean estimate with the
    * standard small-range linear-counting correction. The register table
    * is m rows per group after one keyed aggregation with map-side
    * combine; the 2^-M fold runs over the idx-sorted register array, so
    * the sum has ONE order on every engine and partitioning. */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String,
      salt: String = "graft-hll", scale: Int = 6): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol, salt), groupCol, scale)

  /** The mergeable state of [[hllDistinct]]: one (group, idx, mr) row per
    * touched register. Two register tables over different slices merge by
    * MAX per register — the algebraic property the streaming gate (q94)
    * exercises. */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
      salt: String = "graft-hll"): DataFrame = {
    val m = 256
    val h = TextFunctions.md5Key60(concat(lit(salt), col(keyCol)))
    val rest = shiftright(h, 8)
    val lowbitArr = array((0 until 52).map(j => lit(1L << j)): _*)
    val rho = when(rest === 0L, lit(53))
      .otherwise(array_position(lowbitArr, rest.bitwiseAND(-rest)).cast("int"))
    df
      // NULL keys out: a null hash would put a null-idx register into the
      // sorted fold, and null ordering differs across engines
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol), (h % m).cast("int").as("idx"), rho.as("rho"))
      .groupBy(col(groupCol), col("idx")).agg(max(col("rho")).as("mr"))
  }

  /** Harmonic-mean estimate over a register table (merged or single-run). */
  def hllEstimate(registers: DataFrame, groupCol: String,
      scale: Int = 6): DataFrame = {
    val m = 256
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    val regs = registers.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("idx"), col("mr")))).as("regs"))
    val s = aggregate(col("regs"),
      (lit(m) - size(col("regs"))).cast("double"),
      (acc, r) => acc + pow(lit(2.0), -r.getField("mr").cast("double")))
    val v = lit(m) - size(col("regs"))
    regs.select(col(groupCol),
      graft.functions.SafeMath.roundHalfUp(
        TextFunctions.bindOnce(lit(alphaM2) / s) { raw =>
          when(raw <= lit(2.5 * m) && v > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
            .otherwise(raw)
        }, scale).as("est"))
  }

  /** SQL building blocks of the portable HLL, shared by [[hllDistinctSql]]
    * and [[hllOverlapSql]] so the twins can never drift apart. */
  private def hllMd5FoldSql(keyCol: String, salt: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, 16),
          j -> CAST(strpos('0123456789abcdef',
            substr(md5('$salt' || CAST($keyCol AS VARCHAR)), j, 1)) - 1 AS BIGINT))),
        (a, v) -> a * 16 + v)"""

  private val HllRhoSql: String = {
    val lowbits = (0 until 52).map(j => (1L << j).toString).mkString("[", ", ", "]")
    s"""CASE WHEN (h // 256) = 0 THEN 53
        ELSE CAST(list_position($lowbits,
          (h // 256) & (-(h // 256))) AS INTEGER) END"""
  }

  /** Harmonic-mean estimate expression over a `regs` list column (the SQL
    * twin of [[hllEstimate]]'s fold + linear-counting correction). */
  private def hllEstFoldSql: String =
    s"""list_reduce(
        list_prepend(CAST(256 - len(regs) AS DOUBLE),
          list_transform(regs, r -> power(2.0E0, -CAST(r.mr AS DOUBLE)))),
        (a, b) -> a + b)"""

  private def hllEstCaseSql(scale: Int): String = {
    val m = 256
    val alphaM2 = graft.score.ScoreEngine.fmtD(0.7213 / (1.0 + 1.079 / m) * m * m)
    graft.functions.SafeMath.roundHalfUpSql(
      s"""CASE WHEN ($alphaM2 / s) <= 640.0E0 AND v > 0
        THEN 256.0E0 * ln(256.0E0 / CAST(v AS DOUBLE))
        ELSE ($alphaM2 / s) END""", scale)
  }

  /** The exact SQL twin of [[hllDistinct]] over a relation exposing the
    * group and key columns — kept next to the operator because the two
    * must evolve in lockstep. */
  def hllDistinctSql(rel: String, groupCol: String, keyCol: String,
      salt: String = "graft-hll", scale: Int = 6): String =
    s"""WITH hh AS (SELECT $groupCol, ${hllMd5FoldSql(keyCol, salt)} AS h FROM $rel
          WHERE $keyCol IS NOT NULL),
      rr AS (SELECT $groupCol, CAST(h % 256 AS INTEGER) AS idx,
          $HllRhoSql AS rho
        FROM hh),
      regs AS (SELECT $groupCol, idx, MAX(rho) AS mr FROM rr GROUP BY 1, 2),
      g AS (SELECT $groupCol,
          list(struct_pack(idx := idx, mr := mr) ORDER BY idx) AS regs
        FROM regs GROUP BY $groupCol),
      e AS (SELECT $groupCol, $hllEstFoldSql AS s, 256 - len(regs) AS v FROM g)
    SELECT $groupCol, ${hllEstCaseSql(scale)} AS est
    FROM e"""

  /** Distinct-set OVERLAP between two groups by inclusion–exclusion over
    * the portable HLL: |A∩B| ≈ |A| + |B| − |A∪B|, where the union sketch
    * is the per-register MAX-merge of the two group sketches — the
    * algebraic trick that answers audience-overlap / shared-entity
    * questions from sketches alone. At 100 TB each side's distinct set
    * never materializes: the whole computation is one keyed register
    * aggregation (map-side combined, ≤ 2·256 rows out) and arithmetic on
    * ≤ 3·256 register rows. Deterministic md5 registers → the estimates
    * themselves hash-gate (q202). */
  def hllOverlap(df: DataFrame, groupCol: String, keyCol: String,
      ga: String, gb: String, salt: String = "graft-hll",
      scale: Int = 6): DataFrame = {
    val regs = hllRegisters(
      df.filter(col(groupCol).isin(ga, gb)), groupCol, keyCol, salt)
    val sides = regs
      .select(when(col(groupCol) === ga, lit("a")).otherwise(lit("b")).as("side"),
        col("idx"), col("mr"))
      .unionByName(regs.select(lit("u").as("side"), col("idx"), col("mr")))
      .groupBy("side", "idx").agg(max(col("mr")).as("mr"))
    val ests = hllEstimate(sides, "side", scale)
    ests.agg(
        max(when(col("side") === "a", col("est"))).as("est_a"),
        max(when(col("side") === "b", col("est"))).as("est_b"),
        max(when(col("side") === "u", col("est"))).as("est_union"))
      .select(lit(ga).as("group_a"), lit(gb).as("group_b"),
        col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0.0), (col("est_a") + col("est_b")) - col("est_union"))
          .as("est_overlap"))
  }

  /** The exact SQL twin of [[hllOverlap]]. */
  def hllOverlapSql(rel: String, groupCol: String, keyCol: String,
      ga: String, gb: String, salt: String = "graft-hll",
      scale: Int = 6): String =
    s"""WITH hh AS (SELECT
          CASE WHEN $groupCol = '$ga' THEN 'a' ELSE 'b' END AS side,
          ${hllMd5FoldSql(keyCol, salt)} AS h
        FROM $rel
        WHERE $keyCol IS NOT NULL AND $groupCol IN ('$ga', '$gb')),
      rr AS (SELECT side, CAST(h % 256 AS INTEGER) AS idx,
          $HllRhoSql AS rho
        FROM hh),
      rr2 AS (SELECT side, idx, rho FROM rr
        UNION ALL SELECT 'u' AS side, idx, rho FROM rr),
      regs AS (SELECT side, idx, MAX(rho) AS mr FROM rr2 GROUP BY 1, 2),
      g AS (SELECT side,
          list(struct_pack(idx := idx, mr := mr) ORDER BY idx) AS regs
        FROM regs GROUP BY side),
      e AS (SELECT side, $hllEstFoldSql AS s, 256 - len(regs) AS v FROM g),
      est AS (SELECT side, ${hllEstCaseSql(scale)} AS est FROM e),
      sel AS (SELECT
          MAX(CASE WHEN side = 'a' THEN est END) AS est_a,
          MAX(CASE WHEN side = 'b' THEN est END) AS est_b,
          MAX(CASE WHEN side = 'u' THEN est END) AS est_union
        FROM est)
    SELECT '$ga' AS group_a, '$gb' AS group_b, est_a, est_b, est_union,
      greatest(0.0E0, (est_a + est_b) - est_union) AS est_overlap
    FROM sel"""

  /** Portable Bloom filter over a key column: `mBits` bits stored as
    * mBits/32 BIGINT words — only the low 32 bits of each word are used,
    * so the `1 << bit` shift is identical on every engine (no sign-bit
    * edge at shift 63). `k` probes per key on the md5 family. Output is
    * one (word, bits) row per touched word — at most mBits/32 rows
    * regardless of corpus size, so the built filter broadcasts for
    * membership joins; two filters over different slices MERGE by
    * per-word `bit_or` (the [[IncrementalAgg.merge]] property). The
    * compact alternative to shipping a full key set for decontamination
    * membership tests at 100 TB. */
  def bloomBuild(df: DataFrame, keyCol: String, mBits: Int = 4096,
      k: Int = 5, salt: String = "graft-bloom"): DataFrame = {
    val probes = explode(array((0 until k).map(lit): _*)).as("j")
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"), probes)
      .select((TextFunctions.md5Key60(
        concat(lit(salt), col("j"), col("__k"))) % mBits).as("h"))
      .select((col("h") / 32).cast("int").as("word"),
        (col("h") % 32).cast("int").as("bit"))
      .groupBy("word")
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("bits"))
  }

  /** Membership probe against a built filter: returns one row per
    * distinct probe key with `in_bloom` = all k probed bits set (no
    * false negatives; false-positive rate set by mBits/k vs the build
    * cardinality — and deterministic, so the gate hash-checks even the
    * collisions). The filter side is ≤ mBits/32 rows → broadcast. */
  def bloomMightContain(bloom: DataFrame, probes: DataFrame, keyCol: String,
      mBits: Int = 4096, k: Int = 5, salt: String = "graft-bloom"): DataFrame =
    probes.select(col(keyCol),
        explode(array((0 until k).map(lit): _*)).as("j"))
      .select(col(keyCol), (TextFunctions.md5Key60(
        concat(lit(salt), col("j"), col(keyCol).cast("string"))) % mBits).as("h"))
      .select(col(keyCol), (col("h") / 32).cast("int").as("word"),
        (col("h") % 32).cast("int").as("bit"))
      .join(broadcast(bloom), Seq("word"), "left")
      .select(col(keyCol),
        coalesce(expr("(shiftright(bits, bit) & 1) = 1"), lit(false)).as("__hit"))
      .groupBy(col(keyCol))
      .agg(min(col("__hit")).as("in_bloom"))

  /** Bucket id of the log-linear (HDR-histogram / DDSketch-style)
    * quantile sketch: values below 2^m map to themselves (exact linear
    * region); above, the top m bits after the leading one sub-divide
    * each power-of-two range, bounding RELATIVE error by 2^-m. The msb
    * comes from `length(bin(x))` — pure integer/string ops, so the
    * binning is bit-identical on every engine (a log()-based DDSketch
    * bucket is 1-ulp fragile at bucket boundaries and could never be
    * hash-gated). Input must be a non-negative integer (scale doubles
    * to cents/micros first — with floor(), which both engines apply
    * identically to the same double). */
  def hdrBucket(x: Column, subBits: Int = 6): Column = {
    val cap = 1L << subBits
    val msb = (length(bin(x)) - 1).cast("long")
    val shift = (msb - subBits).cast("int")
    val top = floor(x.cast("double") / pow(lit(2.0), shift.cast("double")))
      .cast("long")
    when(x < cap, x.cast("long"))
      .otherwise((shift + 1).cast("long") * cap + top - cap)
  }

  /** The same bucket id in DuckDB SQL (kept beside the operator — the
    * two must evolve in lockstep). */
  def hdrBucketSql(x: String, subBits: Int = 6): String = {
    val cap = 1L << subBits
    val msb = s"(length(bin($x)) - 1)"
    s"""CASE WHEN $x < $cap THEN CAST($x AS BIGINT)
        ELSE CAST(($msb - $subBits + 1) * $cap
          + ($x // CAST(power(2, $msb - $subBits) AS BIGINT)) - $cap
          AS BIGINT) END"""
  }

  /** Mergeable quantile histogram: one (group, bucket, cnt) row per
    * touched bucket — O(groups × 64·m) rows regardless of corpus size
    * (a 100 TB column collapses to a few thousand counters per group),
    * built in one aggregation with full map-side combine. Histograms
    * over different slices (partitions, days, streams) MERGE by summing
    * cnt per (group, bucket) — the algebraic property the streamed gate
    * exercises. */
  def hdrHistogram(df: DataFrame, groupCol: String, valCol: String,
      subBits: Int = 6): DataFrame =
    df.select(col(groupCol), hdrBucket(col(valCol), subBits).as("bucket"))
      .groupBy(col(groupCol), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a (merged) histogram: rank = ⌈n·q⌉ with
    * exact ppm integer arithmetic, answer = lower bound of the bucket
    * holding that rank (deterministic; relative error ≤ 2^-m). The
    * histogram is tiny, so the cumulative walk is a window over a few
    * thousand rows however large the corpus was. */
  def hdrQuantiles(hist: DataFrame, groupCol: String, qPpms: Seq[Int],
      subBits: Int = 6): DataFrame = {
    val cap = 1L << subBits
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bucket"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val b = col("bucket")
    val est = when(b < 2L * cap, b).otherwise(
      (lit(cap) + b % cap) *
        pow(lit(2.0), (expr(s"bucket div $cap") - 1L).cast("double"))
          .cast("long"))
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wg))
      .select(col(groupCol), b, col("cnt"), col("cum"), col("n"),
        explode(array(qPpms.map(q => lit(q.toLong)): _*)).as("q_ppm"))
      .filter(col("cum") >= expr("greatest(1L, (n * q_ppm + 999999) div 1000000)") &&
        (col("cum") - col("cnt")) < expr("greatest(1L, (n * q_ppm + 999999) div 1000000)"))
      .select(col(groupCol), col("q_ppm"), col("n").as("n_values"),
        est.as("est"))
  }

  /** Join-cardinality estimate from two count-min sketches — the
    * AMS-style sketch inner product: |A ⋈ₖ B| = Σₖ cntA(k)·cntB(k), and
    * each CMS depth row estimates that sum as Σ_bucket cA·cB (an
    * overestimate — collisions only add), so min over the depth rows is
    * the classic CM bound. This is the optimizer-statistics question —
    * "how big is this join going to be?" — answered WITHOUT running the
    * join, from two depth×width counter tables that were each built in
    * one map-side-combined pass and that merge across slices. At 100 TB
    * the sketches are the only thing that moves: the estimate itself
    * joins 2·depth·width counter rows. Deterministic (md5 family) → the
    * estimate hash-gates (q204).
    *
    * Two robustness rules: the bucket join is a LEFT join with the b-side
    * counter coalesced to 0, so a depth row with zero shared buckets
    * contributes an inner product of 0 instead of vanishing from the
    * min() — fully disjoint key sets estimate 0 rows, not NULL; and the
    * counters ride as DECIMAL(18,0) so the Σ ca·cb product cannot wrap
    * BIGINT at advertised scale (per-bucket counts ~10⁹ give ~10¹⁸
    * products summed over `width` buckets — Spark wraps silently
    * non-ANSI, while an oracle summing in a wider type would not: the
    * passes-at-small-SF/breaks-at-10× class). The sum is exact up to
    * 10³⁸ and the oracle mirrors it in HUGEINT; only the final one-row
    * estimate is cast back to BIGINT (it is an estimate — a join past
    * 9.2·10¹⁸ rows needs no sketch to be declared enormous). */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      width: Int = 1024, depth: Int = 4,
      salt: String = "graft-cms"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def sketch(df: DataFrame, key: String, as: String) =
      cmSketch(df.filter(col(key).isNotNull)
          .select(col(key).cast("string").as("__t")), "__t", width, depth, salt)
        .select(col("j"), col("bucket"), col("c").as(as))
    sketch(a, aKey, "ca")
      .join(sketch(b, bKey, "cb"), Seq("j", "bucket"), "left")
      .groupBy(col("j"))
      .agg(sum(col("ca").cast(DecimalType(18, 0)) *
        coalesce(col("cb"), lit(0L)).cast(DecimalType(18, 0))).as("ip"))
      .agg(min(col("ip")).cast("long").as("est_rows"))
  }

  /** Point estimate for each query term: min over the depth rows of the
    * term's counter — ≥ the true count, with the classic CM overestimate
    * bound. The sketch side is tiny (depth×width) → broadcast join. */
  def cmsEstimate(sketch: DataFrame, terms: Seq[String], width: Int = 1024,
      depth: Int = 4, salt: String = "graft-cms"): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    cmsEstimateFrame(sketch, terms.toDF("term"), "term", width, depth, salt)
  }

  /** [[cmsEstimate]] for a whole DataFrame of candidate terms (e.g.
    * every distinct token, for heavy-hitter extraction): the sketch side
    * stays depth×width rows → broadcast, the candidate side shuffles
    * once on (j, bucket). */
  def cmsEstimateFrame(sketch: DataFrame, terms: DataFrame, termCol: String,
      width: Int = 1024, depth: Int = 4,
      salt: String = "graft-cms"): DataFrame =
    terms
      .select(col(termCol).as("term"),
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .select(col("term"), col("j"),
        (TextFunctions.md5Key60(
          concat(lit(salt), col("j"), col("term"))) % width).as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
