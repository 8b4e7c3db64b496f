package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global total-order ranking that stays parallel. The naive
  * `row_number().over(Window.orderBy(...))` plans a SinglePartition
  * exchange — the entire dataset funnels through ONE task, which is the
  * single most common accidental scale-killer in ranking/export jobs.
  * This operator keeps every stage distributed:
  *
  *   1. `repartitionByRange` on the sort key (range boundaries from
  *      Spark's deterministic reservoir sketch — ascending key ranges
  *      land on ascending partition ids), sorted within partitions;
  *   2. local row index = monotonically_increasing_id minus the
  *      partition's min id (ids increment by one in partition row
  *      order, so after the sort the id IS the local rank — no
  *      WindowExec, and crucially no second shuffle: the window form
  *      re-clustered the checkpoint by hash(__pid) at ambient width,
  *      which at bench scale was 32 near-empty sort tasks per rank
  *      pass, the measured bulk of q308's cost);
  *   3. per-partition (count, min_id) census (≤ numParts rows)
  *      prefix-summed on the driver and broadcast back as offsets.
  *
  * rank = offset(pid) + (id − min_id(pid)) + 1 — identical to the
  * global row_number, at one range shuffle, one tiny census aggregate,
  * and a broadcast-join projection. The id projection is
  * non-deterministic in Catalyst's sense, so the optimizer cannot
  * reorder it below the sort; the checkpoint freezes it before the
  * census and the rank projection read it twice. Partitions are capped
  * at 2^33 rows by the id contract — 8.6 B rows per partition, far
  * past any sane partition size. Pass a UNIQUE key combination
  * (include a tie-break column): ranks on a non-total order would
  * depend on partition-internal order.
  *
  * `numParts = 0` (default) ranges at the session shuffle width and
  * lets AQE coalesce small frames below it
  * ([[graft.core.Adaptive.withSmallShuffleCoalesce]] scopes the
  * materialization) — a bench-scale frame collapses to a few tasks
  * while a 100 TB corpus keeps the configured width; pass an explicit
  * width to pin it (AQE honors user-specified counts).
  */
object GlobalSort {

  /** Range-partition + in-partition sort + frozen local row ids — the
    * shared first pass of both rank forms. */
  private def sortedWithIds(df: DataFrame, numParts: Int,
      keys: Seq[Column]): DataFrame = {
    val ranged =
      if (numParts > 0) df.repartitionByRange(numParts, keys: _*)
      else df.repartitionByRange(keys: _*)
    graft.core.Adaptive.withSmallShuffleCoalesce(df.sparkSession) {
      ranged.sortWithinPartitions(keys: _*)
        .withColumn("__mid", monotonically_increasing_id())
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint()
    }
  }

  def withGlobalRank(df: DataFrame, keys: Seq[Column],
      numParts: Int = 0, rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = sortedWithIds(df, numParts, keys)
    // ≤ numParts rows to the driver — the only non-distributed step
    val counts = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n"), min(col("__mid")).as("m0"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
      .zip(counts.map(_._3))
      .map { case ((pid, off), m0) => (pid, off, m0) }
    val offDf = offsets.toSeq.toDF("__pid", "__off", "__m0")
    parted
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(rankCol,
        col("__off") + (col("__mid") - col("__m0")) + lit(1L))
      .drop("__pid", "__mid", "__off", "__m0")
  }

  /** Per-group global rank in ONE machinery pass — N independent
    * [[withGlobalRank]] legs (rank fusion's shape) each pay a range
    * sample + localCheckpoint + census job; tagging the legs with an
    * INT `groupCol` and range-partitioning on (group, keys) ranks them
    * all with a single sample/checkpoint/census (advice r10: q308's two
    * rank legs). Within a partition, rows of one group are contiguous
    * and ordered by `keys` (the in-partition sort leads with the
    * group), so min_id per (pid, group) anchors that group's local
    * indices; a group's rows across partitions ascend with partition
    * id (group leads the range key), so per-(pid, group) counts
    * prefix-summed per group give exact offsets — rank within each
    * group is identical to that group's own withGlobalRank. Census is
    * ≤ numParts × |groups| rows to the driver (groups = the leg count,
    * 2..3 — bounded by construction). */
  def withGroupedRank(df: DataFrame, groupCol: String, keys: Seq[Column],
      numParts: Int = 0, rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = sortedWithIds(df, numParts, col(groupCol) +: keys)
    // ≤ numParts·|groups| rows to the driver — the only non-distributed
    // step (groups are small tag sets: rank legs, not data-sized keys)
    val counts = parted.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("n"), min(col("__mid")).as("m0"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val offsets = counts.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(r => (r._1, r._4))
        .zip(byPid.scanLeft(0L)(_ + _._3).init)
        .map { case ((pid, m0), off) => (pid, g, off, m0) }
    }
    val offDf = offsets.toDF("__pid", groupCol, "__off", "__m0")
    parted
      .join(broadcast(offDf), Seq("__pid", groupCol))
      .withColumn(rankCol,
        col("__off") + (col("__mid") - col("__m0")) + lit(1L))
      .drop("__pid", "__mid", "__off", "__m0")
  }

  /** Exact k-th smallest of an integer column WITHOUT any global sort —
    * the distributed selection algorithm: iteratively census the
    * candidate value range into ≤2^16 equal-width buckets (one scalar
    * aggregate per pass, map-side combined), walk the bounded census on
    * the driver to find the bucket holding rank k, and narrow into it.
    * The range shrinks ≥2^16× per pass, so a 64-bit domain resolves in
    * ≤4 scans (a 2^24 price-cents domain in 2) — each pass is a
    * filtered scan + a ≤65536-row census (≈1 MB to the driver —
    * bounded), no shuffle of data rows, no SinglePartition exchange, no
    * TakeOrdered(k) materializing k rows (exact medians at corpus scale
    * are where `orderBy().limit(n/2)` dies). Radix 2^16 over the
    * original 2^8: per-pass census cost is unchanged at corpus scale
    * (map-side combine over ≤65536 groups) and the PASS COUNT halves —
    * passes are full filtered scans, the thing that costs at 100 TB
    * (and the driver job floor that costs at bench scale; r11 task).
    * Ties are value-ties — the k-th VALUE is order-free.
    * Returns one row: (n, k, kth). */
  def exactKth(df: DataFrame, valCol: String, k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    selectKth(df, valCol, Some(k))
  }

  /** Exact median (LOWER median for even n: rank ceil(n/2) = (n+1)/2 —
    * n=1000 selects rank 500, not 501) — [[exactKth]] with k derived
    * from the SAME head aggregate that seeds the census bounds, so
    * callers don't pay a separate count() job to compute k. */
  def exactMedian(df: DataFrame, valCol: String): DataFrame =
    selectKth(df, valCol, None)

  private def selectKth(df: DataFrame, valCol: String,
      kOpt: Option[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NULLs are excluded from the ranked universe entirely — they carry
    // no order, and counting them (while the census skips them) would
    // let k walk off the census and trip the invariant assert.
    // Persisted across the ≤4 census passes: the cache holds ONE pruned
    // long column (~1% of corpus bytes, spills to disk past memory), vs
    // re-scanning the source once per pass.
    val base = df.select(col(valCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .persist()
    try {
    val head = base.agg(count(lit(1)), min(col("__v")), max(col("__v")))
      .collect()(0)
    val n = head.getLong(0)
    val k = kOpt.getOrElse((n + 1L) / 2L)
    require(k >= 1 && k <= n, s"k=$k outside non-null row count $n")
    var lo = head.getLong(1)
    var hi = head.getLong(2)
    var kk = k
    while (lo < hi) {
      // power-of-two bucket widths, ≤ 2^16 ids per pass: bucket id =
      // (v - lo) div 2^k, floored exactly. When the domain spans more
      // than half the 64-bit range the Long subtraction itself overflows
      // (ANSI mode throws), so that first pass runs the subtraction and
      // the integral divide in DECIMAL(38,0) — exact, no boundary
      // rounding (a scale-6 decimal DIVISION here mis-bucketed values
      // near bucket edges). Bound updates run in BigInt; the results
      // provably fit (newLo ≤ hi). ≤ 4 passes for a 64-bit domain.
      val span = BigInt(hi) - BigInt(lo) // > 0 here
      val shift = math.max(0, span.bitLength - 16) // span >> shift < 2^16
      val step = BigInt(1) << shift
      // Long.MinValue can't be written as a SQL literal (unary-minus
      // overflow in the parser) — splice bounds through string casts
      val bucket =
        if (span <= BigInt(Long.MaxValue))
          expr(s"(__v - CAST('$lo' AS BIGINT)) div ${step.toLong}L")
        else
          expr(s"(CAST(__v AS DECIMAL(38,0)) - " +
            s"CAST('$lo' AS DECIMAL(38,0))) div " +
            s"CAST('$step' AS DECIMAL(38,0))")
      val census = base
        .filter(col("__v") >= lo && col("__v") <= hi)
        .groupBy(bucket.as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var cum = 0L
      var i = 0
      var found = false
      while (!found && i < census.length) {
        val (b, c) = census(i)
        if (cum + c >= kk) {
          kk -= cum
          val newLo = BigInt(lo) + BigInt(b) * step
          val newHi = (newLo + step - 1).min(BigInt(hi))
          lo = newLo.toLong
          hi = newHi.toLong
          found = true
        } else { cum += c; i += 1 }
      }
      assert(found, "rank walked off the census — concurrent mutation?")
    }
    Seq((n, k, lo)).toDF("n", "k", "kth")
    } finally base.unpersist(blocking = false) // also on require/assert throws
  }
}
