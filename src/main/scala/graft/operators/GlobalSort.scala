package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order ranking that stays parallel. The naive
  * `row_number().over(Window.orderBy(...))` plans a SinglePartition
  * exchange — the entire dataset funnels through ONE task, which is the
  * single most common accidental scale-killer in ranking/export jobs.
  * This operator keeps every stage distributed:
  *
  *   1. `repartitionByRange` on the sort key (range boundaries from
  *      Spark's deterministic reservoir sketch — ascending key ranges
  *      land on ascending partition ids);
  *   2. local `row_number` within each sorted partition;
  *   3. per-partition row counts (≤ numParts rows) prefix-summed on the
  *      driver and broadcast back as offsets.
  *
  * rank = offset(pid) + local row_number — identical to the global
  * row_number, at two parallel passes and one tiny driver aggregate.
  * Pass a UNIQUE key combination (include a tie-break column): ranks on
  * a non-total order would depend on partition-internal order.
  */
object GlobalSort {

  def withGlobalRank(df: DataFrame, keys: Seq[Column],
      numParts: Int = 32, rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(numParts, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // ≤ numParts rows to the driver — the only non-distributed step
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init)
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    val out = parted
      .withColumn("__lr", row_number().over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
    out
  }

  /** Per-group global rank in ONE machinery pass — N independent
    * [[withGlobalRank]] legs (rank fusion's shape) each pay a range
    * sample + localCheckpoint + census job; tagging the legs with an
    * INT `groupCol` and range-partitioning on (group, keys) ranks them
    * all with a single sample/checkpoint/census (advice r10: q308's two
    * rank legs). Within a partition, rows of one group are contiguous
    * and ordered by `keys`; a group's rows across partitions ascend
    * with partition id (group leads the range key), so per-(pid, group)
    * counts prefix-summed per group give exact offsets — rank within
    * each group is identical to that group's own withGlobalRank.
    * Census is ≤ numParts × |groups| rows to the driver (groups = the
    * leg count, 2..3 — bounded by construction). */
  def withGroupedRank(df: DataFrame, groupCol: String, keys: Seq[Column],
      numParts: Int = 32, rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df
      .repartitionByRange(numParts, col(groupCol) +: keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // ≤ numParts·|groups| rows to the driver — the only non-distributed
    // step (groups are small tag sets: rank legs, not data-sized keys)
    val counts = parted.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val offsets = counts.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(_._1).zip(byPid.scanLeft(0L)(_ + _._3).init)
        .map { case (pid, off) => (pid, g, off) }
    }
    val offDf = offsets.toDF("__pid", groupCol, "__off")
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(keys: _*)
    parted
      .withColumn("__lr", row_number().over(w))
      .join(broadcast(offDf), Seq("__pid", groupCol))
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }

  /** Exact k-th smallest of an integer column WITHOUT any global sort —
    * the distributed selection algorithm: iteratively census the
    * candidate value range into ≤256 equal-width buckets (one scalar
    * aggregate per pass, map-side combined), walk the bounded census on
    * the driver to find the bucket holding rank k, and narrow into it.
    * The range shrinks ≥256× per pass, so a 64-bit domain resolves in
    * ≤8 scans — each pass is a filtered scan + a ≤256-row census, no
    * shuffle of data rows, no SinglePartition exchange, no
    * TakeOrdered(k) materializing k rows (exact medians at corpus scale
    * are where `orderBy().limit(n/2)` dies). Ties are value-ties —
    * the k-th VALUE is order-free. Returns one row: (n, k, kth). */
  def exactKth(df: DataFrame, valCol: String, k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // NULLs are excluded from the ranked universe entirely — they carry
    // no order, and counting them (while the census skips them) would
    // let k walk off the census and trip the invariant assert.
    // Persisted across the ≤8 census passes: the cache holds ONE pruned
    // long column (~1% of corpus bytes, spills to disk past memory), vs
    // re-scanning the source once per pass.
    val base = df.select(col(valCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .persist()
    try {
    val head = base.agg(count(lit(1)), min(col("__v")), max(col("__v")))
      .collect()(0)
    val n = head.getLong(0)
    require(k <= n, s"k=$k exceeds non-null row count $n")
    var lo = head.getLong(1)
    var hi = head.getLong(2)
    var kk = k
    while (lo < hi) {
      // power-of-two bucket widths, ≤ 256 ids per pass: bucket id =
      // (v - lo) div 2^k, floored exactly. When the domain spans more
      // than half the 64-bit range the Long subtraction itself overflows
      // (ANSI mode throws), so that first pass runs the subtraction and
      // the integral divide in DECIMAL(38,0) — exact, no boundary
      // rounding (a scale-6 decimal DIVISION here mis-bucketed values
      // near bucket edges). Bound updates run in BigInt; the results
      // provably fit (newLo ≤ hi). ≤ 8 passes for a 64-bit domain.
      val span = BigInt(hi) - BigInt(lo) // > 0 here
      val shift = math.max(0, span.bitLength - 8) // span >> shift < 2^8
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
