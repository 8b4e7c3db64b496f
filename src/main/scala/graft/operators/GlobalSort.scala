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
}
