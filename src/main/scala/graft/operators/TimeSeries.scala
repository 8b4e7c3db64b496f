package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators: turning irregular event buckets
  * into the dense, gap-free grids that downstream window math (EWMA,
  * moving averages, seasonal diffs) silently assumes.
  */
object TimeSeries {

  /** Gap-fill a keyed bucket series: materialize every bucket in the
    * corpus' [min, max] range for every key, and forward-fill missing
    * values with the key's last observation (leading gaps stay NULL —
    * there is nothing to carry). `filled` marks synthesized rows.
    *
    * Scale shape: the grid is keys × buckets built by exploding a
    * per-key `sequence` (never a driver loop); the fill is one window
    * per key ordered by bucket — parallel across keys. The global
    * [min, max] is a 2-value aggregate. For sparse multi-year keys cap
    * the range per key (join a per-key min/max instead). */
  def gapFill(df: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val r = df.agg(min(col(bucketCol)), max(col(bucketCol))).collect()(0)
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val grid = df.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(lo), lit(hi))).as(bucketCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(df, Seq(keyCol, bucketCol), "left")
      .withColumn("filled", col(valueCol).isNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }
}
