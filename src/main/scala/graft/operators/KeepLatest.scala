package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-latest-per-key (SURVEY.md §2.6 W1/W2).
  *
  * The reference delegates last-write-wins dedup to ClickHouse
  * `ReplacingMergeTree(create_time)` (DDL `ClickHouse建表定稿修改版.txt:22,202`)
  * and mirrors the latest probe snapshot into `c_p_pinfo_real`
  * (`CONSOLE/sink/ProbeWindowSink.java:63-82`). In Spark this is a single
  * `row_number` over a hash-partitioned window — one shuffle on the key,
  * no sort of the full dataset, and AQE splits skewed keys. At 100 TB the
  * same operator runs as read-side compaction over the bucketed fact files.
  */
object KeepLatest {
  def apply(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
