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

  /** Golden-record survivorship (the MDM merge step a plain keep-latest
    * gets wrong): per entity, each FIELD independently takes its value
    * from the latest row where that field is NON-NULL — a sparse update
    * ("only the email changed") no longer wipes every other attribute
    * back to null. One entity-partitioned window per field carrying
    * `last(field, ignoreNulls)` forward in (orderCols) order, then the
    * final row per entity — a single shuffle on the entity key, same
    * scale shape as keep-latest. Output: one row per entity with the
    * merged fields plus `n_versions`. */
  def goldenRecord(df: DataFrame, entityCol: String,
      orderCols: Seq[Column], fields: Seq[String]): DataFrame = {
    // deterministic tiebreaker: when orderCols do NOT totally order the
    // rows within an entity, the last(ignoreNulls) fill and the
    // row_number pick could otherwise disagree across partitionings
    // (advice r08). A full-row content hash breaks ties identically in
    // both windows, restoring the hash-gating discipline; with a total
    // order it never fires. MapType columns are not xxhash64-hashable
    // (the call would throw — advice r10), and silently DROPPING them
    // would reintroduce the nondeterministic pick for rows differing
    // only in a map (review r10) — so map-bearing columns feed the hash
    // through their JSON serialization instead (per-row stable: the
    // same row carries the same MapData bytes wherever it shuffles).
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case ArrayType(et, _) => hasMap(et)
      case StructType(fs) => fs.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val hashable = df.schema.fields.map { f =>
      if (hasMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }.toSeq
    val base = df.withColumn("__tie", xxhash64(hashable: _*))
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols :+ col("__tie").asc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fields.foldLeft(base) { (acc, f) =>
      acc.withColumn(f, last(col(f), ignoreNulls = true).over(w))
    }
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(entityCol))
          .orderBy(orderCols.map(_.desc) :+ col("__tie").desc: _*)))
      .withColumn("n_versions", count(lit(1)).over(
        Window.partitionBy(col(entityCol))))
    filled.filter(col("__rn") === 1)
      .select(col(entityCol) +: fields.map(col) :+ col("n_versions"): _*)
  }
}
