package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage layout for co-located joins (SURVEY §2 "partitioning
  * & shuffle" at 100 TB).
  *
  * A fact table that is repeatedly joined or aggregated on one key
  * (probe_id, task_param_id — the reference's sipHash64 Distributed keys,
  * see [[OutputCatalog]]) should be written bucketed on that key: both
  * sides of a same-key, same-bucket-count join arrive pre-partitioned,
  * and Spark elides the shuffle entirely (SortMergeJoin with no Exchange
  * — the dominant cost of a 100 TB fact⋈fact join). Bucket counts should
  * match across tables that join each other and be sized so one bucket's
  * rows fit an executor's memory comfortably (buckets ≈ totalBytes /
  * 256 MB, rounded to a power of two).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table registered in
    * the session catalog. Joins/aggregations on `keyCols` against any
    * table bucketed the same way run shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      numBuckets: Int, keyCols: Seq[String]): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
