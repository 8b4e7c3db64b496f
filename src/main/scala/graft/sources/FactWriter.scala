package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fact-table storage layout (SURVEY.md §4 O6-O8; BASELINE.md partitioning).
  *
  * The reference's ClickHouse tables are PARTITIONed by day bucket, ORDERed
  * by (task_param_id, test_time, probe_id) within parts, sharded by
  * sipHash64, TTL'd at 3 months, and deduplicated by ReplacingMergeTree.
  * The Spark-native equivalents:
  *
  *  - `partitionBy(<day bucket>)` directories → partition pruning on every
  *    time-range scan (the dominant predicate at 100 TB);
  *  - `repartition(shardCol)` + `sortWithinPartitions(orderCols)` → files
  *    clustered like the ORDER BY key, so min/max zone maps prune on the
  *    sort key too; sharding falls out of hash partitioning;
  *  - retention = dropping whole day partitions (a metadata delete);
  *  - last-write-wins = read-side [[graft.operators.KeepLatest]] (or a
  *    compaction job rewriting a partition with it).
  */
object FactWriter {

  def write(facts: DataFrame, outDir: String, dayBucketCol: String,
      shardCol: String, orderCols: Seq[String], shards: Int = 32): Unit =
    facts
      .repartition(shards, col(shardCol))
      .sortWithinPartitions(orderCols.map(col): _*)
      .write
      .mode("append")
      .partitionBy(dayBucketCol)
      .parquet(outDir)

  /** Schema-evolution read (SURVEY.md §2.2 K7 / §4 O10): the reference's
    * dead-code sink auto-ALTERed ClickHouse tables when new columns
    * appeared; with parquet appends, new columns just land in newer files
    * and `mergeSchema` unifies them at read (old rows null-filled). */
  def readEvolved(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Retention: drop day partitions older than `cutoffEpochDay` — a
    * directory-level delete, no data rewrite (the TTL analog). */
  def expiredPartitions(outDir: String, dayBucketCol: String,
      cutoffEpochSec: Long): Seq[String] = {
    val root = new java.io.File(outDir)
    Option(root.listFiles()).getOrElse(Array.empty).toSeq
      .filter(_.isDirectory)
      .filter { d =>
        d.getName.startsWith(s"$dayBucketCol=") &&
          d.getName.stripPrefix(s"$dayBucketCol=").toLongOption
            .exists(_ < cutoffEpochSec)
      }
      .map(_.getAbsolutePath)
  }
}
