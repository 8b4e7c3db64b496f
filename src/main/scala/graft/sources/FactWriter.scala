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

  /** ReplacingMergeTree-style COMPACTION — the read-side
    * [[graft.operators.KeepLatest]] applied back to STORAGE: rewrite the
    * fact's day partitions with last-write-wins resolved, each partition
    * collapsed to one file re-clustered on the MergeTree order key (so
    * zone maps prune again after a day of small appends). This is the
    * maintenance job the reference delegates to ClickHouse's background
    * merges; in Spark it is one keyed window + one day-clustered shuffle
    * + a dynamic partition overwrite — run it per day partition on a
    * schedule, not per query.
    *
    * The resolved rows are localCheckpoint'd before the overwrite (the
    * [[deleteSubjects]] self-rewrite rule). `repartition(col(day))`
    * gives every day to exactly one task, so each partition directory
    * lands as ONE file (spec-asserted). Returns the per-partition
    * report: (partition_value, rows_before, dups_removed, rows_after).
    */
  def compactPartitions(spark: org.apache.spark.sql.SparkSession,
      dir: String, dayBucketCol: String, keyCols: Seq[String],
      versionOrder: Seq[org.apache.spark.sql.Column],
      clusterCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val fact = spark.read.parquet(dir)
    val resolved = graft.operators.KeepLatest(fact, keyCols, versionOrder)
      .localCheckpoint()
    val report = fact.groupBy(col(dayBucketCol))
      .agg(count(lit(1)).as("rows_before"))
      .join(resolved.groupBy(col(dayBucketCol))
        .agg(count(lit(1)).as("rows_after")), Seq(dayBucketCol))
      .select(col(dayBucketCol).as("partition_value"), col("rows_before"),
        (col("rows_before") - col("rows_after")).as("dups_removed"),
        col("rows_after"))
      .localCheckpoint()
    resolved
      .repartition(col(dayBucketCol))
      .sortWithinPartitions(clusterCols: _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dayBucketCol).parquet(dir)
    report
  }

  /** GDPR deletion APPLY with MINIMAL partition rewrite — the execution
    * half of the q151 blast-radius audit. One broadcast semi-join census
    * finds the partitions that contain any subject row (bounded by the
    * calendar, collected); ONLY those partitions are rewritten with the
    * subjects anti-joined out, via dynamic partition overwrite; every
    * other partition's files stay byte-untouched (asserted in
    * FactWriterSpec). At 100 TB the difference between "rewrite the 3
    * partitions the subject touched" and "rewrite the table" is the
    * entire compliance-job budget.
    *
    * The surviving rows and the report are localCheckpoint'd BEFORE the
    * overwrite: Spark refuses a write whose plan still reads the output
    * path, and pinning the row set first also makes a failed write
    * re-runnable. A partition whose every row belonged to subjects has
    * nothing left to overwrite it with — dynamic overwrite skips it —
    * so those directories are dropped explicitly (the rows_after = 0
    * branch, spec-covered).
    *
    * Returns the per-partition rewrite report:
    * (partition_value, rows_before, rows_removed, rows_after).
    */
  def deleteSubjects(spark: org.apache.spark.sql.SparkSession, dir: String,
      dayBucketCol: String, keyCol: String, subjects: DataFrame,
      subjectCol: String): DataFrame = {
    val fact = spark.read.parquet(dir)
    val subj = broadcast(
      subjects.select(col(subjectCol).as("__subject")).distinct())
    val affected = fact
      .join(subj, fact(keyCol) === col("__subject"), "left_semi")
      .select(col(dayBucketCol)).distinct()
      // ≤ distinct day partitions touched — bounded by the table's
      // partition count, never its row count
      .collect().map(_.get(0)).toSeq
    if (affected.isEmpty)
      return fact.select(col(dayBucketCol).as("partition_value"),
        lit(0L).as("rows_before"), lit(0L).as("rows_removed"),
        lit(0L).as("rows_after")).limit(0)
    val slice = fact.filter(col(dayBucketCol).isin(affected: _*))
    val report = slice
      .join(subj, slice(keyCol) === col("__subject"), "left")
      .groupBy(col(dayBucketCol))
      .agg(count(lit(1)).as("rows_before"),
        sum(when(col("__subject").isNotNull, 1L).otherwise(0L))
          .as("rows_removed"))
      .select(col(dayBucketCol).as("partition_value"), col("rows_before"),
        col("rows_removed"),
        (col("rows_before") - col("rows_removed")).as("rows_after"))
      .localCheckpoint()
    val keep = slice
      .join(subj, slice(keyCol) === col("__subject"), "left_anti")
      .localCheckpoint()
    keep.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dayBucketCol).parquet(dir)
    // fully-emptied partitions produce no rows for dynamic overwrite to
    // replace — drop their directories explicitly
    report.filter(col("rows_after") === 0L)
      .select(col("partition_value").cast("string"))
      .collect() // ≤ one row per day partition — bounded by construction
      .foreach { r =>
        val d = new java.io.File(dir, s"$dayBucketCol=${r.getString(0)}")
        Option(d.listFiles()).foreach(_.foreach(_.delete()))
        d.delete()
      }
    report
  }

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
