package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SafeMath, TextFunctions}

/** Streaming exact-k weighted reservoir — the Efraimidis–Spirakis sample
  * maintained ACROSS micro-batches: because each row's priority
  * `−ln(u)/w` is a deterministic function of its id (the q216 md5 draw),
  * the global top-k by priority over everything that has arrived IS the
  * exact-k weighted sample of the whole stream, and it can be maintained
  * by folding each batch into a k-row standing state. No per-key state
  * store: the state is one tiny parquet (≤ k rows), re-read and rewritten
  * per batch — O(k + batch) work per trigger regardless of stream length.
  *
  * Replay-safe by construction: priorities are deterministic, the merge
  * dedups on id before cutting, and the state write is an atomic
  * overwrite — re-running a batch folds the same rows to the same top-k.
  */
object StreamSample {

  /** One batch's worth of (id, weight, priority) rows — the same draw as
    * Curation.prioritySample so stream and batch samples are comparable
    * (and hash-gateable against each other). */
  def prioritized(batch: DataFrame, idCol: String,
      weight: org.apache.spark.sql.Column,
      salt: String = "graft-psample"): DataFrame = {
    val key = TextFunctions.md5Key60(
      concat(lit(salt), col(idCol).cast("string")))
    val u = (key.cast("double") + lit(0.5)) / lit(1152921504606846976.0)
    batch.select(col(idCol), weight.cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("priority", SafeMath.roundHalfUp(-log(u) / col("weight"), 8))
  }

  /** Fold one micro-batch into the standing k-row reservoir at
    * `statePath`. The merged frame is localCheckpoint'd before the
    * overwrite so the read side of the state never races its own
    * rewrite. */
  def foldBatch(batch: DataFrame, statePath: String, idCol: String,
      k: Int): Unit = {
    val spark = batch.sparkSession
    val prev =
      try spark.read.parquet(statePath)
      catch { case _: Exception => batch.limit(0) }
    val next = prev.unionByName(batch)
      .dropDuplicates(Seq(idCol)) // 3 narrow cols; re-sent ids are identical
      .orderBy(col("priority").asc, col(idCol).asc)
      .limit(k)
      .localCheckpoint()
    next.write.mode(SaveMode.Overwrite).parquet(statePath)
  }

  /** Read the standing reservoir (empty schema-correct frame if the
    * stream has produced nothing yet). */
  def current(spark: SparkSession, statePath: String, idCol: String): DataFrame =
    spark.read.parquet(statePath)
      .select(col(idCol), col("weight"), col("priority"))
}
