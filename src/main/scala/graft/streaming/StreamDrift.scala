package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{SafeMath, TextFunctions}

/** Streaming distribution-drift alarm: each micro-batch's token
  * distribution is scored by KL divergence against a FROZEN baseline
  * (the corpus the pipeline was tuned on), and batches whose KL crosses
  * the threshold raise an alarm row — the standing guard every
  * continuous-ingest curation pipeline runs so a crawler gone wrong (new
  * spam template, encoding regression, language shift) pages a human
  * BEFORE a day of bad data lands in the lake.
  *
  * Per batch: one token aggregate over the batch, one vocab-keyed left
  * join against the baseline table, one scalar KL sum — all map-side
  * combined; nothing corpus-sized is kept. Results append under
  * `__batch=id` via dynamic partition overwrite (replay rewrites its own
  * row, the exactly-once recipe). FP: the q127 KL discipline — p and q
  * are single exact divisions, each term uses scale-8-rounded ln and is
  * DECIMAL-summed, the final KL rounds at `scale`.
  */
object StreamDrift {

  /** Build the frozen baseline from a reference corpus: (tok, cnt_b)
    * plus its totals, to pass to every [[foldBatch]]. */
  def baseline(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt_b"))

  /** Score one micro-batch against the baseline and append its row
    * (batch, n_tokens, kl, alarm) to `statePath`. `baselineTotal` and
    * `baselineVocab` are the frozen Σcnt_b and |vocab| (collect them
    * once at stream start — they must not drift batch to batch). */
  def foldBatch(batch: DataFrame, textCol: String, base: DataFrame,
      baselineTotal: Long, baselineVocab: Long, statePath: String,
      batchId: Long, threshold: Double, scale: Int = 6): Unit = {
    val spark = batch.sparkSession
    val toks = batch
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the batch total AND the KL terms
    val totRow = toks.agg(sum(col("cnt"))).head()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val out =
      if (total == 0L)
        spark.createDataFrame(Seq((0L, 0.0, false)))
          .toDF("n_tokens", "kl", "alarm")
      else {
        // q = add-one-smoothed baseline probability, defined for tokens
        // the baseline never saw (the drift signal itself)
        val p = col("cnt").cast("double") / lit(total.toDouble)
        val q = (coalesce(col("cnt_b"), lit(0L)) + lit(1L)).cast("double") /
          lit((baselineTotal + baselineVocab).toDouble)
        val klRow = toks.join(base, Seq("tok"), "left")
          .select(SafeMath.roundHalfUp(
              p * (SafeMath.roundHalfUp(log(p), 8) -
                SafeMath.roundHalfUp(log(q), 8)), 8)
            .cast(DecimalType(28, 8)).as("t8"))
          .agg(SafeMath.roundHalfUp(sum(col("t8")).cast("double"), scale))
          .head()
        val kl = klRow.getDouble(0)
        spark.createDataFrame(Seq((total, kl, kl >= threshold)))
          .toDF("n_tokens", "kl", "alarm")
      }
    out.withColumn("batch", lit(batchId))
      .select("batch", "n_tokens", "kl", "alarm")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(statePath)
    toks.unpersist(blocking = false)
  }
}
