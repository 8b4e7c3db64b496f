package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact deduplication as a STREAM (W2 across micro-batches): the first
  * arrival of each key is emitted, every later re-send is suppressed by
  * the dedup state store — the streaming counterpart of
  * [[graft.operators.Dedup.exact]], for pipelines that ingest a corpus
  * incrementally instead of re-scanning it.
  *
  * State sizing at 100 TB: [[firstArrival]] keeps one state entry per
  * distinct key forever — right for bounded id spaces (dim keys, day
  * partitions). For unbounded corpora use [[firstArrivalWithin]]: ids
  * only dedup against arrivals inside the watermark horizon and state is
  * evicted past it, trading unbounded memory for bounded-lateness
  * semantics (the same trade the reference's window dedup makes).
  */
object StreamDedup {

  /** First arrival wins; one state entry per distinct key, kept forever. */
  def firstArrival(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Bounded-state variant: dedup within the `delay` watermark horizon of
    * `eventTime`; state for keys older than the horizon is evicted. */
  def firstArrivalWithin(df: DataFrame, eventTime: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark(keys)
}
