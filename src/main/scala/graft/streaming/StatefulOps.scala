package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators over `KeyValueGroupedDataset`
  * (SURVEY.md §7 "hard parts": register-vs-heartbeat with intra-batch
  * novelty).
  *
  * The reference decides register-vs-heartbeat per record against a
  * mutable Redis/MySQL dim — racy when a probe's first two messages share
  * a batch. [[firstSeen]] makes the semantics deterministic with
  * `flatMapGroupsWithState`: per-key state records whether the key was
  * ever seen; within one batch, the earliest record (by a caller-chosen
  * ordinal) is the registration and the rest are heartbeats. State lives
  * in the state store (RocksDB-backed on a cluster), checkpointed with
  * the query — replay-safe, no external store.
  */
object StatefulOps {

  final case class KeyedEvent(key: String, ordinal: Long)
  final case class SeenState(firstOrdinal: Long)
  final case class Classified(key: String, ordinal: Long, is_first: Boolean)

  /** Classify every event as first-ever-seen (registration) or repeat
    * (heartbeat), deterministically inside and across batches. */
  def firstSeen(events: Dataset[KeyedEvent]): Dataset[Classified] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, Classified](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[SeenState]) =>
          val batch = rows.toSeq.sortBy(_.ordinal)
          if (state.exists) {
            // key already registered in an earlier batch → all heartbeats
            batch.iterator.map(e => Classified(key, e.ordinal, is_first = false))
          } else {
            state.update(SeenState(batch.head.ordinal))
            batch.iterator.zipWithIndex.map { case (e, i) =>
              Classified(key, e.ordinal, is_first = i == 0)
            }
          }
      }
  }

  /** Row-preserving first-seen classifier for a streaming DataFrame: tags
    * every row with `is_first` — true iff the key was never seen in any
    * earlier batch AND the row has the earliest ordinal for its key within
    * this batch. State lives in the state store (checkpointed with the
    * query, RocksDB-backed on a cluster), so "already registered" never
    * requires re-reading an ever-growing sink directory — the state lookup
    * is O(keys in batch) regardless of stream lifetime. */
  def firstSeenRows(df: DataFrame, keyCol: String, ordinalCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.BooleanType
    val schema = df.schema
    val outSchema = schema.add("is_first", BooleanType, nullable = false)
    val keyIdx = schema.fieldIndex(keyCol)
    val ordIdx = schema.fieldIndex(ordinalCol)
    implicit val stateEnc: org.apache.spark.sql.Encoder[SeenState] =
      Encoders.product[SeenState]
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(outSchema)
    def ord(r: Row): Long = r.get(ordIdx) match {
      case null      => Long.MinValue
      case n: Number => n.longValue()
      case other     => other.toString.hashCode.toLong
    }
    df.groupByKey((r: Row) =>
        Option(r.get(keyIdx)).map(_.toString).getOrElse(""))(Encoders.STRING)
      .flatMapGroupsWithState[SeenState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[SeenState]) =>
          val batch = rows.toSeq.sortBy(ord)
          if (state.exists) {
            batch.iterator.map(r => Row.fromSeq(r.toSeq :+ false))
          } else {
            state.update(SeenState(ord(batch.head)))
            batch.iterator.zipWithIndex.map { case (r, i) =>
              Row.fromSeq(r.toSeq :+ (i == 0))
            }
          }
      }
  }

  /** Batch-mode equivalence surface (same semantics, one shot): first
    * event per key by ordinal is the registration. */
  def firstSeenBatch(df: DataFrame, keyCol: String, ordinalCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(ordinalCol))
    df.withColumn("is_first", row_number().over(w) === 1)
  }
}
