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
    // Null keys get a dedicated state slot that CANNOT collide with a
    // real key: every real key is "k:"-prefixed, so a genuine "" key and
    // a null key no longer share one registration slot.
    df.groupByKey((r: Row) =>
        Option(r.get(keyIdx)).map("k:" + _.toString).getOrElse("\u0000"))(
        Encoders.STRING)
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

  final case class EwmaEvent(key: String, ordinal: Long, xs: Long)
  final case class EwmaState(e: Long, n: Long)
  final case class EwmaSnapshot(key: String, n_events: Long, ewma: Long)

  /** Fixed-point exponentially-weighted moving average maintained ACROSS
    * micro-batches: per-key state is (current ewma, event count), each
    * batch folds its events in ordinal order, and the post-batch
    * snapshot is emitted — the latest snapshot per key is the stream's
    * answer. `xs` is the PRE-SCALED integer reading (caller picks the
    * scale) and the update is `e' = (num·x + (den−num)·e) div den` —
    * pure integer arithmetic, so the state is bit-identical across
    * replays, engines, and restart points, which a double EWMA can
    * never be. State size is O(keys), not O(events). */
  def ewmaFixedPoint(events: Dataset[EwmaEvent], num: Long,
      den: Long): Dataset[EwmaSnapshot] = {
    import events.sparkSession.implicits._
    require(num > 0 && den > num, "need 0 < num < den")
    events.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[EwmaEvent], state: GroupState[EwmaState]) =>
          val batch = rows.toSeq.sortBy(_.ordinal)
          var (e, n) = state.getOption.map(s => (s.e, s.n)).getOrElse((0L, 0L))
          batch.foreach { ev =>
            e = if (n == 0L) ev.xs else (num * ev.xs + (den - num) * e) / den
            n += 1L
          }
          state.update(EwmaState(e, n))
          Iterator.single(EwmaSnapshot(key, n, e))
      }
  }

  /** Batch-mode equivalence surface (same semantics, one shot): first
    * event per key by ordinal is the registration. */
  def firstSeenBatch(df: DataFrame, keyCol: String, ordinalCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(ordinalCol))
    df.withColumn("is_first", row_number().over(w) === 1)
  }

  final case class HbEvent(key: String, ts: Long, et: java.sql.Timestamp)
  final case class HbState(last: Long, n: Long)
  final case class StaleAlert(key: String, last_ts: Long, n_events: Long)

  /** Missing-heartbeat detection — the alerting pattern every device
    * fleet runs: per-key state remembers the latest event time and arms
    * an EVENT-TIME TIMEOUT at `last + gapSeconds`; when the stream's
    * watermark passes that point without a newer event, the key fires a
    * stale alert and its state is dropped (re-registration starts
    * fresh). This is the one stateful-streaming mechanism the other
    * jobs don't exercise (they run GroupStateTimeout.NoTimeout):
    * timeouts fire from WATERMARK progress, including Spark's trailing
    * no-data batch when the final watermark advance expires timers.
    * State is O(keys); alerts are emitted exactly once per quiet
    * period. Input must carry `withWatermark` on `et` (the caller owns
    * the delay policy). */
  def staleKeys(events: Dataset[HbEvent], gapSeconds: Long): Dataset[StaleAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[HbState, StaleAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[HbEvent], state: GroupState[HbState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(StaleAlert(key, st.last, st.n))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(HbState(Long.MinValue, 0L))
            val last = math.max(prev.last, batch.map(_.ts).max)
            state.update(HbState(last, prev.n + batch.size))
            state.setTimeoutTimestamp((last + gapSeconds) * 1000L)
            Iterator.empty
          }
      }
  }

  final case class CotEvent(key: String, ts: Long, ordinal: Long, x: Long,
      et: java.sql.Timestamp)
  final case class CotState(bufN: Long, bufSum: Long, fires: Long)
  final case class CotFire(key: String, window_start: Long, fire_seq: Long,
      n_events: Long, sum_x: Long, early: Boolean)

  /** Count-OR-time early-fire window trigger — the reference's custom
    * Flink trigger (`CONSOLE/time/TimeCountMessageTrigger.java:46-104`:
    * FIRE_AND_PURGE when the keyed window's buffered count reaches
    * `maxCount`, otherwise when the window's timer expires), re-expressed
    * as a deterministic Structured Streaming state machine. Per
    * (key, tumbling window) the state is the buffered pane (count + sum
    * + fires-so-far); each micro-batch folds its events in ordinal
    * order, emitting a fire row the instant the pane reaches `maxCount`
    * (`early=true`, pane purged — each fire covers ONLY events since the
    * last fire, Flink's FIRE_AND_PURGE semantics); the event-time
    * timeout at window end flushes the final partial pane
    * (`early=false`). The reference's processing-time timer is replaced
    * by an event-time timer so the result is replay-deterministic —
    * which the Flink original is not (its fires depend on wall-clock).
    *
    * State is O(live windows), three longs each; panes never buffer raw
    * events (the fold aggregates in place), so a hot key at 100 TB costs
    * the same state as a cold one. Input must carry `withWatermark` on
    * `et`; a fire's identity (key, window_start, fire_seq) is stable
    * across replays, so an idempotent sink dedups on it. */
  def countOrTimeFires(events: Dataset[CotEvent], maxCount: Int,
      windowSeconds: Long): Dataset[CotFire] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.key, e.ts - e.ts % windowSeconds))
      .flatMapGroupsWithState[CotState, CotFire](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: (String, Long), rows: Iterator[CotEvent], state: GroupState[CotState]) =>
          val (key, wstart) = k
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.bufN > 0L)
              Iterator.single(CotFire(key, wstart, st.fires, st.bufN,
                st.bufSum, early = false))
            else Iterator.empty
          } else {
            var st = state.getOption.getOrElse(CotState(0L, 0L, 0L))
            val out = Seq.newBuilder[CotFire]
            rows.toSeq.sortBy(_.ordinal).foreach { e =>
              st = CotState(st.bufN + 1L, st.bufSum + e.x, st.fires)
              if (st.bufN >= maxCount) {
                out += CotFire(key, wstart, st.fires, st.bufN, st.bufSum,
                  early = true)
                st = CotState(0L, 0L, st.fires + 1L)
              }
            }
            state.update(st)
            // the window-end timer; if the watermark already passed it
            // (late-ish pane admitted by the delay), arm for the very
            // next advance instead of throwing
            state.setTimeoutTimestamp(math.max(
              (wstart + windowSeconds) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }

  final case class FunnelEvent(key: String, ordinal: Long, step: String)
  final case class FunnelState(t0: Long, t1: Long, t2: Long, n: Long)
  final case class FunnelSnapshot(key: String, n_events: Long,
      stages_reached: Int, t0: Option[Long], t1: Option[Long],
      t2: Option[Long])

  /** Streaming 3-step funnel — the CEP pattern-match (view → click →
    * purchase within `horizon` of the first view) run as a per-key state
    * machine ACROSS micro-batches: state is the earliest qualifying
    * timestamp of each stage plus the event count, each batch folds its
    * events in ordinal order, and the post-batch snapshot is emitted
    * (latest per key = the stream's answer). State is O(keys) — four
    * longs per user however long the stream runs — where the batch twin
    * ([[graft.operators.Funnel.detect]]) re-aggregates all history.
    * Equivalence to the batch result holds when each key's events
    * arrive ordinal-ordered across batches (in-order streams); a step
    * ts must lie in [prev stage ts, t0 + horizon], exactly the batch
    * filter. */
  def funnelStages(events: Dataset[FunnelEvent], steps: Seq[String],
      horizon: Long): Dataset[FunnelSnapshot] = {
    require(steps.size == 3, "3-step funnel")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, 0L))
          rows.toSeq.sortBy(_.ordinal).foreach { ev =>
            val ts = ev.ordinal
            st = st.copy(n = st.n + 1L)
            if (ev.step == steps(0) && st.t0 < 0L)
              st = st.copy(t0 = ts)
            else if (ev.step == steps(1) && st.t0 >= 0L && st.t1 < 0L &&
                ts >= st.t0 && ts <= st.t0 + horizon)
              st = st.copy(t1 = ts)
            else if (ev.step == steps(2) && st.t1 >= 0L && st.t2 < 0L &&
                ts >= st.t1 && ts <= st.t0 + horizon)
              st = st.copy(t2 = ts)
          }
          state.update(st)
          val stages = Seq(st.t0, st.t1, st.t2).count(_ >= 0L)
          Iterator.single(FunnelSnapshot(key, st.n, stages,
            Some(st.t0).filter(_ >= 0L), Some(st.t1).filter(_ >= 0L),
            Some(st.t2).filter(_ >= 0L)))
      }
  }

  final case class SpikeEvent(key: String, ordinal: Long, x: Long)
  final case class SpikeState(recent: List[Long], lastOrd: Long)
  final case class SpikeFlag(key: String, ordinal: Long, x: Long,
      win_sum: Long, n_prior: Long, spike: Boolean)

  /** Streaming twin of [[graft.operators.TimeSeries.rateSpikes]]: the
    * trailing-w counts ride per-key state (a ≤w-element ring, nothing
    * corpus-sized), so a live volume alert fires the same integer
    * Poisson test ((w·n − μ)² > z²·w·μ ∧ w·n > μ) the batch meter
    * gates — equal to the batch result when each key's buckets arrive
    * ordinal-ordered and gap-free across batches. A bucket whose ordinal
    * regresses behind the key's last-seen ordinal (cross-batch reorder,
    * or an at-least-once re-delivery) is DROPPED, not folded into the
    * ring — a trailing window cannot be retro-patched with bounded
    * state, and silently folding a stale bucket corrupts every later
    * test in the window (advice r08). */
  def rateSpikeStream(events: Dataset[SpikeEvent], w: Int,
      z: Int): Dataset[SpikeFlag] = {
    require(w >= 1 && z >= 1)
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SpikeState, SpikeFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SpikeEvent],
            state: GroupState[SpikeState]) =>
          var st = state.getOption.getOrElse(SpikeState(Nil, Long.MinValue))
          var recent = st.recent
          var lastOrd = st.lastOrd
          val out = rows.toSeq.sortBy(_.ordinal).flatMap { e =>
            if (e.ordinal <= lastOrd) None // late/duplicate: never folded
            else {
              val winSum = recent.sum
              val nPrior = recent.size.toLong
              val lhs = w.toLong * e.x - winSum
              val spike = nPrior == w.toLong &&
                lhs * lhs > z.toLong * z * w * winSum &&
                w.toLong * e.x > winSum
              recent = (recent :+ e.x).takeRight(w)
              lastOrd = e.ordinal
              Some(SpikeFlag(key, e.ordinal, e.x, winSum, nPrior, spike))
            }
          }
          state.update(SpikeState(recent, lastOrd))
          out.iterator
      }
  }

  final case class GoldenUpdate(key: Long, ordinal: Long,
      f1: Option[String], f2: Option[String])
  final case class GoldenUpdateTied(key: Long, ordinal: Long,
      f1: Option[String], f2: Option[String], tie: Long)
  final case class GoldenState(ordinal: Long, f1: Option[String],
      f1Ord: Long, f1Tie: Long, f2: Option[String], f2Ord: Long,
      f2Tie: Long, versions: Long)
  final case class GoldenRow(key: Long, f1: Option[String],
      f2: Option[String], n_versions: Long, last_ordinal: Long)

  /** Streaming golden-record upsert — [[graft.operators.KeepLatest
    * .goldenRecord]] as LIVE state: each field independently keeps its
    * latest non-null value across micro-batches (a sparse update never
    * wipes sibling attributes), and every batch that touches an entity
    * emits its post-batch golden row. State is one small record per
    * entity in the state store (checkpointed, RocksDB-backed on a
    * cluster) — the MDM merge never re-reads the sink. Equivalent to
    * the batch fold for ANY arrival order PROVIDED ordinals are
    * distinct per key: the state carries each field's latest-non-null
    * ORDINAL (not just its value), so an out-of-order update across
    * micro-batches fills a field only when it is genuinely newer — a
    * stale re-delivery can no longer wipe a newer value (advice r08),
    * yet a late row still contributes fields no newer row has set.
    * DUPLICATE ordinals break ties exactly like the batch fold
    * (advice r10): each row carries the same full-row `xxhash64` the
    * batch `goldenRecord` window orders by (computed over the input's
    * (key, ordinal, f1, f2) columns BEFORE the state fold, so both
    * engines hash identical bytes), and a field is taken only when
    * (ordinal, tie) is >= the stored pair — so stream and batch agree
    * on ANY input, arrival order and partitioning included. */
  def goldenUpsert(updates: Dataset[GoldenUpdate]): Dataset[GoldenRow] = {
    import updates.sparkSession.implicits._
    val src = updates.toDF()
    val tied = src
      .withColumn("tie", xxhash64(src.columns.map(col).toSeq: _*))
      .as[GoldenUpdateTied]
    tied.groupByKey(_.key)
      .flatMapGroupsWithState[GoldenState, GoldenRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[GoldenUpdateTied],
            state: GroupState[GoldenState]) =>
          var st = state.getOption.getOrElse(GoldenState(
            Long.MinValue, None, Long.MinValue, Long.MinValue,
            None, Long.MinValue, Long.MinValue, 0L))
          rows.toSeq.sortBy(u => (u.ordinal, u.tie)).foreach { u =>
            def newer(ord: Long, tie: Long): Boolean =
              u.ordinal > ord || (u.ordinal == ord && u.tie >= tie)
            val takeF1 = u.f1.isDefined && newer(st.f1Ord, st.f1Tie)
            val takeF2 = u.f2.isDefined && newer(st.f2Ord, st.f2Tie)
            st = GoldenState(
              math.max(st.ordinal, u.ordinal),
              if (takeF1) u.f1 else st.f1,
              if (takeF1) u.ordinal else st.f1Ord,
              if (takeF1) u.tie else st.f1Tie,
              if (takeF2) u.f2 else st.f2,
              if (takeF2) u.ordinal else st.f2Ord,
              if (takeF2) u.tie else st.f2Tie,
              st.versions + 1L)
          }
          state.update(st)
          Iterator.single(GoldenRow(key, st.f1, st.f2, st.versions,
            st.ordinal))
      }
  }
}
