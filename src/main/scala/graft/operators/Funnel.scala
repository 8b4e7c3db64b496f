package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) detection: for each user, the earliest
  * completion of step 0, then the earliest step 1 at-or-after it, then
  * the earliest step 2 at-or-after THAT, … all within `horizon` seconds
  * of step 0 — the classic conversion/journey query (view → click →
  * purchase), and the batch twin of a CEP pattern match.
  *
  * Scale shape: one filtered aggregation per step, each keyed by user —
  * never a per-user sort of the full event history, and never a
  * self-join of events against events (step k joins the per-user step
  * k−1 RESULT, which is ≤ one row per user). K steps → K map-side-
  * combined shuffles over shrinking frames.
  */
object Funnel {

  /** Returns one row per user who completed step 0: `t_0 … t_{k-1}`
    * (nulls where the funnel was abandoned) and `stages_reached`. */
  def detect(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stepTypes: Seq[String], horizon: Long): DataFrame = {
    require(stepTypes.nonEmpty, "need at least one funnel step")
    var acc = events.filter(col(typeCol) === stepTypes.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("t_0"))
    stepTypes.tail.zipWithIndex.foreach { case (st, i) =>
      val prevT = s"t_$i"
      val curT = s"t_${i + 1}"
      val gate = acc.select(
        (Seq(userCol, prevT, "t_0").distinct).map(col): _*)
      val nxt = events.filter(col(typeCol) === st)
        .join(gate, userCol)
        .filter(col(tsCol) >= col(prevT) &&
          col(tsCol) <= col("t_0") + horizon)
        .groupBy(userCol).agg(min(col(tsCol)).as(curT))
      acc = acc.join(nxt, Seq(userCol), "left")
    }
    val reached = stepTypes.indices.tail
      .map(i => when(col(s"t_$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    acc.withColumn("stages_reached", reached)
  }

  /** Frequent event-type sequences (behavioral n-gram mining): for every
    * user, the consecutive `n`-grams of their time-ordered event stream;
    * globally counted, top-k returned. The per-user ordering is a lead()
    * window (one shuffle on user, parallel across users — the event
    * history is never collected into a list), the count is map-side
    * combined, and top-k is a TakeOrdered, not a global sort. The
    * ordering ties on `tieCol` so replays are deterministic. */
  def frequentSequences(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, n: Int = 3,
      topK: Int = 20): DataFrame = {
    require(n >= 2, "sequence length >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val leads = (1 until n).map(i => lead(col(typeCol), i).over(w))
    val gram = concat_ws(">", (col(typeCol) +: leads): _*)
    events
      .select(gram.as("seq"), leads.last.isNotNull.as("__complete"))
      .filter(col("__complete"))
      .groupBy("seq").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("seq").asc)
      .limit(topK)
  }

  /** Last-touch attribution — the marketing-analytics complement of
    * [[detect]]: every conversion is credited to the user's most recent
    * touch event within `lookbackSec`, or to 'direct' when none
    * qualifies. One shuffle on the user key; the carry-forward is a
    * `last(..., ignoreNulls)` running window (the [[TimeSeries.gapFill]]
    * primitive) over an explicit ROWS frame ordered by (ts, id) so ties
    * attribute deterministically. At 100 TB this is a single
    * user-partitioned window over the event stream — no self-join of
    * conversions against touches. Returns (channel, conv_row...) —
    * callers aggregate. */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, touchType: String,
      convType: String, channel: org.apache.spark.sql.Column,
      lookbackSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tse = unix_timestamp(col(tsCol))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__tse", tse)
      .withColumn("__last_ch",
        last(when(col(typeCol) === touchType, channel), ignoreNulls = true)
          .over(w))
      .withColumn("__last_ts",
        last(when(col(typeCol) === touchType, tse), ignoreNulls = true)
          .over(w))
      .filter(col(typeCol) === convType)
      .withColumn("channel",
        when(col("__last_ch").isNotNull &&
          col("__tse") - col("__last_ts") <= lookbackSec, col("__last_ch"))
          .otherwise(lit("direct")))
      .drop("__tse", "__last_ch", "__last_ts")
  }

  /** Linear multi-touch attribution — every touch inside the lookback
    * window shares the conversion's value EQUALLY (vs [[
    * lastTouchAttribution]]'s winner-take-all): per conversion, each of
    * the n touches gets `cents div n` and the MOST RECENT touch absorbs
    * the remainder, so credits are exact integers that sum to the
    * conversion's cents — no FP splits, no lost pennies. Conversions
    * with no in-window touch credit 'direct' in full.
    *
    * Scale shape: ONE user-partitioned window carries the running touch
    * list (bounded by a user's touches — the same per-user bound every
    * funnel op here rides), the in-window filter and per-touch split
    * are array expressions, and the only corpus-sized shuffle is the
    * window's. Emits one row per (conversion, credited touch):
    * (userCol, conv id, channel, n_touches, credit_cents). */
  def linearAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, touchType: String,
      convType: String, channel: org.apache.spark.sql.Column,
      valueCents: org.apache.spark.sql.Column,
      lookbackSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val convs = events
      .withColumn("__tse", unix_timestamp(col(tsCol)))
      .withColumn("__touches",
        collect_list(when(col(typeCol) === touchType,
          struct(unix_timestamp(col(tsCol)).as("t"), channel.as("ch"))))
          .over(w))
      .filter(col(typeCol) === convType)
      .withColumn("__cents", valueCents)
      .withColumn("__in", filter(col("__touches"),
        t => t("t") >= col("__tse") - lookbackSec && t("t") <= col("__tse")))
      .withColumn("__n", size(col("__in")).cast("long"))
    val credited = convs
      .filter(col("__n") > 0)
      .select(col(userCol), col(idCol), col("__cents"), col("__n"),
        posexplode(col("__in")).as(Seq("__pos", "__t")))
      .select(col(userCol), col(idCol), col("__t.ch").as("channel"),
        col("__n").as("n_touches"),
        (expr("__cents div __n") +
          when(col("__pos") === col("__n") - 1L,
            col("__cents") - expr("(__cents div __n)") * col("__n"))
            .otherwise(lit(0L))).as("credit_cents"))
    val direct = convs
      .filter(col("__n") === 0)
      .select(col(userCol), col(idCol), lit("direct").as("channel"),
        lit(0L).as("n_touches"), col("__cents").as("credit_cents"))
    credited.unionByName(direct)
  }
}
