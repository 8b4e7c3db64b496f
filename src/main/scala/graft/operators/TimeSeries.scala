package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators: turning irregular event buckets
  * into the dense, gap-free grids that downstream window math (EWMA,
  * moving averages, seasonal diffs) silently assumes.
  */
object TimeSeries {

  /** Gap-fill a keyed bucket series: materialize every bucket in the
    * corpus' [min, max] range for every key, and forward-fill missing
    * values with the key's last observation (leading gaps stay NULL —
    * there is nothing to carry). `filled` marks synthesized rows.
    *
    * Scale shape: the grid is keys × buckets built by exploding a
    * per-key `sequence` (never a driver loop); the fill is one window
    * per key ordered by bucket — parallel across keys. The global
    * [min, max] is a 2-value aggregate. For sparse multi-year keys cap
    * the range per key (join a per-key min/max instead). */
  def gapFill(df: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val r = df.agg(min(col(bucketCol)), max(col(bucketCol))).collect()(0)
    // Empty input: min/max are NULL — getLong would NPE. Any (lo, hi)
    // works then, since the key grid is empty too; the plan below yields
    // an empty frame with the normal output schema.
    val (lo, hi) = if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
    val grid = df.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(lo), lit(hi))).as(bucketCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(df, Seq(keyCol, bucketCol), "left")
      .withColumn("filled", col(valueCol).isNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Per-key ordinary-least-squares trend over an integer (x, y) series —
    * "is this source growing or shrinking": closed-form slope/intercept
    * from the four sufficient statistics Σx, Σy, Σxy, Σx², accumulated
    * as EXACT integer sums in ONE map-side-combined aggregation per key
    * (never a per-key regression loop, never a covariance UDAF whose
    * partial-merge order perturbs doubles). The only FP ops are the two
    * final divisions of exact longs — deterministic on any engine, so
    * the fit itself hash-gates. Keys with a degenerate x range get NULL
    * slope/intercept. */
  /** Seasonal anomaly baseline — the robust ops-monitoring primitive:
    * per (key, hour-of-day) the MEDIAN and MAD (median absolute
    * deviation) of a value, plus how many observations exceed
    * `k × MAD` from the median. Median/MAD resist the outliers they
    * hunt (a mean/stddev baseline is dragged by the very spikes it
    * should flag — q84/q110 are the z-score/MAD global cousins; this
    * adds the seasonal dimension). Two grouped aggregations + one
    * baseline join (baseline side is keys×24 rows → broadcast);
    * engine-interpolated medians are roundHalfUp'd before any
    * comparison so the anomaly threshold can't flip at the half
    * boundary (the curriculumBins discipline). */
  def seasonalAnomalies(df: DataFrame, keyCol: String, hodCol: String,
      valCol: String, k: Int = 3, scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath
    val e = df.select(col(keyCol), col(hodCol), col(valCol).as("__v"))
    val med = e.groupBy(col(keyCol), col(hodCol))
      .agg(SafeMath.roundHalfUp(
        percentile(col("__v"), lit(0.5)), scale).as("med"))
    val dev = e.join(broadcast(med), Seq(keyCol, hodCol))
      .withColumn("__adev", abs(col("__v") - col("med")))
      .localCheckpoint() // one deviation pass feeds both MAD and the flags
    val mad = dev.groupBy(col(keyCol), col(hodCol))
      .agg(first(col("med")).as("med"),
        SafeMath.roundHalfUp(
          percentile(col("__adev"), lit(0.5)), scale).as("mad"),
        count(lit(1)).as("n"))
    dev.select(col(keyCol), col(hodCol), col("__adev"))
      .join(broadcast(mad), Seq(keyCol, hodCol))
      .groupBy(col(keyCol), col(hodCol))
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        first(col("n")).as("n"),
        sum(when(col("__adev") > lit(k.toDouble) * col("mad"), 1L)
          .otherwise(0L)).as("n_anomalies"))
  }

  /** Interval-overlap join: pair every point (`tsCol`, epoch seconds)
    * with every interval `[startCol, endCol)` it falls inside — the
    * batch form of q98's stream interval join, and the IpGeo recipe
    * (`operators/IpGeo.scala`) generalized from IP ranges to time.
    *
    * A naive `ts >= s AND ts < e` join has no equi-key, so Spark plans
    * BroadcastNestedLoop (fine only while intervals broadcast) or a
    * cartesian. Instead both sides are bucketed into fixed
    * `bucketSec`-wide cells: points hash to one cell, intervals explode
    * to the cells they span (`sequence` over bucket ids), and the join
    * becomes a plain shuffled equi-join on the cell id with the exact
    * range predicate re-applied after. Candidate volume is bounded by
    * points-per-cell × intervals-overlapping-that-cell — pick
    * `bucketSec` on the order of the typical interval length so most
    * intervals explode to ~2 cells. Scales to arbitrarily many
    * intervals; no driver collect, no broadcast requirement.
    *
    * Output: every left row + every right row, one output row per
    * overlapping (point, interval) pair. Callers aggregate after. */
  def intervalJoin(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSec: Long = 3600L): DataFrame = {
    val b = lit(bucketSec)
    val pts = points.withColumn("__cell", floor(col(tsCol) / b))
    // end is exclusive: an interval [s, e) covers cells floor(s/b) ..
    // floor((e-1)/b); empty/invalid intervals (e <= s) cover nothing.
    val iv = intervals
      .withColumn("__cell",
        explode(when(col(endCol) <= col(startCol),
            array().cast("array<bigint>"))
          .otherwise(sequence(floor(col(startCol) / b),
            floor((col(endCol) - 1) / b)))))
    pts.join(iv, Seq("__cell"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__cell")
  }

  def olsTrend(df: DataFrame, keyCol: String, xCol: String,
      yCol: String, scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath
    val s = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col(xCol)).as("sx"),
      sum(col(yCol)).as("sy"),
      sum(col(xCol) * col(yCol)).as("sxy"),
      sum(col(xCol) * col(xCol)).as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double") / den.cast("double")
    s.select(col(keyCol), col("n"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(SafeMath.roundHalfUp(slope, scale)).as("slope"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(SafeMath.roundHalfUp(
            (col("sy").cast("double") - slope * col("sx").cast("double")) /
              col("n").cast("double"), scale)).as("intercept"))
  }

  /** Interval census — concurrent-activity count from an interval table
    * (sessions, SCD2 validity windows, job runtimes): the classic
    * +1/−1 sweep. Every interval emits (+1 at its start bucket, −1 at
    * end bucket + 1); the running sum at each change point is the
    * number of intervals active during that bucket (active in bucket h
    * ⟺ start_h ≤ h ≤ end_h). Output one row per bucket where the count
    * CHANGES: (bucket_start, net, active) — between change points the
    * count is constant by construction, so the sparse form is complete.
    *
    * `startCol`/`endCol` are column NAMES holding non-negative epoch
    * seconds — bucketing uses `div` (Spark `/` on longs is DOUBLE
    * division; an FP quotient truncated back can land one bucket off).
    * Scale shape: one corpus-sized delta projection (2 rows per
    * interval, map-side combined into the bucket aggregate); the
    * running sum is a window over one row per CHANGED BUCKET — bounded
    * by the calendar span, never by interval count (the PlanSpec
    * global-window exemption class). */
  def intervalCensus(df: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    val b = bucketSeconds
    val deltas = df.select(explode(array(
      struct(expr(s"CAST($startCol AS BIGINT) div ${b}L").as("b"),
        lit(1L).as("d")),
      struct((expr(s"CAST($endCol AS BIGINT) div ${b}L") + 1L).as("b"),
        lit(-1L).as("d")))).as("e"))
      .select(col("e.b").as("__b"), col("e.d").as("__d"))
    val perBucket = deltas.groupBy(col("__b"))
      .agg(sum(col("__d")).as("net"))
      .filter(col("net") =!= 0L)
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("active", sum(col("net")).over(w))
      .select((col("__b") * b).as("bucket_start"), col("net"),
        col("active"))
  }

  /** Integer-exact EWMA smoothing per key — the trend-following smooth
    * that downstream alerting thresholds against. α = num/2^shift and
    * the recurrence runs entirely in integers:
    *
    *   s₁ = x₁;   sₜ = ((2^shift − num)·sₜ₋₁ + num·xₜ) >> shift
    *
    * (shift, not division: values are required non-negative, so the
    * arithmetic right-shift IS the truncating divide, exact at any
    * magnitude — no FP anywhere, the DuckDB oracle folds the identical
    * recurrence). An EWMA with truncation is inherently SEQUENTIAL (not
    * a windowable weighted sum), so each key's series is collected,
    * sorted, and folded in one `aggregate` — driver-free, parallel
    * across keys, memory bounded by the series length (calendar-bounded
    * for the daily/hourly series this is for; a million-point series
    * needs chunked carry instead). Emits one row per input point:
    * (key, t, x, ewma). */
  def ewmaMicro(df: DataFrame, keyCol: String, tCol: String, xCol: String,
      num: Long = 1L, shift: Int = 3): DataFrame = {
    require(shift >= 1 && num >= 1 && num < (1L << shift))
    val rest = lit((1L << shift) - num)
    val series = df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(
        col(tCol).cast("long").as("t"),
        col(xCol).cast("long").as("x")))).as("__xs"))
    val folded = series.withColumn("__es",
      aggregate(col("__xs"),
        struct(array().cast("array<bigint>").as("out"), lit(0L).as("last")),
        (acc, e) => {
          val v = when(size(acc("out")) === 0, e("x"))
            .otherwise(shiftright(
              rest * acc("last") + lit(num) * e("x"), shift))
          struct(concat(acc("out"), array(v)).as("out"), v.as("last"))
        },
        acc => acc("out")))
    folded.select(col(keyCol),
      explode(zip_with(col("__xs"), col("__es"),
        (e, v) => struct(e("t").as("t"), e("x").as("x"), v.as("ewma"))))
        .as("__r"))
      .select(col(keyCol), col("__r.t").as(tCol), col("__r.x").as(xCol),
        col("__r.ewma").as("ewma"))
  }

  /** Integer-exact Holt double-exponential smoothing per key — the
    * level+TREND smooth (Holt 1957) that an EWMA can't give: an EWMA
    * lags a ramping series forever, Holt tracks the ramp and yields a
    * one-step forecast `level + trend`. α = num/2^shift, β = 1/2, and
    * the recurrence runs entirely in integers with TRUNCATING division
    * (Spark `div` ≡ DuckDB `//` on negatives — trends go negative, so
    * shift-as-divide would floor where the oracle truncates):
    *
    *   l₁ = x₁,  b₁ = 0
    *   lₜ = (num·xₜ + (2^shift − num)·(lₜ₋₁ + bₜ₋₁)) div 2^shift
    *   bₜ = ((lₜ − lₜ₋₁) + bₜ₋₁) div 2
    *
    * Same scale shape as [[ewmaMicro]]: the recurrence is inherently
    * sequential per key, folded in one `aggregate` over the key's
    * sorted series — driver-free, parallel across keys, memory bounded
    * by series length (calendar-bounded for daily/hourly series).
    * Emits one row per input point: (key, t, x, level, trend,
    * forecast = level + trend). */
  def holtMicro(df: DataFrame, keyCol: String, tCol: String, xCol: String,
      num: Long = 1L, shift: Int = 2): DataFrame = {
    require(shift >= 1 && num >= 1 && num < (1L << shift))
    val rest = lit((1L << shift) - num)
    // truncating division by 2^s (toward zero, matching DuckDB `//`):
    // arithmetic shiftright alone FLOORS negatives one off.
    def tdiv(a: Column, s: Int): Column =
      when(a >= 0, shiftright(a, s)).otherwise(-shiftright(-a, s))
    val series = df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(
        col(tCol).cast("long").as("t"),
        col(xCol).cast("long").as("x")))).as("__xs"))
    val folded = series.withColumn("__lb",
      aggregate(col("__xs"),
        struct(array().cast("array<struct<l:bigint,b:bigint>>").as("out"),
          lit(0L).as("l"), lit(0L).as("b")),
        (acc, e) => {
          val first = size(acc("out")) === 0
          val lNext = when(first, e("x"))
            .otherwise(tdiv(lit(num) * e("x") +
              rest * (acc("l") + acc("b")), shift))
          val bNext = when(first, lit(0L))
            .otherwise(tdiv(lNext - acc("l") + acc("b"), 1))
          struct(
            concat(acc("out"),
              array(struct(lNext.as("l"), bNext.as("b")))).as("out"),
            lNext.as("l"), bNext.as("b"))
        },
        acc => acc("out")))
    folded.select(col(keyCol),
      explode(zip_with(col("__xs"), col("__lb"),
        (e, v) => struct(e("t").as("t"), e("x").as("x"),
          v("l").as("level"), v("b").as("trend")))).as("__r"))
      .select(col(keyCol), col("__r.t").as(tCol), col("__r.x").as(xCol),
        col("__r.level").as("level"), col("__r.trend").as("trend"),
        (col("__r.level") + col("__r.trend")).as("forecast"))
  }

  /** Kaplan–Meier survival curve in integer micro-units — retention /
    * time-to-churn with CENSORING handled correctly (the thing a naive
    * "avg lifetime of churned users" gets wrong: still-alive users
    * carry information up to their observed duration). Per distinct
    * duration t: d = events (churns), m = subjects leaving the risk
    * set, n = suffix-sum of m (subjects with duration ≥ t); the curve
    * folds ascending as
    *
    *   S₀ = 10⁶;   S(t) = (S_prev · (n_t − d_t)) div n_t
    *
    * — an all-integer sequential recurrence (the EWMA/Holt fold
    * pattern; the oracle replays it as a recursive CTE). Scale shape:
    * ONE corpus-sized aggregate to the per-duration risk table; the
    * suffix-sum window, fold, and explode all run on the
    * calendar-bounded duration frame (the PlanSpec bounded-frame
    * exemption class). Output per duration:
    * (t, n_at_risk, d_events, c_censored, surv_micro). */
  def kaplanMeierMicro(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val risk = df
      .select(col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__e"))
      .groupBy(col("__t"))
      .agg(sum(col("__e")).as("__d"), count(lit(1)).as("__m"))
    val wSuffix = Window.orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val table = risk.withColumn("__n", sum(col("__m")).over(wSuffix))
    val series = table.agg(array_sort(collect_list(
      struct(col("__t").as("t"), col("__d").as("d"),
        col("__m").as("m"), col("__n").as("n")))).as("__xs"))
    val folded = series.withColumn("__ss",
      aggregate(col("__xs"),
        struct(array().cast("array<bigint>").as("out"),
          lit(1000000L).as("s")),
        (acc, e) => {
          // exact integer division: subtract pmod first so the FP
          // divide sees an exactly-divisible numerator (a raw FP
          // quotient can round half-ulp above an integer and flip the
          // truncation against the oracle's //)
          val num = acc("s") * (e("n") - e("d"))
          val sNext = ((num - pmod(num, e("n"))) / e("n")).cast("long")
          struct(concat(acc("out"), array(sNext)).as("out"),
            sNext.as("s"))
        },
        acc => acc("out")))
    folded.select(
      explode(zip_with(col("__xs"), col("__ss"), (e, s) =>
        struct(e("t").as("t"), e("n").as("n"), e("d").as("d"),
          (e("m") - e("d")).as("c"), s.as("surv")))).as("__r"))
      .select(col("__r.t").as("t"), col("__r.n").as("n_at_risk"),
        col("__r.d").as("d_events"), col("__r.c").as("c_censored"),
        col("__r.surv").as("surv_micro"))
  }

  /** Per-key interval MERGE (union of validity windows) — collapse
    * overlapping-or-touching [start, end) intervals into maximal
    * covered spans, the gaps-and-islands normalization every
    * SCD2-validity / session-stitch / maintenance-window union needs
    * before durations can be summed without double-counting. An island
    * starts where `start` exceeds the running max of all PRIOR ends
    * (touching intervals — start == prior end — merge: half-open
    * semantics). One key-partitioned window + one keyed aggregate.
    * Output per span: (key, span_start, span_end, n_merged). */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__s"), col("__e"))
    val islands = df
      .select(col(keyCol), col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .withColumn("__pmax", max(col("__e"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__ns",
        when(col("__pmax").isNull || col("__s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum(col("__ns")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    islands.groupBy(col(keyCol), col("__isl"))
      .agg(min(col("__s")).as("span_start"), max(col("__e")).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__isl")
  }

  /** Rate-spike detection with an INTEGER Poisson-style test — flag a
    * bucket whose count exceeds its trailing-W mean by z standard
    * deviations, without any sqrt: n > μ/W + z·√(μ/W) with n > μ/W is
    * algebraically (W·n − μ)² > z²·W·μ ∧ W·n > μ, all in BIGINTs (μ =
    * the trailing window SUM, never the FP mean — an engine-exact spike
    * set where a float sqrt would flip at perfect squares). Buckets
    * with fewer than W predecessors are unflaggable (no baseline).
    * One partitioned window per key; assumes gap-free buckets per key
    * (run [[gapFill]] first on sparse series). Output per point:
    * (key, bucket, n, win_sum, n_prior, spike). */
  def rateSpikes(df: DataFrame, keyCol: String, bucketCol: String,
      countCol: String, w: Int = 7, z: Int = 4): DataFrame = {
    require(w >= 1 && z >= 1)
    val win = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(-w, -1)
    df.select(col(keyCol), col(bucketCol),
        col(countCol).cast("long").as("n"))
      .withColumn("win_sum",
        coalesce(sum(col("n")).over(win), lit(0L)))
      .withColumn("n_prior", count(lit(1)).over(win))
      .withColumn("spike",
        col("n_prior") === w &&
          (lit(w.toLong) * col("n") - col("win_sum")) *
            (lit(w.toLong) * col("n") - col("win_sum")) >
            lit(z.toLong * z) * lit(w.toLong) * col("win_sum") &&
          lit(w.toLong) * col("n") > col("win_sum"))
  }
}
