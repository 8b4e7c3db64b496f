package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null-safe / zero-safe scalar math (SURVEY.md §2.8 F4, §2.3 P9-P10).
  *
  * All pure `Column` expressions — they stay inside whole-stage codegen and
  * vectorize; no UDF boundary anywhere in the hot path.
  */
object SafeMath {

  /** Half-up rounding on the BINARY double value: `floor(x·10ˢ + 0.5)/10ˢ`.
    *
    * Used instead of `functions.round` everywhere a rounded double is part
    * of a gated result: Spark's `round` goes through the decimal string
    * (`BigDecimal.valueOf`) while DuckDB rounds the binary value — they
    * disagree on values like 74.195. This formulation is identical FP
    * arithmetic on any engine; [[roundHalfUpSql]] is the oracle-side twin.
    */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + 0.5) / p
  }

  /** Driver-side (plain `Double`) twin of [[roundHalfUp]] — for values
    * computed on the driver (percentile cutoffs, thresholds) that must
    * agree bit-for-bit with an engine-side rounding of the same value. */
  def roundHalfUpD(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    math.floor(x * p + 0.5) / p
  }

  /** Oracle-side twin of [[roundHalfUp]]. `E0` suffixes force DOUBLE
    * literals (DuckDB would otherwise use exact DECIMAL arithmetic);
    * scales ≥ 8 already render in scientific notation and must not get a
    * second exponent appended. */
  def roundHalfUpSql(x: String, scale: Int): String = {
    val p = math.pow(10, scale).toString
    val ps = if (p.contains("E") || p.contains("e")) p else s"${p}E0"
    s"(FLOOR(($x) * $ps + 0.5E0) / $ps)"
  }

  /** `n / d` rounded to `scale`, 0 when the denominator is 0 or null.
    * Reference: `CONSOLE/handler/parser/HttpDataParser.java:35,58,95`. */
  def safeDiv(n: Column, d: Column, scale: Int = 4): Column =
    when(d.isNull || d === 0, lit(0.0)).otherwise(roundHalfUp(n / d, scale))

  /** Timestamp repair (never drop): if |now − ts| exceeds `maxSkewSec`,
    * replace with `now`. Reference clamps at 108000 s (30 h):
    * `CONSOLE/handler/message/DataMessage.java:17-19`. `now` is passed in
    * (not `current_timestamp()`) so replays and tests are deterministic. */
  def clampTimestamp(ts: Column, now: Column, maxSkewSec: Long = 108000L): Column =
    when(abs(unix_timestamp(now) - unix_timestamp(ts)) > maxSkewSec, now)
      .otherwise(ts)

  /** ClickHouse-style null coercion (`CONSOLE/util/ValKit.java:16-63`). */
  def defStr(c: Column): Column    = coalesce(c, lit(""))
  def defNum(c: Column): Column    = coalesce(c, lit(0))
  def defDouble(c: Column): Column = coalesce(c, lit(0.0))
}
