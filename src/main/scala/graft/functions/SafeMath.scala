package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null-safe / zero-safe scalar math (SURVEY.md §2.8 F4, §2.3 P9-P10).
  *
  * All pure `Column` expressions — they stay inside whole-stage codegen and
  * vectorize; no UDF boundary anywhere in the hot path.
  */
object SafeMath {

  /** `n / d` rounded to `scale`, 0 when the denominator is 0 or null.
    * Reference: `CONSOLE/handler/parser/HttpDataParser.java:35,58,95`. */
  def safeDiv(n: Column, d: Column, scale: Int = 4): Column =
    when(d.isNull || d === 0, lit(0.0)).otherwise(round(n / d, scale))

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
