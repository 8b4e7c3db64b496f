package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket materialization (SURVEY.md §2.8 F3).
  *
  * The reference stamps every fact row with epoch-second columns for the
  * start of its hour / day / week / month
  * (`CONSOLE/handler/parser/WindowDataParser.java:127-132`) so downstream
  * GROUP BYs prune on a materialized key instead of re-computing
  * `date_trunc` per query. We keep that design: buckets are plain codegen'd
  * `date_trunc` + `unix_timestamp` expressions (no UDF), computed once at
  * write time; at 100 TB they double as storage partition keys
  * (`partitionBy(bucket_d)`) giving partition pruning on time-range scans.
  *
  * Week start is Monday for both Spark `date_trunc('week')` and the
  * reference's hutool `beginOfWeek`. Session TZ is pinned to UTC.
  */
object TimeBuckets {
  def hourStart(ts: Column): Column  = unix_timestamp(date_trunc("hour", ts))
  def dayStart(ts: Column): Column   = unix_timestamp(date_trunc("day", ts))
  def weekStart(ts: Column): Column  = unix_timestamp(date_trunc("week", ts))
  def monthStart(ts: Column): Column = unix_timestamp(date_trunc("month", ts))

  /** Add the four bucket columns `<prefix>_h/_d/_w/_m` for timestamp col. */
  def withBuckets(df: DataFrame, tsCol: String, prefix: String): DataFrame = {
    val ts = col(tsCol)
    df.withColumns(Map(
      s"${prefix}_h" -> hourStart(ts),
      s"${prefix}_d" -> dayStart(ts),
      s"${prefix}_w" -> weekStart(ts),
      s"${prefix}_m" -> monthStart(ts)))
  }
}
