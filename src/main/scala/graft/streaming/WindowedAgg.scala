package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The windowed-aggregation API surface (SURVEY.md §7 step 8) — the
  * Spark-native capability the reference delegates to ClickHouse GROUP BYs
  * over materialized bucket columns. Works identically on batch frames and
  * on streams (add `withWatermark` upstream for event-time streams; the
  * expressions are the same `window()`/`session_window()` Catalyst nodes).
  *
  * Each helper emits `window_start`/`window_end` epoch seconds plus the
  * dimension and aggregate columns — the flat shape the NQS dashboards
  * query.
  */
object WindowedAgg {

  private def flatten(df: DataFrame, windowCol: String): DataFrame =
    df.select(
      (Seq(
        unix_timestamp(col(s"$windowCol.start")).as("window_start"),
        unix_timestamp(col(s"$windowCol.end")).as("window_end")) ++
        df.columns.filterNot(_ == windowCol).map(col)): _*)

  /** Tumbling event-time windows of `duration` over `tsCol`. */
  def tumbling(df: DataFrame, tsCol: String, duration: String,
      dims: Seq[String], aggs: Seq[Column]): DataFrame =
    flatten(
      df.groupBy((window(col(tsCol), duration) +: dims.map(col)): _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumnRenamed("window", "__w"), "__w")

  /** Sliding windows (`duration` long, advancing every `slide`). */
  def sliding(df: DataFrame, tsCol: String, duration: String, slide: String,
      dims: Seq[String], aggs: Seq[Column]): DataFrame =
    flatten(
      df.groupBy((window(col(tsCol), duration, slide) +: dims.map(col)): _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumnRenamed("window", "__w"), "__w")

  /** Session windows closing after `gap` of inactivity per dim tuple. */
  def session(df: DataFrame, tsCol: String, gap: String,
      dims: Seq[String], aggs: Seq[Column]): DataFrame =
    flatten(
      df.groupBy((session_window(col(tsCol), gap) +: dims.map(col)): _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumnRenamed("session_window", "__w"), "__w")
}
