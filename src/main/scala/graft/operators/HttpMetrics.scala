package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SafeMath

/** HTTP page/element metric derivation (SURVEY.md §2.8 F5/F7, §2.5 A2/A3).
  *
  * Reference: `CONSOLE/handler/parser/HttpDataParser.java:21-127`. Two forms
  * are provided, both pure `Column` algebra (whole-stage codegen, no UDF):
  *
  *  - [[deriveScalars]]: per-row page metrics (`conn_cost`, `avg_speed`,
  *    `text_cost`, `first_screen_cost`, `page_total_cost`,
  *    `page_avg_speed`) — identical formulas to the reference, with
  *    null→0 defaulting and zero-denominator guards;
  *  - [[deriveDetailAgg]]: the per-record aggregate over the `detail`
  *    element array (success counts, total size, success rate, and the
  *    per-thread max load cost) expressed with higher-order array
  *    functions (`transform`/`filter`/`aggregate`) so the whole thing
  *    stays row-local — at 100 TB this is embarrassingly parallel with
  *    ZERO shuffle, unlike an explode+groupBy formulation.
  */
object HttpMetrics {

  private def d0(name: String)(implicit df: DataFrame): Column =
    if (df.columns.contains(name)) SafeMath.defDouble(col(name).cast("double"))
    else lit(0.0)

  /** Page-level scalar metrics. `firstScreenFactor` is the reference's
    * `gw-console.data.http.firstscreencost` config multiplier. */
  def deriveScalars(input: DataFrame, firstScreenFactor: Double = 1.0): DataFrame = {
    implicit val df: DataFrame = input
    val pageSize = d0("page_size")
    val transBody = d0("trans_body_cost")
    val connCost = d0("dns_cost") + d0("tcp_cost") + d0("ssl_cost")
    val textCost = connCost + transBody
    val elementLoad = d0("element_load_cost")
    val elementTotalSize = d0("element_total_size")
    val pageTotal = textCost + elementLoad
    input
      .withColumn("conn_cost", connCost)
      .withColumn("avg_speed", SafeMath.safeDiv(pageSize, transBody / 1000))
      .withColumn("text_cost", textCost)
      .withColumn("first_screen_cost", textCost + elementLoad * firstScreenFactor)
      .withColumn("page_total_cost", pageTotal)
      .withColumn("page_avg_speed",
        SafeMath.safeDiv(pageSize + elementTotalSize, pageTotal / 1000))
  }

  /** Element-array aggregates over a `detail: array<struct<...>>` column.
    * Adds `elements_sum/_success_sum/_fail_sum`, `element_total_size`,
    * `elements_success_rate`, `element_load_cost`, and rewrites `detail`
    * with per-element derived `conn_cost`/`element_total_cost`/`avg_speed`.
    */
  def deriveDetailAgg(df: DataFrame, detailCol: String = "detail"): DataFrame = {
    val details = col(detailCol)
    val enriched = transform(details, e => {
      val conn = coalesce(e.getField("dns_cost"), lit(0.0)) +
        coalesce(e.getField("tcp_cost"), lit(0.0)) +
        coalesce(e.getField("ssl_cost"), lit(0.0))
      val dl = coalesce(e.getField("element_download_cost"), lit(0.0))
      val total = conn + dl
      e.withField("conn_cost", conn)
        .withField("element_total_cost", total)
        .withField("avg_speed",
          SafeMath.safeDiv(coalesce(e.getField("element_size"), lit(0.0)), dl / 1000))
    })
    val n = size(details)
    val successes = size(filter(details, e => e.getField("element_status") === 0))
    // per-thread sum of element_total_cost, then max across threads:
    // thread ids come from the data; fold over the distinct thread set.
    val threads = array_distinct(transform(details, _.getField("thread_num")))
    val perThreadSums = transform(threads, t =>
      aggregate(
        filter(col("__detail_enriched"), e => e.getField("thread_num") === t),
        lit(0.0), (acc, e) => acc + e.getField("element_total_cost")))
    df.withColumn("__detail_enriched", enriched)
      .withColumn("elements_sum", coalesce(n, lit(0)))
      .withColumn("elements_success_sum", coalesce(successes, lit(0)))
      .withColumn("elements_fail_sum", coalesce(n - successes, lit(0)))
      .withColumn("element_total_size",
        coalesce(aggregate(details, lit(0.0),
          (acc, e) => acc + coalesce(e.getField("element_size"), lit(0.0))), lit(0.0)))
      .withColumn("elements_success_rate",
        when(n.isNull || n === 0, lit(0.0))
          .otherwise(SafeMath.roundHalfUp(successes.cast("double") / n * 100, 4)))
      .withColumn("element_load_cost",
        coalesce(array_max(perThreadSums), lit(0.0)))
      .withColumn(detailCol, col("__detail_enriched"))
      .drop("__detail_enriched")
  }
}

/** GAME metric derivation (`CONSOLE/handler/parser/GameDataParser.java:11-31`):
  * `avg_speed` falls back to page_size / transfer time when unreported;
  * `conn_cost` is recomputed from dns+tcp+ssl unless all three are zero
  * (in which case the probe-reported value wins).
  */
object GameMetrics {
  def derive(input: DataFrame): DataFrame = {
    val pageSize = SafeMath.defDouble(col("page_size").cast("double"))
    val transBody = SafeMath.defDouble(col("trans_body_cost").cast("double"))
    val dns = SafeMath.defDouble(col("dns_cost").cast("double"))
    val tcp = SafeMath.defDouble(col("tcp_cost").cast("double"))
    val ssl = SafeMath.defDouble(col("ssl_cost").cast("double"))
    val reportedSpeed = SafeMath.defDouble(col("avg_speed").cast("double"))
    val reportedConn = col("conn_cost").cast("double")
    input
      .withColumn("avg_speed",
        when(reportedSpeed === 0, SafeMath.safeDiv(pageSize, transBody / 1000))
          .otherwise(reportedSpeed))
      .withColumn("conn_cost",
        when(dns === 0 && tcp === 0 && ssl === 0, reportedConn)
          .otherwise(dns + tcp + ssl))
  }
}
