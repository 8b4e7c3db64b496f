package graft.nqs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SafeMath, TimeBuckets}
import graft.operators.{GameMetrics, HttpMetrics}
import graft.score.{PQConfig, PQDefaults, ScoreEngine}
import graft.score.ScoreEngine.Source

/** The `ConsoleTaskDataMain` topology as pure dataflow (SURVEY.md §3.1):
  * parse → validate → clamp → enrich (probe/task/geo) → per-protocol
  * metric derivation → perceived-quality score → time buckets → ids.
  *
  * Reference path: `WindowDataProcessFunction.java:36-90` →
  * `WindowDataParser.java:30-134` → `ScoreHelper.fillScore`. One record
  * in, one enriched fact row out (plus exploded HTTP detail children via
  * [[explodeHttpDetails]]) — except the reference's per-record MySQL/Redis
  * I/O, replaced by broadcast joins, and its wall-clock `create_time`,
  * replaced by a caller-supplied deterministic `now` for replayability.
  */
object TaskDataPipeline {

  final case class Dims(
      probes: DataFrame,
      taskSrcDest: DataFrame,
      taskParam: DataFrame,
      ipRegion: DataFrame)

  /** Deterministic row id: content hash instead of the reference's
    * snowflake/short-uuid (`UUIDKit.java:12-56`) — replay-safe, and the
    * downstream last-write-wins dedup (O8) keys on it. */
  def rowId(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    sha2(concat_ws("|", cols: _*), 256)

  def apply(raw: DataFrame, dims: Dims, cfg: PQConfig = PQDefaults.config,
      nowEpoch: Long, firstScreenFactor: Double = 1.0): DataFrame = {
    val parsed = Parse.dataUpload(raw).filter(!col("bad_msg")).drop("bad_msg")

    // P9: timestamp clamp against processing time (deterministic `now`).
    val clamped = parsed.withColumn("test_time",
      when(abs(lit(nowEpoch) - col("test_time")) > 108000L, lit(nowEpoch))
        .otherwise(col("test_time")))

    // J1-J4 enrichment; geo override needs host_province/city/operator
    // present from the task join first.
    val enriched = Enrich.withHostGeo(
      Enrich.withTask(
        Enrich.withProbe(clamped, dims.probes),
        dims.taskSrcDest, dims.taskParam),
      dims.ipRegion)

    // Per-protocol derivation (F5-F7, A2-A3): HTTP needs the detail
    // aggregates before page metrics (element_load_cost feeds
    // first_screen/page_total); GAME has its fallback rules. Non-matching
    // protocols keep their reported values — exactly the reference's
    // parser registry dispatch (`ParserContext.java:14-43`), expressed as
    // conditional columns over one unified frame.
    val httpDerived = HttpMetrics.deriveScalars(
      HttpMetrics.deriveDetailAgg(
        enriched.filter(col("task_type_name").isin("HTTP", "HTTP_DETAIL"))),
      firstScreenFactor)
    val gameDerived = GameMetrics.derive(
      enriched.filter(col("task_type_name") === "GAME"))
    val passthrough = enriched.filter(
      !col("task_type_name").isin("HTTP", "HTTP_DETAIL", "GAME"))
    val derived = unionByNameAll(Seq(httpDerived, gameDerived, passthrough))

    // A4: config-driven weighted score, protocol-dispatched. Metrics a
    // deployment's schema doesn't carry resolve to null (→ skipped, as the
    // reference skips unreadable fields).
    val scored = derived.withColumn("score",
      ScoreEngine.scoreAll(cfg, col("task_type_name"), safeSrc(derived)))

    // F3 buckets + deterministic identity + create_time.
    val ts = to_timestamp(col("test_time"))
    TimeBuckets.withBuckets(
        scored.withColumn("__ts", ts), "__ts", "test_time")
      .drop("__ts")
      .withColumn("create_time", lit(nowEpoch))
      .withColumn("id",
        rowId(col("probe_id"), col("task_id"), col("task_type_name"),
          col("test_time")))
  }

  /** U3: explode HTTP detail arrays into child fact rows carrying the
    * parent id (`WindowDataProcessFunction.java:47-77`,
    * `DetailAbstractDataParser.java:35-75`). Children are re-scored with
    * the HTTP_DETAIL criteria. */
  def explodeHttpDetails(facts: DataFrame, cfg: PQConfig = PQDefaults.config): DataFrame = {
    val parents = facts.filter(col("task_type_name") === "HTTP")
    val base = parents.select(
      col("id").as("parent_id"),
      col("probe_id"), col("task_id"), col("task_param_id"),
      col("test_time"), col("test_time_h"), col("test_time_d"),
      col("test_time_w"), col("test_time_m"), col("create_time"),
      col("province_code"), col("city_code"),
      posexplode(col("detail")).as(Seq("element_idx", "e")))
    val flat = base.select(col("*"), col("e.*")).drop("e")
      .withColumn("task_type_name", lit("HTTP_DETAIL"))
      .withColumn("conn_cost",
        SafeMath.defDouble(col("dns_cost")) + SafeMath.defDouble(col("tcp_cost")) +
          SafeMath.defDouble(col("ssl_cost")))
      .withColumn("text_cost",
        col("conn_cost") + SafeMath.defDouble(col("element_download_cost")))
      .withColumn("avg_speed",
        SafeMath.safeDiv(SafeMath.defDouble(col("element_size")),
          SafeMath.defDouble(col("element_download_cost")) / 1000))
      .withColumn("id",
        rowId(col("parent_id"), col("element_idx"), col("test_time")))
    flat.withColumn("score",
      ScoreEngine.scoreAll(cfg, col("task_type_name"), safeSrc(flat)))
  }

  /** Metric source that resolves missing columns to null instead of
    * failing analysis — the criteria config may score fields a given
    * schema doesn't carry. */
  private def safeSrc(df: DataFrame)(name: String): Source =
    if (df.columns.contains(name)) Source(col(name), name)
    else Source(lit(null).cast("double"), "NULL")

  private def unionByNameAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
}
