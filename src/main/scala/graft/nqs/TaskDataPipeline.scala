package graft.nqs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SafeMath, TimeBuckets}
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

  /** Everything except the score: parse → clamp → enrich → per-protocol
    * derive → buckets/id/create_time. Exposed separately so the streaming
    * job can CACHE this frame per batch and compute [[withScore]] only in
    * the one sink that needs it — the full pipeline + 14-protocol score
    * fused into a single cache-build stage overruns janino's 64 KB method
    * limit (the batch path survives only because sink-side column pruning
    * shrinks its projections). */
  def preScore(raw: DataFrame, dims: Dims, nowEpoch: Long,
      firstScreenFactor: Double = 1.0,
      maxSkewSec: Long = graft.core.DynamicConf.DefaultProbeTimeOffset): DataFrame = {
    val parsed = Parse.dataUpload(raw).filter(!col("bad_msg")).drop("bad_msg")

    // P9: timestamp clamp against processing time (deterministic `now`).
    // The threshold is the reference's runtime-reloadable
    // `gw-console.probe.time.offset` (`TaskDataClickHouseSink.java:71`) —
    // the streaming job re-resolves it per micro-batch from a
    // [[graft.core.DynamicConf]].
    val clamped = parsed.withColumn("test_time",
      when(abs(lit(nowEpoch) - col("test_time")) > maxSkewSec, lit(nowEpoch))
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
    // conditional columns over one unified frame: the previous
    // filter-per-branch + union form scanned the parsed source once PER
    // BRANCH (3× micro-batch I/O) and triplicated the parse/enrich
    // subtree in the plan.
    val derived = deriveAllProtocols(enriched, firstScreenFactor)

    // F3 buckets + deterministic identity + create_time.
    val ts = to_timestamp(col("test_time"))
    TimeBuckets.withBuckets(
        derived.withColumn("__ts", ts), "__ts", "test_time")
      // the reference also stamps a Date-typed begin-of-month column
      // (`WindowDataParser.java:49` month_time) alongside the epoch
      // buckets — carried for schema parity; same instant as test_time_m
      .withColumn("month_time", to_date(date_trunc("month", col("__ts"))))
      .drop("__ts")
      .withColumn("create_time", lit(nowEpoch))
      .withColumn("id",
        rowId(col("probe_id"), col("task_id"), col("task_type_name"),
          col("test_time")))
  }

  /** A4: config-driven weighted score, protocol-dispatched. Metrics a
    * deployment's schema doesn't carry resolve to null (→ skipped, as the
    * reference skips unreadable fields). */
  def withScore(df: DataFrame, cfg: PQConfig = PQDefaults.config): DataFrame =
    df.withColumn("score",
      ScoreEngine.scoreAll(cfg, col("task_type_name"), safeSrc(df)))

  def apply(raw: DataFrame, dims: Dims, cfg: PQConfig = PQDefaults.config,
      nowEpoch: Long, firstScreenFactor: Double = 1.0,
      maxSkewSec: Long = graft.core.DynamicConf.DefaultProbeTimeOffset): DataFrame =
    withScore(preScore(raw, dims, nowEpoch, firstScreenFactor, maxSkewSec), cfg)

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
      col("test_time_w"), col("test_time_m"), col("month_time"),
      col("create_time"),
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


  /** One-pass per-protocol metric derivation over the unified parsed
    * frame. Value-equivalent to routing through
    * `HttpMetrics.deriveDetailAgg` + `deriveScalars` (HTTP/HTTP_DETAIL),
    * `GameMetrics.derive` (GAME), and a passthrough branch then
    * `unionByName(allowMissingColumns)` — HTTP-only outputs are null off
    * the HTTP branch, exactly as the union's missing-column fill made
    * them — but the plan scans the source once instead of once per
    * branch. The standalone operators remain the API for callers with a
    * single-protocol frame (q14-q16). */
  private def deriveAllProtocols(enriched: DataFrame,
      firstScreenFactor: Double): DataFrame = {
    val isHttp = col("task_type_name").isin("HTTP", "HTTP_DETAIL")
    val isGame = col("task_type_name") === "GAME"
    def dc(n: String) = SafeMath.defDouble(col(n).cast("double"))

    // --- detail-array aggregates (A2/A3, F7) — HTTP rows only ---
    val details = col("detail")
    val enrichedDetail = transform(details, e => {
      val conn = coalesce(e.getField("dns_cost"), lit(0.0)) +
        coalesce(e.getField("tcp_cost"), lit(0.0)) +
        coalesce(e.getField("ssl_cost"), lit(0.0))
      val dl = coalesce(e.getField("element_download_cost"), lit(0.0))
      e.withField("conn_cost", conn)
        .withField("element_total_cost", conn + dl)
        .withField("avg_speed",
          SafeMath.safeDiv(coalesce(e.getField("element_size"), lit(0.0)), dl / 1000))
    })
    val n = size(details)
    val successes = size(filter(details, e => e.getField("element_status") === 0))
    val threads = array_distinct(transform(details, _.getField("thread_num")))
    val perThreadSums = transform(threads, t =>
      aggregate(
        filter(col("__detail_enriched"), e => e.getField("thread_num") === t),
        lit(0.0), (acc, e) => acc + e.getField("element_total_cost")))
    // the non-HTTP branch pads the struct with typed null fields so both
    // CASE branches share one type (the union form's nested-field merge
    // did the same null-fill)
    val paddedDetail = transform(details, e =>
      e.withField("conn_cost", lit(null).cast("double"))
        .withField("element_total_cost", lit(null).cast("double"))
        .withField("avg_speed", lit(null).cast("double")))
    val base = enriched
      .withColumn("__detail_enriched", when(isHttp, enrichedDetail).otherwise(paddedDetail))
      .withColumn("elements_sum", when(isHttp, coalesce(n, lit(0))))
      .withColumn("elements_success_sum", when(isHttp, coalesce(successes, lit(0))))
      .withColumn("elements_fail_sum", when(isHttp, coalesce(n - successes, lit(0))))
      .withColumn("element_total_size", when(isHttp,
        coalesce(aggregate(details, lit(0.0),
          (acc, e) => acc + coalesce(e.getField("element_size"), lit(0.0))), lit(0.0))))
      .withColumn("elements_success_rate", when(isHttp,
        when(n.isNull || n === 0, lit(0.0))
          .otherwise(SafeMath.roundHalfUp(successes.cast("double") / n * 100, 4))))
      .withColumn("element_load_cost", when(isHttp,
        coalesce(array_max(perThreadSums), lit(0.0))))
      .withColumn("detail", col("__detail_enriched"))
      .drop("__detail_enriched")

    // --- page/connection scalars (F5/F6) ---
    val pageSize = dc("page_size")
    val transBody = dc("trans_body_cost")
    val httpConn = dc("dns_cost") + dc("tcp_cost") + dc("ssl_cost")
    val textCost = httpConn + transBody
    val elementLoad = SafeMath.defDouble(col("element_load_cost"))
    val elementTotalSize = SafeMath.defDouble(col("element_total_size"))
    val pageTotal = textCost + elementLoad
    val reportedSpeed = dc("avg_speed")
    val httpAvgSpeed = SafeMath.safeDiv(pageSize, transBody / 1000)
    base
      .withColumn("conn_cost",
        when(isHttp, httpConn)
          .when(isGame,
            when(dc("dns_cost") === 0 && dc("tcp_cost") === 0 && dc("ssl_cost") === 0,
              col("conn_cost").cast("double"))
              .otherwise(dc("dns_cost") + dc("tcp_cost") + dc("ssl_cost")))
          .otherwise(col("conn_cost")))
      .withColumn("avg_speed",
        when(isHttp, httpAvgSpeed)
          .when(isGame,
            when(reportedSpeed === 0, httpAvgSpeed).otherwise(reportedSpeed))
          .otherwise(col("avg_speed")))
      .withColumn("text_cost", when(isHttp, textCost))
      .withColumn("first_screen_cost",
        when(isHttp, textCost + elementLoad * firstScreenFactor))
      .withColumn("page_total_cost", when(isHttp, pageTotal))
      .withColumn("page_avg_speed",
        when(isHttp, SafeMath.safeDiv(pageSize + elementTotalSize, pageTotal / 1000)))
  }
}
