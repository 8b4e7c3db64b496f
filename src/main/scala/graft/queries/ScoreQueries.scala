package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.TimeBuckets
import graft.score.{PQDefaults, ScoreEngine}
import graft.score.ScoreEngine.Source

/** Perceived-quality scoring over the driver testdata (SURVEY.md §2.5 A4,
  * §2.8 F8-F10). The Spark expression AND the DuckDB oracle are compiled
  * from the same [[graft.score.PQConfig]] model, so the gate checks the
  * compiler itself. The score is a pure codegen'd when-chain — per-row,
  * no shuffle; the hourly rollup shuffles once on (hour, type).
  */
object ScoreQueriesSupport {
  val cfg = PQDefaults.config

  /** k = the integer payload mined from the events.props JSON. */
  private val kSql = """CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)"""
  private def kCol: Column =
    regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long")

  /** Shared metric-source mapping: every metric name any protocol uses,
    * derived deterministically from (value, k) — Column and SQL in one
    * place so both backends see identical double arithmetic. */
  // every constant is CAST AS DOUBLE on the SQL side: DuckDB otherwise
  // parses decimal-point literals as exact DECIMALs (see ScoreEngine.fmtD)
  val sources: Map[String, Source] = Map(
    "rtt" -> Source(col("value"), "(value)"),
    "lost_rate" -> Source(kCol / lit(100.0), s"(($kSql) / CAST(100.0 AS DOUBLE))"),
    "dns_cost" -> Source((kCol + lit(1L)).cast("double"), s"CAST(($kSql) + 1 AS DOUBLE)"),
    "conn_cost" -> Source(col("value") + kCol, s"((value) + ($kSql))"),
    "text_cost" -> Source(col("value") * lit(12.0), "((value) * CAST(12.0 AS DOUBLE))"),
    "avg_speed" -> Source(col("value") * lit(4.0), "((value) * CAST(4.0 AS DOUBLE))"),
    "tcp_delay" -> Source(col("value") * lit(1.5), "((value) * CAST(1.5 AS DOUBLE))"),
    "first_byte_cost" -> Source(col("value") * lit(3.0), "((value) * CAST(3.0 AS DOUBLE))"),
    "pause_count" -> Source((kCol % lit(8L)).cast("double"), s"CAST(($kSql) % 8 AS DOUBLE)"),
    "carlton_rate" -> Source(kCol / lit(200.0), s"(($kSql) / CAST(200.0 AS DOUBLE))"),
    "time_cost" -> Source(kCol.cast("double"), s"CAST($kSql AS DOUBLE)"),
    "success_rate" -> Source((kCol % lit(101L)).cast("double"), s"CAST(($kSql) % 101 AS DOUBLE)"),
    "send_speed" -> Source(col("value") * lit(4.0), "((value) * CAST(4.0 AS DOUBLE))"),
    "response_cost" -> Source(col("value"), "(value)"),
    "bandwidth_ratio" -> Source(kCol.cast("double"), s"CAST($kSql AS DOUBLE)"),
    "download_speed" -> Source(col("value") / lit(30.0), "((value) / CAST(30.0 AS DOUBLE))"),
    "upload_speed" -> Source(col("value") / lit(40.0), "((value) / CAST(40.0 AS DOUBLE))"))

  def src(name: String): Source = sources(name)

  /** Deterministic event → protocol routing that exercises every criteria
    * branch including SPEED and an unknown protocol. */
  val protocols: Seq[String] = Seq("PING", "HTTP", "TCPPING", "GAME", "FLASH",
    "DNS", "POP3", "SMTP", "WECHAT", "SPEED", "FTP", "HTTP_DETAIL",
    "DNS_DETAIL", "DNS_RESOLUTION_DETAIL", "UNKNOWN")
  def protocolCol: Column = {
    val m = protocols.zipWithIndex
      .foldLeft(when(lit(false), lit(""))) { case (acc, (p, i)) =>
        acc.when(pmod(col("event_id"), lit(protocols.size)) === i, lit(p))
      }
    m.otherwise(lit(""))
  }
  def protocolSql: String = {
    val branches = protocols.zipWithIndex
      .map { case (p, i) => s"WHEN (event_id % ${protocols.size}) = $i THEN '$p'" }
      .mkString(" ")
    s"(CASE $branches ELSE '' END)"
  }
}

object ScoreQueries {
  import ScoreQueriesSupport._

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q11_pq_score_ping",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.select(col("event_id"),
          ScoreEngine.scoreFor(cfg.byProtocol("PING"), src).as("score"))
      },
      Some {
        val scoreSql = ScoreEngine.scoreForSql(cfg.byProtocol("PING"), src)
        s"SELECT event_id, $scoreSql AS score FROM events"
      }),

    GraftQuery(
      "q12_pq_score_hourly",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.select(
            TimeBuckets.hourStart(col("ts")).as("hour_start"),
            col("event_type"),
            ScoreEngine.scoreFor(cfg.byProtocol("PING"), src).as("score"))
          .groupBy("hour_start", "event_type")
          .agg(
            count(lit(1)).as("n"),
            // sum in DECIMAL (order-independent), final output pinned to
            // DOUBLE on both sides — driver hashes rendered values, and
            // Spark DECIMAL "261.60" vs DuckDB decimal→float "261.6" differ.
            sum(col("score").cast(DecimalType(12, 2))).cast("double").as("sum_score"),
            graft.functions.SafeMath.roundHalfUp(
              sum(col("score").cast(DecimalType(12, 2))).cast("double") /
                count(lit(1)), 4).as("avg_score"))
      },
      Some {
        val scoreSql = ScoreEngine.scoreForSql(cfg.byProtocol("PING"), src)
        s"""SELECT hour_start, event_type, COUNT(*) AS n,
          CAST(SUM(CAST(score AS DECIMAL(12,2))) AS DOUBLE) AS sum_score,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "CAST(SUM(CAST(score AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)", 4)} AS avg_score
          FROM (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
            event_type, $scoreSql AS score FROM events)
          GROUP BY hour_start, event_type"""
      },
      bench = true),

    GraftQuery(
      "q13_pq_score_all_protocols",
      (s, dir) => {
        // Two-stage projection: stage 1 computes the 17 metric sources
        // (each with its regexp_extract) and the protocol route ONCE as
        // plain columns; stage 2's 14-protocol dispatch then references
        // attributes instead of re-embedding those subtrees per band.
        // CollapseProject keeps the split (the inner expressions are
        // non-cheap and multiply referenced), and each projection
        // compiles inside whole-stage codegen — the single-projection
        // form blew past janino's method limits and fell back to
        // interpreted evaluation.
        val ev = Tables.events(s, dir)
        val staged = ev.select(
          Seq(col("event_id"), protocolCol.as("protocol")) ++
            sources.keys.toSeq.sorted.map(n => sources(n).column.as(s"__$n")): _*)
        staged.select(col("event_id"), col("protocol"),
          ScoreEngine.scoreAll(cfg, col("protocol"),
            name => Source(col(s"__$name"), name)).as("score"))
      },
      Some {
        val scoreSql = ScoreEngine.scoreAllSql(cfg, protocolSql, src)
        s"SELECT event_id, $protocolSql AS protocol, $scoreSql AS score FROM events"
      },
      bench = true)
  )
}
