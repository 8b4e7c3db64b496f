package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.nqs.ProbePipelines

/** The nqs pipeline stages gated end-to-end on WIRE-FORMAT messages:
  * both sides synthesize identical deterministic messages from driver
  * tables; Spark runs the REAL parsers/pipelines (Parse → clamp → route →
  * enrich → id/buckets), DuckDB computes the expected outputs directly
  * from the generator columns. A parse/route/enrich divergence breaks the
  * hash — this upgrades SURVEY rows P2/P4/P5/P7, J5, F2, F11/F12,
  * F15/F16 from unit-tested to driver-gated.
  */
object PipelineQueries {

  private val Now = 1705708800L // fixed "now" → deterministic clamps

  /** Temp dir for the embedded-database gates, swept at JVM exit —
    * repeated verify/bench runs otherwise accumulate .db files in /tmp
    * (review r10; same pattern as the q255 bucketed-layout dirs). */
  private def tempDbDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }
    p
  }

  /** `<json>\x02<ip>` heartbeat wire message derived from a key column.
    * When `withBad`, every 101st key omits the probe id (P4 reject). */
  private def hbMessage(k: Column, ip: Column, withBad: Boolean): Column = {
    val t = lit(Now) - (k % 60) * 3600
    val good = concat(
      lit("""{"info":{"id":"p-"""), k,
      lit("""","soft_ver":"v"""), k % 5,
      lit("""","so_ver":"s"""), k % 3,
      lit("""","task_queue_size":"""), k % 7,
      lit(""","task_size":"""), k % 11,
      lit("""},"time":"""), t, lit("}"))
    val json =
      if (withBad)
        when(k % 101 === 0,
          concat(lit("""{"info":{"soft_ver":"x"},"time":"""), t, lit("}")))
          .otherwise(good)
      else good
    concat(json, lit("\u0002"), ip)
  }

  private def emptyProbes(s: SparkSession) =
    s.range(0).select(col("id").cast("string").as("id"))

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q49_parse_heartbeat",
      (s, dir) => {
        // P2 wire parse + P4 reject + P9 clamp over synthesized messages.
        val k = col("c_custkey")
        val raw = Tables.load(s, dir, "customer")
          .select(hbMessage(k, concat(lit("9.0.0."), k % 200),
            withBad = true).as("value"))
        ProbePipelines.parseClampHeartbeat(raw, Now)
          .select("probe_id", "soft_ver", "so_ver", "task_queue_size",
            "task_size", "heartbeat_time", "internet_ip")
      },
      Some(s"""SELECT 'p-' || c_custkey AS probe_id,
          'v' || (c_custkey % 5) AS soft_ver,
          's' || (c_custkey % 3) AS so_ver,
          CAST(c_custkey % 7 AS INTEGER) AS task_queue_size,
          CAST(c_custkey % 11 AS INTEGER) AS task_size,
          CAST(CASE WHEN (c_custkey % 60) * 3600 > 108000 THEN $Now
            ELSE $Now - (c_custkey % 60) * 3600 END AS BIGINT) AS heartbeat_time,
          '9.0.0.' || (c_custkey % 200) AS internet_ip
        FROM customer WHERE c_custkey % 101 <> 0""")),

    GraftQuery(
      "q50_gwinfo_pon",
      (s, dir) => {
        // P7 route on nested payload presence + F11 PON normalization +
        // F12 sentinel + F2 content-hash id + F3 buckets, end-to-end
        // through the real gatewayInfoJob.
        val k = col("s_suppkey")
        val t = lit(Now) - (k % 40) * 3600
        val pc = when(k % 10 === 0, lit("ÿÿÿÿ"))
          .when(k % 10 === 1, lit("DT741-csf"))
          .otherwise(concat(lit("M"), k % 5))
        val json = concat(
          lit("""{"probe_id":"gw-"""), k, lit("""","time":"""), t,
          lit(""","probe_info":{"id":"gw-"""), k,
          lit("""","pc":""""), pc,
          lit("""","vendor":"vd"""), k % 4,
          lit("""","sn":"sn"""), k, lit(""""}"""),
          when(k % 13 =!= 0, concat(
            lit(""","sgw_info":{"pon_info":{"current":"""), k % 50,
            lit(""","rx_power":"""), (k * 7) % 10000,
            lit(""","tx_power":"""), k % 30,
            lit(""","temperature":"""), k % 70,
            lit(""","voltage":"""), k % 12,
            lit("}}"))).otherwise(lit("")),
          lit("}"))
        val raw = Tables.load(s, dir, "supplier").select(json.as("value"))
        val noStored = s.range(0).select(
          col("id").cast("string").as("probe_id"),
          col("id").cast("string").as("access_type_name"),
          col("id").cast("string").as("connect_status"))
        ProbePipelines.gatewayInfoJob(raw, noStored, Now).pon
      },
      Some(s"""WITH b AS (
          SELECT s_suppkey AS k, 'gw-' || s_suppkey AS probe_id,
            CAST(CASE WHEN (s_suppkey % 40) * 3600 > 108000 THEN $Now
              ELSE $Now - (s_suppkey % 40) * 3600 END AS BIGINT) AS info_time,
            CASE WHEN s_suppkey % 10 = 0 THEN 'ÿÿÿÿ'
                 WHEN s_suppkey % 10 = 1 THEN 'DT741-csf'
                 ELSE 'M' || (s_suppkey % 5) END AS pc,
            CAST((s_suppkey * 7) % 10000 AS DOUBLE) AS rx0
          FROM supplier WHERE s_suppkey % 13 <> 0)
        SELECT probe_id, info_time, pc,
          CAST(k % 50 AS DOUBLE) AS "current",
          CASE WHEN pc = 'DT741-csf' THEN rx0 / 10000 ELSE rx0 END AS rx_power,
          CAST(k % 30 AS DOUBLE) AS tx_power,
          CAST(k % 70 AS DOUBLE) AS temperature,
          CAST(k % 12 AS DOUBLE) AS voltage,
          CAST(epoch(date_trunc('hour', make_timestamp(info_time * 1000000))) AS BIGINT) AS info_time_h,
          CAST(epoch(date_trunc('day', make_timestamp(info_time * 1000000))) AS BIGINT) AS info_time_d,
          CAST(epoch(date_trunc('week', make_timestamp(info_time * 1000000))) AS BIGINT) AS info_time_w,
          CAST(epoch(date_trunc('month', make_timestamp(info_time * 1000000))) AS BIGINT) AS info_time_m,
          CAST($Now AS BIGINT) AS create_time,
          sha256(probe_id || '|' || info_time) AS id
        FROM b""")),

    GraftQuery(
      "q52_task_data_ping",
      (s, dir) => {
        // The FULL task-data pipeline on PING messages: P1 array explode,
        // P5/P6 envelope+payload, P9 clamp, J1-J4 enrich chain with geo
        // override, A4 protocol-dispatched scoring (incl. outlier rules),
        // F2 content-hash id, F3 buckets. Two measurements per message
        // exercise the one-Kafka-message=JSON-array contract.
        val k = col("c_custkey")
        val t = lit(Now) - (k % 60) * 3600
        def meas(taskSel: Column, tt: Column, rtt: Column, lost: Column) =
          concat(
            lit("""{"probe_id":"p-"""), k % 30,
            lit("""","task_id":"t-"""), taskSel,
            lit("""","task_type_name":"PING","test_time":"""), tt,
            lit(""","host_ip":"1.2.3."""), k % 40,
            lit("""","rtt":"""), rtt,
            lit(""","jitter":"""), k % 35,
            lit(""","lost_rate":"""), lost, lit("}"))
        val raw = Tables.load(s, dir, "customer").select(concat(
          lit("["),
          meas(k % 7, t, k % 130, k % 105), lit(","),
          meas((k + 3) % 7, t - 60, (k + 17) % 130, (k + 31) % 105),
          lit("]")).as("value"))
        val facts = graft.nqs.TaskDataPipeline(
          raw, PipelineFixtures.dims(s, dir), nowEpoch = Now)
        // month_time is DateType in the pipeline (reference parity,
        // WindowDataParser.java:49); gate its yyyy-MM-dd rendering — raw
        // DATE cells render differently per engine (pandas date vs
        // datetime64) and would hash-mismatch on identical values
        facts
          .withColumn("month_time",
            date_format(col("month_time"), "yyyy-MM-dd"))
          .select("id", "probe_id", "task_id", "task_param_id",
            "task_type_name", "test_time", "rtt", "jitter", "lost_rate",
            "probe_name", "province_code", "host_province", "host_city",
            "operator", "task_param_name", "alarm_template_id", "score",
            "test_time_h", "test_time_d", "month_time", "create_time")
      },
      Some {
        val scoreSql = graft.score.ScoreEngine.scoreForSql(
          graft.score.PQDefaults.config.byProtocol("PING"),
          name => if (Set("rtt", "lost_rate").contains(name))
            graft.score.ScoreEngine.Source(col(name), s"($name)")
          else graft.score.ScoreEngine.Source(
            lit(null).cast("double"), "CAST(NULL AS DOUBLE)"))
        s"""WITH base AS (SELECT c_custkey AS k FROM customer),
          meas AS (
            SELECT k, 'p-' || (k % 30) AS probe_id, 't-' || (k % 7) AS task_id,
              CAST(CASE WHEN (k % 60) * 3600 > 108000 THEN $Now
                ELSE $Now - (k % 60) * 3600 END AS BIGINT) AS test_time,
              '1.2.3.' || (k % 40) AS host_ip,
              CAST(k % 130 AS DOUBLE) AS rtt,
              CAST(k % 35 AS DOUBLE) AS jitter,
              CAST(k % 105 AS DOUBLE) AS lost_rate
            FROM base
            UNION ALL
            SELECT k, 'p-' || (k % 30), 't-' || ((k + 3) % 7),
              CAST(CASE WHEN (k % 60) * 3600 + 60 > 108000 THEN $Now
                ELSE $Now - (k % 60) * 3600 - 60 END AS BIGINT),
              '1.2.3.' || (k % 40),
              CAST((k + 17) % 130 AS DOUBLE),
              CAST(k % 35 AS DOUBLE),
              CAST((k + 31) % 105 AS DOUBLE)
            FROM base),
          probes AS (SELECT 'p-' || n_nationkey AS probe_id,
            'PN' || n_nationkey AS probe_name,
            'PC' || n_nationkey AS province_code FROM nation),
          tasks AS (SELECT 't-' || r_regionkey AS task_id,
            CAST(r_regionkey + 5 AS BIGINT) AS task_param_id,
            'HP' || r_regionkey AS hp, 'HC' || r_regionkey AS hc,
            'OP' || r_regionkey AS op FROM region),
          params AS (SELECT CAST(r_regionkey + 5 AS BIGINT) AS task_param_id,
            'TPN' || r_regionkey AS task_param_name,
            CAST(r_regionkey AS BIGINT) AS alarm_template_id FROM region),
          geo AS (SELECT '1.2.3.' || n_nationkey AS ip,
            'GP' || n_nationkey AS gp, 'GC' || n_nationkey AS gc,
            'GO' || n_nationkey AS gop FROM nation)
          SELECT
            sha256(m.probe_id || '|' || m.task_id || '|' || 'PING' || '|' || m.test_time) AS id,
            m.probe_id, m.task_id, t.task_param_id,
            'PING' AS task_type_name, m.test_time, m.rtt, m.jitter,
            m.lost_rate, p.probe_name, p.province_code,
            CASE WHEN g.ip IS NOT NULL THEN g.gp ELSE t.hp END AS host_province,
            CASE WHEN g.ip IS NOT NULL THEN g.gc ELSE t.hc END AS host_city,
            CASE WHEN g.ip IS NOT NULL THEN g.gop ELSE t.op END AS operator,
            pa.task_param_name, pa.alarm_template_id,
            $scoreSql AS score,
            CAST(epoch(date_trunc('hour', make_timestamp(m.test_time * 1000000))) AS BIGINT) AS test_time_h,
            CAST(epoch(date_trunc('day', make_timestamp(m.test_time * 1000000))) AS BIGINT) AS test_time_d,
            strftime(CAST(date_trunc('month', make_timestamp(m.test_time * 1000000)) AS DATE), '%Y-%m-%d') AS month_time,
            CAST($Now AS BIGINT) AS create_time
          FROM meas m
          LEFT JOIN probes p ON p.probe_id = m.probe_id
          LEFT JOIN tasks t ON t.task_id = m.task_id
          LEFT JOIN params pa ON pa.task_param_id = t.task_param_id
          LEFT JOIN geo g ON g.ip = m.host_ip"""
      }),

    GraftQuery(
      "q53_http_detail_children",
      (s, dir) => {
        // U3/J9: HTTP detail arrays exploded into re-scored child facts
        // carrying the parent's content-hash id — through the REAL
        // pipeline + explodeHttpDetails.
        val k = col("c_custkey")
        val t = lit(Now) - (k % 60) * 3600
        def el(i: Int) = {
          val dl = when(k % 50 === 0, lit(0)).otherwise((k % 400) + 10 * i)
          concat(
            lit(s"""{"element_name":"el$i","element_num":"""), (k % 9) + i,
            lit(""","element_url":"u","dns_cost":"""), (k % 20) + i,
            lit(""","tcp_cost":"""), k % 15,
            if (i == 0) concat(lit(""","ssl_cost":"""), k % 5) else lit(""),
            lit(""","element_download_cost":"""), dl,
            lit(""","first_byte_cost":"""), k % 60,
            lit(""","thread_num":"""), k % 4,
            lit(""","element_status":"""), (k + i) % 5,
            lit(""","element_size":"""), (k % 300) * 10,
            lit(""","element_http_code":"200","is_localnet":"0","host_ip":"8.8.8."""),
            k % 99, lit(""""}"""))
        }
        val raw = Tables.load(s, dir, "customer").select(concat(
          lit("""[{"probe_id":"p-"""), k % 30,
          lit("""","task_id":"t-"""), k % 7,
          lit("""","task_type_name":"HTTP","test_time":"""), t,
          lit(""","host_ip":"1.2.3."""), k % 40,
          lit("""","detail":["""), el(0), lit(","), el(1),
          lit("]}]")).as("value"))
        val facts = graft.nqs.TaskDataPipeline(
          raw, PipelineFixtures.dims(s, dir), nowEpoch = Now)
        graft.nqs.TaskDataPipeline.explodeHttpDetails(facts)
          .select("parent_id", "id", "element_idx", "element_name",
            "element_num", "dns_cost", "tcp_cost", "ssl_cost",
            "element_download_cost", "first_byte_cost", "thread_num",
            "element_status", "element_size", "conn_cost", "text_cost",
            "avg_speed", "score", "probe_id", "task_id", "task_param_id",
            "task_type_name", "test_time", "test_time_h", "create_time",
            "province_code", "city_code")
      },
      Some {
        val scoreSql = graft.score.ScoreEngine.scoreForSql(
          graft.score.PQDefaults.config.byProtocol("HTTP_DETAIL"),
          name => if (Set("dns_cost", "conn_cost", "text_cost",
              "avg_speed").contains(name))
            graft.score.ScoreEngine.Source(col(name), s"($name)")
          else graft.score.ScoreEngine.Source(
            lit(null).cast("double"), "CAST(NULL AS DOUBLE)"))
        val elSelects = Seq(0, 1).map { i =>
          val ssl = if (i == 0) "CAST(k % 5 AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          s"""SELECT k, CAST($i AS INTEGER) AS element_idx,
            'el$i' AS element_name, CAST((k % 9) + $i AS BIGINT) AS element_num,
            CAST((k % 20) + $i AS DOUBLE) AS dns_cost,
            CAST(k % 15 AS DOUBLE) AS tcp_cost,
            $ssl AS ssl_cost,
            CAST(CASE WHEN k % 50 = 0 THEN 0 ELSE (k % 400) + ${10 * i} END AS DOUBLE) AS element_download_cost,
            CAST(k % 60 AS DOUBLE) AS first_byte_cost,
            CAST(k % 4 AS BIGINT) AS thread_num,
            CAST((k + $i) % 5 AS BIGINT) AS element_status,
            CAST((k % 300) * 10 AS DOUBLE) AS element_size
          FROM base"""
        }.mkString(" UNION ALL ")
        val avgSpeedSql = graft.functions.SafeMath.roundHalfUpSql(
          "(element_size) / ((element_download_cost) / 1000)", 4)
        s"""WITH base AS (SELECT c_custkey AS k FROM customer),
          els AS ($elSelects),
          env AS (SELECT k, 'p-' || (k % 30) AS probe_id,
            't-' || (k % 7) AS task_id,
            CAST(CASE WHEN (k % 60) * 3600 > 108000 THEN $Now
              ELSE $Now - (k % 60) * 3600 END AS BIGINT) AS test_time
            FROM base),
          probes AS (SELECT 'p-' || n_nationkey AS probe_id,
            'PC' || n_nationkey AS province_code,
            'CC' || n_nationkey AS city_code FROM nation),
          tasks AS (SELECT 't-' || r_regionkey AS task_id,
            CAST(r_regionkey + 5 AS BIGINT) AS task_param_id FROM region),
          flat AS (
            SELECT e.*, v.probe_id, v.task_id, v.test_time,
              sha256(v.probe_id || '|' || v.task_id || '|' || 'HTTP' || '|' || v.test_time) AS parent_id,
              COALESCE(e.dns_cost, 0) + COALESCE(e.tcp_cost, 0) + COALESCE(e.ssl_cost, 0) AS conn_cost
            FROM els e JOIN env v ON e.k = v.k),
          flat2 AS (
            SELECT f.*,
              f.conn_cost + COALESCE(f.element_download_cost, 0) AS text_cost,
              CASE WHEN (element_download_cost / 1000) = 0 OR element_download_cost IS NULL
                THEN 0.0E0 ELSE $avgSpeedSql END AS avg_speed
            FROM flat f)
          SELECT parent_id,
            sha256(parent_id || '|' || element_idx || '|' || test_time) AS id,
            element_idx, element_name, element_num, dns_cost, tcp_cost,
            ssl_cost, element_download_cost, first_byte_cost, thread_num,
            element_status, element_size, conn_cost, text_cost, avg_speed,
            $scoreSql AS score,
            f.probe_id, f.task_id, t.task_param_id,
            'HTTP_DETAIL' AS task_type_name, test_time,
            CAST(epoch(date_trunc('hour', make_timestamp(test_time * 1000000))) AS BIGINT) AS test_time_h,
            CAST($Now AS BIGINT) AS create_time,
            p.province_code, p.city_code
          FROM flat2 f
          LEFT JOIN probes p ON p.probe_id = f.probe_id
          LEFT JOIN tasks t ON t.task_id = f.task_id"""
      }),

    GraftQuery(
      "q54_dns_detail_children",
      (s, dir) => {
        // U1/U3 non-HTTP children: the DNS detail spec explodes the raw
        // detail_json (captured before typed parsing, so the
        // protocol-specific element shape survives) into scored
        // DNS_DETAIL child facts.
        val k = col("c_custkey")
        val t = lit(Now) - (k % 60) * 3600
        def el(i: Int) = concat(
          lit(s"""{"domain":"d$i.example","dns_cost":"""), (k + 9 * i) % 25,
          lit(""","success_rate":"""), (k + 13 * i) % 101,
          lit(""","host_ip":"7.7.7."""), k % 9, lit(""""}"""))
        val raw = Tables.load(s, dir, "customer").select(concat(
          lit("""[{"probe_id":"p-"""), k % 30,
          lit("""","task_id":"t-"""), k % 7,
          lit("""","task_type_name":"DNS","test_time":"""), t,
          lit(""","time_cost":"""), k % 80,
          lit(""","success_rate":"""), k % 101,
          lit(""","detail":["""), el(0), lit(","), el(1),
          lit("]}]")).as("value"))
        val facts = graft.nqs.TaskDataPipeline(
          raw, PipelineFixtures.dims(s, dir), nowEpoch = Now)
        graft.nqs.DetailSpecs.explode(facts, graft.nqs.DetailSpecs.dnsDetail)
          .select("parent_id", "id", "element_idx", "domain", "dns_cost",
            "success_rate", "host_ip", "task_type_name", "score",
            "probe_id", "task_id", "task_param_id", "test_time",
            "test_time_h", "create_time")
      },
      Some {
        val scoreSql = graft.score.ScoreEngine.scoreForSql(
          graft.score.PQDefaults.config.byProtocol("DNS_DETAIL"),
          name => if (Set("dns_cost", "success_rate").contains(name))
            graft.score.ScoreEngine.Source(col(name), s"($name)")
          else graft.score.ScoreEngine.Source(
            lit(null).cast("double"), "CAST(NULL AS DOUBLE)"))
        val elSelects = Seq(0, 1).map { i =>
          s"""SELECT k, CAST($i AS INTEGER) AS element_idx,
            'd$i.example' AS domain,
            CAST((k + ${9 * i}) % 25 AS DOUBLE) AS dns_cost,
            CAST((k + ${13 * i}) % 101 AS DOUBLE) AS success_rate,
            '7.7.7.' || (k % 9) AS host_ip
          FROM base"""
        }.mkString(" UNION ALL ")
        s"""WITH base AS (SELECT c_custkey AS k FROM customer),
          els AS ($elSelects),
          env AS (SELECT k, 'p-' || (k % 30) AS probe_id,
            't-' || (k % 7) AS task_id,
            CAST(CASE WHEN (k % 60) * 3600 > 108000 THEN $Now
              ELSE $Now - (k % 60) * 3600 END AS BIGINT) AS test_time
            FROM base),
          tasks AS (SELECT 't-' || r_regionkey AS task_id,
            CAST(r_regionkey + 5 AS BIGINT) AS task_param_id FROM region)
          SELECT
            sha256(v.probe_id || '|' || v.task_id || '|' || 'DNS' || '|' || v.test_time) AS parent_id,
            sha256(sha256(v.probe_id || '|' || v.task_id || '|' || 'DNS' || '|' || v.test_time)
              || '|' || e.element_idx || '|' || v.test_time) AS id,
            e.element_idx, e.domain, e.dns_cost, e.success_rate, e.host_ip,
            'DNS_DETAIL' AS task_type_name,
            $scoreSql AS score,
            v.probe_id, v.task_id, t.task_param_id, v.test_time,
            CAST(epoch(date_trunc('hour', make_timestamp(v.test_time * 1000000))) AS BIGINT) AS test_time_h,
            CAST($Now AS BIGINT) AS create_time
          FROM els e
          JOIN env v ON e.k = v.k
          LEFT JOIN tasks t ON t.task_id = v.task_id"""
      }),

    GraftQuery(
      "q56_dns_resolution_children",
      (s, dir) => {
        // the third detail spec (DNS_RESOLUTION → DNS_RESOLUTION_DETAIL):
        // same machinery as q54, different element shape + child criteria
        // (time_cost-keyed).
        val k = col("c_custkey")
        val t = lit(Now) - (k % 60) * 3600
        def el(i: Int) = concat(
          lit(s"""{"domain":"r$i.example","time_cost":"""), (k + 7 * i) % 90,
          lit(""","success_rate":"""), (k + 5 * i) % 101, lit("}"))
        val raw = Tables.load(s, dir, "customer").select(concat(
          lit("""[{"probe_id":"p-"""), k % 30,
          lit("""","task_id":"t-"""), k % 7,
          lit("""","task_type_name":"DNS_RESOLUTION","test_time":"""), t,
          lit(""","detail":["""), el(0), lit(","), el(1),
          lit("]}]")).as("value"))
        val facts = graft.nqs.TaskDataPipeline(
          raw, PipelineFixtures.dims(s, dir), nowEpoch = Now)
        graft.nqs.DetailSpecs.explode(facts,
            graft.nqs.DetailSpecs.dnsResolutionDetail)
          .select("parent_id", "id", "element_idx", "domain", "time_cost",
            "success_rate", "task_type_name", "score", "probe_id",
            "task_id", "test_time", "create_time")
      },
      Some {
        val scoreSql = graft.score.ScoreEngine.scoreForSql(
          graft.score.PQDefaults.config.byProtocol("DNS_RESOLUTION_DETAIL"),
          name => if (Set("time_cost", "success_rate").contains(name))
            graft.score.ScoreEngine.Source(col(name), s"($name)")
          else graft.score.ScoreEngine.Source(
            lit(null).cast("double"), "CAST(NULL AS DOUBLE)"))
        val elSelects = Seq(0, 1).map { i =>
          s"""SELECT k, CAST($i AS INTEGER) AS element_idx,
            'r$i.example' AS domain,
            CAST((k + ${7 * i}) % 90 AS DOUBLE) AS time_cost,
            CAST((k + ${5 * i}) % 101 AS DOUBLE) AS success_rate
          FROM base"""
        }.mkString(" UNION ALL ")
        s"""WITH base AS (SELECT c_custkey AS k FROM customer),
          els AS ($elSelects),
          env AS (SELECT k, 'p-' || (k % 30) AS probe_id,
            't-' || (k % 7) AS task_id,
            CAST(CASE WHEN (k % 60) * 3600 > 108000 THEN $Now
              ELSE $Now - (k % 60) * 3600 END AS BIGINT) AS test_time
            FROM base)
          SELECT
            sha256(v.probe_id || '|' || v.task_id || '|' || 'DNS_RESOLUTION' || '|' || v.test_time) AS parent_id,
            sha256(sha256(v.probe_id || '|' || v.task_id || '|' || 'DNS_RESOLUTION' || '|' || v.test_time)
              || '|' || e.element_idx || '|' || v.test_time) AS id,
            e.element_idx, e.domain, e.time_cost, e.success_rate,
            'DNS_RESOLUTION_DETAIL' AS task_type_name,
            $scoreSql AS score,
            v.probe_id, v.task_id, v.test_time,
            CAST($Now AS BIGINT) AS create_time
          FROM els e JOIN env v ON e.k = v.k"""
      }),

    GraftQuery(
      "q57_probe_dim_updates",
      (s, dir) => {
        // T6 dim-maintenance output: two gateway reports per probe →
        // keep-latest per probe with pc sentinel repair and the
        // alias-follows-probe_name rule.
        val k = col("s_suppkey")
        def msg(i: Int) = {
          // k%29 keeps every timestamp inside the clamp window, so the
          // newer report (i=0) deterministically wins the keep-latest
          val t = lit(Now) - (k % 29) * 3600 - lit(i * 60)
          val pc = if (i == 0) when(k % 10 === 0, lit("ÿÿÿÿ"))
            .otherwise(concat(lit("M"), k % 5)) else concat(lit("N"), k % 5)
          concat(
            lit("""{"probe_id":"gw-"""), k, lit("""","time":"""), t,
            lit(""","probe_info":{"id":"gw-"""), k,
            lit("""","pc":""""), pc,
            lit("""","vendor":"vd"""), (k + i) % 4,
            lit("""","sn":"sn"""), k,
            lit("""","mac":"mac"""), k,
            lit("""","loid":"lo"""), k,
            lit("""","pppoe_username":"pu"""), k,
            lit("""","hb_interval":"""), (k % 5 + 1) * 60,
            if (i == 0) concat(lit(""","probe_name":"PN"""), k, lit(""""}"""))
            else lit("}"),
            lit("}"))
        }
        val raw = Tables.load(s, dir, "supplier")
          .select(explode(array(msg(0), msg(1))).as("value"))
        val noStored = s.range(0).select(
          col("id").cast("string").as("probe_id"),
          col("id").cast("string").as("access_type_name"),
          col("id").cast("string").as("connect_status"))
        ProbePipelines.gatewayInfoJob(raw, noStored, Now)
          .probeDimUpdates
          .select("id", "info_time", "pc", "vendor", "sn", "mac", "loid",
            "pppoe_username", "hb_interval", "probe_name",
            "probe_alias_suggested", "update_time")
      },
      Some(s"""SELECT 'gw-' || s_suppkey AS id,
          CAST($Now - (s_suppkey % 29) * 3600 AS BIGINT) AS info_time,
          CASE WHEN s_suppkey % 10 = 0 THEN 'DT741-csf'
               ELSE 'M' || (s_suppkey % 5) END AS pc,
          'vd' || (s_suppkey % 4) AS vendor,
          'sn' || s_suppkey AS sn,
          'mac' || s_suppkey AS mac,
          'lo' || s_suppkey AS loid,
          'pu' || s_suppkey AS pppoe_username,
          CAST((s_suppkey % 5 + 1) * 60 AS INTEGER) AS hb_interval,
          'PN' || s_suppkey AS probe_name,
          'PN' || s_suppkey AS probe_alias_suggested,
          CAST($Now AS BIGINT) AS update_time
        FROM supplier""")),

    GraftQuery(
      "q51_register_enrich",
      (s, dir) => {
        // J5 register geo + F15 alias synthesis + F16 region_path through
        // the real register branch (empty probe dim → everything is new).
        val k = col("c_custkey")
        val raw = Tables.load(s, dir, "customer")
          .select(hbMessage(k, concat(lit("1.2.3."), k % 40),
            withBad = false).as("value"))
        val n = Tables.load(s, dir, "nation")
        val nk = col("n_nationkey")
        val geoDim = n.select(
          concat(lit("1.2.3."), nk).as("ip"),
          concat(lit("P"), nk).as("province_name"),
          (nk * 100 + 110000).cast("string").as("province_code"),
          concat(lit("C"), nk).as("city_name"),
          (nk * 100 + 110001).cast("string").as("city_code"),
          when(nk % 3 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("D"), nk)).as("district_name"),
          when(nk % 3 === 0, lit(null).cast("string"))
            .otherwise((nk * 100 + 110002).cast("string")).as("district_code"),
          (nk * 1.5).as("longitude"), (nk * 0.75).as("latitude"))
        val noPat = s.range(0).select(
          col("id").cast("string").as("probe_id"),
          col("id").cast("string").as("access_type_name"),
          col("id").cast("int").as("is_default"),
          col("id").cast("string").as("connect_status"))
        val (_, newProbes) = ProbePipelines.heartbeatJob(
          raw, emptyProbes(s), noPat, geoDim, Now)
        newProbes.select("probe_id", "internet_ip", "probe_alias",
          "region_path", "status", "create_time")
      },
      Some(s"""WITH g AS (
          SELECT '1.2.3.' || n_nationkey AS ip,
            'P' || n_nationkey AS pn,
            CAST(n_nationkey * 100 + 110000 AS VARCHAR) AS pcode,
            'C' || n_nationkey AS cn,
            CAST(n_nationkey * 100 + 110001 AS VARCHAR) AS ccode,
            CASE WHEN n_nationkey % 3 = 0 THEN NULL
                 ELSE 'D' || n_nationkey END AS dn,
            CASE WHEN n_nationkey % 3 = 0 THEN NULL
                 ELSE CAST(n_nationkey * 100 + 110002 AS VARCHAR) END AS dcode
          FROM nation),
        r AS (SELECT 'p-' || c_custkey AS probe_id,
            '1.2.3.' || (c_custkey % 40) AS internet_ip
          FROM customer)
        SELECT probe_id, internet_ip,
          concat_ws('-', g.pn, g.cn, g.dn, '临时',
            substring(sha256(probe_id), 1, 8)) AS probe_alias,
          '/100000/' || concat_ws('/', g.pcode, g.ccode, g.dcode) || '/' AS region_path,
          CAST(10 AS INTEGER) AS status,
          CAST($Now AS BIGINT) AS create_time
        FROM r LEFT JOIN g ON g.ip = r.internet_ip""")),

    GraftQuery(
      "q198_jdbc_batch_sink",
      (s, dir) => {
        // K2/K7's bulk-write physics through a REAL JDBC database: the
        // fact frame goes out via JdbcBatchSink (per-partition writers,
        // the reference's 10k-row/4s flush contract,
        // ClickhouseSink.java:28-31) into an embedded DuckDB file, is
        // read back over the same JDBC URL, and the roundtrip is
        // hash-gated against the parquet truth — a type-mapping, batch
        // or commit bug anywhere in the sink breaks the gate. Batch size
        // is lowered to 1000 so sf0.01's ~7k rows exercise several
        // flush/commit cycles, not one.
        val dbDir = tempDbDir("graft_jdbc")
        val url = s"jdbc:duckdb:${dbDir.resolve("facts.db")}"
        val facts = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity") >= 45)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
          .repartition(4, col("l_orderkey"))
        graft.sources.JdbcBatchSink.write(facts, url, "lineitem_facts",
          batchRows = 1000)
        graft.sources.JdbcBatchSink.ensureDialect()
        s.read.format("jdbc")
          .option("url", url)
          .option("dbtable", "lineitem_facts")
          .option("driver", "org.duckdb.DuckDBDriver")
          .load()
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
          l_extendedprice, l_returnflag
        FROM lineitem WHERE l_quantity >= 45""")),

    GraftQuery(
      "q213_jdbc_sharded_sink",
      (s, dir) => {
        // the reference sink's multi-node rotation
        // (ClickhouseSink.java:43-61, dead code there) made live: the
        // fact frame fans out across TWO embedded DuckDB shard files at
        // PARTITION granularity (partition p → shard p % 2) — each
        // shard's writers keep q198's batch/flush contract and each
        // flush is one transaction on one node. Both shards are read
        // back over JDBC and unioned; the gate hashes the union against
        // the parquet truth, so a partition lost to (or duplicated on)
        // either node breaks it. Shard balance is asserted in
        // JdbcBatchSinkSpec (partition counts are a session property,
        // not gate-stable content).
        val dbDir = tempDbDir("graft_jdbc_shard")
        val urls = Seq(s"jdbc:duckdb:${dbDir.resolve("shard0.db")}",
          s"jdbc:duckdb:${dbDir.resolve("shard1.db")}")
        val facts = Tables.load(s, dir, "orders")
          .filter(col("o_totalprice") >= 200000)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_totalprice"))
          .repartition(4, col("o_custkey"))
        graft.sources.JdbcBatchSink.writeSharded(facts, urls, "order_facts",
          batchRows = 500)
        graft.sources.JdbcBatchSink.ensureDialect()
        urls.map(u => s.read.format("jdbc")
            .option("url", u)
            .option("dbtable", "order_facts")
            .option("driver", "org.duckdb.DuckDBDriver")
            .load())
          .reduce(_.unionByName(_))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_totalprice >= 200000""")),

    GraftQuery(
      "q309_jdbc_schema_evolution",
      (s, dir) => {
        // write-side JDBC schema evolution (ClickhouseSink.java:70-125,
        // dead code in the reference, live here): batch 1 lands (id,
        // name); batch 2 arrives with a NEW acctbal column mid-stream —
        // the sink diffs the frame against the table and ALTERs the
        // column in before inserting, so batch-1 rows read back NULL
        // acctbal and batch-2 rows carry values. The oracle predicts
        // the union from the same parity split; a dropped ALTER, a
        // misnamed column, or a clobbered old row all break the hash.
        val dbDir = tempDbDir("graft_jdbc_evolve")
        val url = s"jdbc:duckdb:${dbDir.resolve("dims.db")}"
        val sup = Tables.load(s, dir, "supplier")
        val batch1 = sup.filter(col("s_suppkey") % 2 === 0)
          .select(col("s_suppkey").as("id"), col("s_name").as("name"))
          .repartition(2, col("id"))
        val batch2 = sup.filter(col("s_suppkey") % 2 === 1)
          .select(col("s_suppkey").as("id"), col("s_name").as("name"),
            col("s_acctbal").as("acctbal"))
          .repartition(2, col("id"))
        graft.sources.JdbcBatchSink.write(batch1, url, "dim_suppliers",
          batchRows = 100)
        graft.sources.JdbcBatchSink.write(batch2, url, "dim_suppliers",
          batchRows = 100)
        graft.sources.JdbcBatchSink.ensureDialect()
        s.read.format("jdbc")
          .option("url", url)
          .option("dbtable", "dim_suppliers")
          .option("driver", "org.duckdb.DuckDBDriver")
          .load()
      },
      Some("""SELECT s_suppkey AS id, s_name AS name,
          CASE WHEN s_suppkey % 2 = 1 THEN s_acctbal ELSE NULL END AS acctbal
        FROM supplier""")),

    GraftQuery(
      "q251_jsonl_quarantine",
      (s, dir) => {
        // corrupt-record routing on a synthesized dirty JSONL feed:
        // every 7th line is truncated mid-object, every 11th isn't JSON
        // at all; both must land in quarantine with the raw line intact
        // while every other row parses — the oracle predicts the split
        // from the same id arithmetic, so a parser that drops or
        // misroutes one line breaks rows or hash.
        val k = col("c_custkey")
        val good = concat(lit("""{"k":"""), k,
          lit(""","name":""""), col("c_name"), lit(""""}"""))
        val value = when(k % 7 === 0, substring(good, 1, 10))
          .when(k % 11 === 0, concat(lit("garbage-"), k))
          .otherwise(good)
        val lines = Tables.load(s, dir, "customer")
          .select(k.as("line_id"), value.as("value"))
        graft.sources.Ingest.jsonlQuarantine(lines, "line_id", "value",
          org.apache.spark.sql.types.StructType.fromDDL(
            "k LONG, name STRING"))
      },
      Some("""WITH src AS (SELECT c_custkey AS line_id,
            (c_custkey % 7 = 0 OR c_custkey % 11 = 0) AS bad,
            CASE WHEN c_custkey % 7 = 0 THEN
                substr('{"k":' || CAST(c_custkey AS VARCHAR) || ',"name":"'
                  || c_name || '"}', 1, 10)
              WHEN c_custkey % 11 = 0 THEN
                'garbage-' || CAST(c_custkey AS VARCHAR)
              ELSE NULL END AS rawbad,
            c_custkey AS kk, c_name AS nm
          FROM customer)
        SELECT line_id, NOT bad AS ok,
          CASE WHEN bad THEN NULL ELSE kk END AS k,
          CASE WHEN bad THEN NULL ELSE nm END AS name,
          CASE WHEN bad THEN rawbad ELSE NULL END AS quarantine
        FROM src"""))
  )
}

/** Deterministic dims shared by the pipeline gates: probes from nation,
  * tasks/params from region, geo from nation — the same derivations the
  * oracles re-state in SQL. */
object PipelineFixtures {
  def dims(s: SparkSession, dir: String): graft.nqs.TaskDataPipeline.Dims = {
    val n = Tables.load(s, dir, "nation")
    val nk = col("n_nationkey")
    val probes = n.select(
      concat(lit("p-"), nk).as("id"),
      concat(lit("PN"), nk).as("probe_name"),
      concat(lit("PA"), nk).as("probe_alias"),
      concat(lit("pu"), nk).as("pppoe_username"),
      concat(lit("lo"), nk).as("loid"),
      concat(lit("sn"), nk).as("sn"),
      concat(lit("9.9.9."), nk).as("ip"),
      concat(lit("pc"), nk).as("pc"),
      concat(lit("vd"), nk % 4).as("vendor"),
      concat(lit("PC"), nk).as("province_code"),
      concat(lit("PV"), nk).as("province_name"),
      concat(lit("CC"), nk).as("city_code"),
      concat(lit("CN"), nk).as("city_name"),
      concat(lit("DC"), nk).as("district_code"),
      concat(lit("DN"), nk).as("district_name"),
      concat(lit("TC"), nk).as("town_code"),
      concat(lit("TN"), nk).as("town_name"))
    val r = Tables.load(s, dir, "region")
    val rk = col("r_regionkey")
    val tasks = r.select(
      concat(lit("t-"), rk).as("id"),
      concat(lit("md5-"), rk).as("task_md5"),
      (rk + 5).as("task_param_id"),
      concat(lit("AT"), rk).as("access_type_name"),
      concat(lit("di"), rk).as("dest_id"),
      concat(lit("dn"), rk).as("dest_name"),
      concat(lit("da"), rk).as("dest_addr"),
      concat(lit("HP"), rk).as("host_province"),
      concat(lit("HC"), rk).as("host_city"),
      concat(lit("OP"), rk).as("operator"))
    val params = r.select(
      (rk + 5).as("id"),
      concat(lit("TPN"), rk).as("task_param_name"),
      rk.as("alarm_template_id"))
    val geo = n.select(
      concat(lit("1.2.3."), nk).as("ip"),
      concat(lit("GP"), nk).as("province_name"),
      concat(lit("GC"), nk).as("city_name"),
      concat(lit("GO"), nk).as("operator"))
    graft.nqs.TaskDataPipeline.Dims(probes, tasks, params, geo)
  }
}
