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
        FROM r LEFT JOIN g ON g.ip = r.internet_ip"""))
  )
}
