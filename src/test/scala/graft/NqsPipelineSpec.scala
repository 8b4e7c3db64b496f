package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.nqs._

object NqsFixtures {
  val Now = 1723420800L // 2024-08-12 00:00:00 UTC

  val httpMsg: String =
    s"""{"probe_id":"p-0001","task_id":"t-0001","task_type_name":"HTTP",
       |"task_from":10,"test_time":$Now,"host_ip":"1.2.3.4",
       |"dns_cost":20.0,"tcp_cost":30.0,"ssl_cost":10.0,
       |"trans_body_cost":500.0,"page_size":2048.0,"first_byte_cost":120.0,
       |"http_code":"200","detail":[
       |{"element_name":"a.js","element_num":1,"dns_cost":1.0,"tcp_cost":2.0,
       | "ssl_cost":3.0,"element_download_cost":10.0,"thread_num":1,
       | "element_status":0,"element_size":100.0},
       |{"element_name":"b.png","element_num":2,"dns_cost":2.0,"tcp_cost":2.0,
       | "ssl_cost":2.0,"element_download_cost":20.0,"thread_num":2,
       | "element_status":1,"element_size":200.0}]}""".stripMargin.replaceAll("\n", "")

  val pingMsg: String =
    s"""{"probe_id":"p-0001","task_id":"t-0002","task_type_name":"PING",
       |"task_from":10,"test_time":$Now,"rtt":20.0,"jitter":1.0,
       |"lost_rate":0.005}""".stripMargin.replaceAll("\n", "")

  val stalePingMsg: String = // test_time 40h old → clamped to Now
    s"""{"probe_id":"p-0002","task_id":"t-0002","task_type_name":"PING",
       |"task_from":10,"test_time":${Now - 144000},"rtt":50.0,
       |"lost_rate":0.2}""".stripMargin.replaceAll("\n", "")

  val badMsg: String = // missing task_id
    s"""{"probe_id":"p-0001","task_type_name":"PING","test_time":$Now,
       |"rtt":10.0}""".stripMargin.replaceAll("\n", "")

  val gameMsg: String =
    s"""{"probe_id":"p-0001","task_id":"t-0003","task_type_name":"GAME",
       |"task_from":10,"test_time":$Now,"tcp_delay":40.0,"rtt":25.0,
       |"dns_cost":0.0,"tcp_cost":0.0,"ssl_cost":0.0,"conn_cost":55.0,
       |"page_size":100.0,"trans_body_cost":50.0,"avg_speed":0.0}"""
      .stripMargin.replaceAll("\n", "")

  def rawBatch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(s"[$httpMsg,$pingMsg]", s"[$stalePingMsg,$badMsg,$gameMsg]").toDF("value")
  }

  def dims(spark: SparkSession): TaskDataPipeline.Dims = {
    import spark.implicits._
    val probes = Seq(
      ("p-0001", "probe one", "alias1", "pppoe1", "loid1", "sn1", "10.0.0.1",
        "DT741-csf", "vendorA", "440000", "广东省", "440100", "广州市",
        "440106", "天河区", "", ""),
      ("p-0002", "probe two", "alias2", "pppoe2", "loid2", "sn2", "10.0.0.2",
        "other", "vendorB", "110000", "北京市", "110100", "北京市", "110108",
        "海淀区", "", ""))
      .toDF("id", "probe_name", "probe_alias", "pppoe_username", "loid", "sn",
        "ip", "pc", "vendor", "province_code", "province_name", "city_code",
        "city_name", "district_code", "district_name", "town_code", "town_name")
    val tasks = Seq(
      ("t-0001", "md5a", 5L, "LAN1", "d1", "dest one", "www.example.com",
        "湖北省", "武汉市", "电信"),
      ("t-0002", "md5b", 6L, "LAN1", "d2", "dest two", "8.8.8.8", "湖北省",
        "武汉市", "联通"),
      ("t-0003", "md5c", 7L, "LAN1", "d3", "dest three", "game.example.com",
        "湖北省", "武汉市", "移动"))
      .toDF("id", "task_md5", "task_param_id", "access_type_name", "dest_id",
        "dest_name", "dest_addr", "host_province", "host_city", "operator")
    val params = Seq((5L, "http param", 1L), (6L, "ping param", 2L), (7L, "game param", 3L))
      .toDF("id", "task_param_name", "alarm_template_id")
    val ipRegion = Seq(
      ("1.2.3.4", "330000", "浙江省", "330100", "杭州市", "330106", "西湖区",
        "电信", 120.1, 30.2))
      .toDF("ip", "province_code", "province_name", "city_code", "city_name",
        "district_code", "district_name", "operator", "longitude", "latitude")
    TaskDataPipeline.Dims(probes, tasks, params, ipRegion)
  }
}

/** End-to-end batch run of the three NQS job pipelines over FIXTURES.md-
  * shaped messages, asserting the reference semantics row by row. */
class NqsPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import NqsFixtures._

  lazy val facts: DataFrame =
    TaskDataPipeline(rawBatch(spark), dims(spark), nowEpoch = Now,
      firstScreenFactor = 1.0).cache()

  test("bad records filtered; valid records enriched with probe+task+geo") {
    assert(facts.count() === 4) // http, ping, stale ping, game
    val http = facts.filter(col("task_type_name") === "HTTP").collect()(0)
    assert(http.getAs[String]("probe_name") === "probe one")
    assert(http.getAs[String]("task_param_name") === "http param")
    // host_ip 1.2.3.4 (public) overrides task host_province via geo dim
    assert(http.getAs[String]("host_province") === "浙江省")
    assert(http.getAs[String]("operator") === "电信")
    // PING task has no geo row for its host_ip → task defaults kept
    val ping = facts.filter(col("task_id") === "t-0002" && col("probe_id") === "p-0001").collect()(0)
    assert(ping.getAs[String]("host_province") === "湖北省")
  }

  test("timestamp clamp repairs stale test_time to now") {
    val stale = facts.filter(col("probe_id") === "p-0002").collect()(0)
    assert(stale.getAs[Long]("test_time") === Now)
    assert(stale.getAs[Long]("test_time_d") === Now - (Now % 86400))
  }

  test("HTTP detail aggregates + page metrics + score") {
    val h = facts.filter(col("task_type_name") === "HTTP").collect()(0)
    assert(h.getAs[Int]("elements_sum") === 2)
    assert(h.getAs[Int]("elements_success_sum") === 1)
    assert(h.getAs[Double]("element_total_size") === 300.0)
    assert(h.getAs[Double]("element_load_cost") === 26.0) // max(16, 26)
    assert(h.getAs[Double]("conn_cost") === 60.0)
    assert(h.getAs[Double]("text_cost") === 560.0)
    assert(h.getAs[Double]("page_total_cost") === 586.0)
    val score = h.getAs[Double]("score")
    assert(score > 0 && score <= 100)
  }

  test("GAME fallback: all-zero dns/tcp/ssl keeps reported conn_cost; speed computed") {
    val g = facts.filter(col("task_type_name") === "GAME").collect()(0)
    assert(g.getAs[Double]("conn_cost") === 55.0)
    assert(g.getAs[Double]("avg_speed") === 2000.0) // 100/(50/1000)
  }

  test("deterministic ids are stable across runs") {
    val again = TaskDataPipeline(rawBatch(spark), dims(spark), nowEpoch = Now)
    val a = facts.select("id").collect().map(_.getString(0)).toSet
    val b = again.select("id").collect().map(_.getString(0)).toSet
    assert(a === b && a.size === 4)
  }

  test("HTTP detail explosion creates scored children with parent FK") {
    val children = TaskDataPipeline.explodeHttpDetails(facts)
    val rows = children.orderBy("element_idx").collect()
    assert(rows.length === 2)
    val parentId = facts.filter(col("task_type_name") === "HTTP")
      .collect()(0).getAs[String]("id")
    assert(rows.forall(_.getAs[String]("parent_id") === parentId))
    assert(rows(0).getAs[Double]("conn_cost") === 6.0)  // per-element dns+tcp+ssl
    assert(rows(0).getAs[String]("task_type_name") === "HTTP_DETAIL")
    assert(rows.map(_.getAs[String]("id")).distinct.length === 2)
  }

  test("DNS/TRACE detail explosion via raw detail_json capture") {
    import spark.implicits._
    val dnsMsg =
      s"""{"probe_id":"p-0001","task_id":"t-0002","task_type_name":"DNS",
         |"task_from":10,"test_time":$Now,"time_cost":35.0,"success_rate":99.0,
         |"detail":[{"domain":"a.com","dns_cost":30.0,"success_rate":100.0},
         |{"domain":"b.com","dns_cost":250.0,"success_rate":50.0}]}"""
        .stripMargin.replaceAll("\n", "")
    val traceMsg =
      s"""{"probe_id":"p-0001","task_id":"t-0002","task_type_name":"TRACE",
         |"task_from":10,"test_time":$Now,
         |"detail":[{"hops":1,"ip":"10.0.0.1","rtt":2.0,"jitter":0.1,"lost_rate":0.0},
         |{"hops":2,"ip":"1.1.1.1","rtt":15.0,"jitter":1.0,"lost_rate":0.01}]}"""
        .stripMargin.replaceAll("\n", "")
    val raw = Seq(s"[$dnsMsg,$traceMsg]").toDF("value")
    val facts2 = TaskDataPipeline(raw, dims(spark), nowEpoch = Now)
    val dnsChildren = DetailSpecs.explode(facts2, DetailSpecs.dnsDetail)
    val rows = dnsChildren.orderBy("element_idx").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("domain") === "a.com")
    assert(rows(0).getAs[String]("task_type_name") === "DNS_DETAIL")
    // DNS_DETAIL criteria: dns_cost 30 → band (0,40]; success 100 → (70,100]
    assert(rows(0).getAs[Double]("score") > 90.0)
    assert(rows(1).getAs[Double]("score") < rows(0).getAs[Double]("score"))
    val traceChildren = DetailSpecs.explode(facts2, DetailSpecs.traceDetail)
    val t = traceChildren.orderBy("element_idx").collect()
    assert(t.length === 2)
    assert(t(0).getAs[Long]("hops") === 1L)
    assert(t(0).getAs[Double]("score") === 0.0) // no TRACE_DETAIL criteria
  }

  test("heartbeat job: register/heartbeat split, geo synthesis, port status") {
    import spark.implicits._
    val raw = Seq(
      s"""{"info":{"id":"p-0001","soft_ver":"1.2","so_ver":"0.9",
         |"task_queue_size":2,"task_size":17},"time":$Now}5.6.7.8"""
        .stripMargin.replaceAll("\n", ""),
      s"""{"info":{"id":"p-9999","soft_ver":"1.0","so_ver":"0.1",
         |"task_queue_size":0,"task_size":0},"time":$Now}1.2.3.4$Now"""
        .stripMargin.replaceAll("\n", "")).toDF("value")
    val pat = Seq(("p-0001", "LAN1", 1, "connected"))
      .toDF("probe_id", "access_type_name", "is_default", "connect_status")
    val (hb, newProbes) = ProbePipelines.heartbeatJob(
      raw, dims(spark).probes, pat, dims(spark).ipRegion, Now)
    val rows = hb.orderBy("probe_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Int]("status") === 10) // known probe, port connected
    assert(rows(1).getAs[Int]("status") === 10) // fresh registration
    val np = newProbes.collect()(0)
    assert(np.getAs[String]("probe_id") === "p-9999")
    assert(np.getAs[String]("probe_alias").startsWith("浙江省-杭州市-西湖区-临时-"))
    assert(np.getAs[String]("region_path") === "/100000/330000/330100/330106/")
  }

  test("gateway-info job: 4-way routing, pon normalization, access diff") {
    import spark.implicits._
    val gw =
      s"""{"probe_id":"p-0001","time":$Now,
         |"probe_info":{"id":"p-0001","pc":"DT741-csf","vendor":"v","sn":"s",
         |  "loid":"l","pppoe_username":"u","hb_interval":120},
         |"access_type_info":[
         |  {"access_type_name":"LAN1","connect_status":"connected","is_default":1},
         |  {"access_type_name":"WLAN1","connect_status":"connected","is_default":0}],
         |"traffic_info":[
         |  {"access_type_name":"wan","up_avg":1.2,"up_max":3.4,"down_avg":5.6,"down_max":7.8},
         |  {"access_type_name":"lan","up_avg":0.1,"up_max":0.2,"down_avg":0.3,"down_max":0.4}],
         |"status_info":{"cpu_rate":12.5,"ram_rate":43.1,"run_time":"86400"},
         |"sgw_info":{"loid":"l","pon_info":{"current":12.0,"rx_power":-215000.0,
         |  "tx_power":2.1,"temperature":45.0,"voltage":3.3}}}"""
        .stripMargin.replaceAll("\n", "")
    val stored = Seq(
      ("p-0001", "LAN1", "connected"),
      ("p-0001", "OLD_PORT", "connected"),
      ("p-0001", "default_name", "connected"))
      .toDF("probe_id", "access_type_name", "connect_status")
    val out = ProbePipelines.gatewayInfoJob(Seq(gw).toDF("value"), stored, Now)
    assert(out.traffic.count() === 2)
    assert(out.status.collect()(0).getAs[Double]("cpu_rate") === 12.5)
    val pon = out.pon.collect()(0)
    assert(pon.getAs[Double]("rx_power") === -21.5) // ×10⁻⁴ for DT741-csf
    val actions = out.accessDiff.collect()
      .map(r => r.getAs[String]("access_type_name") -> r.getAs[String]("action")).toMap
    assert(actions("LAN1") === "update")
    assert(actions("WLAN1") === "insert")
    assert(actions("OLD_PORT") === "delete")
    assert(!actions.contains("default_name")) // never deleted
    val pinfo = out.pinfo.collect()(0)
    assert(pinfo.getAs[String]("access_type_info").contains("WLAN1"))
  }
}
