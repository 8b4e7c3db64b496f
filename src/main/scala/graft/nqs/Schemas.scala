package graft.nqs

import org.apache.spark.sql.types._

/** Input schemas for the three probe-telemetry topics (FIXTURES.md §1-§3;
  * reference message classes under `CONSOLE/handler/message/`).
  *
  * Design: the reference copies protocol payload fields from raw JSON by
  * reflecting over per-task entity classes (`WindowDataParser.java:41-44`).
  * We use ONE explicit wide envelope+payload struct per topic — static
  * schemas mean `from_json` is a single codegen'd parse, Catalyst prunes
  * unused fields, and nested arrays stay REAL arrays (`ArrayType(Struct)`)
  * instead of JSON strings, serialized back only at the sink boundary.
  */
object Schemas {

  /** HTTP element detail (`GEN/entity/gwdata/GwHttpDetailData.java:12-60`). */
  val httpDetail: StructType = StructType(Seq(
    StructField("element_name", StringType),
    StructField("element_num", LongType),
    StructField("element_url", StringType),
    StructField("dns_cost", DoubleType),
    StructField("tcp_cost", DoubleType),
    StructField("ssl_cost", DoubleType),
    StructField("element_download_cost", DoubleType),
    StructField("first_byte_cost", DoubleType),
    StructField("thread_num", LongType),
    StructField("element_status", LongType),
    StructField("element_size", DoubleType),
    StructField("element_http_code", StringType),
    StructField("is_localnet", StringType),
    StructField("host_ip", StringType)))

  /** `data_upload` measurement object: common envelope
    * (`DataMessage.java:15-42`) + the union of protocol payloads
    * (`GEN/entity/gwdata/` entities). */
  val dataUpload: StructType = StructType(Seq(
    // envelope
    StructField("probe_id", StringType),
    StructField("task_id", StringType),
    StructField("task_type_name", StringType),
    StructField("task_from", IntegerType),
    StructField("test_time", LongType),
    StructField("host_ip", StringType),
    StructField("error_code", StringType),
    // HTTP (GwHttpData.java:10-77)
    StructField("real_ip", StringType),
    StructField("jump_iplist", StringType),
    StructField("detail", ArrayType(httpDetail)),
    StructField("tcp_cost", DoubleType),
    StructField("ssl_cost", DoubleType),
    StructField("dns_cost", DoubleType),
    StructField("trans_body_cost", DoubleType),
    StructField("page_size", DoubleType),
    StructField("first_byte_cost", DoubleType),
    StructField("http_code", StringType),
    // PING (GwPingData.java:9-14)
    StructField("rtt", DoubleType),
    StructField("jitter", DoubleType),
    StructField("lost_rate", DoubleType),
    // DNS (GwDnsData.java:11-16)
    StructField("time_cost", DoubleType),
    StructField("success_rate", DoubleType),
    // FLASH (GwFlashData.java:11-46)
    StructField("real_url", StringType),
    StructField("conn_cost", DoubleType),
    StructField("buffer_cost", DoubleType),
    StructField("content_size", DoubleType),
    StructField("avg_speed", DoubleType),
    StructField("first_pause_cost", DoubleType),
    StructField("bitrate", DoubleType),
    StructField("play_duration", DoubleType),
    StructField("pause_cost", DoubleType),
    StructField("pause_count", DoubleType),
    StructField("carlton_rate", DoubleType),
    // GAME (perceived_quality.xml:90-112, GameDataParser.java:11-31)
    StructField("tcp_delay", DoubleType),
    // SMTP / WECHAT / SPEED / FTP scored fields (perceived_quality.xml:184-243)
    StructField("send_speed", DoubleType),
    StructField("response_cost", DoubleType),
    StructField("bandwidth_ratio", DoubleType),
    StructField("download_speed", DoubleType),
    StructField("upload_speed", DoubleType)))

  /** `heartbeat_info` JSON part (`HeartBeatMessage.java:22-28`). The wire
    * framing `<json>\x02<internet_ip>[\x02<ts>]` is handled in Parse. */
  val heartbeat: StructType = StructType(Seq(
    StructField("info", StructType(Seq(
      StructField("id", StringType),
      StructField("soft_ver", StringType),
      StructField("so_ver", StringType),
      StructField("task_queue_size", IntegerType),
      StructField("task_size", IntegerType)))),
    StructField("time", LongType)))

  /** `gateway_info` (`GwInfoMessage.java:8-28`, FIXTURES.md §3). */
  val gatewayInfo: StructType = StructType(Seq(
    StructField("probe_id", StringType),
    StructField("time", LongType),
    StructField("probe_info", StructType(Seq(
      StructField("id", StringType),
      StructField("loid", StringType),
      StructField("pppoe_username", StringType),
      StructField("pc", StringType),
      StructField("vendor", StringType),
      StructField("sn", StringType),
      StructField("mac", StringType),
      StructField("hb_interval", IntegerType),
      StructField("data_interval", IntegerType),
      StructField("ram_size", DoubleType),
      StructField("flash_size", DoubleType),
      StructField("probe_name", StringType)))),
    StructField("access_type_info", ArrayType(StructType(Seq(
      StructField("access_type_name", StringType),
      StructField("connect_status", StringType),
      StructField("is_default", IntegerType),
      StructField("mac", StringType),
      StructField("ip", StringType),
      StructField("mask", StringType),
      StructField("dns", StringType),
      StructField("gateway", StringType),
      StructField("link_type", StringType),
      StructField("no", StringType),
      StructField("speed", DoubleType))))),
    StructField("traffic_info", ArrayType(StructType(Seq(
      StructField("access_type_name", StringType),
      StructField("ip", StringType),
      StructField("up_avg", DoubleType),
      StructField("up_max", DoubleType),
      StructField("down_avg", DoubleType),
      StructField("down_max", DoubleType))))),
    StructField("status_info", StructType(Seq(
      StructField("cpu_rate", DoubleType),
      StructField("ram_rate", DoubleType),
      StructField("run_time", StringType)))),
    StructField("sgw_info", StructType(Seq(
      StructField("loid", StringType),
      StructField("pppoe_username", StringType),
      StructField("pon_info", StructType(Seq(
        StructField("current", DoubleType),
        StructField("rx_power", DoubleType),
        StructField("tx_power", DoubleType),
        StructField("temperature", DoubleType),
        StructField("voltage", DoubleType)))))))))
}
