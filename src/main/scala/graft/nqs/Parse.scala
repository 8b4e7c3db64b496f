package graft.nqs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Topic parsing + validation (SURVEY.md §2.3 P1-P4).
  *
  * Each parser takes a DataFrame with a raw string column `value` (as a
  * Kafka source delivers) and returns typed rows plus a `bad_msg` flag;
  * invalid rows are kept and routable (`.filter(col("bad_msg"))`) — the
  * reference logs-and-drops, we keep a rejected side output. All parsing is
  * `from_json` / `split` — codegen'd, no UDF, no per-record driver work.
  */
object Parse {

  /** `data_upload`: one Kafka message = a JSON ARRAY of measurements
    * (`ConsoleTaskDataMain.java:56-76`) → explode to one row each.
    * bad_msg when probe_id/task_id/task_type_name missing
    * (`DataMessage.java:21-42`). */
  def dataUpload(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    raw
      // two-step parse: first split the array into raw element strings so
      // the polymorphic `detail` payload (HTTP elements, DNS domains,
      // TRACE hops — same key, different shapes) survives as raw JSON
      // for the per-protocol detail parsers (U3).
      .select(explode(from_json(col("value"), ArrayType(StringType))).as("raw_msg"))
      .withColumn("m", from_json(col("raw_msg"), Schemas.dataUpload))
      .select(col("m.*"),
        get_json_object(col("raw_msg"), "$.detail").as("detail_json"))
      .withColumn("bad_msg",
        col("probe_id").isNull || trim(col("probe_id")) === "" ||
        col("task_id").isNull || trim(col("task_id")) === "" ||
        col("task_type_name").isNull || trim(col("task_type_name")) === "")
  }

  /** `heartbeat_info`: wire format `<json>\x02<internet_ip>[\x02<ts>]`,
    * split on ASCII 0x02 (`HeartBeatMessage.java:16-21`). bad_msg when the
    * probe id is missing (`:23-28`). */
  def heartbeat(raw: DataFrame): DataFrame = {
    val parts = split(col("value"), "\\x02")
    raw
      .withColumn("__parts", parts)
      .withColumn("j", from_json(col("__parts").getItem(0), Schemas.heartbeat))
      .select(
        col("j.info.id").as("probe_id"),
        col("j.info.soft_ver").as("soft_ver"),
        col("j.info.so_ver").as("so_ver"),
        col("j.info.task_queue_size").as("task_queue_size"),
        col("j.info.task_size").as("task_size"),
        col("j.time").as("heartbeat_time"),
        col("__parts").getItem(1).as("internet_ip"),
        when(size(col("__parts")) > 2, col("__parts").getItem(2).cast("long"))
          .as("recv_time"))
      .withColumn("bad_msg", col("probe_id").isNull || trim(col("probe_id")) === "")
  }

  /** `gateway_info`: single JSON object (`GwInfoMessage.java:8-23`). */
  def gatewayInfo(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value"), Schemas.gatewayInfo).as("g"))
      .select(col("g.*"))
      .withColumn("bad_msg", col("probe_id").isNull || trim(col("probe_id")) === "")
}
