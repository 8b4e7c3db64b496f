package graft.nqs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TimeBuckets
import graft.operators.SetDiff

/** The `ConsoleProbeHeartDataMain` and `ConsoleProbeInfoDataMain`
  * topologies as pure dataflow (SURVEY.md §3.2-§3.3).
  *
  * Deliberate redesign (SURVEY §7 risks): the reference mutates MySQL and
  * Redis from inside window functions; here every side effect becomes an
  * OUTPUT DataFrame (new-probe upserts, port-diff actions) the caller
  * writes in `foreachBatch` — replay-safe and idempotent.
  */
object ProbePipelines {

  /** Heartbeat job: parse → validate → clamp → split register/heartbeat →
    * per-branch enrichment → union into `c_p_heartbeat` rows
    * (`WindowHeartbeatProcessFunction.java:75-170`,
    * `WindowRegisterProcessFunction.java:76-184`).
    *
    * Returns (heartbeatFacts, newProbes): the second output is the dim
    * maintenance the reference did inline (`:123-148`).
    */
  def heartbeatJob(raw: DataFrame, probes: DataFrame, probeAccessType: DataFrame,
      ipRegion: DataFrame, nowEpoch: Long): (DataFrame, DataFrame) = {
    val parsed = parseClampHeartbeat(raw, nowEpoch)
    val (regs, beats) = Enrich.splitByExistence(parsed, probes)
    buildHeartbeatOutputs(regs, beats, probeAccessType, ipRegion, nowEpoch)
  }

  /** Heartbeat parse + P9 timestamp clamp — the stateless prefix, usable
    * directly on a streaming DataFrame (pure expressions). */
  def parseClampHeartbeat(raw: DataFrame, nowEpoch: Long): DataFrame =
    Parse.heartbeat(raw).filter(!col("bad_msg")).drop("bad_msg")
      .withColumn("heartbeat_time",
        when(col("heartbeat_time").isNull ||
            abs(lit(nowEpoch) - col("heartbeat_time")) > 108000L, lit(nowEpoch))
          .otherwise(col("heartbeat_time")))

  /** Heartbeat job over a stream pre-classified by
    * [[graft.streaming.StatefulOps.firstSeenRows]]: a row is a
    * registration iff the state store says it's the first sighting AND
    * the probe isn't in the static dim — no re-read of the registration
    * sink, no per-batch growth. */
  def heartbeatJobClassified(classified: DataFrame, probes: DataFrame,
      probeAccessType: DataFrame, ipRegion: DataFrame,
      nowEpoch: Long): (DataFrame, DataFrame) = {
    val ids = probes.select(col("id").as("probe_id"))
    val regs = classified.filter(col("is_first"))
      .join(broadcast(ids), Seq("probe_id"), "left_anti")
      .drop("is_first")
    val beats = classified
      .join(broadcast(ids), Seq("probe_id"), "left_semi")
      .unionByName(classified.filter(!col("is_first"))
        .join(broadcast(ids), Seq("probe_id"), "left_anti"))
      .drop("is_first")
    buildHeartbeatOutputs(regs, beats, probeAccessType, ipRegion, nowEpoch)
  }

  private def buildHeartbeatOutputs(regs: DataFrame, beats: DataFrame,
      probeAccessType: DataFrame, ipRegion: DataFrame,
      nowEpoch: Long): (DataFrame, DataFrame) = {
    // register branch: geo from internet_ip (J5), alias synthesis (F15),
    // region_path (F16); status 10 = newly alive.
    val geo = ipRegion.select(
      col("ip").as("internet_ip"),
      col("province_code").as("g_province_code"), col("province_name").as("g_province_name"),
      col("city_code").as("g_city_code"), col("city_name").as("g_city_name"),
      col("district_code").as("g_district_code"), col("district_name").as("g_district_name"),
      col("longitude").as("g_lng"), col("latitude").as("g_lat"))
    val newProbes = regs.join(broadcast(geo), Seq("internet_ip"), "left")
      .withColumn("probe_alias",
        concat_ws("-",
          array_compact(array(col("g_province_name"), col("g_city_name"),
            col("g_district_name"), lit("临时"),
            substring(sha2(col("probe_id"), 256), 1, 8)))))
      .withColumn("region_path",
        concat(lit("/100000/"),
          concat_ws("/", array_compact(array(
            col("g_province_code"), col("g_city_code"), col("g_district_code")))),
          lit("/")))
      .withColumn("status", lit(10))
      .withColumn("create_time", lit(nowEpoch))

    // heartbeat branch: J6 default-port status.
    val hb = Enrich.withDefaultPortStatus(beats, probeAccessType)

    // both branches emit heartbeat fact rows → one table (§2.7 union).
    val regFacts = newProbes.select(
      col("probe_id"), col("heartbeat_time"), col("status"),
      col("soft_ver"), col("so_ver"), col("task_queue_size"), col("task_size"),
      col("internet_ip"))
    val hbFacts = hb.select(
      col("probe_id"), col("heartbeat_time"), col("status"),
      col("soft_ver"), col("so_ver"), col("task_queue_size"), col("task_size"),
      col("internet_ip"))
    val facts = TimeBuckets.withBuckets(
        regFacts.unionByName(hbFacts)
          .withColumn("__ts", to_timestamp(col("heartbeat_time"))),
        "__ts", "heartbeat_time")
      .drop("__ts")
      .withColumn("create_time", lit(nowEpoch))
      .withColumn("id", TaskDataPipeline.rowId(col("probe_id"), col("heartbeat_time")))
    (facts, newProbes)
  }

  /** Gateway-info job: parse → validate → 4-way route on nested payload
    * presence (P7, `ProbeInfoProcess.java:53-81`) + access-type diff (J8).
    * Returns the five outputs: (pinfo, traffic, status, pon, accessDiff).
    */
  def gatewayInfoJob(raw: DataFrame, storedAccessTypes: DataFrame,
      nowEpoch: Long): GwOutputs = {
    val parsed = Parse.gatewayInfo(raw).filter(!col("bad_msg")).drop("bad_msg")
      .withColumn("info_time",
        when(col("time").isNull || abs(lit(nowEpoch) - col("time")) > 108000L,
          lit(nowEpoch)).otherwise(col("time")))

    def stamp(df: DataFrame, tsCol: String = "info_time"): DataFrame =
      TimeBuckets.withBuckets(
          df.withColumn("__ts", to_timestamp(col(tsCol))), "__ts", tsCol)
        .drop("__ts")
        .withColumn("create_time", lit(nowEpoch))

    // pinfo snapshot: JSON-serialized nested payloads, exactly the
    // reference's c_p_pinfo row (`WindowProbeInfoProcessFunction.java:104-108`)
    // — to_json only at this sink boundary. pc sentinel repair (F12).
    val pinfo = stamp(parsed
      .filter(col("probe_info").isNotNull)
      .select(
        col("probe_id"), col("info_time"),
        when(col("probe_info.pc") === "ÿÿÿÿ", lit("DT741-csf"))
          .otherwise(col("probe_info.pc")).as("pc"),
        col("probe_info.vendor").as("vendor"),
        col("probe_info.sn").as("sn"),
        col("probe_info.loid").as("loid"),
        col("probe_info.pppoe_username").as("pppoe_username"),
        // the raw payload JSON too — the c_p_pinfo table stores it whole
        to_json(col("probe_info")).as("probe_info"),
        to_json(col("access_type_info")).as("access_type_info"),
        to_json(col("traffic_info")).as("traffic_info"),
        to_json(col("status_info")).as("status_info"),
        to_json(col("sgw_info")).as("sgw_info")))
      .withColumn("id", TaskDataPipeline.rowId(col("probe_id"), col("info_time")))

    // traffic: explode per-port rows (`WindowProbeTrafficProcessFunction.java:38-67`).
    val traffic = stamp(parsed
      .filter(size(col("traffic_info")) > 0)
      .select(col("probe_id"), col("info_time"),
        explode(col("traffic_info")).as("t"))
      .select(col("probe_id"), col("info_time"), col("t.*")))
      .withColumn("id",
        TaskDataPipeline.rowId(col("probe_id"), col("access_type_name"), col("info_time")))

    // status: scalar copy (`WindowProbeStatusProcessFunction.java:38-60`).
    val status = stamp(parsed
      .filter(col("status_info").isNotNull)
      .select(col("probe_id"), col("info_time"),
        col("status_info.cpu_rate").as("cpu_rate"),
        col("status_info.ram_rate").as("ram_rate"),
        col("status_info.run_time").cast("long").as("run_time")))
      .withColumn("id", TaskDataPipeline.rowId(col("probe_id"), col("info_time")))

    // pon: optical power normalization F11 (`SmartGateWayUtil.java:9-17`):
    // model DT741-csf reports rx_power ×10000.
    val pon = stamp(parsed
      .filter(col("sgw_info.pon_info").isNotNull)
      .select(col("probe_id"), col("info_time"),
        col("probe_info.pc").as("pc"),
        col("sgw_info.pon_info.current").as("current"),
        when(col("probe_info.pc") === "DT741-csf",
          col("sgw_info.pon_info.rx_power") / 10000)
          .otherwise(col("sgw_info.pon_info.rx_power")).as("rx_power"),
        col("sgw_info.pon_info.tx_power").as("tx_power"),
        col("sgw_info.pon_info.temperature").as("temperature"),
        col("sgw_info.pon_info.voltage").as("voltage")))
      .withColumn("id", TaskDataPipeline.rowId(col("probe_id"), col("info_time")))

    // access-type CDC diff (J8): reported ports vs stored dim; the
    // reference never deletes the default port (`ProbeAccessTypeSink.java:94`).
    // The reported side is a SET of ports: a batch carrying two reports
    // from the same gateway (duplicate delivery, or two info messages in
    // one window) must diff once per port, last report winning — the
    // reference's per-record upserts are idempotent the same way
    // (`ProbeAccessTypeSink.java:48-106`).
    val reported = graft.operators.KeepLatest(
      parsed
        .filter(size(col("access_type_info")) > 0)
        .select(col("probe_id"), col("info_time"),
          explode(col("access_type_info")).as("a"))
        .select(col("probe_id"), col("info_time"), col("a.access_type_name"),
          col("a.connect_status"), col("a.ip"), col("a.mac"), col("a.speed"),
          col("a.is_default")),
      Seq("probe_id", "access_type_name"), Seq(col("info_time").desc))
      .drop("info_time")
    val stored = storedAccessTypes.select(
      col("probe_id"), col("access_type_name"),
      col("connect_status").as("stored_connect_status"))
    val accessDiff = SetDiff(stored, reported, Seq("probe_id", "access_type_name"))
      .filter(!(col("action") === "delete" &&
        col("access_type_name") === "default_name"))

    // probe-dim maintenance (T6 redesign of `ProbeInfoThread.java:95-115`):
    // the reference UPDATEs the MySQL probe row with the gateway-reported
    // attributes when an info message arrives; here it's an output frame —
    // latest report per probe per batch, alias following probe_name when
    // one is reported (the alias_modified guard is the dim owner's merge
    // rule, applied at upsert time).
    val dimUpdates = graft.operators.KeepLatest(
      parsed.filter(col("probe_info").isNotNull)
        .select(
          col("probe_id").as("id"), col("info_time"),
          when(col("probe_info.pc") === "ÿÿÿÿ", lit("DT741-csf"))
            .otherwise(col("probe_info.pc")).as("pc"),
          col("probe_info.vendor").as("vendor"),
          col("probe_info.sn").as("sn"),
          col("probe_info.mac").as("mac"),
          col("probe_info.loid").as("loid"),
          col("probe_info.pppoe_username").as("pppoe_username"),
          col("probe_info.hb_interval").as("hb_interval"),
          col("probe_info.probe_name").as("probe_name"),
          when(col("probe_info.probe_name").isNotNull &&
              trim(col("probe_info.probe_name")) =!= "",
            col("probe_info.probe_name")).as("probe_alias_suggested"))
        .withColumn("update_time", lit(nowEpoch)),
      Seq("id"), Seq(col("info_time").desc))

    GwOutputs(pinfo, traffic, status, pon, accessDiff, dimUpdates)
  }

  /** New-probe default-task notifications
    * (`WindowRegisterProcessFunction.java:143-148`): the reference pushes
    * {probeId, provinceCode, cityCode, districtCode} to a Redis queue per
    * registration so the task generator creates the probe's default task
    * set; here the queue is an output frame derived from the registration
    * branch. */
  def defaultTaskNotices(newProbes: DataFrame): DataFrame =
    newProbes.select(
      col("probe_id"),
      coalesce(col("g_province_code"), lit("000000")).as("province_code"),
      coalesce(col("g_city_code"), lit("000000")).as("city_code"),
      coalesce(col("g_district_code"), lit("000000")).as("district_code"),
      col("create_time"))

  final case class GwOutputs(
      pinfo: DataFrame, traffic: DataFrame, status: DataFrame,
      pon: DataFrame, accessDiff: DataFrame, probeDimUpdates: DataFrame)
}
