package graft.nqs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension enrichment (SURVEY.md §2.4 J1-J6).
  *
  * The reference enriches per record through a Redis read-through cache
  * over MySQL (`InfoLoader.java:45-114`) — cross-process I/O per record.
  * Here every dimension is a DataFrame broadcast-joined to the stream:
  * each executor gets one copy of each dim per micro-batch, lookups are
  * hash-map probes inside codegen, and the fact side never shuffles.
  * At 100 TB the dims (probes, tasks, geo) are still ≤ GBs — broadcast is
  * the right physical plan; were a dim ever to outgrow that, dropping the
  * `broadcast()` hint lets AQE fall back to a shuffle join.
  */
object Enrich {

  /** J1: probe dim on `probe_id` → location/device columns. */
  def withProbe(events: DataFrame, probes: DataFrame): DataFrame = {
    val p = probes.select(
      col("id").as("probe_id"),
      col("probe_name"), col("probe_alias"), col("pppoe_username"),
      col("loid"), col("sn"), col("ip").as("probe_ip"), col("pc"),
      col("vendor"),
      col("province_code"), col("province_name"),
      col("city_code"), col("city_name"),
      col("district_code"), col("district_name"),
      col("town_code"), col("town_name"))
    events.join(broadcast(p), Seq("probe_id"), "left")
  }

  /** J2+J3: task src/dest on `task_id`, then task param. Missing tasks are
    * kept (left join) — window mode emits them regardless
    * (`WindowDataParser.java:94-118`). */
  def withTask(events: DataFrame, taskSrcDest: DataFrame, taskParam: DataFrame): DataFrame = {
    val t = taskSrcDest.select(
      col("id").as("task_id"),
      col("task_md5"), col("task_param_id"), col("access_type_name"),
      col("dest_id"), col("dest_name"), col("dest_addr"),
      col("host_province"), col("host_city"), col("operator"))
    val tp = taskParam.select(
      col("id").as("task_param_id"), col("task_param_name"),
      col("alarm_template_id"))
    events
      .join(broadcast(t), Seq("task_id"), "left")
      .join(broadcast(tp), Seq("task_param_id"), "left")
  }

  /** J4: ip → region. The reference resolves via a binary ipdb file plus a
    * region-code dim with municipality fix-ups (`IPHelper.java:35-66`);
    * the geo db files are absent from the repo, so the lookup is modeled
    * as a precomputed `ip → (province, city, operator)` dim table —
    * broadcast equi-join, overriding task-level defaults when present.
    * LAN addresses short-circuit to no override (`IPHelper.java:46-52`). */
  def withHostGeo(events: DataFrame, ipRegion: DataFrame,
      ipCol: String = "host_ip"): DataFrame = {
    val g = ipRegion.select(
      col("ip").as(ipCol),
      col("province_name").as("__geo_province"),
      col("city_name").as("__geo_city"),
      col("operator").as("__geo_operator"))
    val lan = col(ipCol).isNull || col(ipCol).rlike(
      "^(10\\.|192\\.168\\.|172\\.(1[6-9]|2[0-9]|3[01])\\.|127\\.)")
    events.join(broadcast(g), Seq(ipCol), "left")
      .withColumn("host_province",
        when(!lan && col("__geo_province").isNotNull, col("__geo_province"))
          .otherwise(col("host_province")))
      .withColumn("host_city",
        when(!lan && col("__geo_city").isNotNull, col("__geo_city"))
          .otherwise(col("host_city")))
      .withColumn("operator",
        when(!lan && col("__geo_operator").isNotNull, col("__geo_operator"))
          .otherwise(col("operator")))
      .drop("__geo_province", "__geo_city", "__geo_operator")
  }

  /** J4 faithful variant: ip → region via the RANGE lookup when the dim is
    * an interval table `(range_start, range_end, province_name, city_name,
    * district_name, operator, code)` — the shape of the reference's ipdb
    * (`IPHelper.java:35-67`). Runs [[graft.operators.IpGeo.withGeo]]
    * (bucketed broadcast equi-join + municipality fix-ups) and overrides
    * task-level defaults where the lookup resolved. */
  def withHostGeoRanges(events: DataFrame, ipRanges: DataFrame,
      ipCol: String = "host_ip"): DataFrame = {
    // The IpGeo lookup appends province_name/city_name/district_name/
    // region_code; if the input frame already carries any of those names
    // (task/probe enrich does in other paths), stash them under
    // temporaries so the lookup's scratch columns can't clobber them.
    val geoNames = Seq("province_name", "city_name", "district_name", "region_code")
    val preExisting = geoNames.filter(events.columns.contains)
    val stashed = preExisting.foldLeft(events) { (df, c) =>
      df.withColumnRenamed(c, s"__keep_$c")
    }
    val resolved = graft.operators.IpGeo.withGeo(
      stashed.withColumnRenamed("host_province", "__in_province")
        .withColumnRenamed("host_city", "__in_city")
        .withColumnRenamed("operator", "__in_operator"),
      ipCol, ipRanges)
    val merged = resolved
      .withColumn("host_province",
        when(col("province_name") =!= graft.operators.IpGeo.DefaultName,
          col("province_name")).otherwise(col("__in_province")))
      .withColumn("host_city",
        when(col("city_name") =!= graft.operators.IpGeo.DefaultName,
          col("city_name")).otherwise(col("__in_city")))
      .withColumn("operator",
        when(col("operator") =!= graft.operators.IpGeo.DefaultName,
          col("operator")).otherwise(col("__in_operator")))
      .drop("__in_province", "__in_city", "__in_operator",
        "province_name", "city_name", "district_name", "region_code")
    preExisting.foldLeft(merged) { (df, c) =>
      df.withColumnRenamed(s"__keep_$c", c)
    }
  }

  /** J6: default access-type port per probe → heartbeat status
    * (connected → 10, else 20; `WindowHeartbeatProcessFunction.java:101-113`). */
  def withDefaultPortStatus(heartbeats: DataFrame, probeAccessType: DataFrame): DataFrame = {
    val d = probeAccessType.filter(col("is_default") === 1)
      .select(col("probe_id"), col("connect_status").as("__default_port_status"))
    heartbeats.join(broadcast(d), Seq("probe_id"), "left")
      .withColumn("status",
        when(col("__default_port_status") === "connected", lit(10)).otherwise(lit(20)))
      .drop("__default_port_status")
  }

  /** J7: split a parsed stream into (registrations, heartbeats) by probe
    * existence (`ProbeExistProcess.java:57-68`) — anti/semi broadcast joins. */
  def splitByExistence(parsed: DataFrame, probes: DataFrame): (DataFrame, DataFrame) = {
    val ids = probes.select(col("id").as("probe_id"))
    val registrations = parsed.join(broadcast(ids), Seq("probe_id"), "left_anti")
    val heartbeats = parsed.join(broadcast(ids), Seq("probe_id"), "left_semi")
    (registrations, heartbeats)
  }
}
