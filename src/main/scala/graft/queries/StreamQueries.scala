package graft.queries

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.streaming.StreamJobs

/** The Structured Streaming jobs driver-gated END-TO-END: synthesized
  * wire messages are staged as text files with controlled modification
  * times, the REAL streaming jobs run to completion with
  * `Trigger.AvailableNow` (multiple micro-batches via
  * `maxFilesPerTrigger=1`), and the gate reads back the SINK parquet —
  * so the file source, checkpointing, `foreachBatch` sink writes,
  * within-batch id dedup (T8), cross-batch first-seen state (the
  * register/heartbeat split), and typed-catalog conformance (K1/K2/K4/
  * K8) are all inside the DuckDB hash compare, not just unit tests.
  *
  * Determinism notes: sink row SETS are batching-invariant (every
  * synthesized fact has a unique content-hash id), and the one
  * batching-SENSITIVE output (which sighting registers a probe) is
  * pinned by file modification times — `FileStreamSource` processes
  * oldest-first, and the first-seen classifier breaks intra-batch ties
  * by the same ordinal, so either batching yields the same rows.
  */
object StreamQueries {

  private val Now = 1705708800L // fixed "now" → deterministic clamps/ids

  /** Stage each frame (single `value` string column) as ONE text file
    * named by its index, modification times strictly increasing in
    * sequence order. Returns the input directory. */
  private def stage(base: Path, frames: Seq[DataFrame]): Path = {
    val inDir = base.resolve("in")
    Files.createDirectories(inDir)
    frames.zipWithIndex.foreach { case (df, i) =>
      val staging = base.resolve(s"stage$i")
      df.coalesce(1).write.mode("overwrite").text(staging.toString)
      val listing = Files.list(staging)
      val part = try listing.filter(p =>
        p.getFileName.toString.startsWith("part-")).findFirst().get()
      finally listing.close()
      val target = inDir.resolve(f"$i%04d.txt")
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(target,
        FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    inDir
  }

  /** Run `body` with the RocksDB state-store provider active (T5): the
    * stream started inside clones the session conf at start(), so the
    * stateful first-seen job keeps its keyed state in RocksDB instead of
    * the default HDFS-backed in-memory map — the provider a real cluster
    * runs, now exercised (not just configured) by the q64 gate. */
  private def withRocksDbState[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Run a staged stream job to completion and return the named sink,
    * detached from the temp dir (localCheckpoint) so the caller gets a
    * plain DataFrame. */
  private def runStaged(spark: SparkSession, frames: Seq[DataFrame],
      sinkTable: String)(
      start: (DataFrame, String, String) => org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    val base = Files.createTempDirectory("graft-stream")
    val inDir = stage(base, frames)
    val raw = StreamJobs.fileSource(spark, inDir.toString, maxFilesPerTrigger = 1)
    val q = start(raw, base.resolve("out").toString, base.resolve("ckpt").toString)
    q.awaitTermination()
    spark.read.parquet(base.resolve("out").resolve(sinkTable).toString)
      .localCheckpoint()
  }

  // ---- task-data job (K1/K2/A5/T1/T5/T8) --------------------------------

  private def pingMeas(k: Column, task: Column, t: Column, rtt: Column,
      lost: Column): Column =
    concat(
      lit("""{"probe_id":"p-"""), k % 30,
      lit("""","task_id":"t-"""), task,
      lit("""","task_type_name":"PING","test_time":"""), t,
      lit(""","host_ip":"1.2.3."""), k % 40,
      lit("""","rtt":"""), rtt,
      lit(""","jitter":"""), k % 35,
      lit(""","lost_rate":"""), lost, lit("}"))

  // ---- heartbeat job (K4/K8/T5 + cross-batch first-seen) ----------------

  private def hbMsg(k: Column, t: Column): Column =
    concat(
      lit("""{"info":{"id":"p-"""), k,
      lit("""","soft_ver":"v"""), k % 5,
      lit("""","so_ver":"s"""), k % 3,
      lit("""","task_queue_size":"""), k % 7,
      lit(""","task_size":"""), k % 11,
      lit("""},"time":"""), t, lit("}"),
      lit("\u0002"), concat(lit("9.0.0."), k % 200))

  private def hbT1(k: Column): Column = lit(Now) - (k % 20) * 3600 - 3600

  private def emptyProbes(s: SparkSession): DataFrame =
    s.range(0).select(col("id").cast("string").as("id"))

  private def accessTypeDim(s: SparkSession, dir: String): DataFrame = {
    val c = col("c_custkey")
    Tables.load(s, dir, "customer").select(
      concat(lit("p-"), c).as("probe_id"),
      when(c % 3 === 0, lit(1)).otherwise(lit(0)).as("is_default"),
      when(c % 2 === 0, lit("connected")).otherwise(lit("down"))
        .as("connect_status"))
  }

  private def ipRegionDim(s: SparkSession, dir: String): DataFrame = {
    val c = col("c_custkey")
    Tables.load(s, dir, "customer").filter(c < 200).select(
      concat(lit("9.0.0."), c).as("ip"),
      concat(lit("P"), c % 30).as("province_code"),
      concat(lit("PN"), c % 30).as("province_name"),
      concat(lit("C"), c % 90).as("city_code"),
      concat(lit("CN"), c % 90).as("city_name"),
      when(c % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("D"), c)).as("district_code"),
      when(c % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("DN"), c)).as("district_name"),
      (c % 360).cast("double").as("longitude"),
      (c % 180).cast("double").as("latitude"))
  }

  private def heartbeatFrames(s: SparkSession, dir: String): Seq[DataFrame] = {
    val k = col("c_custkey")
    val cust = Tables.load(s, dir, "customer")
    Seq(
      cust.select(hbMsg(k, hbT1(k)).as("value")),
      cust.select(hbMsg(k, hbT1(k) + 3600).as("value")))
  }

  private val bucketSql: String => String = col =>
    Seq("hour" -> "h", "day" -> "d", "week" -> "w", "month" -> "m").map {
      case (unit, suf) =>
        s"CAST(epoch(date_trunc('$unit', make_timestamp($col * 1000000))) AS BIGINT) AS ${col}_$suf"
    }.mkString(",\n          ")

  // ---- gateway-info job (T7 five-sink fan-out, K4/K5/K8/F11/F12) --------

  /** One gateway-info wire message with all four nested payloads present
    * conditionally — so every one of the five sink branches sees both
    * populated and absent payloads. All numeric payload values are
    * INTEGRAL, so the `to_json` round-trip in the pinfo sink renders them
    * identically in Spark ("37.0") and the DuckDB oracle's
    * `CAST(x AS DOUBLE) || ''`. */
  private def gwMsg(k: Column, t: Column): Column = {
    val pc = when(k % 10 === 0, lit("ÿÿÿÿ"))
      .when(k % 10 === 1, lit("DT741-csf"))
      .otherwise(concat(lit("M"), k % 5))
    val cs = when(k % 2 === 0, lit("connected")).otherwise(lit("down"))
    concat(
      lit("""{"probe_id":"gw-"""), k, lit("""","time":"""), t,
      lit(""","probe_info":{"id":"gw-"""), k,
      lit("""","pc":""""), pc,
      lit("""","vendor":"vd"""), k % 4,
      lit("""","sn":"sn"""), k, lit(""""}"""),
      lit(""","access_type_info":[{"access_type_name":"atA","connect_status":""""),
      cs, lit("""","is_default":1,"ip":"10.0.0."""), k, lit(""""}"""),
      when(k % 3 =!= 0, concat(
        lit(""",{"access_type_name":"atB","connect_status":"down","is_default":0,"ip":"10.0.1."""),
        k, lit(""""}"""))).otherwise(lit("")),
      lit("]"),
      when(k % 5 =!= 0, concat(
        lit(""","traffic_info":[{"access_type_name":"atA","ip":"10.0.0."""), k,
        lit("""","up_avg":"""), k % 100,
        lit(""","up_max":"""), k % 200,
        lit(""","down_avg":"""), k % 300,
        lit(""","down_max":"""), k % 400, lit("}]"))).otherwise(lit("")),
      when(k % 4 =!= 0, concat(
        lit(""","status_info":{"cpu_rate":"""), k % 100,
        lit(""","ram_rate":"""), k % 90,
        lit(""","run_time":""""), k * 13, lit(""""}"""))).otherwise(lit("")),
      when(k % 13 =!= 0, concat(
        lit(""","sgw_info":{"pon_info":{"current":"""), k % 50,
        lit(""","rx_power":"""), (k * 7) % 10000,
        lit(""","tx_power":"""), k % 30,
        lit(""","temperature":"""), k % 70,
        lit(""","voltage":"""), k % 12, lit("}}"))).otherwise(lit("")),
      lit("}"))
  }

  /** Two micro-batches: batch 1 carries every message TWICE (the
    * within-batch id dedup and the reported-port KeepLatest must collapse
    * them), batch 2 re-reports 30 min later → distinct content ids. The
    * (k % 24) hour offset keeps every timestamp inside the 108000 s clamp
    * window, so info_time == wire time deterministically. */
  private def gwFrames(s: SparkSession, dir: String): Seq[DataFrame] = {
    val k = col("s_suppkey")
    val sup = Tables.load(s, dir, "supplier")
    val t1 = lit(Now) - (k % 24) * 3600
    val b1 = sup.select(gwMsg(k, t1).as("value"))
    Seq(b1.unionAll(b1), sup.select(gwMsg(k, t1 + 1800).as("value")))
  }

  /** Stored access-type dim: atA everywhere (→ update), atOld on k%6
    * (→ delete), and a `default_name` port on k%9 whose delete the
    * pipeline must SUPPRESS (`ProbeAccessTypeSink.java:94`). */
  private def gwStoredAccessTypes(s: SparkSession, dir: String): DataFrame = {
    val k = col("s_suppkey")
    val sup = Tables.load(s, dir, "supplier")
    def row(f: DataFrame, at: String, cs: String) = f.select(
      concat(lit("gw-"), k).as("probe_id"), lit(at).as("access_type_name"),
      lit(cs).as("connect_status"))
    row(sup, "atA", "connected")
      .unionByName(row(sup.filter(k % 6 === 0), "atOld", "down"))
      .unionByName(row(sup.filter(k % 9 === 0), "default_name", "down"))
  }

  /** The five-sink gateway stream runs ONCE per sf dir; the six q69 gates
    * each hash a different sink of the same completed run. Verify calls
    * queries sequentially in one JVM, so a plain synchronized memo works. */
  private val gwRunCache = scala.collection.mutable.HashMap.empty[String, String]
  private def gwRun(s: SparkSession, dir: String): String = gwRunCache.synchronized {
    gwRunCache.getOrElseUpdate(dir, {
      val base = Files.createTempDirectory("graft-gwstream")
      val inDir = stage(base, gwFrames(s, dir))
      val raw = StreamJobs.fileSource(s, inDir.toString, maxFilesPerTrigger = 1)
      val q = StreamJobs.runGatewayInfo(raw, gwStoredAccessTypes(s, dir),
        base.resolve("out").toString, base.resolve("ckpt").toString,
        nowEpoch = Now, trigger = Trigger.AvailableNow())
      q.awaitTermination()
      base.resolve("out").toString
    })
  }

  /** Shared oracle CTEs: every probe in both batches, with the same pc /
    * connect-status derivations the wire generator uses. */
  private val gwBaseSql: String =
    s"""base AS (
          SELECT s_suppkey AS k, 'gw-' || s_suppkey AS probe_id,
            CASE WHEN s_suppkey % 10 = 0 THEN 'ÿÿÿÿ'
                 WHEN s_suppkey % 10 = 1 THEN 'DT741-csf'
                 ELSE 'M' || (s_suppkey % 5) END AS pc,
            CASE WHEN s_suppkey % 2 = 0 THEN 'connected' ELSE 'down' END AS cs
          FROM supplier),
        t AS (
          SELECT k, probe_id, pc, cs, bn,
            CAST($Now - (k % 24) * 3600 + (bn - 1) * 1800 AS BIGINT) AS timesheet
          FROM base, (SELECT 1 AS bn UNION ALL SELECT 2) batches)"""

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q62_stream_task_facts",
      (s, dir) => {
        // Two micro-batches of PING task-data through runTaskData; batch
        // 1 carries every measurement TWICE in one wire array — the
        // within-batch content-id dedup (T8) must collapse them or the
        // row count (and hash) breaks.
        val k = col("c_custkey")
        val t1 = lit(Now) - (k % 1000) * 60 - 60
        // cap the seed: the wire content-id is sha256(probe|task|PING|
        // test_time) = f(k%30, k%7, k%1000), unique only for k < 21000
        // (their lcm). Above that, synthesized measurements genuinely
        // collide and the T8 content-id dedup rightly collapses them —
        // but which colliding payload survives is arrival-order, so the
        // gate must keep ids unique to stay hash-checkable. No-op at the
        // driver's scales.
        val cust = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 15000)
        val m1 = pingMeas(k, k % 7, t1, k % 130, k % 105)
        val m2 = pingMeas(k, (k + 3) % 7, t1 - 30, (k + 17) % 130, (k + 31) % 105)
        val frames = Seq(
          cust.select(concat(lit("["), m1, lit(","), m1, lit("]")).as("value")),
          cust.select(concat(lit("["), m2, lit("]")).as("value")))
        val dims = PipelineFixtures.dims(s, dir)
        runStaged(s, frames, "gw_facts") { (raw, out, ckpt) =>
          StreamJobs.runTaskData(raw, dims, out, ckpt, nowEpoch = Now,
            trigger = Trigger.AvailableNow())
        }.select("id", "probe_id", "task_id", "task_param_id",
          "task_type_name", "test_time", "rtt", "jitter", "lost_rate",
          "probe_name", "province_code", "host_province", "host_city",
          "operator", "task_param_name", "alarm_template_id", "score",
          "test_time_h", "test_time_d", "create_time")
      },
      Some {
        val scoreSql = graft.score.ScoreEngine.scoreForSql(
          graft.score.PQDefaults.config.byProtocol("PING"),
          name => if (Set("rtt", "lost_rate").contains(name))
            graft.score.ScoreEngine.Source(col(name), s"($name)")
          else graft.score.ScoreEngine.Source(
            lit(null).cast("double"), "CAST(NULL AS DOUBLE)"))
        s"""WITH base AS (SELECT c_custkey AS k FROM customer
            WHERE c_custkey <= 15000),
          meas AS (
            SELECT k, 'p-' || (k % 30) AS probe_id, 't-' || (k % 7) AS task_id,
              CAST($Now - (k % 1000) * 60 - 60 AS BIGINT) AS test_time,
              '1.2.3.' || (k % 40) AS host_ip,
              CAST(k % 130 AS DOUBLE) AS rtt,
              CAST(k % 35 AS DOUBLE) AS jitter,
              CAST(k % 105 AS DOUBLE) AS lost_rate
            FROM base
            UNION ALL
            SELECT k, 'p-' || (k % 30), 't-' || ((k + 3) % 7),
              CAST($Now - (k % 1000) * 60 - 90 AS BIGINT),
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
            CAST($Now AS BIGINT) AS create_time
          FROM meas m
          LEFT JOIN probes p ON p.probe_id = m.probe_id
          LEFT JOIN tasks t ON t.task_id = m.task_id
          LEFT JOIN params pa ON pa.task_param_id = t.task_param_id
          LEFT JOIN geo g ON g.ip = m.host_ip"""
      }),

    GraftQuery(
      "q63_stream_heartbeat_sink",
      (s, dir) => {
        // Both sightings of every probe through runHeartbeat, read back
        // from the CONFORMED c_p_heartbeat sink: parse → clamp → state
        // classification → typed-catalog conform → partitioned parquet.
        // heartbeat_time_d comes back as a partition directory →
        // re-cast to the catalog's BIGINT.
        val frames = heartbeatFrames(s, dir)
        val probes = emptyProbes(s)
        val pat = accessTypeDim(s, dir)
        val ipr = ipRegionDim(s, dir)
        runStaged(s, frames, "c_p_heartbeat") { (raw, out, ckpt) =>
          StreamJobs.runHeartbeat(raw, probes, pat, ipr, out, ckpt,
            nowEpoch = Now, trigger = Trigger.AvailableNow())
        }.select(col("id"), col("probe_id"), col("heartbeat_time"),
          col("internet_ip"), col("so_ver"), col("soft_ver"),
          col("task_queue_size"), col("task_size"), col("probe_name"),
          col("type"), col("heartbeat_time_h"),
          col("heartbeat_time_d").cast("long").as("heartbeat_time_d"),
          col("heartbeat_time_w"), col("heartbeat_time_m"),
          col("create_time"))
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer),
          hb AS (
            SELECT k, CAST($Now - (k % 20) * 3600 - 3600 AS BIGINT) AS heartbeat_time FROM b
            UNION ALL
            SELECT k, CAST($Now - (k % 20) * 3600 AS BIGINT) FROM b)
          SELECT sha256('p-' || k || '|' || heartbeat_time) AS id,
            'p-' || k AS probe_id, heartbeat_time,
            '9.0.0.' || (k % 200) AS internet_ip,
            's' || (k % 3) AS so_ver,
            'v' || (k % 5) AS soft_ver,
            CAST(k % 7 AS BIGINT) AS task_queue_size,
            CAST(k % 11 AS BIGINT) AS task_size,
            '' AS probe_name,
            CAST(0 AS BIGINT) AS type,
            ${bucketSql("heartbeat_time")},
            CAST($Now AS BIGINT) AS create_time
          FROM hb""")),

    GraftQuery(
      "q64_stream_registrations",
      (s, dir) => {
        // The new_probes sink after two sightings per probe: exactly ONE
        // registration each, carrying the FIRST sighting's heartbeat_time
        // — this hashes the cross-batch first-seen state (a probe seen in
        // batch 1 must NOT re-register in batch 2) plus the geo enrich,
        // alias (F15) and region-path (F16) synthesis.
        val frames = heartbeatFrames(s, dir)
        val probes = emptyProbes(s)
        val pat = accessTypeDim(s, dir)
        val ipr = ipRegionDim(s, dir)
        withRocksDbState(s) {
          runStaged(s, frames, "new_probes") { (raw, out, ckpt) =>
            StreamJobs.runHeartbeat(raw, probes, pat, ipr, out, ckpt,
              nowEpoch = Now, trigger = Trigger.AvailableNow())
          }
        }.select("probe_id", "heartbeat_time", "internet_ip",
          "probe_alias", "region_path", "status", "create_time")
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer),
          geo AS (SELECT '9.0.0.' || c_custkey AS ip,
              'P' || (c_custkey % 30) AS pc, 'PN' || (c_custkey % 30) AS pn,
              'C' || (c_custkey % 90) AS cc, 'CN' || (c_custkey % 90) AS cn,
              CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE 'D' || c_custkey END AS dc,
              CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE 'DN' || c_custkey END AS dn
            FROM customer WHERE c_custkey < 200)
          SELECT 'p-' || k AS probe_id,
            CAST($Now - (k % 20) * 3600 - 3600 AS BIGINT) AS heartbeat_time,
            '9.0.0.' || (k % 200) AS internet_ip,
            concat_ws('-', g.pn, g.cn, g.dn, '临时',
              substring(sha256('p-' || k), 1, 8)) AS probe_alias,
            '/100000/' || concat_ws('/', g.pc, g.cc, g.dc) || '/' AS region_path,
            CAST(10 AS INTEGER) AS status,
            CAST($Now AS BIGINT) AS create_time
          FROM b LEFT JOIN geo g ON g.ip = '9.0.0.' || (k % 200)""")),

    GraftQuery(
      "q65_stream_windowed_agg",
      (s, dir) => {
        // The north-star operation under the driver gate: event-time
        // tumbling windows + watermark over a REAL stream, append mode to
        // a parquet sink. Append emits a window only in a batch AFTER the
        // watermark passes its end, so two sentinel files (far-future
        // timestamps) follow the data file: sentinel 1 advances the
        // watermark past every data window, sentinel 2 triggers the batch
        // that emits them. The sentinels' own windows stay unemitted and
        // the final filter keeps data windows only — the output is
        // exactly the closed windows, deterministically.
        val k = col("c_custkey")
        val base = Now // hour-aligned epoch
        def row(pid: Column, ts: Column, score: Column): Column =
          concat(lit("""{"probe_id":"p-"""), pid,
            lit("""","ts":"""), ts, lit(""","score":"""), score, lit("}"))
        val cust = Tables.load(s, dir, "customer")
        val data = cust.select(row(k % 50, lit(base) + (k % 48) * 1800,
          (k % 89).cast("double") + lit(0.25)).as("value"))
        def sentinel(tag: Int) = cust.limit(1).select(
          row(lit(9999), lit(base + 30L * 86400 + tag), lit(0.0)).as("value"))
        val frames = Seq(data, sentinel(0), sentinel(1))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "probe_id STRING, ts LONG, score DOUBLE")
        runStaged(s, frames, "windows") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
            .withColumn("event_time", to_timestamp(col("ts")))
            .withWatermark("event_time", "10 minutes")
          graft.streaming.WindowedAgg.tumbling(parsed, "event_time", "1 hour",
              Seq("probe_id"),
              Seq(count(lit(1)).as("n"),
                sum(col("score").cast(
                  org.apache.spark.sql.types.DecimalType(12, 2)))
                  .cast("double").as("sum_score")))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/windows")
            .trigger(Trigger.AvailableNow())
            .start()
        }.filter(col("window_start") < base + 86400L)
          .select("window_start", "window_end", "probe_id", "n", "sum_score")
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer),
          r AS (SELECT 'p-' || (k % 50) AS probe_id,
            CAST($Now + (k % 48) * 1800 AS BIGINT) AS ts,
            CAST(k % 89 AS DOUBLE) + 0.25E0 AS score FROM b)
          SELECT CAST((ts // 3600) * 3600 AS BIGINT) AS window_start,
            CAST((ts // 3600) * 3600 + 3600 AS BIGINT) AS window_end,
            probe_id, COUNT(*) AS n,
            CAST(SUM(CAST(score AS DECIMAL(12,2))) AS DOUBLE) AS sum_score
          FROM r GROUP BY 1, 2, 3""")),

    GraftQuery(
      "q71_stream_session_window",
      (s, dir) => {
        // Session windows under the driver gate as a REAL stream: each
        // probe emits two bursts of 10-min-spaced events 10 h apart, so
        // the 30-min-gap session_window must MERGE each burst into one
        // session and split the bursts — in append mode, where a session
        // only emits after the watermark passes its close. Same sentinel
        // recipe as q65: two far-future files advance the watermark past
        // every data session, and the final filter drops the sentinels'
        // own (unemitted-then-emitted) windows.
        val k = col("c_custkey")
        val base = Now
        def row(pid: Column, ts: Column, score: Column): Column =
          concat(lit("""{"probe_id":"p-"""), pid,
            lit("""","ts":"""), ts, lit(""","score":"""), score, lit("}"))
        val cust = Tables.load(s, dir, "customer")
        // j = k div 30 varies WITHIN each probe class (k mod 30), so every
        // probe gets both bursts: three 10-min-spaced events (one merged
        // session) and the same shape 10 h later (a second session)
        val j = ((k - k % 30) / 30).cast("long")
        val ts = lit(base) + (j % 3) * 600 +
          when(j % 2 === 0, lit(0)).otherwise(lit(36000))
        val data = cust.select(
          row(k % 30, ts, (k % 89).cast("double") + lit(0.25)).as("value"))
        def sentinel(tag: Int) = cust.limit(1).select(
          row(lit(9999), lit(base + 30L * 86400 + tag), lit(0.0)).as("value"))
        val frames = Seq(data, sentinel(0), sentinel(1))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "probe_id STRING, ts LONG, score DOUBLE")
        runStaged(s, frames, "sessions") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
            .withColumn("event_time", to_timestamp(col("ts")))
            .withWatermark("event_time", "10 minutes")
          graft.streaming.WindowedAgg.session(parsed, "event_time",
              "30 minutes", Seq("probe_id"),
              Seq(count(lit(1)).as("n"),
                sum(col("score").cast(
                  org.apache.spark.sql.types.DecimalType(12, 2)))
                  .cast("double").as("sum_score")))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/sessions")
            .trigger(Trigger.AvailableNow())
            .start()
        }.filter(col("window_start") < base + 86400L)
          .select("window_start", "window_end", "probe_id", "n", "sum_score")
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer),
          r AS (SELECT 'p-' || (k % 30) AS probe_id,
            CAST($Now + ((k // 30) % 3) * 600 +
              CASE WHEN (k // 30) % 2 = 0 THEN 0 ELSE 36000 END AS BIGINT) AS sec,
            CAST(k % 89 AS DOUBLE) + 0.25E0 AS score FROM b),
          -- session ids over DISTINCT (probe, sec) only: with duplicate
          -- secs in one partition the LAG pass and the running-SUM pass
          -- tie-break independently, and the lone new_s=1 row can land
          -- mid-prefix, splitting a session nondeterministically
          d AS (SELECT DISTINCT probe_id, sec FROM r),
          s AS (SELECT probe_id, sec,
            CASE WHEN LAG(sec) OVER w IS NULL
                   OR sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
            FROM d WINDOW w AS (PARTITION BY probe_id ORDER BY sec)),
          g AS (SELECT probe_id, sec,
            SUM(new_s) OVER (PARTITION BY probe_id ORDER BY sec
              ROWS UNBOUNDED PRECEDING) AS sid
            FROM s)
        SELECT MIN(r.sec) AS window_start,
          CAST(MAX(r.sec) + 1800 AS BIGINT) AS window_end,
          r.probe_id, COUNT(*) AS n,
          CAST(SUM(CAST(r.score AS DECIMAL(12,2))) AS DOUBLE) AS sum_score
        FROM r JOIN g ON r.probe_id = g.probe_id AND r.sec = g.sec
        GROUP BY r.probe_id, g.sid""")),

    GraftQuery(
      "q69_stream_gw_pinfo",
      (s, dir) => {
        // The c_p_pinfo sink of the 5-sink gateway stream: full JSON
        // payload re-serialization (to_json at the sink boundary), pc
        // sentinel NOT applied to the stored raw payload, id dedup of the
        // duplicated batch-1 messages, catalog conformance.
        s.read.parquet(s"${gwRun(s, dir)}/c_p_pinfo")
          .select(col("id"), col("access_type_info"), col("neighbor_info"),
            col("probe_id"), col("probe_info"), col("sgw_info"),
            col("status_info"), col("traffic_info"), col("timesheet"),
            col("timesheet_h"),
            col("timesheet_d").cast("long").as("timesheet_d"),
            col("timesheet_w"), col("timesheet_m"), col("create_time"))
      },
      Some(s"""WITH $gwBaseSql
        SELECT sha256(probe_id || '|' || timesheet) AS id,
          '[{"access_type_name":"atA","connect_status":"' || cs ||
            '","is_default":1,"ip":"10.0.0.' || k || '"}' ||
            CASE WHEN k % 3 <> 0 THEN
              ',{"access_type_name":"atB","connect_status":"down","is_default":0,"ip":"10.0.1.' || k || '"}'
            ELSE '' END || ']' AS access_type_info,
          CAST(NULL AS VARCHAR) AS neighbor_info,
          probe_id,
          '{"id":"' || probe_id || '","pc":"' || pc || '","vendor":"vd' ||
            (k % 4) || '","sn":"sn' || k || '"}' AS probe_info,
          CASE WHEN k % 13 <> 0 THEN
            '{"pon_info":{"current":' || CAST(k % 50 AS DOUBLE) ||
            ',"rx_power":' || CAST((k * 7) % 10000 AS DOUBLE) ||
            ',"tx_power":' || CAST(k % 30 AS DOUBLE) ||
            ',"temperature":' || CAST(k % 70 AS DOUBLE) ||
            ',"voltage":' || CAST(k % 12 AS DOUBLE) || '}}' END AS sgw_info,
          CASE WHEN k % 4 <> 0 THEN
            '{"cpu_rate":' || CAST(k % 100 AS DOUBLE) ||
            ',"ram_rate":' || CAST(k % 90 AS DOUBLE) ||
            ',"run_time":"' || (k * 13) || '"}' END AS status_info,
          CASE WHEN k % 5 <> 0 THEN
            '[{"access_type_name":"atA","ip":"10.0.0.' || k ||
            '","up_avg":' || CAST(k % 100 AS DOUBLE) ||
            ',"up_max":' || CAST(k % 200 AS DOUBLE) ||
            ',"down_avg":' || CAST(k % 300 AS DOUBLE) ||
            ',"down_max":' || CAST(k % 400 AS DOUBLE) || '}]' END AS traffic_info,
          timesheet,
          ${bucketSql("timesheet")},
          CAST($Now AS BIGINT) AS create_time
        FROM t""")),

    GraftQuery(
      "q69b_stream_gw_traffic",
      (s, dir) =>
        s.read.parquet(s"${gwRun(s, dir)}/c_p_traffic")
          .select(col("id"), col("access_type_name"), col("down_avg"),
            col("down_max"), col("ip"), col("probe_id"), col("timesheet"),
            col("traffic_type"), col("up_avg"), col("up_max"),
            col("timesheet_h"),
            col("timesheet_d").cast("long").as("timesheet_d"),
            col("timesheet_w"), col("timesheet_m"), col("create_time")),
      Some(s"""WITH $gwBaseSql
        SELECT sha256(probe_id || '|' || 'atA' || '|' || timesheet) AS id,
          'atA' AS access_type_name,
          CAST(k % 300 AS DOUBLE) AS down_avg,
          CAST(k % 400 AS DOUBLE) AS down_max,
          '10.0.0.' || k AS ip, probe_id, timesheet,
          CAST(NULL AS VARCHAR) AS traffic_type,
          CAST(k % 100 AS DOUBLE) AS up_avg,
          CAST(k % 200 AS DOUBLE) AS up_max,
          ${bucketSql("timesheet")},
          CAST($Now AS BIGINT) AS create_time
        FROM t WHERE k % 5 <> 0""")),

    GraftQuery(
      "q69c_stream_gw_status",
      (s, dir) =>
        s.read.parquet(s"${gwRun(s, dir)}/c_p_status")
          .select(col("id"), col("cpu_rate"), col("probe_id"),
            col("ram_rate"), col("run_time"), col("timesheet"),
            col("timesheet_h"),
            col("timesheet_d").cast("long").as("timesheet_d"),
            col("timesheet_w"), col("timesheet_m"), col("create_time")),
      Some(s"""WITH $gwBaseSql
        SELECT sha256(probe_id || '|' || timesheet) AS id,
          CAST(k % 100 AS DOUBLE) AS cpu_rate, probe_id,
          CAST(k % 90 AS DOUBLE) AS ram_rate,
          CAST(k * 13 AS VARCHAR) AS run_time, timesheet,
          ${bucketSql("timesheet")},
          CAST($Now AS BIGINT) AS create_time
        FROM t WHERE k % 4 <> 0""")),

    GraftQuery(
      "q69d_stream_gw_pon",
      (s, dir) =>
        s.read.parquet(s"${gwRun(s, dir)}/c_p_pon")
          .select(col("id"), col("current"), col("probe_id"),
            col("rx_power"), col("temperature"), col("tx_power"),
            col("timesheet"), col("voltage"), col("timesheet_h"),
            col("timesheet_d").cast("long").as("timesheet_d"),
            col("timesheet_w"), col("timesheet_m"), col("create_time")),
      Some(s"""WITH $gwBaseSql
        SELECT sha256(probe_id || '|' || timesheet) AS id,
          CAST(k % 50 AS DOUBLE) AS "current", probe_id,
          CASE WHEN pc = 'DT741-csf'
            THEN CAST((k * 7) % 10000 AS DOUBLE) / 10000
            ELSE CAST((k * 7) % 10000 AS DOUBLE) END AS rx_power,
          CAST(k % 70 AS DOUBLE) AS temperature,
          CAST(k % 30 AS DOUBLE) AS tx_power, timesheet,
          CAST(k % 12 AS DOUBLE) AS voltage,
          ${bucketSql("timesheet")},
          CAST($Now AS BIGINT) AS create_time
        FROM t WHERE k % 13 <> 0""")),

    GraftQuery(
      "q69e_stream_gw_access_diff",
      (s, dir) =>
        // Per-batch CDC diff of reported ports vs the stored dim: both
        // batches report the same port set, so every diff row appears
        // exactly twice (append sink, one diff per micro-batch) — and the
        // default_name delete is suppressed in both.
        s.read.parquet(s"${gwRun(s, dir)}/access_diff")
          .select(col("probe_id"), col("access_type_name"),
            col("stored_connect_status"), col("connect_status"), col("ip"),
            col("mac"), col("speed"), col("is_default"), col("action")),
      Some(s"""WITH $gwBaseSql,
          rep AS (
            SELECT k, probe_id, 'atA' AS access_type_name,
              cs AS connect_status, '10.0.0.' || k AS ip, 1 AS is_default
            FROM base
            UNION ALL
            SELECT k, probe_id, 'atB', 'down', '10.0.1.' || k, 0
            FROM base WHERE k % 3 <> 0),
          st AS (
            SELECT k, probe_id, 'atA' AS access_type_name,
              'connected' AS stored_cs FROM base
            UNION ALL
            SELECT k, probe_id, 'atOld', 'down' FROM base WHERE k % 6 = 0
            UNION ALL
            SELECT k, probe_id, 'default_name', 'down' FROM base WHERE k % 9 = 0),
          d AS (
            SELECT COALESCE(st.probe_id, rep.probe_id) AS probe_id,
              COALESCE(st.access_type_name, rep.access_type_name) AS access_type_name,
              st.stored_cs AS stored_connect_status,
              rep.connect_status, rep.ip,
              CAST(NULL AS VARCHAR) AS mac, CAST(NULL AS DOUBLE) AS speed,
              rep.is_default,
              CASE WHEN st.probe_id IS NULL THEN 'insert'
                   WHEN rep.probe_id IS NULL THEN 'delete'
                   ELSE 'update' END AS action
            FROM st FULL OUTER JOIN rep
              ON st.probe_id = rep.probe_id
              AND st.access_type_name = rep.access_type_name)
        SELECT probe_id, access_type_name, stored_connect_status,
          connect_status, ip, mac, speed, is_default, action
        FROM d, (SELECT 1 AS bn UNION ALL SELECT 2) batches
        WHERE NOT (action = 'delete' AND access_type_name = 'default_name')""")),

    GraftQuery(
      "q69f_stream_gw_dim_updates",
      (s, dir) =>
        // K8 streamed: per-batch keep-latest probe attributes (the
        // duplicated batch-1 copies collapse to one), pc sentinel
        // REPAIRED here (unlike the raw pinfo payload).
        s.read.parquet(s"${gwRun(s, dir)}/probe_dim_updates")
          .select("id", "info_time", "pc", "vendor", "sn", "mac", "loid",
            "pppoe_username", "hb_interval", "probe_name",
            "probe_alias_suggested", "update_time"),
      Some(s"""WITH $gwBaseSql
        SELECT probe_id AS id, timesheet AS info_time,
          CASE WHEN pc = 'ÿÿÿÿ' THEN 'DT741-csf' ELSE pc END AS pc,
          'vd' || (k % 4) AS vendor, 'sn' || k AS sn,
          CAST(NULL AS VARCHAR) AS mac, CAST(NULL AS VARCHAR) AS loid,
          CAST(NULL AS VARCHAR) AS pppoe_username,
          CAST(NULL AS INTEGER) AS hb_interval,
          CAST(NULL AS VARCHAR) AS probe_name,
          CAST(NULL AS VARCHAR) AS probe_alias_suggested,
          CAST($Now AS BIGINT) AS update_time
        FROM t""")),

    GraftQuery(
      "q72_stream_pinfo_real",
      (s, dir) =>
        // W1/K3: the c_p_pinfo_real read-side view — keep-latest per
        // probe over the STREAMED c_p_pinfo sink dir (the reference's
        // ReplacingMergeTree collapse, `ClickHouse建表定稿修改版.txt:57-74`).
        // Batch 2 re-reported every probe 30 min later, so the view must
        // return exactly the batch-2 snapshot rows.
        StreamJobs.latestView(s, s"${gwRun(s, dir)}/c_p_pinfo",
            "probe_id", "timesheet")
          .select(col("id"), col("access_type_info"), col("probe_id"),
            col("probe_info"), col("sgw_info"), col("status_info"),
            col("traffic_info"), col("timesheet"),
            col("timesheet_d").cast("long").as("timesheet_d"),
            col("create_time")),
      Some(s"""WITH $gwBaseSql
        SELECT sha256(probe_id || '|' || timesheet) AS id,
          '[{"access_type_name":"atA","connect_status":"' || cs ||
            '","is_default":1,"ip":"10.0.0.' || k || '"}' ||
            CASE WHEN k % 3 <> 0 THEN
              ',{"access_type_name":"atB","connect_status":"down","is_default":0,"ip":"10.0.1.' || k || '"}'
            ELSE '' END || ']' AS access_type_info,
          probe_id,
          '{"id":"' || probe_id || '","pc":"' || pc || '","vendor":"vd' ||
            (k % 4) || '","sn":"sn' || k || '"}' AS probe_info,
          CASE WHEN k % 13 <> 0 THEN
            '{"pon_info":{"current":' || CAST(k % 50 AS DOUBLE) ||
            ',"rx_power":' || CAST((k * 7) % 10000 AS DOUBLE) ||
            ',"tx_power":' || CAST(k % 30 AS DOUBLE) ||
            ',"temperature":' || CAST(k % 70 AS DOUBLE) ||
            ',"voltage":' || CAST(k % 12 AS DOUBLE) || '}}' END AS sgw_info,
          CASE WHEN k % 4 <> 0 THEN
            '{"cpu_rate":' || CAST(k % 100 AS DOUBLE) ||
            ',"ram_rate":' || CAST(k % 90 AS DOUBLE) ||
            ',"run_time":"' || (k * 13) || '"}' END AS status_info,
          CASE WHEN k % 5 <> 0 THEN
            '[{"access_type_name":"atA","ip":"10.0.0.' || k ||
            '","up_avg":' || CAST(k % 100 AS DOUBLE) ||
            ',"up_max":' || CAST(k % 200 AS DOUBLE) ||
            ',"down_avg":' || CAST(k % 300 AS DOUBLE) ||
            ',"down_max":' || CAST(k % 400 AS DOUBLE) || '}]' END AS traffic_info,
          timesheet,
          CAST(epoch(date_trunc('day', make_timestamp(timesheet * 1000000))) AS BIGINT) AS timesheet_d,
          CAST($Now AS BIGINT) AS create_time
        FROM t WHERE bn = 2""")),

    GraftQuery(
      "q81_stream_dedup",
      (s, dir) => {
        // Cross-batch streaming exact dedup (W2 as a stream): three
        // arrival waves re-send overlapping document slices with wave-
        // tagged payloads; with maxFilesPerTrigger=1 each wave is its own
        // micro-batch, so the dedup STATE (not within-batch dedup) must
        // suppress waves 2/3 re-sends — the winning payload per doc is
        // the first-wave version, which the hash compare pins.
        val k = col("doc_id")
        def row(tag: Int): Column =
          concat(lit("""{"doc_id":"""), k,
            lit(s""","tag":$tag,"text":"v$tag-"""), k, lit(""""}"""))
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        val frames = Seq(
          docs.filter(k % 5 < 2).select(row(0).as("value")),
          docs.filter(k % 5 < 4).select(row(1).as("value")),
          docs.select(row(2).as("value")))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, tag INT, text STRING")
        runStaged(s, frames, "docs_deduped") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          graft.streaming.StreamDedup.firstArrival(parsed, Seq("doc_id"))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/docs_deduped")
            .trigger(Trigger.AvailableNow())
            .start()
        }.select("doc_id", "tag", "text")
      },
      Some("""SELECT doc_id,
          CAST(CASE WHEN doc_id % 5 < 2 THEN 0
                    WHEN doc_id % 5 < 4 THEN 1
                    ELSE 2 END AS INTEGER) AS tag,
          'v' || CAST(CASE WHEN doc_id % 5 < 2 THEN 0
                           WHEN doc_id % 5 < 4 THEN 1
                           ELSE 2 END AS VARCHAR) ||
            '-' || CAST(doc_id AS VARCHAR) AS text
        FROM documents""")),

    GraftQuery(
      "q301_stream_rate_spikes",
      (s, dir) => {
        // q291's volume alert LIVE ([[graft.streaming.StatefulOps
        // .rateSpikeStream]]): daily counts arrive in three
        // chronological waves, and the trailing-7-day window rides
        // per-key state across micro-batches — a day near a wave
        // boundary still tests against the previous wave's baseline.
        // Oracle = the batch meter's SQL over the union of all days.
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400L").as("d"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val r = daily.agg(min(col("d")), max(col("d"))).collect()(0)
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
        def wave(f: Column): DataFrame = daily.filter(f)
          .select(concat(lit("""{"key":""""), col("event_type"),
            lit("""","d":"""), col("d"), lit(""","n":"""), col("n"),
            lit("}")).as("value"))
        val frames = Seq(wave(col("d") <= c1),
          wave(col("d") > c1 && col("d") <= c2), wave(col("d") > c2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "key STRING, d LONG, n LONG")
        runStaged(s, frames, "spikes") { (raw, out, ckpt) =>
          import s.implicits._
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.key").as("key"), col("j.d").as("ordinal"),
              col("j.n").as("x"))
            .as[graft.streaming.StatefulOps.SpikeEvent]
          graft.streaming.StatefulOps.rateSpikeStream(parsed, w = 7, z = 4)
            .toDF()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/spikes")
            .trigger(Trigger.AvailableNow())
            .start()
        }.select(col("key"), col("ordinal").as("d"), col("x").as("n"),
          col("win_sum"), col("n_prior"), col("spike"))
      },
      Some("""WITH daily AS (SELECT event_type,
              CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          t AS (SELECT event_type, d, n,
              COALESCE(CAST(SUM(n) OVER w AS BIGINT), 0) AS win_sum,
              CAST(COUNT(*) OVER w AS BIGINT) AS n_prior
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        SELECT event_type AS key, d, n, win_sum, n_prior,
          (n_prior = 7 AND (7 * n - win_sum) * (7 * n - win_sum)
            > 16 * 7 * win_sum AND 7 * n > win_sum) AS spike
        FROM t""")),

    GraftQuery(
      "q296_stream_golden_record",
      (s, dir) => {
        // MDM golden record as LIVE state ([[graft.streaming.StatefulOps
        // .goldenUpsert]]): three sparse-update waves arrive as separate
        // micro-batches — wave 1 sets f2 WITHOUT f1, wave 2 overwrites
        // f1 — and the cross-batch state must merge fields independently
        // (a keep-latest row would wipe f2 back to null on wave 2). The
        // final golden per entity is the last emission (max n_versions).
        val k = col("doc_id")
        val docs = Tables.load(s, dir, "documents").select(k)
        val frames = Seq(
          docs.select(concat(lit("""{"key":"""), k,
            lit(""","ord":1,"f1":"a"""), k, lit(""""}""")).as("value")),
          docs.filter(k % 3 === 0).select(concat(lit("""{"key":"""), k,
            lit(""","ord":2,"f2":"b"""), k, lit(""""}""")).as("value")),
          docs.filter(k % 5 === 0).select(concat(lit("""{"key":"""), k,
            lit(""","ord":3,"f1":"c"""), k, lit(""""}""")).as("value")))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "key LONG, ord LONG, f1 STRING, f2 STRING")
        val emitted = runStaged(s, frames, "golden") { (raw, out, ckpt) =>
          import s.implicits._
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.key").as("key"), col("j.ord").as("ordinal"),
              col("j.f1").as("f1"), col("j.f2").as("f2"))
            .as[graft.streaming.StatefulOps.GoldenUpdate]
          graft.streaming.StatefulOps.goldenUpsert(parsed).toDF()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/golden")
            .trigger(Trigger.AvailableNow())
            .start()
        }
        graft.operators.KeepLatest(emitted, Seq("key"),
          Seq(col("n_versions").desc))
          .select("key", "f1", "f2", "n_versions", "last_ordinal")
      },
      Some("""SELECT doc_id AS key,
          CASE WHEN doc_id % 5 = 0 THEN 'c' || CAST(doc_id AS VARCHAR)
            ELSE 'a' || CAST(doc_id AS VARCHAR) END AS f1,
          CASE WHEN doc_id % 3 = 0 THEN 'b' || CAST(doc_id AS VARCHAR)
            ELSE NULL END AS f2,
          CAST(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
            + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
            AS n_versions,
          CAST(CASE WHEN doc_id % 5 = 0 THEN 3
            WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT)
            AS last_ordinal
        FROM documents""")),

    GraftQuery(
      "q155_stream_ann_index",
      (s, dir) => {
        // ANN index kept FRESH from a stream (no rebuilds): three waves
        // of vectors arrive as micro-batches; each foreachBatch appends
        // its rows under __bucket=b/__batch=id via dynamic partition
        // overwrite, so a REPLAYED batch rewrites exactly its own files
        // (exercised: batch 2 is written twice). A probe over the
        // stream-maintained index must equal the same probe over a
        // batch-built index of the full corpus — the freshness path adds
        // files, never answers.
        val emb = Tables.load(s, dir, "embeddings")
          .select("vec_id", "embedding")
        val qv = emb.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toSeq.map(_.toDouble)
        val k = col("vec_id")
        def wave(p: Column) = emb.filter(p)
          .select(to_json(struct(col("vec_id"), col("embedding"))).as("value"))
        val frames = Seq(
          wave(k % 3 === 0), wave(k % 3 === 1), wave(k % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id LONG, embedding ARRAY<FLOAT>")
        val streamedIdx = runStaged(s, frames, "ann_idx") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          parsed.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              graft.operators.AnnIndex.appendBatch(
                b, "vec_id", "embedding", s"$out/ann_idx",
                dim = 64, bits = 8, batchId = id)
              if (id == 2) // simulate a retried batch: idempotent rewrite
                graft.operators.AnnIndex.appendBatch(
                  b, "vec_id", "embedding", s"$out/ann_idx",
                  dim = 64, bits = 8, batchId = id)
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }
        val bpath = Files.createTempDirectory("graft-annbatch")
          .resolve("idx").toString
        graft.operators.AnnIndex.build(emb, "vec_id", "embedding", bpath,
          dim = 64, bits = 8)
        val batchProbe = graft.operators.AnnIndex.topK(
            graft.operators.AnnIndex.load(s, bpath),
            "vec_id", "embedding", qv, k = 10, bits = 8)
          .select(lit("batch").as("src"), col("vec_id"), col("cos"))
        val streamedProbe = graft.operators.AnnIndex.topK(
            streamedIdx.drop("__batch"),
            "vec_id", "embedding", qv, k = 10, bits = 8)
          .select(lit("streamed").as("src"), col("vec_id"), col("cos"))
        batchProbe.unionByName(streamedProbe)
      },
      // both probes must answer exactly the known single-table LSH top-k
      Some(s"""SELECT 'batch' AS src, vec_id, cos
          FROM (${VectorQueries.lshTopKOracle})
        UNION ALL SELECT 'streamed' AS src, vec_id, cos
          FROM (${VectorQueries.lshTopKOracle})""")),

    GraftQuery(
      "q225_stream_pq_index",
      (s, dir) => {
        // the COMPRESSED index kept fresh from a stream: the IVF-PQ
        // model (coarse cells + codebooks) is trained once on the
        // standing corpus and FROZEN — the invariant that keeps codes
        // written in different batches comparable — then three arrival
        // waves encode themselves and append under __cell=c/__batch=id
        // (dynamic partition overwrite; batch 1 is appended twice to
        // exercise the idempotent replay). A probe over the
        // stream-maintained index must equal the probe over a
        // batch-built index of the full corpus, and both must equal the
        // q223 oracle's independently re-derived ranking.
        val emb = Tables.load(s, dir, "embeddings")
          .select("vec_id", "embedding")
        val qv = emb.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toSeq.map(_.toDouble)
        val model = graft.operators.PqIndex.train(
          emb, "vec_id", "embedding", nCells = 16, m = 4, ks = 8, iters = 2)
        val k = col("vec_id")
        def wave(p: Column) = emb.filter(p)
          .select(to_json(struct(col("vec_id"), col("embedding"))).as("value"))
        val frames = Seq(
          wave(k % 3 === 0), wave(k % 3 === 1), wave(k % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id LONG, embedding ARRAY<FLOAT>")
        val streamedIdx = runStaged(s, frames, "pq_idx") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          parsed.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              graft.operators.PqIndex.appendBatch(
                b, "vec_id", "embedding", s"$out/pq_idx", model, id)
              if (id == 1) // retried batch: idempotent rewrite
                graft.operators.PqIndex.appendBatch(
                  b, "vec_id", "embedding", s"$out/pq_idx", model, id)
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }.drop("__batch")
        val bpath = Files.createTempDirectory("graft-pqbatch")
          .resolve("idx").toString
        graft.operators.PqIndex.build(emb, "vec_id", "embedding", bpath, model)
        val batchProbe = graft.operators.PqIndex.topK(
            graft.operators.PqIndex.load(s, bpath), "vec_id", qv,
            k = 10, model, nProbe = 4)
          .select(lit("batch").as("src"), col("vec_id"), col("score"))
        val streamedProbe = graft.operators.PqIndex.topK(
            streamedIdx, "vec_id", qv, k = 10, model, nProbe = 4)
          .select(lit("streamed").as("src"), col("vec_id"), col("score"))
        batchProbe.unionByName(streamedProbe)
      },
      Some(s"""SELECT 'batch' AS src, vec_id, score
          FROM (${VectorQueries.ivfPqTopKOracle})
        UNION ALL SELECT 'streamed' AS src, vec_id, score
          FROM (${VectorQueries.ivfPqTopKOracle})""")),

    GraftQuery(
      "q218_stream_minhash_ingest",
      (s, dir) => {
        // the day-2 near-dup ingest (q215) run AS A STREAM — the
        // standing-pipeline shape end-to-end: the corpus is seeded into
        // a partitioned "seen" store (batch=-1), and each arrival wave
        // (1) pairs its docs against everything that arrived BEFORE it
        // (partition-pruned read of batch < id — the probe never
        // re-pairs the standing corpus against itself), writing its
        // verified pairs idempotently under batch=<id>, then (2) appends
        // its own docs to the store under batch=<id>. Batch 1 is run
        // twice to exercise replay: the batch<id filter keeps the retry
        // from seeing its own first attempt, so it rewrites exactly the
        // same files. The union of per-wave pairs must equal the
        // one-shot oracle — every (a, b) with wave(a) > wave(b) and
        // jaccard ≥ 0.8, waves encoded in id ranges.
        val W = 1000000L
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val k = col("doc_id")
        def wave(w: Int, p: Column) = docs.filter(p)
          .select(to_json(struct((col("doc_id") + w * W).as("doc_id"),
            col("text"))).as("value"))
        val frames = Seq(wave(1, k % 3 === 0), wave(2, k % 3 === 1),
          wave(3, k % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, text STRING")
        runStaged(s, frames, "pairs") { (raw, out, ckpt) =>
          val seen = s"$out/seen"
          docs.write.mode("overwrite").parquet(s"$seen/batch=-1")
          raw.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              val batch = b
                .select(from_json(col("value"), schema).as("j"))
                .select(col("j.*"))
                .localCheckpoint()
              def run(): Unit = {
                val standing = batch.sparkSession.read.parquet(seen)
                  .filter(col("batch") < id)
                graft.operators.Dedup.minhashLshIngest(standing, batch,
                    "doc_id", "text", numHashes = 16, bands = 4, k = 3,
                    threshold = 0.8)
                  .write.mode("overwrite").parquet(s"$out/pairs/batch=$id")
                batch.write.mode("overwrite").parquet(s"$seen/batch=$id")
              }
              run()
              if (id == 1) run() // replayed batch: idempotent rewrite
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }.select("doc_new", "doc_old", "jaccard")
      },
      Some(DedupQueries.bandedIngestOracleSql(
        """(SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 1000000 AS doc_id, text
              FROM documents WHERE doc_id % 3 = 0
            UNION ALL SELECT doc_id + 2000000 AS doc_id, text
              FROM documents WHERE doc_id % 3 = 1
            UNION ALL SELECT doc_id + 3000000 AS doc_id, text
              FROM documents WHERE doc_id % 3 = 2)""",
        "(x.doc // 1000000) > (y.doc // 1000000)"))),

    GraftQuery(
      "q320_stream_semdedup_cells",
      (s, dir) => {
        // q200's sign-bucket SEMANTIC dedup maintained AS A STREAM —
        // the cell store is the state (the q218 ingest-store shape,
        // embedding flavor): each arrival wave decides keep/drop for
        // ITS vectors against (a) the partition-pruned standing cell
        // store (`batch < id` — the store never re-pairs itself) and
        // (b) its own lower ids, then appends its cells under
        // batch=<id>. Wave ids are strictly increasing across waves,
        // so the union of per-wave verdicts must equal ONE batch
        // semDedupLsh over the whole corpus — the oracle is exactly
        // q200's batch semantics on the three-wave union. Batch 1 runs
        // twice to exercise replay idempotence. Wave 2 exact-duplicates
        // wave 1 (every verdict false via the cross leg), wave 3's
        // evens duplicate both (dropped against standing, not re-paired
        // in-wave beyond its own organics).
        val W = 1000000L
        val emb = Tables.load(s, dir, "embeddings")
          .select("vec_id", "embedding")
        val k = col("vec_id")
        def wave(w: Int, p: Column) = emb.filter(p)
          .select(to_json(struct((col("vec_id") + w * W).as("vec_id"),
            col("embedding"))).as("value"))
        val frames = Seq(wave(0, lit(true)), wave(1, lit(true)),
          wave(2, k % 2 === 0))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id LONG, embedding ARRAY<FLOAT>")
        runStaged(s, frames, "kept") { (raw, out, ckpt) =>
          val store = s"$out/cells"
          emb.limit(0).select(col("vec_id"), lit(0L).as("cluster"),
              col("embedding"))
            .write.mode("overwrite").parquet(s"$store/batch=-1")
          raw.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              val batch = b
                .select(from_json(col("value"), schema).as("j"))
                .select(col("j.*"))
                .localCheckpoint()
              def run(): Unit = {
                val ss = batch.sparkSession
                val standing = ss.read.parquet(store)
                  .filter(col("batch") < id)
                graft.operators.Similarity.semDedupLshIngest(
                    standing, batch, "vec_id", "embedding",
                    dim = 64, bits = 10, threshold = 0.95)
                  .write.mode("overwrite").parquet(s"$out/kept/batch=$id")
                batch.select(col("vec_id"),
                    graft.operators.Similarity.lshBucket(
                      col("embedding"), 64, 10).as("cluster"),
                    col("embedding"))
                  .write.mode("overwrite").parquet(s"$store/batch=$id")
              }
              run()
              if (id == 1) run() // replayed batch: idempotent rewrite
              batch.unpersist(blocking = false)
              ()
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }.select("vec_id", "cluster", "is_kept")
      },
      Some(VectorQueries.semDedupCellsOracleSql(
        """(SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding
            FROM embeddings
          UNION ALL SELECT vec_id + 2000000 AS vec_id, embedding
            FROM embeddings WHERE vec_id % 2 = 0)"""))),

    GraftQuery(
      "q262_stream_vocab_novelty",
      (s, dir) => {
        // the vocabulary-growth curve (q259's signal) maintained ONLINE:
        // each arrival wave counts the types it has never seen before by
        // anti-joining its distinct tokens against a batch-partitioned
        // "seen type" store (`batch < id` partition pruning — the q218
        // ingest-store shape, so a replayed batch never sees its own
        // first attempt), then appends exactly its NOVEL types under
        // batch=<id> (the store holds each type once, ever — state is
        // vocabulary-sized, not corpus-sized). Batch 1 runs twice to
        // exercise replay idempotence. A collapsing novelty rate is the
        // online "crawl is re-crawling itself" alarm.
        val k = col("doc_id")
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        def wave(p: Column) = docs.filter(p)
          .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
        val frames = Seq(wave(k % 3 === 0), wave(k % 3 === 1),
          wave(k % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, text STRING")
        runStaged(s, frames, "novel") { (raw, out, ckpt) =>
          val store = s"$out/seen_types"
          docs.limit(0)
            .select(explode(graft.functions.TextFunctions.tokens(
              col("text"))).as("tok"))
            .write.mode("overwrite").parquet(s"$store/batch=-1")
          raw.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              val batch = b
                .select(from_json(col("value"), schema).as("j"))
                .select(col("j.*"))
                .localCheckpoint()
              def run(): Unit = {
                val ss = batch.sparkSession
                val toks = batch
                  .select(explode(graft.functions.TextFunctions.tokens(
                    col("text"))).as("tok"))
                  .distinct().localCheckpoint()
                val standing = ss.read.parquet(store)
                  .filter(col("batch") < id).select("tok")
                val novel = toks.join(standing, Seq("tok"), "left_anti")
                  .localCheckpoint()
                val (nd, nt, nn) = (batch.count(), toks.count(), novel.count())
                import ss.implicits._
                Seq((nd, nt, nn)).toDF("n_docs", "n_types", "n_novel")
                  .coalesce(1)
                  .write.mode("overwrite").parquet(s"$out/novel/batch=$id")
                novel.write.mode("overwrite").parquet(s"$store/batch=$id")
              }
              run()
              if (id == 1) run() // replayed batch: idempotent rewrite
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }.select(col("batch").cast("long").as("batch"), col("n_docs"),
          col("n_types"), col("n_novel"))
      },
      // one-shot oracle: a type is novel in the wave where it FIRST
      // appears (waves = doc_id % 3, staged in that order)
      Some {
        val toks =
          """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
        s"""WITH w AS (SELECT doc_id % 3 AS b, unnest($toks) AS tok
            FROM documents),
          bt AS (SELECT b, tok FROM w GROUP BY b, tok),
          fw AS (SELECT tok, MIN(b) AS b FROM bt GROUP BY tok),
          d AS (SELECT doc_id % 3 AS b, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1),
          ty AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_types FROM bt
            GROUP BY b),
          nov AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_novel FROM fw
            GROUP BY b)
        SELECT CAST(d.b AS BIGINT) AS batch, d.n_docs, ty.n_types,
          COALESCE(nov.n_novel, 0) AS n_novel
        FROM d JOIN ty USING (b) LEFT JOIN nov USING (b)"""
      }),

    GraftQuery(
      "q91_stream_sketch",
      (s, dir) => {
        // corpus statistics maintained AS A STREAM: three waves of
        // documents each fold into a per-batch count-min sketch (written
        // idempotently under batch=<id>); the merged sketch's estimates
        // must equal the batch-built sketch over the whole corpus —
        // which is exactly q89's oracle (CM is algebraic, and the md5
        // family makes the counters engine-exact).
        val k = col("doc_id")
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        def wave(p: Column) = docs.filter(p)
          .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
        val frames = Seq(wave(k % 3 === 0), wave(k % 3 === 1), wave(k % 3 === 2))
        val batchSketches = runStaged(s, frames, "sketch") { (raw, out, ckpt) =>
          StreamJobs.runTokenSketch(raw, out, ckpt, Trigger.AvailableNow())
        }
        val merged = batchSketches.groupBy("j", "bucket")
          .agg(sum(col("c")).as("c"))
        graft.operators.Sketches.cmsEstimate(merged,
          Seq("spark", "table", "the", "zebra-unseen"))
      },
      // identical to q89's oracle by design: the streamed, batch-merged
      // sketch must reproduce the batch-built sketch bit-for-bit
      Some(s"""WITH toks AS (
            SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
              x -> x <> '')) AS tok FROM documents),
          h AS (SELECT r.j AS j,
              ${CurationQueries.md5Key60Sql(
                "'graft-cms' || CAST(r.j AS VARCHAR) || tok")} % 1024 AS bucket
            FROM toks, range(0, 4) r(j)),
          counters AS (SELECT j, bucket, COUNT(*) AS c FROM h GROUP BY 1, 2),
          q AS (SELECT t.term, r.j,
              ${CurationQueries.md5Key60Sql(
                "'graft-cms' || CAST(r.j AS VARCHAR) || t.term")} % 1024 AS bucket
            FROM (SELECT unnest(['spark', 'table', 'the', 'zebra-unseen'])
              AS term) t, range(0, 4) r(j))
        SELECT term, MIN(COALESCE(c.c, 0)) AS est
        FROM q LEFT JOIN counters c ON c.j = q.j AND c.bucket = q.bucket
        GROUP BY term""")),

    GraftQuery(
      "q159_stream_hdr_quantiles",
      (s, dir) => {
        // the mergeable-quantile property run as a stream: three
        // partitioning waves of lineitem each fold into a per-batch HDR
        // histogram (idempotently overwritten under batch=<id> — batch 1
        // is written twice to exercise replay), the per-batch counters
        // merge by SUM, and the merged histogram's quantile estimates
        // must equal q158's batch-built answers bit-for-bit.
        val k = col("l_orderkey")
        val li = Tables.load(s, dir, "lineitem").select(k.as("k"),
          col("l_returnflag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        def wave(p: Column) = li.filter(p)
          .select(to_json(struct(col("l_returnflag"), col("cents"))).as("value"))
        val frames = Seq(wave(col("k") % 3 === 0), wave(col("k") % 3 === 1),
          wave(col("k") % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "l_returnflag STRING, cents LONG")
        val batchHists = runStaged(s, frames, "hist") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          parsed.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              def put(): Unit = graft.operators.Sketches
                .hdrHistogram(b, "l_returnflag", "cents")
                .write.mode("overwrite").parquet(s"$out/hist/batch=$id")
              put()
              if (id == 1) put() // simulate a retried batch
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }
        val merged = batchHists.groupBy(col("l_returnflag"), col("bucket"))
          .agg(sum(col("cnt")).as("cnt"))
        graft.operators.Sketches.hdrQuantiles(merged, "l_returnflag",
          Seq(500000, 900000, 990000))
      },
      // identical to q158's oracle by design: streamed, sum-merged
      // counters must reproduce the batch-built histogram exactly
      Some(s"""WITH v AS (SELECT l_returnflag,
            CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem),
        h AS (SELECT l_returnflag,
            ${graft.operators.Sketches.hdrBucketSql("cents")} AS bucket,
            CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1, 2),
        c AS (SELECT l_returnflag, bucket, cnt,
            SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
            SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
          FROM h),
        q AS (SELECT c.*, CAST(r.q AS BIGINT) AS q_ppm,
            greatest(1, (n * r.q + 999999) // 1000000) AS rank
          FROM c, (SELECT unnest([500000, 900000, 990000]) AS q) r)
      SELECT l_returnflag, q_ppm, CAST(n AS BIGINT) AS n_values,
        CASE WHEN bucket < 128 THEN bucket
          ELSE CAST((64 + bucket % 64) *
            CAST(power(2, bucket // 64 - 1) AS BIGINT) AS BIGINT) END AS est
      FROM q WHERE cum >= rank AND cum - cnt < rank""")),

    GraftQuery(
      "q94_stream_hll",
      (s, dir) => {
        // distinct-count state maintained AS A STREAM: three OVERLAPPING
        // event waves (re-sent users must merge by register MAX, not
        // double-count); the max-merged registers' estimate must equal
        // the batch HLL over the whole table — q93's oracle verbatim.
        val ev = Tables.events(s, dir)
          .select("event_id", "event_type", "user_id")
        def wave(p: Column) = ev.filter(p)
          .select(to_json(struct(col("event_type"), col("user_id"))).as("value"))
        val frames = Seq(wave(col("event_id") % 2 === 0),
          wave(col("event_id") % 3 === 0), wave(lit(true)))
        val regs = runStaged(s, frames, "hll") { (raw, out, ckpt) =>
          StreamJobs.runHllRegisters(raw, "event_type", "user_id",
            "event_type STRING, user_id LONG", out, ckpt,
            Trigger.AvailableNow())
        }
        val merged = regs.groupBy(col("event_type"), col("idx"))
          .agg(max(col("mr")).as("mr"))
        graft.operators.Sketches.hllEstimate(merged, "event_type")
      },
      Some(graft.operators.Sketches.hllDistinctSql(
        "events", "event_type", "user_id"))),

    GraftQuery(
      "q150_stream_windowed_hll",
      (s, dir) => {
        // unique users PER HOUR WINDOW on an infinite stream: the HLL
        // register state is keyed by (window, register idx), so the
        // sketch for every window keeps merging as overlapping waves
        // re-send users; the max-merged estimate per window must equal
        // the batch HLL over the full table grouped by hour.
        val ev = Tables.events(s, dir).select(
          graft.functions.TimeBuckets.hourStart(col("ts")).as("wstart"),
          col("event_id"), col("user_id"))
        def wave(p: Column) = ev.filter(p)
          .select(to_json(struct(col("wstart"), col("user_id"))).as("value"))
        val frames = Seq(wave(col("event_id") % 2 === 0),
          wave(col("event_id") % 3 === 0), wave(lit(true)))
        val regs = runStaged(s, frames, "hll") { (raw, out, ckpt) =>
          StreamJobs.runHllRegisters(raw, "wstart", "user_id",
            "wstart LONG, user_id LONG", out, ckpt,
            Trigger.AvailableNow())
        }
        val merged = regs.groupBy(col("wstart"), col("idx"))
          .agg(max(col("mr")).as("mr"))
        graft.operators.Sketches.hllEstimate(merged, "wstart")
      },
      Some(graft.operators.Sketches.hllDistinctSql(
        "(SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS wstart, user_id FROM events) e",
        "wstart", "user_id"))),

    GraftQuery(
      "q168_stream_windowed_hdr",
      (s, dir) => {
        // per-hour-window value quantiles on an infinite stream: each
        // micro-batch folds its events into per-(window, bucket) HDR
        // counters (idempotently overwritten under batch=<id>), counters
        // sum-merge at read, and the merged per-window quantiles must
        // equal the batch build over the full table — the windowed
        // sibling of q159, as q150 is to q94.
        val ev = Tables.events(s, dir).select(
          graft.functions.TimeBuckets.hourStart(col("ts")).as("wstart"),
          col("event_id"), (col("event_id") % 997 + 1).as("val"))
        def wave(p: Column) = ev.filter(p)
          .select(to_json(struct(col("wstart"), col("val"))).as("value"))
        val frames = Seq(wave(col("event_id") % 3 === 0),
          wave(col("event_id") % 3 === 1), wave(col("event_id") % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "wstart LONG, val LONG")
        val hists = runStaged(s, frames, "whist") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          parsed.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              graft.operators.Sketches.hdrHistogram(b, "wstart", "val")
                .write.mode("overwrite").parquet(s"$out/whist/batch=$id")
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }
        val merged = hists.groupBy(col("wstart"), col("bucket"))
          .agg(sum(col("cnt")).as("cnt"))
        graft.operators.Sketches.hdrQuantiles(merged, "wstart",
          Seq(500000, 990000))
      },
      Some(s"""WITH v AS (SELECT
            CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS wstart,
            CAST(event_id % 997 + 1 AS BIGINT) AS val FROM events),
        h AS (SELECT wstart,
            ${graft.operators.Sketches.hdrBucketSql("val")} AS bucket,
            CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1, 2),
        c AS (SELECT wstart, bucket, cnt,
            SUM(cnt) OVER (PARTITION BY wstart ORDER BY bucket) AS cum,
            SUM(cnt) OVER (PARTITION BY wstart) AS n
          FROM h),
        q AS (SELECT c.*, CAST(r.q AS BIGINT) AS q_ppm,
            greatest(1, (n * r.q + 999999) // 1000000) AS rank
          FROM c, (SELECT unnest([500000, 990000]) AS q) r)
      SELECT wstart, q_ppm, CAST(n AS BIGINT) AS n_values,
        CASE WHEN bucket < 128 THEN bucket
          ELSE CAST((64 + bucket % 64) *
            CAST(power(2, bucket // 64 - 1) AS BIGINT) AS BIGINT) END AS est
      FROM q WHERE cum >= rank AND cum - cnt < rank""")),

    GraftQuery(
      "q98_stream_interval_join",
      (s, dir) => {
        // Flink-style event-time INTERVAL JOIN as a real stream-stream
        // join: impressions arrive in batch 1, clicks in batch 2, so
        // every match crosses micro-batches through the join STATE. A
        // click matches an impression with the same key within
        // [imp_time, imp_time + 30 min]; both sides are watermarked (the
        // interval is what bounds the buffered state). Inner joins emit
        // on match — no sentinel files needed.
        val k = col("c_custkey")
        def row(kind: String, ts: Column, v: Column): Column =
          concat(lit(s"""{"kind":"$kind","key":"p-"""), k % 30,
            lit("""","ts":"""), ts, lit(""","v":"""), v, lit("}"))
        // cap the synthesized stream: key/ts spaces are FIXED moduli, so
        // row volume must not scale with SF or the join's output grows
        // quadratically (at ~sf1 this gate would emit >100M pairs while
        // verifying the same semantics). No-op at the sf0.01 gate.
        val cust = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 15000)
        val imps = cust.select(
          row("imp", lit(Now) + (k % 40) * 60, k % 89).as("value"))
        val clks = cust.select(
          row("clk", lit(Now) + (k % 40) * 60 + (k % 25) * 120, k % 97)
            .as("value"))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "kind STRING, key STRING, ts LONG, v LONG")
        runStaged(s, Seq(imps, clks), "joined") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          val l = parsed.filter(col("kind") === "imp")
            .select(col("key"),
              to_timestamp(col("ts")).as("imp_time"), col("v").as("imp_v"))
            .withWatermark("imp_time", "1 hour")
          val r = parsed.filter(col("kind") === "clk")
            .select(col("key").as("clk_key"),
              to_timestamp(col("ts")).as("clk_time"), col("v").as("clk_v"))
            .withWatermark("clk_time", "1 hour")
          graft.streaming.StreamJoins.intervalJoin(l, r,
              "key", "clk_key", "imp_time", "clk_time", 0L, 1800L)
            .select(col("key"),
              unix_timestamp(col("imp_time")).as("imp_ts"), col("imp_v"),
              unix_timestamp(col("clk_time")).as("clk_ts"), col("clk_v"))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/joined")
            .trigger(Trigger.AvailableNow())
            .start()
        }
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_custkey <= 15000),
          imp AS (SELECT 'p-' || (k % 30) AS key,
            CAST($Now + (k % 40) * 60 AS BIGINT) AS imp_ts,
            CAST(k % 89 AS BIGINT) AS imp_v FROM b),
          clk AS (SELECT 'p-' || (k % 30) AS key,
            CAST($Now + (k % 40) * 60 + (k % 25) * 120 AS BIGINT) AS clk_ts,
            CAST(k % 97 AS BIGINT) AS clk_v FROM b)
        SELECT i.key, i.imp_ts, i.imp_v, c.clk_ts, c.clk_v
        FROM imp i JOIN clk c ON c.key = i.key
          AND c.clk_ts >= i.imp_ts AND c.clk_ts <= i.imp_ts + 1800""")),

    GraftQuery(
      "q100_stream_sliding_window",
      (s, dir) => {
        // Sliding windows under the driver gate as a REAL stream — the
        // last windowed-agg mode not yet stream-gated (tumbling = q65,
        // session = q71). Every event lands in TWO overlapping 1-hour
        // windows advancing every 30 min, so the append-mode output must
        // double-count each event across window assignments while the
        // watermark still closes every window deterministically. Same
        // sentinel recipe as q65.
        val k = col("c_custkey")
        val base = Now
        def row(pid: Column, ts: Column, score: Column): Column =
          concat(lit("""{"probe_id":"p-"""), pid,
            lit("""","ts":"""), ts, lit(""","score":"""), score, lit("}"))
        val cust = Tables.load(s, dir, "customer")
        val data = cust.select(row(k % 50, lit(base) + (k % 48) * 1800,
          (k % 89).cast("double") + lit(0.25)).as("value"))
        def sentinel(tag: Int) = cust.limit(1).select(
          row(lit(9999), lit(base + 30L * 86400 + tag), lit(0.0)).as("value"))
        val frames = Seq(data, sentinel(0), sentinel(1))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "probe_id STRING, ts LONG, score DOUBLE")
        runStaged(s, frames, "sliding") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
            .withColumn("event_time", to_timestamp(col("ts")))
            .withWatermark("event_time", "10 minutes")
          graft.streaming.WindowedAgg.sliding(parsed, "event_time",
              "1 hour", "30 minutes", Seq("probe_id"),
              Seq(count(lit(1)).as("n"),
                sum(col("score").cast(
                  org.apache.spark.sql.types.DecimalType(12, 2)))
                  .cast("double").as("sum_score")))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/sliding")
            .trigger(Trigger.AvailableNow())
            .start()
        }.filter(col("window_start") < base + 86400L)
          .select("window_start", "window_end", "probe_id", "n", "sum_score")
      },
      // every data ts is slide-aligned (multiple of 1800), so its two
      // containing 1-hour windows start at ts and ts - 1800 exactly
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer),
          r AS (SELECT 'p-' || (k % 50) AS probe_id,
            CAST($Now + (k % 48) * 1800 AS BIGINT) AS ts,
            CAST(k % 89 AS DOUBLE) + 0.25E0 AS score FROM b),
          w AS (SELECT probe_id, ts - g.i * 1800 AS ws, score
            FROM r, range(0, 2) g(i))
        SELECT CAST(ws AS BIGINT) AS window_start,
          CAST(ws + 3600 AS BIGINT) AS window_end,
          probe_id, COUNT(*) AS n,
          CAST(SUM(CAST(score AS DECIMAL(12,2))) AS DOUBLE) AS sum_score
        FROM w GROUP BY 1, 2, 3""")),

    GraftQuery(
      "q118_stream_outer_join",
      (s, dir) => {
        // LEFT OUTER stream-stream interval join: impressions whose
        // click interval expires under the watermark must STILL emit,
        // null-padded — the incremental form of "which impressions never
        // converted" (a batch anti-join over full history otherwise).
        // Clicks land (k%25)*120 s after the impression, so k%25 > 15
        // rows fall outside the 30-min interval and only emit via the
        // outer path. A far-future sentinel on EACH side pushes both
        // watermarks past every data interval so expiry is provable.
        val k = col("c_custkey")
        def row(kind: String, ts: Column, v: Column): Column =
          concat(lit(s"""{"kind":"$kind","key":"p-"""), k % 30,
            lit("""","ts":"""), ts, lit(""","v":"""), v, lit("}"))
        // same fixed-moduli cap as q98: bound the synthesized stream so
        // the outer join's pair volume stays constant as SF grows
        val cust = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 15000)
        val far = lit(Now) + 30L * 86400
        val imps = cust.select(
          row("imp", lit(Now) + (k % 40) * 60, k % 89).as("value"))
        val clks = cust.select(
          row("clk", lit(Now) + (k % 40) * 60 + (k % 25) * 120, k % 97)
            .as("value"))
        val sentinels = cust.limit(1).select(explode(array(
          concat(lit("""{"kind":"imp","key":"p-9999","ts":"""), far,
            lit(""","v":0}""")),
          concat(lit("""{"kind":"clk","key":"p-9999","ts":"""), far,
            lit(""","v":0}""")))).as("value"))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "kind STRING, key STRING, ts LONG, v LONG")
        runStaged(s, Seq(imps, clks, sentinels), "joined") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          val l = parsed.filter(col("kind") === "imp")
            .select(col("key"),
              to_timestamp(col("ts")).as("imp_time"), col("v").as("imp_v"))
            .withWatermark("imp_time", "1 hour")
          val r = parsed.filter(col("kind") === "clk")
            .select(col("key").as("clk_key"),
              to_timestamp(col("ts")).as("clk_time"), col("v").as("clk_v"))
            .withWatermark("clk_time", "1 hour")
          graft.streaming.StreamJoins.intervalJoinLeftOuter(l, r,
              "key", "clk_key", "imp_time", "clk_time", 0L, 1800L)
            .select(col("key"),
              unix_timestamp(col("imp_time")).as("imp_ts"), col("imp_v"),
              unix_timestamp(col("clk_time")).as("clk_ts"), col("clk_v"))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/joined")
            .trigger(Trigger.AvailableNow())
            .start()
        }.filter(col("key") =!= "p-9999")
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_custkey <= 15000),
          imp AS (SELECT 'p-' || (k % 30) AS key,
            CAST($Now + (k % 40) * 60 AS BIGINT) AS imp_ts,
            CAST(k % 89 AS BIGINT) AS imp_v FROM b),
          clk AS (SELECT 'p-' || (k % 30) AS key,
            CAST($Now + (k % 40) * 60 + (k % 25) * 120 AS BIGINT) AS clk_ts,
            CAST(k % 97 AS BIGINT) AS clk_v FROM b)
        SELECT i.key, i.imp_ts, i.imp_v, c.clk_ts, c.clk_v
        FROM imp i LEFT JOIN clk c ON c.key = i.key
          AND c.clk_ts >= i.imp_ts AND c.clk_ts <= i.imp_ts + 1800""")),

    GraftQuery(
      "q119_stream_late_route",
      (s, dir) => {
        // late-data side routing under the gate: wave 1 sets the
        // high-watermark, wave 2 replays some rows older than
        // (hwm − 30 min) — those must land in the late sink, not main —
        // and wave 3 repeats the pattern against the advanced hwm. The
        // routing decision uses only EARLIER batches' state, so the
        // expected flag is a pure per-row formula.
        val k = col("c_custkey")
        val base = Now
        def row(w: Int, ts: Column): Column =
          concat(lit(s"""{"k":"""), k, lit(s""","w":$w,"ts":"""), ts,
            lit("}"))
        val cust = Tables.load(s, dir, "customer")
        val w1 = cust.select(row(1, lit(base) + (k % 60) * 60).as("value"))
        val w2 = cust.select(row(2,
          when(k % 5 === 0, lit(base))
            .otherwise(lit(base) + 3600 + (k % 60) * 60)).as("value"))
        val w3 = cust.select(row(3,
          when(k % 7 === 0, lit(base) + 100)
            .otherwise(lit(base) + 7200 + (k % 60) * 60)).as("value"))
        val base0 = java.nio.file.Files.createTempDirectory("graft-late")
        val frames = Seq(w1, w2, w3)
        val outDir = {
          // runStaged writes one named sink; late-route has two, so run
          // the staged stream inline with the same recipe
          val q = StreamJobs.runLateRoute(
            StreamJobs.fileSource(s, stage(base0, frames).toString,
              maxFilesPerTrigger = 1),
            "k LONG, w INT, ts LONG", "ts", latenessSec = 1800L,
            base0.resolve("out").toString,
            base0.resolve("ckpt").toString,
            trigger = Trigger.AvailableNow())
          q.awaitTermination()
          base0.resolve("out").toString
        }
        val main = s.read.parquet(s"$outDir/main")
          .select(col("k"), col("w"), col("ts"), lit(false).as("is_late"))
        val late = s.read.parquet(s"$outDir/late")
          .select(col("k"), col("w"), col("ts"), lit(true).as("is_late"))
        main.unionByName(late).localCheckpoint()
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer)
        SELECT k, CAST(1 AS INTEGER) AS w,
          CAST($Now + (k % 60) * 60 AS BIGINT) AS ts, false AS is_late
        FROM b
        UNION ALL
        SELECT k, CAST(2 AS INTEGER) AS w,
          CAST(CASE WHEN k % 5 = 0 THEN $Now
            ELSE $Now + 3600 + (k % 60) * 60 END AS BIGINT) AS ts,
          (k % 5 = 0) AS is_late
        FROM b
        UNION ALL
        SELECT k, CAST(3 AS INTEGER) AS w,
          CAST(CASE WHEN k % 7 = 0 THEN $Now + 100
            ELSE $Now + 7200 + (k % 60) * 60 END AS BIGINT) AS ts,
          (k % 7 = 0) AS is_late
        FROM b""")),

    GraftQuery(
      "q111_stream_ewma",
      (s, dir) => {
        // per-key EWMA maintained ACROSS batches through keyed state:
        // three ordinal-ranged waves arrive in separate micro-batches,
        // each folds into the fixed-point state, and the final snapshot
        // per key must equal a single fold over the whole ordered
        // series (the oracle's list_reduce) — which only holds if the
        // cross-batch state carries (ewma, count) exactly.
        import s.implicits._
        val k = col("c_custkey")
        val cust = Tables.load(s, dir, "customer").select(k.as("k"))
        def wave(p: Column) = cust.filter(p).select(
          to_json(struct(
            concat(lit("k-"), col("k") % 20).as("key"),
            col("k").cast("long").as("ordinal"),
            ((col("k") % 997) * 1000).cast("long").as("xs"))).as("value"))
        val n3 = lit(500) // wave boundaries by key range: ordinal order
        val frames = Seq(wave(col("k") < n3),
          wave(col("k") >= n3 && col("k") < n3 * 2), wave(col("k") >= n3 * 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "key STRING, ordinal LONG, xs LONG")
        val snaps = runStaged(s, frames, "ewma") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*")).as[graft.streaming.StatefulOps.EwmaEvent]
          graft.streaming.StatefulOps.ewmaFixedPoint(parsed, 3L, 10L)
            .toDF()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/ewma")
            .trigger(Trigger.AvailableNow())
            .start()
        }
        graft.operators.KeepLatest(snaps, Seq("key"),
          Seq(col("n_events").desc))
      },
      Some("""WITH b AS (SELECT c_custkey AS k FROM customer),
          e AS (SELECT 'k-' || (k % 20) AS key, k AS ordinal,
            (k % 997) * 1000 AS xs FROM b),
          l AS (SELECT key, list(xs ORDER BY ordinal) AS xs
            FROM e GROUP BY key)
        SELECT key, CAST(len(xs) AS BIGINT) AS n_events,
          CAST(list_reduce(xs, (a, x) -> (3 * x + 7 * a) // 10) AS BIGINT)
            AS ewma
        FROM l""")),

    GraftQuery(
      "q144_stream_stale_keys",
      (s, dir) => {
        // missing-heartbeat alerting via event-time timeout: wave 1
        // beats all 20 keys (ts ≤ ~124), wave 2 refreshes only keys
        // 0-9 (ts ~5000), wave 3 refreshes only key 0 (ts 10000). As
        // the watermark passes last_seen + 500 s, every key except the
        // still-fresh k-0 must fire exactly one stale alert carrying
        // its true last_ts and event count — keys 10-19 expire on the
        // wave-3 batch, keys 1-9 on the trailing no-data batch Spark
        // runs because the final watermark advance expired their timers.
        // (ts starts at 1: rows at ts=0 equal the initial watermark and
        // are dropped by the stateful op's late-row filter.)
        import s.implicits._
        val k = col("c_custkey")
        val cust = Tables.load(s, dir, "customer").select(k.as("k"))
        def wave(filter: Column, ts: Column) =
          cust.filter(filter).select(to_json(struct(
            concat(lit("k-"), col("k") % 20).as("key"),
            ts.cast("long").as("ts"))).as("value"))
        // wave filters are MODULAR (k%3, k=20), never absolute custkey
        // ranges: sf0.001 has only 150 customers, and an empty wave 2/3
        // would freeze the watermark so no timer ever fires (0 rows)
        val frames = Seq(
          wave(lit(true), col("k") % 25 * 5 + expr("k div 100") + 1),
          wave(col("k") % 3 === 0 && col("k") % 20 < 10,
            lit(5000) + col("k") % 97),
          wave(col("k") === 20, lit(10000)))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "key STRING, ts LONG")
        val alerts = runStaged(s, frames, "stale") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.key").as("key"), col("j.ts").as("ts"),
              col("j.ts").cast("timestamp").as("et"))
            .withWatermark("et", "0 seconds")
            .as[graft.streaming.StatefulOps.HbEvent]
          graft.streaming.StatefulOps.staleKeys(parsed, gapSeconds = 500L)
            .toDF()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/stale")
            .trigger(Trigger.AvailableNow())
            .start()
        }
        alerts
      },
      Some("""WITH b AS (SELECT c_custkey AS k FROM customer),
          e AS (
            SELECT 'k-' || (k % 20) AS key,
              CAST((k % 25) * 5 + k // 100 + 1 AS BIGINT) AS ts
            FROM b
            UNION ALL
            SELECT 'k-' || (k % 20), CAST(5000 + k % 97 AS BIGINT)
            FROM b WHERE k % 3 = 0 AND k % 20 < 10
            UNION ALL
            SELECT 'k-0', CAST(10000 AS BIGINT) FROM b WHERE k = 20)
        SELECT key, MAX(ts) AS last_ts, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e GROUP BY key
        HAVING key <> 'k-0'""")),

    GraftQuery(
      "q157_stream_count_or_time",
      (s, dir) => {
        // the reference's custom Flink trigger (TimeCountMessageTrigger:
        // fire the keyed window early whenever its pane holds maxCount
        // events, flush the remainder when the window's timer expires),
        // run deterministically: three modular waves of order events
        // land in [1,180] over 60 s tumbling windows with maxCount=7;
        // a pane's fire boundaries depend only on arrival order
        // (wave, then ordinal), which the oracle replays with a
        // row_number over the same ordering. The 200 s watermark delay
        // keeps all three same-range waves non-late; the sentinel wave
        // advances the final watermark so every remainder pane flushes
        // on the trailing no-data batch.
        import s.implicits._
        val k = col("k")
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey").as("k"))
        def wave(f: Column) = ord.filter(f).select(to_json(struct(
          concat(lit("k-"), k % 8).as("key"),
          (lit(1) + k % 180).cast("long").as("ts"),
          k.cast("long").as("ordinal"),
          (k % 100).cast("long").as("x"))).as("value"))
        val frames = Seq(
          wave(k % 3 === 0), wave(k % 3 === 1), wave(k % 3 === 2),
          ord.limit(1).select(to_json(struct(lit("k-z").as("key"),
            lit(10000L).as("ts"), lit(0L).as("ordinal"),
            lit(0L).as("x"))).as("value")))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "key STRING, ts LONG, ordinal LONG, x LONG")
        val fires = runStaged(s, frames, "fires") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.key").as("key"), col("j.ts").as("ts"),
              col("j.ordinal").as("ordinal"), col("j.x").as("x"),
              col("j.ts").cast("timestamp").as("et"))
            .withWatermark("et", "200 seconds")
            .as[graft.streaming.StatefulOps.CotEvent]
          graft.streaming.StatefulOps
            .countOrTimeFires(parsed, maxCount = 7, windowSeconds = 60L)
            .toDF()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/fires")
            .trigger(Trigger.AvailableNow())
            .start()
        }
        // the sentinel's own pane never flushes (its window end stays
        // beyond the final watermark) — nothing to filter out
        fires
      },
      Some("""WITH b AS (SELECT o_orderkey AS k FROM orders
            WHERE o_orderkey % 5 = 0),
          e AS (SELECT 'k-' || (k % 8) AS key,
              CAST(1 + (k % 180) AS BIGINT) AS ts,
              k AS ordinal, CAST(k % 100 AS BIGINT) AS x, k % 3 AS wave
            FROM b),
          w AS (SELECT key, ts - ts % 60 AS window_start, ordinal, x, wave
            FROM e),
          r AS (SELECT key, window_start, x,
              row_number() OVER (PARTITION BY key, window_start
                ORDER BY wave, ordinal) - 1 AS rn
            FROM w),
          g AS (SELECT key, window_start, rn // 7 AS fire_seq,
              COUNT(*) AS n, SUM(x) AS sx
            FROM r GROUP BY 1, 2, 3)
        SELECT key, CAST(window_start AS BIGINT) AS window_start,
          CAST(fire_seq AS BIGINT) AS fire_seq,
          CAST(n AS BIGINT) AS n_events, CAST(sx AS BIGINT) AS sum_x,
          n = 7 AS early
        FROM g""")),

    GraftQuery(
      "q130_stream_funnel",
      (s, dir) => {
        // the CEP pattern-match as a stream: three waves (views, then
        // clicks for keys j<15, then purchases for j<8) arrive in
        // separate micro-batches in per-key ordinal order; the keyed
        // state machine must land every key on the same (stages, t0,
        // t1, t2) as the batch funnel oracle — including keys whose
        // purchase falls OUTSIDE the horizon (j = 6, 7: ts 20040+1000j
        // > 100j + 25000) and keys abandoned mid-funnel.
        import s.implicits._
        val k = col("c_custkey")
        val cust = Tables.load(s, dir, "customer").select(k.as("k"))
        def ev(filter: Column, ts: Column, step: String) =
          cust.filter(filter).select(to_json(struct(
            concat(lit("u-"), col("k") % 25).as("key"),
            ts.cast("long").as("ordinal"),
            lit(step).as("step"))).as("value"))
        val j = col("k") % 25
        val frames = Seq(
          ev(col("k") < 500, j * 100 + expr("k div 25"), "view"),
          ev(col("k") >= 500 && col("k") < 1000 && j < 15,
            j * 100 + expr("k div 25") + 5000, "click"),
          ev(col("k") >= 1000 && col("k") < 1500 && j < 8,
            j * 1000 + expr("k div 25") + 20000, "purchase"))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "key STRING, ordinal LONG, step STRING")
        val snaps = runStaged(s, frames, "funnel") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
            .as[graft.streaming.StatefulOps.FunnelEvent]
          graft.streaming.StatefulOps.funnelStages(parsed,
              Seq("view", "click", "purchase"), horizon = 25000L)
            .toDF()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", s"$out/funnel")
            .trigger(Trigger.AvailableNow())
            .start()
        }
        graft.operators.KeepLatest(snaps, Seq("key"),
          Seq(col("n_events").desc))
      },
      Some("""WITH b AS (SELECT c_custkey AS k FROM customer),
          e AS (
            SELECT 'u-' || (k % 25) AS key,
              CAST((k % 25) * 100 + k // 25 AS BIGINT) AS ts,
              'view' AS step FROM b WHERE k < 500
            UNION ALL
            SELECT 'u-' || (k % 25),
              CAST((k % 25) * 100 + k // 25 + 5000 AS BIGINT), 'click'
            FROM b WHERE k >= 500 AND k < 1000 AND (k % 25) < 15
            UNION ALL
            SELECT 'u-' || (k % 25),
              CAST((k % 25) * 1000 + k // 25 + 20000 AS BIGINT), 'purchase'
            FROM b WHERE k >= 1000 AND k < 1500 AND (k % 25) < 8),
          n AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM e GROUP BY key),
          s0 AS (SELECT key, MIN(ts) AS t0 FROM e
            WHERE step = 'view' GROUP BY key),
          s1 AS (SELECT e.key, MIN(e.ts) AS t1 FROM e JOIN s0 USING (key)
            WHERE step = 'click' AND e.ts >= s0.t0
              AND e.ts <= s0.t0 + 25000 GROUP BY e.key),
          s2 AS (SELECT e.key, MIN(e.ts) AS t2 FROM e
            JOIN s1 USING (key) JOIN s0 USING (key)
            WHERE step = 'purchase' AND e.ts >= s1.t1
              AND e.ts <= s0.t0 + 25000 GROUP BY e.key)
        SELECT n.key, n.n_events,
          CAST(CASE WHEN s0.key IS NULL THEN 0 ELSE 1 END
             + CASE WHEN s1.key IS NULL THEN 0 ELSE 1 END
             + CASE WHEN s2.key IS NULL THEN 0 ELSE 1 END AS INTEGER)
            AS stages_reached,
          s0.t0, s1.t1, s2.t2
        FROM n
        LEFT JOIN s0 USING (key)
        LEFT JOIN s1 USING (key)
        LEFT JOIN s2 USING (key)""")),

    GraftQuery(
      "q178_stream_checksum",
      (s, dir) => {
        // the replica-integrity checksum (q177) maintained AS A STREAM:
        // each wave's batch folds to per-bucket (count, xor) partials
        // written idempotently under batch=<id> (batch 1 is deliberately
        // re-run — the overwrite makes the retry a no-op); partials
        // merge at read by (sum, bit_xor) since XOR-of-XORs is the XOR
        // of the union. The merged frame must equal the batch-built
        // checksum bit-for-bit — q177's oracle verbatim.
        val o = Tables.load(s, dir, "orders")
          .withColumn("bucket_d",
            unix_timestamp(date_trunc("day", col("o_orderdate"))))
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_orderpriority"), col("bucket_d"))
        def wave(p: Column) = o.filter(p)
          .select(to_json(struct(o.columns.map(col): _*)).as("value"))
        val k = col("o_orderkey")
        val frames = Seq(wave(k % 3 === 0), wave(k % 3 === 1),
          wave(k % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
            "o_orderpriority STRING, bucket_d LONG")
        val parts = runStaged(s, frames, "chk") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          parsed.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              def put(): Unit = graft.operators.Audit
                .tableChecksum(b, "bucket_d",
                  Seq("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_orderpriority"))
                .write.mode("overwrite").parquet(s"$out/chk/batch=$id")
              put()
              if (id == 1) put() // simulate a retried batch
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }
        parts.groupBy(col("bucket"))
          .agg(sum(col("n_rows")).as("n_rows"),
            expr("bit_xor(xor_key)").as("xor_key"))
      },
      // identical to q177's oracle by design: streamed partials merged
      // by (sum, xor) must reproduce the batch checksum exactly
      Some(s"""WITH r AS (SELECT
            CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS bucket,
            ${CurationQueries.md5Key60Sql(
              "COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)) || chr(31) || " +
              "COALESCE(CAST(o_custkey AS VARCHAR), chr(0)) || chr(31) || " +
              "COALESCE(o_orderstatus, chr(0)) || chr(31) || " +
              "COALESCE(o_orderpriority, chr(0))")} AS rk
          FROM orders)
        SELECT bucket, COUNT(*) AS n_rows, bit_xor(rk) AS xor_key
        FROM r GROUP BY 1""")),

    GraftQuery(
      "q189_stream_batch_audit",
      (s, dir) => {
        // ingest lineage as data: every micro-batch writes ONE audit row
        // (rows, distinct keys, day span) alongside its sink output —
        // the per-batch manifest an ops team replays incidents from.
        // The gate reconciles the merged audit trail against the whole
        // corpus: batch row counts must SUM to the table count, key
        // counts to the distinct total, and the span to the corpus span
        // — so a dropped or double-committed batch is visible in the
        // manifest itself (batch 1's deliberate retry overwrites
        // idempotently and must NOT double-count).
        val o = Tables.load(s, dir, "orders")
          .withColumn("day",
            unix_timestamp(date_trunc("day", col("o_orderdate"))))
          .select(col("o_orderkey"), col("day"))
        def wave(p: Column) = o.filter(p)
          .select(to_json(struct(col("o_orderkey"), col("day"))).as("value"))
        val k = col("o_orderkey")
        val frames = Seq(wave(k % 3 === 0), wave(k % 3 === 1),
          wave(k % 3 === 2))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey LONG, day LONG")
        val audit = runStaged(s, frames, "audit") { (raw, out, ckpt) =>
          val parsed = raw.select(from_json(col("value"), schema).as("j"))
            .select(col("j.*"))
          parsed.writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              def put(): Unit = b.agg(
                  count(lit(1)).as("n_rows"),
                  countDistinct(col("o_orderkey")).as("n_keys"),
                  min(col("day")).as("min_day"),
                  max(col("day")).as("max_day"))
                .withColumn("batch_id", lit(id))
                .write.mode("overwrite").parquet(s"$out/audit/batch=$id")
              put()
              if (id == 1) put() // retried batch: idempotent overwrite
            }
            .trigger(Trigger.AvailableNow())
            .start()
        }
        audit.agg(
          count(lit(1)).as("n_batches"),
          sum(col("n_rows")).as("total_rows"),
          sum(col("n_keys")).as("total_keys"),
          min(col("min_day")).as("min_day"),
          max(col("max_day")).as("max_day"))
      },
      // the manifest must reconcile with the corpus: per-wave rows sum
      // to the table count, keys are disjoint across waves (mod split),
      // and the day span is the corpus span
      Some("""SELECT CAST(COUNT(DISTINCT o_orderkey % 3) AS BIGINT)
            AS n_batches,
          CAST(COUNT(*) AS BIGINT) AS total_rows,
          CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS total_keys,
          CAST(min(epoch(date_trunc('day', o_orderdate))) AS BIGINT)
            AS min_day,
          CAST(max(epoch(date_trunc('day', o_orderdate))) AS BIGINT)
            AS max_day
        FROM orders"""))
    ,

    GraftQuery(
      "q196_stream_paned_task_data",
      (s, dir) => {
        // T2/U4 composed INTO the task-data topology (the reference's
        // ConsoleTaskDataMain.java:83 layout): three waves of PING wire
        // messages run the full parse→clamp→enrich→derive pipeline AS A
        // STREAM, and the count-or-time pane state machine batches the
        // parsed facts per (task, 10-min window) before the sink — a
        // pane fires early the instant it holds 7 measurements, the
        // event-time timer flushes remainders on the trailing no-data
        // batch. Probe ids are unique per source row, so the parsed
        // probe suffix is the deterministic pane fold order; the 20000 s
        // watermark delay spans the waves' full event-time range (no
        // cross-wave late drops), and a far-future sentinel (within the
        // P9 clamp bound, so it survives the pipeline) advances the
        // final watermark past every real window end.
        import s.implicits._
        val k = col("c_custkey")
        val ts = lit(Now) - 86000L + (k % 180) * 60L
        def meas(pid: Column, task: Column, t: Column, rtt: Column) =
          concat(
            lit("""[{"probe_id":""""), pid,
            lit("""","task_id":"t-"""), task,
            lit("""","task_type_name":"PING","test_time":"""), t,
            lit(""","host_ip":"1.2.3.4","rtt":"""), rtt,
            lit(""","jitter":1,"lost_rate":2}]"""))
        val cust = Tables.load(s, dir, "customer")
        def wave(f: Column) = cust.filter(f)
          .select(meas(concat(lit("p-"), k), k % 5, ts, k % 130).as("value"))
        val frames = Seq(
          wave(k % 3 === 0), wave(k % 3 === 1), wave(k % 3 === 2),
          cust.limit(1).select(
            meas(lit("p-0"), lit("z"), lit(Now) + 100000L, lit(0)).as("value")))
        val dims = PipelineFixtures.dims(s, dir)
        val fires = runStaged(s, frames, "paned_facts") { (raw, out, ckpt) =>
          StreamJobs.runTaskDataPaned(raw, dims, out, ckpt, nowEpoch = Now,
            keyCol = col("task_id"),
            ordinalCol = substring(col("probe_id"), 3, 12),
            xCol = col("rtt"),
            maxCount = 7, windowSeconds = 600L,
            watermarkDelay = "20000 seconds",
            trigger = Trigger.AvailableNow())
        }
        // the sentinel's own pane never flushes (its window end stays
        // beyond the final watermark); its key never reaches the sink
        fires
      },
      Some(s"""WITH base AS (SELECT c_custkey AS k FROM customer),
          e AS (SELECT 't-' || (k % 5) AS key,
              CAST($Now - 86000 + (k % 180) * 60 AS BIGINT) AS ts,
              k AS ordinal, CAST(k % 130 AS BIGINT) AS x, k % 3 AS wave
            FROM base),
          w AS (SELECT key, ts - ts % 600 AS window_start, ordinal, x, wave
            FROM e),
          r AS (SELECT key, window_start, x,
              row_number() OVER (PARTITION BY key, window_start
                ORDER BY wave, ordinal) - 1 AS rn
            FROM w),
          g AS (SELECT key, window_start, rn // 7 AS fire_seq,
              COUNT(*) AS n, SUM(x) AS sx
            FROM r GROUP BY 1, 2, 3)
        SELECT key, CAST(window_start AS BIGINT) AS window_start,
          CAST(fire_seq AS BIGINT) AS fire_seq,
          CAST(n AS BIGINT) AS n_events, CAST(sx AS BIGINT) AS sum_x,
          n = 7 AS early
        FROM g""")),

    GraftQuery(
      "q199_dynamic_clamp_stream",
      (s, dir) => {
        // The xxl-conf analog end-to-end (`core/DynamicConf`): the SAME
        // 2-day-stale PING wire input runs through runTaskData twice
        // under two mirror-file values of the reference's runtime key
        // `gw-console.probe.time.offset` (`TaskDataClickHouseSink.java:
        // 71`) — the 30 h default clamps every test_time to `now`, the
        // widened 300 000 s gate keeps the reported times. Both runs
        // append to ONE facts table, so the gate hashes the conf value
        // binding into the plan, not just a parameter default. Payload
        // fields are functions of the id key (k%30, k%7, k%480 via the
        // timestamp), so content-id collisions collapse value-neutrally
        // at any scale; host/geo columns (k%40) are excluded from the
        // projection for the same reason.
        val k = col("c_custkey")
        val cust = Tables.load(s, dir, "customer")
        val t0 = lit(Now) - 172800L - (k % 480) * 60L
        val msg = pingMeas(k, k % 7, t0,
          (k % 30) + (k % 7) * 2, (k % 7) * 5)
        val frames = cust.select(concat(lit("["), msg, lit("]")).as("value"))
        val dims = PipelineFixtures.dims(s, dir)
        val base = Files.createTempDirectory("graft-dynclamp")
        val mirror = base.resolve("xxl-mirror.properties").toString
        val outDir = base.resolve("out").toString
        for ((offset, run) <- Seq(108000L -> "a", 300000L -> "b")) {
          graft.core.DynamicConf.writeMirror(mirror, Map(
            graft.core.DynamicConf.ProbeTimeOffsetKey -> offset.toString))
          val inDir = stage(base.resolve(s"in$run"), Seq(frames))
          val q = StreamJobs.runTaskData(
            StreamJobs.fileSource(s, inDir.toString),
            dims, outDir, base.resolve(s"ckpt$run").toString,
            nowEpoch = Now, trigger = Trigger.AvailableNow(),
            dynConf = Some(new graft.core.DynamicConf(mirror, ttlMs = 0L)))
          q.awaitTermination()
        }
        s.read.parquet(s"$outDir/gw_facts")
          .select("id", "probe_id", "task_id", "task_type_name",
            "test_time", "rtt", "jitter", "lost_rate", "test_time_h",
            "create_time")
          .localCheckpoint()
      },
      Some(s"""WITH b AS (SELECT c_custkey AS k FROM customer),
          m AS (SELECT DISTINCT k % 30 AS pk, k % 7 AS tk, k % 35 AS jit,
              CAST($Now - 172800 - (k % 480) * 60 AS BIGINT) AS t0
            FROM b),
          runs AS (
            SELECT DISTINCT pk, tk, jit, CAST($Now AS BIGINT) AS test_time
              FROM m
            UNION ALL
            SELECT DISTINCT pk, tk, jit, t0 FROM m)
          SELECT
            sha256('p-' || pk || '|' || 't-' || tk || '|' || 'PING' || '|'
              || test_time) AS id,
            'p-' || pk AS probe_id, 't-' || tk AS task_id,
            'PING' AS task_type_name, test_time,
            CAST(pk + tk * 2 AS DOUBLE) AS rtt,
            CAST(jit AS DOUBLE) AS jitter,
            CAST(tk * 5 AS DOUBLE) AS lost_rate,
            CAST(epoch(date_trunc('hour', make_timestamp(test_time * 1000000))) AS BIGINT) AS test_time_h,
            CAST($Now AS BIGINT) AS create_time
          FROM runs""")),

    GraftQuery(
      "q246_stream_reservoir",
      (s, dir) => {
        // exact-k weighted reservoir maintained ACROSS micro-batches:
        // three overlapping arrival waves (waves 2/3 re-send earlier
        // slices, exercising the id-dedup in the fold); because the
        // Efraimidis-Spirakis priority is a deterministic function of
        // the id, the standing k-row state after the last batch must
        // equal the BATCH sample over everything that ever arrived —
        // which is exactly what the oracle computes.
        val k = col("doc_id")
        def row: Column =
          concat(lit("""{"doc_id":"""), k,
            lit(""","w":"""), k % 7 + 1, lit("}"))
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        val frames = Seq(
          docs.filter(k % 5 < 2).select(row.as("value")),
          docs.filter(k % 5 < 4).select(row.as("value")),
          docs.select(row.as("value")))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, w LONG")
        runStaged(s, frames, "reservoir") { (raw, out, ckpt) =>
          raw.writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              val parsed = b
                .select(from_json(col("value"), schema).as("j"))
                .select(col("j.*"))
              graft.streaming.StreamSample.foldBatch(
                graft.streaming.StreamSample.prioritized(
                  parsed, "doc_id", col("w")),
                s"$out/reservoir", "doc_id", k = 50)
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
        }.select("doc_id", "weight", "priority")
      },
      Some(s"""WITH w AS (SELECT doc_id,
            CAST(doc_id % 7 + 1 AS DOUBLE) AS weight FROM documents),
          p AS (SELECT doc_id, weight,
              ${graft.functions.SafeMath.roundHalfUpSql(
                s"-ln((CAST(${CurationQueries.md5Key60Sql(
                  "'graft-psample' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)" +
                  " + 0.5E0) / 1152921504606846976E0) / weight",
                8)} AS priority
            FROM w WHERE weight > 0)
        SELECT doc_id, weight, priority FROM p
        ORDER BY priority, doc_id LIMIT 50"""))
  ) :+ streamPc1Query :+ streamDriftQuery

  private def streamDriftQuery: GraftQuery = GraftQuery(
    "q253_stream_drift",
    (s, dir) => {
      // per-batch KL drift alarm against a FROZEN baseline: wave 0
      // re-sends the baseline corpus (KL ≈ smoothing-only), wave 1
      // appends a novel 4-token tail per doc (moderate drift), wave 2 is
      // a pure template (total drift). Batch 1 is folded twice to prove
      // replay rewrites its partition instead of duplicating the row.
      import graft.streaming.StreamDrift
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val base = StreamDrift.baseline(docs, "text").localCheckpoint()
      val bRow = base.agg(sum(col("cnt_b")), count(lit(1))).head()
      val (bTot, bVoc) = (bRow.getLong(0), bRow.getLong(1))
      def wave(text: Column) = docs.select(
        to_json(struct(col("doc_id"), text.as("text"))).as("value"))
      val frames = Seq(
        wave(col("text")),
        wave(concat(col("text"), lit(" zyq zyq zyq zyq"))),
        wave(lit("zzz yyy xxx www zzz yyy xxx www")))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, text STRING")
      val out = runStaged(s, frames, "drift") { (raw, outDir, ckpt) =>
        raw.writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            val parsed = b
              .select(from_json(col("value"), schema).as("j"))
              .select(col("j.*"))
            StreamDrift.foldBatch(parsed, "text", base, bTot, bVoc,
              s"$outDir/drift", id, threshold = 0.05)
            if (id == 1) // retried batch: idempotent partition rewrite
              StreamDrift.foldBatch(parsed, "text", base, bTot, bVoc,
                s"$outDir/drift", id, threshold = 0.05)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      // `batch` is a partition column (inferred int) — pin the gate type
      out.select(col("batch").cast("long").as("batch"), col("n_tokens"),
        col("kl"), col("alarm"))
    },
    Some {
      val rh = graft.functions.SafeMath.roundHalfUpSql _
      // one KL scalar CTE per wave, mirroring StreamDrift.foldBatch:
      // pp = cnt/total (exact divisions), qq = add-one-smoothed baseline,
      // per-token term with scale-8 lns, DECIMAL(28,8) sum, scale-6 KL
      def klCte(name: String, wave: String, totalExpr: String): String =
        s"""$name AS (SELECT ${rh(
            "CAST(SUM(CAST(t8 AS DECIMAL(28,8))) AS DOUBLE)", 6)} AS kl
          FROM (SELECT ${rh(
            s"pp * (${rh("ln(pp)", 8)} - ${rh("ln(qq)", 8)})", 8)} AS t8
            FROM (SELECT
                CAST(w.cnt AS DOUBLE) / CAST($totalExpr AS DOUBLE) AS pp,
                CAST(COALESCE(b.cnt_b, 0) + 1 AS DOUBLE) /
                  CAST(bt.tot + bt.voc AS DOUBLE) AS qq
              FROM $wave w LEFT JOIN base b ON b.tok = w.tok, bt)))"""
      s"""WITH base AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt_b
            FROM (SELECT unnest(
              list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
              AS tok FROM documents) GROUP BY tok),
        bt AS (SELECT CAST(SUM(cnt_b) AS BIGINT) AS tot,
            CAST(COUNT(*) AS BIGINT) AS voc FROM base),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        w0 AS (SELECT tok, cnt_b AS cnt FROM base),
        w1 AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cnt FROM (
            SELECT tok, cnt_b AS c FROM base
            UNION ALL SELECT 'zyq' AS tok, 4 * n AS c FROM nd)
          GROUP BY tok),
        w2 AS (SELECT t.tok, CAST(2 * n AS BIGINT) AS cnt
          FROM (VALUES ('zzz'), ('yyy'), ('xxx'), ('www')) t(tok), nd),
        ${klCte("k0", "w0", "bt.tot")},
        ${klCte("k1", "w1", "(bt.tot + 4 * (SELECT n FROM nd))")},
        ${klCte("k2", "w2", "(8 * (SELECT n FROM nd))")}
      SELECT CAST(0 AS BIGINT) AS batch, bt.tot AS n_tokens, k0.kl AS kl,
        k0.kl >= 0.05E0 AS alarm FROM bt, k0
      UNION ALL SELECT 1, bt.tot + 4 * nd.n, k1.kl, k1.kl >= 0.05E0
        FROM bt, nd, k1
      UNION ALL SELECT 2, 8 * nd.n, k2.kl, k2.kl >= 0.05E0 FROM nd, k2"""
    })

  private def streamPc1Query: GraftQuery = GraftQuery(
    "q250_stream_pc1",
    (s, dir) => {
      // moment sums maintained ACROSS micro-batches: three waves of
      // vectors each write their exact (i, j, s) contribution under
      // __batch=id (dynamic overwrite — batch 1 is appended twice to
      // prove a replay rewrites, never double-counts), and the component
      // iterated from the folded state must equal the BATCH pc1 over the
      // whole corpus, which is what the oracle computes.
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
        .select("vec_id", "embedding")
      val k = col("vec_id")
      def wave(p: Column) = emb.filter(p)
        .select(to_json(struct(col("vec_id"), col("embedding"))).as("value"))
      val frames = Seq(
        wave(k % 3 === 0), wave(k % 3 === 1), wave(k % 3 === 2))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id LONG, embedding ARRAY<FLOAT>")
      val statePath = java.nio.file.Files
        .createTempDirectory("graft-pc1").resolve("moments").toString
      runStaged(s, frames, "pc1_done") { (raw, out, ckpt) =>
        raw.writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            val parsed = b
              .select(from_json(col("value"), schema).as("j"))
              .select(col("j.*"))
            graft.operators.Spectral.appendMomentsBatch(
              parsed, statePath, "embedding", dim = 64, batchId = id)
            if (id == 1) // retried batch: idempotent partition rewrite
              graft.operators.Spectral.appendMomentsBatch(
                parsed, statePath, "embedding", dim = 64, batchId = id)
            // marker sink so runStaged has a table to read back
            b.sparkSession.range(1).select(lit(id).as("batch"))
              .write.mode("append").parquet(s"$out/pc1_done")
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      val v = graft.operators.Spectral.pc1FromMomentState(
        s, statePath, dim = 64)
      v.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("pos", "v")
    },
    Some(s"""WITH ${VectorQueries.pc1CtesSql(dim = 64, iters = 4, snap = 9)}
      SELECT CAST(r.i AS BIGINT) - 1 AS pos, v[r.i] AS v
      FROM v4, range(1, 65) r(i)"""))
}
