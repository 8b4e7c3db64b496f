package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.nqs.TaskDataPipeline
import graft.streaming.StreamJobs

/** Structured Streaming harness tests (SURVEY.md §2.9 T1-T8): the
  * file-source micro-batch run must produce exactly the batch pipeline's
  * rows (T1 window≡micro-batch), replays must be idempotent under the
  * content-hash ids (T8/O8), and the keep-latest view (W1) must pick the
  * newest row per key.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import NqsFixtures._

  test("gateway-info stream writes catalog-conformed typed sinks") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-gw").toFile.getAbsolutePath
    val srcDir = s"$tmp/src"; new java.io.File(srcDir).mkdirs()
    val gw =
      s"""{"probe_id":"p-0001","time":$Now,
         |"probe_info":{"id":"p-0001","pc":"DT741-csf","vendor":"v","sn":"s"},
         |"status_info":{"cpu_rate":12.5,"ram_rate":43.1,"run_time":"86400"},
         |"sgw_info":{"pon_info":{"current":12.0,"rx_power":-215000.0,
         |  "tx_power":2.1,"temperature":45.0,"voltage":3.3}}}"""
        .stripMargin.replaceAll("\n", "")
    Files.writeString(java.nio.file.Path.of(s"$srcDir/a.txt"), gw)
    val stored = Seq.empty[(String, String, String)]
      .toDF("probe_id", "access_type_name", "connect_status")
    val q = StreamJobs.runGatewayInfo(
      StreamJobs.fileSource(spark, srcDir), stored,
      s"$tmp/out", s"$tmp/ck", nowEpoch = Now,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    // every catalog sink reads back with EXACTLY the reference DDL schema
    for (t <- Seq("c_p_pinfo", "c_p_status", "c_p_pon")) {
      val df = spark.read.parquet(s"$tmp/out/$t")
      val want = graft.sources.OutputCatalog.tables(t).schema
      assert(df.schema.fieldNames.sorted.toSeq ===
        want.fieldNames.sorted.toSeq, t)
      assert(df.count() === 1, t)
    }
    val pon = spark.read.parquet(s"$tmp/out/c_p_pon").collect()(0)
    assert(pon.getAs[Double]("rx_power") === -21.5)
    assert(pon.getAs[Long]("timesheet") === Now)
    val st = spark.read.parquet(s"$tmp/out/c_p_status").collect()(0)
    assert(st.getAs[String]("run_time") === "86400")
  }

  test("streaming file-source run matches the batch pipeline exactly") {
    val tmp = Files.createTempDirectory("graft-stream").toFile.getAbsolutePath
    val srcDir = s"$tmp/src"; val outDir = s"$tmp/out"; val ckDir = s"$tmp/ck"
    new java.io.File(srcDir).mkdirs()
    // two "kafka messages" as two files → two potential micro-batches
    Files.writeString(java.nio.file.Path.of(s"$srcDir/a.txt"), s"[$httpMsg,$pingMsg]")
    Files.writeString(java.nio.file.Path.of(s"$srcDir/b.txt"), s"[$stalePingMsg,$badMsg,$gameMsg]")

    val q = StreamJobs.runTaskData(
      StreamJobs.fileSource(spark, srcDir, maxFilesPerTrigger = 1),
      dims(spark), outDir, ckDir, nowEpoch = Now,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)

    // foreachBatch is at-least-once into append sinks: a retried batch may
    // duplicate rows at rest — the engine contract resolves that at the
    // read-side keep-latest view (O8), so compare THROUGH the view.
    val streamed = StreamJobs.latestView(spark, s"$outDir/gw_facts", "id", "create_time")
    val batch = TaskDataPipeline(rawBatch(spark), dims(spark), nowEpoch = Now).drop("detail")
    assert(streamed.count() === 4)
    val sIds = streamed.select("id").collect().map(_.getString(0)).toSet
    val bIds = batch.select("id").collect().map(_.getString(0)).toSet
    assert(sIds === bIds)
    // full row parity on a stable projection
    val cols = Seq("id", "task_type_name", "score", "test_time", "host_province")
    val s = streamed.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val b = batch.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(s === b)
    // detail children landed too
    assert(StreamJobs.latestView(spark, s"$outDir/gw_http_detail", "id", "create_time")
      .count() === 2)
  }

  test("replaying the same input is idempotent at the read-side view") {
    val tmp = Files.createTempDirectory("graft-replay").toFile.getAbsolutePath
    val srcDir = s"$tmp/src"; val outDir = s"$tmp/out"
    new java.io.File(srcDir).mkdirs()
    Files.writeString(java.nio.file.Path.of(s"$srcDir/a.txt"), s"[$pingMsg]")
    // two separate runs with fresh checkpoints = an at-least-once replay
    for (i <- 1 to 2) {
      val q = StreamJobs.runTaskData(
        StreamJobs.fileSource(spark, srcDir), dims(spark), outDir, s"$tmp/ck$i",
        nowEpoch = Now,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    val raw = spark.read.parquet(s"$outDir/gw_facts")
    assert(raw.count() >= 2) // duplicated at rest, as in ReplacingMergeTree pre-merge
    val deduped = StreamJobs.latestView(spark, s"$outDir/gw_facts", "id", "create_time")
    assert(deduped.count() === 1) // resolved at read, as in the reference (O8)
  }

  test("event-time windowed aggregation with watermark over a file stream") {
    // T4 extended mode: event-time tumbling windows + 10-minute watermark,
    // append output — late rows beyond the watermark are dropped.
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wm").toFile.getAbsolutePath
    val srcDir = s"$tmp/src"; new java.io.File(srcDir).mkdirs()
    val rows = Seq(
      s"""{"probe_id":"p1","ts":1723420800,"score":90.0}""",
      s"""{"probe_id":"p1","ts":1723420805,"score":70.0}""",
      s"""{"probe_id":"p2","ts":1723421400,"score":50.0}""")
    Files.writeString(java.nio.file.Path.of(s"$srcDir/a.txt"), rows.mkString("\n"))
    val schema = "probe_id STRING, ts LONG, score DOUBLE"
    val stream = spark.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL(schema))
      .json(srcDir)
      .withColumn("event_time", to_timestamp(col("ts")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "10 minutes"), col("probe_id"))
      .agg(count(lit(1)).as("n"), avg(col("score")).as("avg_score"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("wm_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // windows close only when the watermark passes; a second batch with a
    // later event advances it and emits the first window
    Files.writeString(java.nio.file.Path.of(s"$srcDir/b.txt"),
      s"""{"probe_id":"p2","ts":1723424000,"score":10.0}""")
    val q2 = stream.writeStream.outputMode("append")
      .format("memory").queryName("wm_out2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val out = spark.table("wm_out2")
      .select(col("probe_id"), col("n"), col("avg_score")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.contains(("p1", 2L, 80.0)))
    assert(out.contains(("p2", 1L, 50.0)))
  }

  test("heartbeat stream: a probe registering in batch 1 heartbeats in batch 2") {
    import spark.implicits._
    val SEP = ""
    val tmp = Files.createTempDirectory("graft-hb").toFile.getAbsolutePath
    val srcDir = s"$tmp/src"; new java.io.File(srcDir).mkdirs()
    // distinct heartbeat_time per message: the content-hash id keys on
    // (probe_id, heartbeat_time), so identical times are BY DESIGN one
    // logical row after the dedup view
    def msg(id: String, t: Long): String =
      s"""{"info":{"id":"$id","soft_ver":"1.0","so_ver":"0.1","task_queue_size":0,"task_size":0},"time":$t}$SEP""" + "1.2.3.4"
    Files.writeString(java.nio.file.Path.of(s"$srcDir/a.txt"), msg("p-7777", Now))
    Files.writeString(java.nio.file.Path.of(s"$srcDir/b.txt"), msg("p-7777", Now + 60))
    val pat = Seq.empty[(String, String, Int, String)]
      .toDF("probe_id", "access_type_name", "is_default", "connect_status")
    val q = graft.streaming.StreamJobs.runHeartbeat(
      graft.streaming.StreamJobs.fileSource(spark, srcDir, maxFilesPerTrigger = 1),
      dims(spark).probes, pat, dims(spark).ipRegion,
      s"$tmp/out", s"$tmp/ck", nowEpoch = Now,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    // both messages produced heartbeat facts, but only ONE registration
    // (read through the dedup view — append sinks are at-least-once)
    assert(graft.streaming.StreamJobs
      .latestView(spark, s"$tmp/out/c_p_heartbeat", "id", "create_time")
      .count() === 2)
    val regs = spark.read.parquet(s"$tmp/out/new_probes")
      .filter(col("probe_id") === "p-7777").select("probe_id").distinct()
    assert(regs.count() === 1)
  }

  test("flatMapGroupsWithState first-seen: intra-batch novelty is deterministic") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{Classified, KeyedEvent}
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KeyedEvent]
    // batch 1: p1 twice (register + heartbeat in ONE batch), p2 once
    input.addData(KeyedEvent("p1", 2), KeyedEvent("p1", 1), KeyedEvent("p2", 3))
    val q = StatefulOps.firstSeen(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("first_seen").start()
    q.processAllAvailable()
    // batch 2: p1 again (known), p3 new
    input.addData(KeyedEvent("p1", 4), KeyedEvent("p3", 5))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("first_seen").as[Classified].collect()
      .map(c => (c.key, c.ordinal) -> c.is_first).toMap
    assert(out(("p1", 1L)) === true)   // earliest in batch = registration
    assert(out(("p1", 2L)) === false)  // same batch, later = heartbeat
    assert(out(("p2", 3L)) === true)
    assert(out(("p1", 4L)) === false)  // state persisted across batches
    assert(out(("p3", 5L)) === true)
  }

  test("count-or-time trigger: early fires mid-batch, timeout flushes remainder") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{CotEvent, CotFire}
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long, Long)]
    val ds = input.toDS()
      .select(col("_1").as("key"), col("_2").as("ts"), col("_3").as("ordinal"),
        col("_4").as("x"), col("_2").cast("timestamp").as("et"))
      .withWatermark("et", "0 seconds")
      .as[CotEvent]
    val q = StatefulOps.countOrTimeFires(ds, maxCount = 3, windowSeconds = 60L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cot").start()
    // batch 1: 4 events in window [0,60) → pane fills at the 3rd (early
    // fire covering exactly those 3), 4th stays buffered
    input.addData(("a", 5L, 1L, 10L), ("a", 6L, 2L, 10L), ("a", 7L, 3L, 10L),
      ("a", 8L, 4L, 5L))
    q.processAllAvailable()
    // batch 2: the buffer carries ACROSS batches — 2 more fill the pane
    // (5+1+2), the 3rd starts the next pane
    input.addData(("a", 9L, 5L, 1L), ("a", 10L, 6L, 2L), ("a", 11L, 7L, 3L))
    q.processAllAvailable()
    // batch 3: watermark jumps past the window end → the partial pane
    // flushes via event-time timeout; b's own window stays open (its end
    // is beyond the final watermark) and must NOT fire
    input.addData(("b", 100L, 8L, 0L))
    q.processAllAvailable()
    q.stop()
    val fires = spark.table("cot").as[CotFire].collect()
      .map(f => (f.key, f.window_start, f.fire_seq) ->
        (f.n_events, f.sum_x, f.early)).toMap
    assert(fires(("a", 0L, 0L)) === ((3L, 30L, true)))
    assert(fires(("a", 0L, 1L)) === ((3L, 8L, true)))
    assert(fires(("a", 0L, 2L)) === ((1L, 3L, false)))
    assert(fires.size === 3, s"unexpected fires: $fires")
  }

  test("stream dedup: first arrival wins across batches; watermark bounds state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // unbounded variant: re-sends in later batches are suppressed
    val in1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in1.addData((1L, "a1"), (2L, "b1"))
    val q1 = graft.streaming.StreamDedup.firstArrival(
        in1.toDF().toDF("doc_id", "payload"), Seq("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_unbounded").start()
    q1.processAllAvailable()
    in1.addData((1L, "a2"), (3L, "c1")) // 1 is a re-send
    q1.processAllAvailable()
    q1.stop()
    val out1 = spark.table("dedup_unbounded").as[(Long, String)]
      .collect().toMap
    assert(out1 === Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))

    // watermarked variant: dedups inside the horizon, evicts beyond it
    val in2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
    val q2 = graft.streaming.StreamDedup.firstArrivalWithin(
        in2.toDF().toDF("doc_id", "ts", "payload")
          .withColumn("event_time", to_timestamp(col("ts"))),
        "event_time", "10 seconds", Seq("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_within").start()
    in2.addData((1L, 1000L, "x1"), (1L, 1001L, "x2")) // dup inside horizon
    q2.processAllAvailable()
    // advance watermark far past 1000+10s, then re-send id 1: state evicted
    in2.addData((9L, 5000L, "w"))
    q2.processAllAvailable()
    in2.addData((1L, 5001L, "x3"))
    q2.processAllAvailable()
    q2.stop()
    val out2 = spark.table("dedup_within").as[(Long, Long, String, java.sql.Timestamp)]
      .collect().map(r => (r._1, r._3)).toSet
    assert(out2.contains((1L, "x1")) && !out2.contains((1L, "x2")))
    assert(out2.contains((1L, "x3"))) // beyond horizon = fresh arrival
  }

  test("interval join matches only in-window same-key pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val l = Seq(("a", 1000L, 1), ("a", 5000L, 2), ("b", 1000L, 3))
      .toDF("key", "lts", "lv")
      .select(col("key"), to_timestamp(col("lts")).as("ltime"), col("lv"))
    val r = Seq(("a", 1100L, 10), ("a", 3000L, 11), ("b", 900L, 12),
        ("c", 1000L, 13))
      .toDF("rkey", "rts", "rv")
      .select(col("rkey"), to_timestamp(col("rts")).as("rtime"), col("rv"))
    val out = graft.streaming.StreamJoins.intervalJoin(
        l, r, "key", "rkey", "ltime", "rtime", 0L, 1800L)
      .select("lv", "rv").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    // a@1000 ↔ a@1100 only (a@3000 is past +1800; b@900 precedes b@1000;
    // c has no left side)
    assert(out === Set((1, 10)))
  }

  test("keep-latest view returns newest row per key") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-latest").toFile.getAbsolutePath
    Seq(("p1", 100L, "old"), ("p1", 200L, "new"), ("p2", 50L, "only"))
      .toDF("probe_id", "create_time", "v")
      .write.parquet(s"$tmp/facts")
    val latest = StreamJobs.latestView(spark, s"$tmp/facts", "probe_id", "create_time")
      .collect().map(r => r.getAs[String]("probe_id") -> r.getAs[String]("v")).toMap
    assert(latest === Map("p1" -> "new", "p2" -> "only"))
  }

  test("rateSpikeStream carries the trailing window across batches") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{SpikeEvent, SpikeFlag}
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SpikeEvent]
    // batch 1: days 1..7 at 10/day (fills the window, no baseline yet
    // for days 1..7's first flaggable successor)
    input.addData((1L to 7L).map(d => SpikeEvent("a", d, 10L)): _*)
    val q = StatefulOps.rateSpikeStream(input.toDS(), w = 7, z = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("spikes_live").start()
    q.processAllAvailable()
    // batch 2: the spike day — its 7-day baseline lives in STATE
    input.addData(SpikeEvent("a", 8L, 100L), SpikeEvent("a", 9L, 11L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("spikes_live").as[SpikeFlag].collect()
      .map(f => f.ordinal -> f).toMap
    assert(out(8L).spike === true && out(8L).win_sum === 70L)
    assert(out(9L).spike === false)   // baseline now includes the spike
    assert(out(7L).spike === false)   // only 6 priors inside batch 1
  }

  test("goldenUpsert merges sparse fields across batches") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{GoldenRow, GoldenUpdate}
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[GoldenUpdate]
    input.addData(GoldenUpdate(1L, 1L, Some("a"), Some("x")))
    val q = StatefulOps.goldenUpsert(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("golden_ups").start()
    q.processAllAvailable()
    // batch 2: sparse update sets ONLY f2 — f1 must survive from state
    input.addData(GoldenUpdate(1L, 2L, None, Some("y")))
    q.processAllAvailable()
    // batch 3: sparse update sets ONLY f1 — f2 must survive
    input.addData(GoldenUpdate(1L, 3L, Some("c"), None))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("golden_ups").as[GoldenRow].collect()
      .map(g => g.n_versions -> g).toMap
    assert(out(1L) === GoldenRow(1L, Some("a"), Some("x"), 1L, 1L))
    assert(out(2L) === GoldenRow(1L, Some("a"), Some("y"), 2L, 2L))
    assert(out(3L) === GoldenRow(1L, Some("c"), Some("y"), 3L, 3L))
  }

  test("rateSpikeStream drops ordinal regressions instead of folding them") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{SpikeEvent, SpikeFlag}
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SpikeEvent]
    input.addData(SpikeEvent("a", 1L, 10L), SpikeEvent("a", 2L, 10L),
      SpikeEvent("a", 3L, 10L))
    val q = StatefulOps.rateSpikeStream(input.toDS(), w = 3, z = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("spikes_late").start()
    q.processAllAvailable()
    // batch 2: ordinal 2 REGRESSES (re-delivery) — must be dropped, not
    // folded into the ring; ordinal 4 then sees the clean 10,10,10 window
    input.addData(SpikeEvent("a", 2L, 999L), SpikeEvent("a", 4L, 100L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("spikes_late").as[SpikeFlag].collect()
    assert(rows.length === 4)               // late row emitted nothing new
    val out = rows.map(f => f.ordinal -> f).toMap
    assert(out(2L).x === 10L)               // batch-1 row, not the replay
    assert(out(4L).win_sum === 30L)         // 999 never entered the window
    assert(out(4L).spike === true)
  }

  test("goldenUpsert: a stale re-delivery cannot wipe a newer field") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{GoldenRow, GoldenUpdate}
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[GoldenUpdate]
    input.addData(GoldenUpdate(1L, 5L, Some("new"), None))
    val q = StatefulOps.goldenUpsert(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("golden_late").start()
    q.processAllAvailable()
    // batch 2 arrives OUT OF ORDER (ordinal 2 < 5): f1 must keep "new"
    // (a newer write exists) while f2 still fills from the late row —
    // exactly the batch goldenRecord fold, per-field latest-non-null
    input.addData(GoldenUpdate(1L, 2L, Some("old"), Some("x")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("golden_late").as[GoldenRow].collect()
      .map(g => g.n_versions -> g).toMap
    assert(out(2L) === GoldenRow(1L, Some("new"), Some("x"), 2L, 5L))
  }

  test("goldenUpsert breaks duplicate-ordinal ties exactly like the batch fold") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{GoldenRow, GoldenUpdate}
    implicit val sqlCtx = spark.sqlContext
    // deliberately TIED ordinals, per field and across keys — the r10
    // caveat case. Batch goldenRecord breaks ties with the full-row
    // xxhash64; the stream must pick the SAME winners for ANY arrival
    // order (the tie hash is computed over the identical (key, ordinal,
    // f1, f2) columns before the state fold).
    val rows = Seq(
      GoldenUpdate(1L, 7L, Some("b1"), Some("y1")),
      GoldenUpdate(1L, 7L, Some("b2"), None),
      GoldenUpdate(1L, 7L, None, Some("y2")),
      GoldenUpdate(1L, 3L, Some("a"), Some("x")),
      GoldenUpdate(2L, 5L, Some("p"), Some("q")),
      GoldenUpdate(2L, 5L, Some("p2"), Some("q2")))
    val batch = graft.operators.KeepLatest.goldenRecord(
        rows.toDF(), "key", Seq(col("ordinal")), Seq("f1", "f2"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), r.getLong(3))))
      .toMap

    def streamed(waves: Seq[Seq[GoldenUpdate]], name: String) = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[GoldenUpdate]
      val q = StatefulOps.goldenUpsert(input.toDS()).writeStream
        .outputMode("append").format("memory").queryName(name).start()
      waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[GoldenRow].collect()
        .groupBy(_.key).map { case (k, g) => k -> g.maxBy(_.n_versions) }
    }
    val fwd = streamed(Seq(rows.take(3), rows.drop(3)), "golden_tied_f")
    val rev = streamed(
      Seq(rows.reverse.take(2), rows.reverse.drop(2)), "golden_tied_r")
    for (m <- Seq(fwd, rev); (k, (bf1, bf2, bn)) <- batch) {
      val s = m(k)
      assert((s.f1, s.f2, s.n_versions) === ((bf1, bf2, bn)),
        s"key $k diverged from the batch fold")
    }
  }

  test("dedup state survives a stop + restart from the same checkpoint") {
    // true T8 recovery: run 1 terminates (AvailableNow) and the process
    // "dies"; run 2 is a NEW query over the SAME checkpoint with new
    // files staged in between. The dropDuplicates state must come back
    // from the state store — a resend of id 1 across the restart stays
    // suppressed — and the source offset log must not replay wave 1.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val base = Files.createTempDirectory("graft-restart")
    val in = base.resolve("in"); Files.createDirectories(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    def put(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(in.resolve(name),
        rows.map { case (i, pl) => s"""{"doc_id":$i,"payload":"$pl"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val sch = new StructType().add("doc_id", "long").add("payload", "string")
    def runOnce(): Unit = {
      val q = graft.streaming.StreamDedup.firstArrival(
          spark.readStream.schema(sch).json(in.toString), Seq("doc_id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    put("w1.json", Seq(1L -> "a1", 2L -> "b1"))
    runOnce()
    put("w2.json", Seq(1L -> "a2", 3L -> "c1")) // id 1 is a cross-run resend
    runOnce()
    val got = spark.read.parquet(out)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("payload"))
    assert(got.length === 3, s"duplicate or lost rows: ${got.toSeq}")
    assert(got.toMap === Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))
  }
}
