package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.DynamicConf
import graft.streaming.StreamJobs

/** Runtime-reloadable config (the xxl-conf analog, `XxlConfBean.java`):
  * mirror-file load/TTL/fallback semantics, and the end-to-end contract —
  * a running streaming query picks up a changed mirror file at the next
  * micro-batch, no restart. */
class DynamicConfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import NqsFixtures._

  private def mirror(dir: String) = s"$dir/xxl-mirror.properties"

  test("mirror file loads typed values; defaults fill missing keys") {
    val dir = Files.createTempDirectory("graft-dynconf").toString
    DynamicConf.writeMirror(mirror(dir), Map(
      DynamicConf.ProbeTimeOffsetKey -> "259200",
      DynamicConf.FirstScreenFactorKey -> "0.8",
      "some.flag" -> "on"))
    val conf = new DynamicConf(mirror(dir), ttlMs = 0L)
    assert(conf.getLong(DynamicConf.ProbeTimeOffsetKey, 108000L) === 259200L)
    assert(conf.getDouble(DynamicConf.FirstScreenFactorKey, 1.0) === 0.8)
    assert(conf.getString("some.flag", "off") === "on")
    assert(conf.getLong("absent.key", 42L) === 42L)
  }

  test("ttl=0 re-reads every call; a large ttl caches until refresh()") {
    val dir = Files.createTempDirectory("graft-dynconf").toString
    DynamicConf.writeMirror(mirror(dir), Map("k" -> "1"))
    val hot = new DynamicConf(mirror(dir), ttlMs = 0L)
    val cached = new DynamicConf(mirror(dir), ttlMs = 3600000L)
    assert(hot.getLong("k", 0) === 1L)
    assert(cached.getLong("k", 0) === 1L)
    DynamicConf.writeMirror(mirror(dir), Map("k" -> "2"))
    assert(hot.getLong("k", 0) === 2L)    // ttl elapsed (0) → re-read
    assert(cached.getLong("k", 0) === 1L) // inside ttl → cached snapshot
    cached.refresh()
    assert(cached.getLong("k", 0) === 2L)
  }

  test("missing file fails fast on first load, keeps last-good afterwards") {
    val dir = Files.createTempDirectory("graft-dynconf").toString
    val never = new DynamicConf(s"$dir/nope.properties", ttlMs = 0L)
    intercept[java.io.IOException] { never.getLong("k", 0) }
    DynamicConf.writeMirror(mirror(dir), Map("k" -> "7"))
    val conf = new DynamicConf(mirror(dir), ttlMs = 0L)
    assert(conf.getLong("k", 0) === 7L)
    // admin center / file gone → the mirror fallback: last-good survives
    Files.delete(java.nio.file.Path.of(mirror(dir)))
    assert(conf.getLong("k", 0) === 7L)
  }

  test("a running stream picks up mirror changes at the next micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-dynstream").toString
    val outDir = s"$tmp/out"; val ckDir = s"$tmp/ck"
    DynamicConf.writeMirror(mirror(tmp), Map(
      DynamicConf.ProbeTimeOffsetKey -> "108000",
      DynamicConf.FirstScreenFactorKey -> "1.0"))
    val conf = new DynamicConf(mirror(tmp), ttlMs = 0L)

    // a second stale ping, distinct content so its row id differs
    val stalePing2 =
      s"""{"probe_id":"p-0001","task_id":"t-0002","task_type_name":"PING",
         |"task_from":10,"test_time":${Now - 144000},"rtt":60.0,
         |"lost_rate":0.1}""".stripMargin.replaceAll("\n", "")

    val mem = MemoryStream[String]
    val q = StreamJobs.runTaskData(
      mem.toDF().toDF("value"), dims(spark), outDir, ckDir,
      nowEpoch = Now, trigger = Trigger.ProcessingTime(0L),
      dynConf = Some(conf))
    try {
      // batch 1: default 30h gate → the 40h-old ping is clamped to now;
      // first-screen factor 1.0
      mem.addData(s"[$stalePingMsg,$httpMsg]")
      q.processAllAvailable()
      // ops changes the config mid-flight — NO restart:
      DynamicConf.writeMirror(mirror(tmp), Map(
        DynamicConf.ProbeTimeOffsetKey -> "1000000000",
        DynamicConf.FirstScreenFactorKey -> "3.0"))
      // batch 2: gate now huge → the same-age ping keeps its own time;
      // http first-screen re-weighted by the new factor
      mem.addData(s"[$stalePing2,$httpMsg]")
      q.processAllAvailable()
    } finally q.stop()

    val facts = spark.read.parquet(s"$outDir/gw_facts")
    val pings = facts.filter(col("task_type_name") === "PING")
      .select("rtt", "test_time").collect()
      .map(r => r.getAs[Double]("rtt") -> r.getAs[Long]("test_time")).toMap
    assert(pings(50.0) === Now)          // batch 1: clamped
    assert(pings(60.0) === Now - 144000) // batch 2: within the new gate
    // same raw HTTP message, two factors → factor delta shows up as
    // exactly (3.0 - 1.0) × element_load_cost in first_screen_cost
    val https = facts.filter(col("task_type_name") === "HTTP")
      .select("first_screen_cost", "element_load_cost").collect()
    assert(https.length === 2)
    val fs = https.map(_.getAs[Double]("first_screen_cost")).sorted
    val el = https.head.getAs[Double]("element_load_cost")
    assert(el > 0.0)
    assert(math.abs((fs(1) - fs(0)) - 2.0 * el) < 1e-9)
  }
}
