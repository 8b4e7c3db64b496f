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

    val streamed = spark.read.parquet(s"$outDir/gw_facts")
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
    assert(spark.read.parquet(s"$outDir/gw_http_detail").count() === 2)
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
    assert(raw.count() === 2) // duplicated at rest, as in ReplacingMergeTree pre-merge
    val deduped = StreamJobs.latestView(spark, s"$outDir/gw_facts", "id", "create_time")
    assert(deduped.count() === 1) // resolved at read, as in the reference (O8)
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
}
