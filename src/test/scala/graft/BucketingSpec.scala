package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed tables co-locate same-key joins: the join plan must contain
  * NO shuffle exchange, and results must equal the plain join. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("same-bucket join elides the shuffle and matches the plain join") {
    val tmp = Files.createTempDirectory("graft-buckets").toFile.getAbsolutePath
    val facts = (1 to 1000).map(i => (s"p-${i % 37}", i.toLong, i * 1.5))
      .toDF("probe_id", "seq", "v")
    val dim = (0 until 37).map(i => (s"p-$i", s"probe $i"))
      .toDF("probe_id", "name")
    Bucketing.writeBucketed(facts, "b_facts", s"$tmp/b_facts", 8, Seq("probe_id"))
    Bucketing.writeBucketed(dim, "b_dim", s"$tmp/b_dim", 8, Seq("probe_id"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readTable(spark, "b_facts")
        .join(Bucketing.readTable(spark, "b_dim"), "probe_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      val expected = facts.join(dim, "probe_id").count()
      assert(joined.count() === expected)
      // bucketed groupBy on the key also runs shuffle-free
      val agg = Bucketing.readTable(spark, "b_facts")
        .groupBy("probe_id").agg(sum("v"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() === 37)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }
}
