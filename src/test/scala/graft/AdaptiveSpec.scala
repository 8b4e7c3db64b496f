package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Adaptive

/** Unit coverage for the iteration-width primitive behind the
  * pagerank/clustering bench recovery: `partsFor` must size shuffles to
  * the counted state (never above the session tuning, never 0), and
  * `withShufflePartitions` must pin the conf only for the loop body —
  * including on failure, or one thrown round would poison every later
  * query's width. */
class AdaptiveSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("partsFor clamps to [1, session width] and scales with rows") {
    assert(Adaptive.partsFor(spark, 0L) === 1)
    assert(Adaptive.partsFor(spark, 1L) === 1)
    assert(Adaptive.partsFor(spark, 100000L) === 1)
    assert(Adaptive.partsFor(spark, 100001L) === 2)
    // big data keeps the session tuning — never exceeds it
    assert(Adaptive.partsFor(spark, Long.MaxValue / 2) === 4)
    // custom density
    assert(Adaptive.partsFor(spark, 10L, rowsPerPartition = 3L) === 4)
  }

  test("withShufflePartitions pins plans compiled inside and restores after") {
    import spark.implicits._
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // AQE re-plans small shuffles, so pin it off for a deterministic
    // width reading (what's under test is the conf scoping, not AQE)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def widthOfGroupBy(): Int =
        Seq(1 -> "a", 2 -> "b", 1 -> "c").toDF("k", "v")
          .groupBy("k").count().rdd.getNumPartitions
      val ambient = widthOfGroupBy()
      assert(ambient === before.toInt,
        "without a pin, shuffle width follows the session conf")
      val n = Adaptive.withShufflePartitions(spark, 1)(widthOfGroupBy())
      assert(n === 1, s"pinned width not honored (got $n)")
      assert(spark.conf.get(key) === before, "conf not restored")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("withShufflePartitions restores the conf when the body throws") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    intercept[RuntimeException] {
      Adaptive.withShufflePartitions(spark, 2) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key) === before, "conf not restored on failure")
  }
}
