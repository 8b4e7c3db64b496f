package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinReduction

/** Invariants of the runtime Bloom-filter semi-join reduction: no false
  * negatives (the reduced join is IDENTICAL to the plain join), real
  * reduction (non-matching probe rows die before the join), and NULL-key
  * removal. */
class JoinReductionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private lazy val probe = (0L until 5000L).map(i => (i, i % 500L))
    .toDF("row_id", "key")
  private lazy val build = (0L until 10L).toDF("bkey")

  test("prefilter keeps every true match — reduced join equals plain join") {
    val reduced = JoinReduction.bloomPrefilter(probe, "key", build, "bkey")
    val plainJoin = probe.join(build, col("key") === col("bkey"))
      .select("row_id").as[Long].collect().toSet
    val reducedJoin = reduced.join(build, col("key") === col("bkey"))
      .select("row_id").as[Long].collect().toSet
    assert(reducedJoin === plainJoin)
    assert(plainJoin.size === 100) // 10 matching keys × 10 rows each
  }

  test("prefilter actually reduces: non-matching rows die before the join") {
    val reduced = JoinReduction.bloomPrefilter(probe, "key", build, "bkey")
    val n = reduced.count()
    // 100 true matches survive; at the 262144-bit/10-key operating point
    // the false-positive rate is ~0, so anything beyond a small margin
    // means the word/bit arithmetic drifted from bloomBuild's
    assert(n >= 100 && n <= 200, s"expected ~100 surviving rows, got $n")
  }

  test("NULL probe keys are removed (inner-join semantics preserved)") {
    val withNulls = probe.withColumn("key",
      when(col("row_id") % 2 === 0, col("key")))
    val reduced = JoinReduction.bloomPrefilter(withNulls, "key", build, "bkey")
    assert(reduced.filter(col("key").isNull).count() === 0)
    // even-row matches all survive
    val expect = withNulls.join(build, col("key") === col("bkey"))
      .select("row_id").as[Long].collect().toSet
    val got = reduced.join(build, col("key") === col("bkey"))
      .select("row_id").as[Long].collect().toSet
    assert(got === expect)
  }
}
