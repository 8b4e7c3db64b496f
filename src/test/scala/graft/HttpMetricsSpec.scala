package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GameMetrics, HttpMetrics}

case class Elem(element_status: Long, dns_cost: Double, tcp_cost: Double,
    ssl_cost: Double, element_download_cost: Double, element_size: Double,
    thread_num: Long)
case class Page(probe_id: String, page_size: Double, trans_body_cost: Double,
    dns_cost: Double, tcp_cost: Double, ssl_cost: Double,
    element_load_cost: Double, element_total_size: Double)

/** NQS-shaped fixtures (FIXTURES.md §1) through the HTTP/GAME metric
  * transforms; expectations hand-computed from the reference semantics
  * (`HttpDataParser.java:21-127`, `GameDataParser.java:11-31`).
  */
class HttpMetricsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("page-level scalar metrics match reference formulas") {
    val df = Seq(
      Page("p1", 2048.0, 500.0, 10.0, 20.0, 5.0, 300.0, 4096.0),
      Page("p2", 1000.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0) // zero-division guards
    ).toDF
    val out = HttpMetrics.deriveScalars(df, firstScreenFactor = 2.0)
      .orderBy("probe_id")
      .select("conn_cost", "avg_speed", "text_cost", "first_screen_cost",
        "page_total_cost", "page_avg_speed")
      .collect()
    val r1 = out(0)
    assert(r1.getDouble(0) === 35.0)                       // conn = 10+20+5
    assert(r1.getDouble(1) === math.floor(2048.0 / 0.5 * 10000 + 0.5) / 10000)
    assert(r1.getDouble(2) === 535.0)                      // text = conn+trans
    assert(r1.getDouble(3) === 535.0 + 300.0 * 2.0)        // first screen
    assert(r1.getDouble(4) === 835.0)                      // page total
    assert(r1.getDouble(5) === math.floor((2048.0 + 4096.0) / 0.835 * 10000 + 0.5) / 10000)
    val r2 = out(1)
    assert(r2.getDouble(1) === 0.0 && r2.getDouble(5) === 0.0)
  }

  test("detail array aggregation: counts, sizes, success rate, thread max") {
    val details = Seq(
      Elem(0, 1, 2, 3, 10, 100, 1), // conn 6, total 16, thread 1
      Elem(0, 2, 2, 2, 20, 200, 1), // conn 6, total 26, thread 1 (sum 42)
      Elem(1, 1, 1, 1, 30, 300, 2), // conn 3, total 33, thread 2 (sum 33)
      Elem(0, 0, 0, 0, 0, 400, 3))  // avg_speed 0-guard,   thread 3 (sum 0)
    val df = Seq(("p1", details)).toDF("probe_id", "detail")
    val out = HttpMetrics.deriveDetailAgg(df).collect()(0)
    assert(out.getAs[Int]("elements_sum") === 4)
    assert(out.getAs[Int]("elements_success_sum") === 3)
    assert(out.getAs[Int]("elements_fail_sum") === 1)
    assert(out.getAs[Double]("element_total_size") === 1000.0)
    assert(out.getAs[Double]("elements_success_rate") === 75.0)
    assert(out.getAs[Double]("element_load_cost") === 42.0)
    val enriched = out.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("detail")
    assert(enriched.head.getAs[Double]("conn_cost") === 6.0)
    assert(enriched.head.getAs[Double]("element_total_cost") === 16.0)
    assert(enriched.head.getAs[Double]("avg_speed") === 10000.0) // 100/(10/1000)
    assert(enriched(3).getAs[Double]("avg_speed") === 0.0)
  }

  test("empty detail array yields zeroed aggregates") {
    val df = Seq(("p1", Seq.empty[Elem])).toDF("probe_id", "detail")
    val out = HttpMetrics.deriveDetailAgg(df).collect()(0)
    assert(out.getAs[Int]("elements_sum") === 0)
    assert(out.getAs[Double]("elements_success_rate") === 0.0)
    assert(out.getAs[Double]("element_load_cost") === 0.0)
  }

  test("GAME conn_cost keeps probe-reported value when dns/tcp/ssl all zero") {
    val df = Seq(
      ("g1", 100.0, 50.0, 0.0, 0.0, 0.0, 0.0, 77.0),
      ("g2", 100.0, 50.0, 1.0, 2.0, 3.0, 99.0, 77.0)
    ).toDF("probe_id", "page_size", "trans_body_cost", "dns_cost", "tcp_cost",
      "ssl_cost", "avg_speed", "conn_cost")
    val out = GameMetrics.derive(df).orderBy("probe_id")
      .select("conn_cost", "avg_speed").collect()
    assert(out(0).getDouble(0) === 77.0)  // reported wins
    assert(out(0).getDouble(1) === 2000.0) // 100/(50/1000) computed
    assert(out(1).getDouble(0) === 6.0)   // recomputed dns+tcp+ssl
    assert(out(1).getDouble(1) === 99.0)  // reported speed kept
  }
}
