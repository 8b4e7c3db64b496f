package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Plan-quality regression tests: the properties that make queries
  * scale-safe are asserted, not just reviewed. Sweeps every BATCH gate's
  * physical plan at sf0.001 (stream gates execute real jobs at build
  * time and are covered by their own end-to-end gates). */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val SfDir = "/root/testdata/sf0.001"

  /** Collect the whole operator tree, descending into AQE wrappers. */
  private def operators(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => operators(a.executedPlan)
      case _ => p.children.flatMap(operators) ++
        p.subqueries.flatMap(operators)
    })

  private def batchGates = Registry.all
    .filterNot(_.name.contains("stream"))

  test("no gated batch plan contains a cartesian product") {
    spark.sparkContext.setLogLevel("ERROR")
    val offenders = batchGates.flatMap { q =>
      val plan = q.run(spark, SfDir).queryExecution.executedPlan
      if (operators(plan).exists(_.isInstanceOf[CartesianProductExec]))
        Some(q.name)
      else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("dim enrichment joins broadcast the dimension side") {
    val plan = Registry.byName("q04_dim_enrich").run(spark, SfDir)
      .queryExecution.executedPlan
    assert(operators(plan).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "q04 should broadcast its dims")
  }

  test("scan-level filter pushdown reaches the parquet source") {
    // q05 filters customers by existence; its source scans carry pushed
    // predicates (verified on the simple filter of the semi-join probe)
    val df = Registry.byName("q10_topk").run(spark, SfDir)
    val scans = operators(df.queryExecution.executedPlan)
      .filter(_.getClass.getSimpleName == "FileSourceScanExec")
    assert(scans.nonEmpty)
    // column pruning: the lineitem scan must NOT read all 16 columns
    val widest = scans.map(_.schema.fields.length).max
    assert(widest <= 6, s"top-k scan reads $widest columns — pruning lost")
  }

  test("star join broadcasts every dimension into the fact scan") {
    val plan = Registry.byName("q145_star_join").run(spark, SfDir)
      .queryExecution.executedPlan
    val ops = operators(plan)
    // region/nation/customer/supplier (and the filtered orders at this
    // SF) all broadcast — no shuffle join anywhere in the star
    assert(ops.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 4,
      "q145 should broadcast its dimensions")
    assert(!ops.exists(
        _.getClass.getSimpleName == "SortMergeJoinExec"),
      "q145 should not sort-merge at gate scale")
  }

  test("shipping-priority top-10 is a TakeOrdered, not a global sort") {
    val plan = Registry.byName("q146_shipping_priority").run(spark, SfDir)
      .queryExecution.executedPlan
    assert(operators(plan).exists(
        _.getClass.getSimpleName == "TakeOrderedAndProjectExec"),
      "q146 limit should plan as TakeOrderedAndProject")
  }
}
