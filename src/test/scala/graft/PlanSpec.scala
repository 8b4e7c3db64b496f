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

  test("PQ encode is a pure projection; ADC top-k scans join-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // encode: codebooks travel as literals — no exchange anywhere (the
    // property that makes the index build a single map pass at 100 TB)
    val enc = Registry.byName("q220_pq_encode").run(spark, SfDir)
    assert(!operators(enc.queryExecution.executedPlan)
        .exists(_.isInstanceOf[ShuffleExchangeLike]),
      "pqEncode must not shuffle — codebooks are literals")
    // ADC read path: lookup tables are literal arrays, so the scored
    // scan has NO join operator and the top-k is a TakeOrderedAndProject
    val adc = Registry.byName("q221_pq_adc_topk").run(spark, SfDir)
    val ops = operators(adc.queryExecution.executedPlan)
    assert(!ops.exists(o => o.getClass.getSimpleName.contains("Join")),
      "ADC scan must not join — luts are literal arrays")
    assert(ops.exists(
        _.getClass.getSimpleName == "TakeOrderedAndProjectExec"),
      "ADC top-k should plan as TakeOrderedAndProject")
  }

  test("global rank plans without a single-partition exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val df = Registry.byName("q164_global_rank").run(spark, SfDir)
    val single = operators(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike if e.outputPartitioning == SinglePartition => e
    }
    assert(single.isEmpty,
      "q164 must never funnel the dataset through one partition — " +
        "that is the anti-pattern GlobalSort exists to kill")
  }

  test("AQE actually splits a deliberately skewed shuffle join") {
    // The engine's skew story is salting (q42) + AQE skew-join as the
    // runtime backstop — this asserts the backstop WORKS, not just that
    // the config is set: half of a 200k-row fact collapses onto key 0,
    // broadcast is disabled so the join must shuffle, and after
    // execution the adaptive plan's sort-merge join must carry
    // isSkewJoin=true (OptimizeSkewedJoin split the oversized
    // partition into advisory-sized reader splits).
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("p"))
      val right = spark.range(1000).select(col("id").as("k"), lit("d").as("d"))
      val df = left.join(right, "k").agg(sum(length(col("p"))).as("s"))
      df.collect()
      // the final adaptive plan hides operators inside QueryStageExec
      // leaves; AdaptiveSparkPlanHelper.collect descends through them
      val helper =
        new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      val smjs = helper.collect(df.queryExecution.executedPlan) {
        case s: SortMergeJoinExec => s
      }
      assert(smjs.nonEmpty, "expected a sort-merge join in the final plan")
      assert(smjs.exists(_.isSkewJoin),
        "OptimizeSkewedJoin did not mark the skewed join (isSkewJoin=false)")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("intervalJoin stays an equi-join when intervals outgrow broadcast") {
    // The whole point of the bucketed-cell formulation: a range join
    // whose interval side is too big to broadcast must NOT degrade to
    // BroadcastNestedLoop/cartesian — the cell id gives Catalyst an
    // equi-key, so the plan is an ordinary shuffled join at ANY interval
    // count. Broadcast is disabled to simulate the at-scale shape.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.functions._
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pts = spark.range(5000).select(col("id").as("pid"),
        (col("id") * 37 % 100000).as("sec"))
      val iv = spark.range(20000).select(col("id").as("iid"),
        (col("id") * 5 % 100000).as("s"),
        (col("id") * 5 % 100000 + 200).as("e"))
      val df = graft.operators.TimeSeries
        .intervalJoin(pts, "sec", iv, "s", "e", bucketSec = 300L)
        .groupBy("iid").agg(count(lit(1)).as("n"))
      df.collect()
      val helper =
        new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      val bad = helper.collect(df.queryExecution.executedPlan) {
        case b: BroadcastNestedLoopJoinExec => b
        case c: CartesianProductExec => c
      }
      assert(bad.isEmpty,
        s"interval join degraded to a non-equi join: ${bad.map(_.nodeName)}")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("spread() is a no-op on already-wide inputs and widens narrow ones") {
    // the sf1 fixes inserted spread() ahead of O(n·q) scoring scans; this
    // pins its contract so a future edit can't turn it into an
    // unconditional shuffle (at cluster scale every scan is already wide)
    import org.apache.spark.sql.functions.col
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).select(col("id")).repartition(target + 2)
    assert(graft.operators.Similarity.spread(wide) eq wide,
      "spread() must pass a wide frame through untouched")
    val narrow = spark.range(1000).coalesce(1)
      .select(col("id"))
    assert(graft.operators.Similarity.spread(narrow).rdd.getNumPartitions
      === target,
      "spread() must widen a single-split frame to defaultParallelism")
  }

  test("no gated batch plan runs a global (single-partition) window over an unbounded input") {
    // the kAnonymize scale bug class: count(*) over Window.partitionBy(lit(1))
    // (or any window with an EMPTY partition spec) funnels the entire input
    // through one task — correct at gate scale, dead at 100 TB. Global
    // aggregates are fine (partial agg + 1-row exchange); global WINDOWS
    // move every row. Exempt: windows over frames bounded by construction
    // — a limit(k) result, or an aggregate whose cardinality is fixed by
    // the bin count / calendar span rather than data volume. Anything
    // corpus-sized must rank via GlobalSort.withGlobalRank (q164).
    import org.apache.spark.sql.execution.window.WindowExec
    spark.sparkContext.setLogLevel("ERROR")
    val boundedWindows = Set(
      "q163_cms_heavy_hitters",   // ranks two orderBy().limit(20) frames
      "q188_decile_report",       // share-of-total over the 10-row decile agg
      "q173_period_over_period",  // lag over one row per DAY (calendar-bounded)
      "q193_new_vs_returning",    // running total over one row per DAY
      "q257_unimax_alloc",        // waterfilling over the DOMAIN census
                                  // (one row per domain, never corpus rows)
      "q259_heaps_fit",           // cumulative curve over the J=8-row
                                  // checkpoint census
      "q267_gini_concentration",  // rank over the domain/type census —
                                  // one row per domain, vocabulary-
                                  // bounded, never corpus rows
      "q272_interval_census",     // running sum over one row per CHANGED
                                  // HOUR — calendar-bounded
      "q275_rrf_fusion",          // ranks two orderBy().limit(50) frames
                                  // (the q163 class)
      "q288_kaplan_meier",        // suffix-sum over one row per DISTINCT
                                  // DURATION (days) — calendar-bounded
      "q293_rbo",                 // ranks two orderBy().limit(20) frames
                                  // (the q163/q275 class)
      "q295_vocab_coverage")      // cumulative mass over the VOCABULARY
                                  // census (the q267 bounded class)
    val offenders = batchGates
      .filterNot(q => boundedWindows.contains(q.name))
      .flatMap { q =>
        val plan = q.run(spark, SfDir).queryExecution.executedPlan
        val globals = operators(plan).collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty) Some(q.name) else None
      }
    assert(offenders.isEmpty,
      s"global windows (empty partition spec) in: ${offenders.mkString(", ")}")
  }

  test("bucketed co-located join runs with zero shuffle exchanges") {
    // q255's whole point: both tables written bucketed on the join key,
    // so the join AND the rollup on that key elide every exchange — the
    // property that makes bucket layout pay for itself at 100 TB.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = Registry.byName("q255_bucketed_join").run(spark, SfDir)
    val shuffles = operators(df.queryExecution.executedPlan)
      .filter(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles.isEmpty,
      s"bucketed join should be exchange-free, found: " +
        shuffles.map(_.nodeName).mkString(", "))
  }

  test("partitioned fact join carries a dynamic partition pruning filter") {
    // q256: the hot-month dim is broadcast and its census filter cannot
    // be statically pushed to the fact side (it tests a non-join
    // column), so PartitionPruning must inject a runtime subquery into
    // the fact scan's partition filters — the at-scale I/O elision.
    val df = Registry.byName("q256_dpp_join").run(spark, SfDir)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in the fact scan:\n" +
        planStr.take(4000))
  }

  test("no gated batch plan nests a BroadcastNestedLoopJoin outside the brute-force baselines") {
    // the single-core O(n²) shape the sf1 sweep caught: a non-equi join
    // plans as BroadcastNestedLoop, and only the DELIBERATE brute-force
    // measurement baselines may contain one — everything else must keep
    // an equi-key. A new gate that trips this either needs a bucketed
    // reformulation or an explicit entry here with a reason.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    spark.sparkContext.setLogLevel("ERROR")
    val bruteForceBaselines = Set(
      "q33_cosine_topk",        // brute top-k: the recall/cost baseline
      "q37_embedding_near_dup", // brute near-dup: ditto (both spread())
      "q138_ann_recall",        // recall harness joins brute vs LSH truth
      "q154_ann_multitable_recall", // ditto, multi-table
      "q319_ann_recall_probe_sample", // q154 on a 1/500 probe sample —
                                // same BY-DESIGN brute ground-truth leg
      "q182_ann_ndcg",          // NDCG against brute ground truth
      // crossJoin(broadcast(<one-row aggregate>)) also plans as BNLJ —
      // a single-row build side is O(n), not O(n²), so these are fine:
      "q76_bm25",               // broadcasts (N, avgdl) corpus scalars
      "q180_ab_test",           // crossJoins two 1-row variant aggregates
      "q197_zorder_skipping",   // broadcasts (mx, my, mz) maxima
      "q204_cms_join_size",     // crossJoins the 1-row estimate & exact
      "q224_pq_recall",         // stamps the 1-row recall onto the census
      // bounded-by-construction frames: every BNLJ operand is the ≤11-row
      // quality-decile bin frame (isotonicFitMicro require-caps bins at
      // 64), so the non-equi span joins are O(bins³), never corpus-sized:
      "q284_isotonic_fit",
      // the depth≤20 weight frame joined to the ≤20-row overlap census —
      // both operands bounded by the top-k inputs:
      "q293_rbo",
      "q305_mutual_nn")         // brute cross-scoring baseline (spread();
                                // at scale candidates come LSH-pruned)
    val offenders = batchGates
      .filterNot(q => bruteForceBaselines.contains(q.name))
      .flatMap { q =>
        val plan = q.run(spark, SfDir).queryExecution.executedPlan
        if (operators(plan).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
          Some(q.name)
        else None
      }
    assert(offenders.isEmpty,
      s"unexpected BroadcastNestedLoopJoin in: ${offenders.mkString(", ")}")
  }
}
