package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. Complements
  * [[Dedup.clusterAssignments]] (connected components): where CC answers
  * "which docs are the same", PageRank answers "which nodes matter" —
  * the classic quality prior for web-crawl curation (rank domains by the
  * link graph, then feed the rank into the keep/drop decision).
  *
  * All rank arithmetic is FIXED-POINT INTEGER (scale 10^12): ranks are
  * longs, contributions are integer divisions, damping is `(85·x) div
  * 100`. That makes every iteration bit-identical across engines and
  * partition orders — a floating-point PageRank can't be hash-gated
  * (partial-sum order perturbs the low bits) and isn't replay-stable at
  * 100 TB either. Precision loss is ≤ outdeg·10⁻¹² per node per
  * iteration — noise relative to any real ranking use.
  */
object Graphs {

  val Scale = 1000000000000L // 10^12 fixed-point

  /** Below this many (distinct, symmetric where applicable) edges,
    * [[pageRank]] runs its rounds UNROLLED in one lazy plan (single
    * driver job) instead of a localCheckpoint per round: on a small
    * graph the per-round driver round-trips ARE the cost (q103's r12
    * floor decomposition — ~16 data-independent jobs on a 100-node
    * bench graph), while the plan depth is only linear in iterations.
    * At or above the threshold the checkpointed form keeps O(1)
    * lineage and per-round fault containment — the 100 TB shape.
    * [[UnrollIterCap]] bounds the unrolled PLAN DEPTH as well: the
    * lazy form nests one join+agg+join round per iteration, so a
    * small graph with many iterations would otherwise build an
    * arbitrarily deep single plan (Catalyst analysis cost grows with
    * nesting, and a 100-stage job has none of the per-round fault
    * containment) — above the cap the checkpointed loop runs even on
    * tiny graphs (review r13). */
  private[graft] val UnrollEdges = 2000000L
  private[graft] val UnrollIterCap = 8

  /** PageRank with damping 0.85 over `iterations` synchronous rounds.
    * Node set = every id appearing as src or dst; dangling nodes (no
    * out-edges) contribute nothing (their mass decays into the teleport
    * term — the simplified formulation; document if exact mass
    * conservation matters). Returns (node, pr) with pr at scale 10^12.
    *
    * Per round: ONE join of the (edge ⋈ outdeg) frame against the
    * current ranks on src, one map-side-combined shuffle on dst. The
    * rank frame is persisted + localCheckpoint'd per round so lineage
    * stays O(1) across iterations (the [[Dedup.clusterAssignments]]
    * recipe). The whole iteration runs at a shuffle width sized to the
    * COUNTED graph ([[graft.core.Adaptive.partsFor]]): AQE won't
    * coalesce below defaultParallelism, so a small graph would
    * otherwise iterate on ~32 near-empty tasks per stage × many stages
    * per round — the measured bulk of the bench cost — while a
    * billion-edge graph keeps the session's configured width.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, UnrollEdges)

  /** [[pageRank]] with the unroll threshold injectable — specs force
    * each form (`unrollBelow = 0` → always checkpointed, `Long.MaxValue`
    * → always unrolled) and assert bit-identical ranks. */
  private[graft] def pageRankImpl(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int, unrollBelow: Long): DataFrame = {
    val spark = edges.sparkSession
    graft.core.Adaptive.withSmallShuffleCoalesce(spark) {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodesAll = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().persist()
    // both setup counts in ONE action (each job is a driver round-trip
    // that the tiny-graph bench pays at full price); keyed rows — union
    // output order is an implementation detail. (r13 measured the
    // AQE-off one-job setup variant SLOWER — the adaptive stage-jobs
    // here are small-coalesced and cheaper than 32-task fixed-width
    // stages; see ARCHITECTURE §perf-floor.)
    val cnts = nodesAll.groupBy().agg(count(lit(1)).as("c"))
      .withColumn("k", lit("n"))
      .unionAll(e.groupBy().agg(count(lit(1)).as("c"))
        .withColumn("k", lit("m")))
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val n = cnts("n")
    val m = cnts("m")
    // loud contract instead of a bare driver ArithmeticException on
    // `Scale / 0` — an empty edge frame is a real upstream condition
    // (a filtered day with no links), not a programming error
    require(n > 0, "pageRank needs at least one edge (empty edge frame)")
    val parts = graft.core.Adaptive.partsFor(spark, math.max(n, m))
    val base = Scale * 15 / 100 / n
    // AQE off for the pinned loop: width is already counted, every loop
    // input is a checkpoint at that width — AQE would only split each
    // round into a job per shuffle stage (measured ~25 jobs for 3
    // rounds at sf0.1, pure driver floor)
    graft.core.Adaptive.withNoAqe(spark) {
    graft.core.Adaptive.withShufflePartitions(spark, parts) {
    if (m < unrollBelow && iterations <= UnrollIterCap) {
      // small graph: all rounds in ONE lazy plan, materialized by a
      // single localCheckpoint — no per-round driver jobs. eo is a
      // lazy cache (computed inside the one job, read by later rounds);
      // name-keyed (`usingColumns`) joins keep the pr-derives-from-
      // nodesAll self-reference unambiguous.
      val eo = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src").persist()
      var pr = nodesAll.select(col("node"), lit(Scale / n).as("pr"))
      (1 to iterations).foreach { _ =>
        val contrib = eo
          .join(pr.select(col("node").as("src"), col("pr")), "src")
          .select(col("dst"), expr("pr div outdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("c"))
        pr = nodesAll
          .join(contrib.select(col("dst").as("node"), col("c")),
            Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(c, 0L)) div 100")).as("pr"))
      }
      val out = pr.localCheckpoint()
      eo.unpersist(blocking = false)
      e.unpersist(blocking = false)
      nodesAll.unpersist(blocking = false)
      out
    } else {
      // re-materialize the loop-invariant frames at the loop width: the
      // per-round stages then scan `parts` blocks, not the ambient-width
      // cache (a 32-block scan of 200 rows costs more than the rounds)
      val nodes = nodesAll.coalesce(parts).localCheckpoint()
      val eo = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
        .coalesce(parts).localCheckpoint()
      e.unpersist(blocking = false)
      nodesAll.unpersist(blocking = false)
      var pr = nodes.withColumn("pr", lit(Scale / n))
      var prevCheckpointed: DataFrame = null
      (1 to iterations).foreach { _ =>
        val contrib = eo.join(pr, eo("src") === pr("node"))
          .select(col("dst"), expr("pr div outdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("c"))
        val next = nodes
          .join(contrib, nodes("node") === contrib("dst"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(c, 0L)) div 100")).as("pr"))
          .localCheckpoint()
        if (prevCheckpointed != null) prevCheckpointed.unpersist()
        prevCheckpointed = next
        pr = next
      }
      // with zero iterations pr still reads the nodes checkpoint (a
      // localCheckpoint can't be recomputed once its blocks are dropped)
      if (prevCheckpointed != null) {
        nodes.unpersist(blocking = false)
        eo.unpersist(blocking = false)
      }
      pr
    }
    }
    }
    }
  }

  /** TrustRank (Gyöngyi et al. 2004) — PageRank with the teleport mass
    * confined to a trusted SEED set: quality propagates outward along
    * links from vetted pages instead of raining uniformly, the standard
    * seeded-quality-propagation move for web-corpus curation (rank a
    * crawl by link-proximity to a trusted whitelist, cut the tail).
    * Identical fixed-point arithmetic, loop shape, and 10¹² scale as
    * [[pageRank]] — the only changes are the seed-restricted base and
    * init vectors (non-seeds start and teleport at 0). */
  def trustRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[String], iterations: Int = 3): DataFrame = {
    require(seeds.nonEmpty, "need at least one trusted seed")
    val spark = edges.sparkSession
    graft.core.Adaptive.withSmallShuffleCoalesce(spark) {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodesAll = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().persist()
    val n = nodesAll.count()
    val m = e.count()
    val parts = graft.core.Adaptive.partsFor(spark, math.max(n, m))
    // teleport mass renormalizes over seeds PRESENT in the node set:
    // dividing Scale by the full seed count while absent seeds get no
    // mass would silently shrink total trust (advice r08). Bounded
    // collect: ≤ seeds.size rows.
    val present = nodesAll
      .filter(col("node").isin(seeds: _*))
      .collect().map(_.getString(0)).toSet
    val liveSeeds = seeds.filter(present)
    require(liveSeeds.nonEmpty,
      s"none of the ${seeds.size} trusted seeds appear in the graph")
    val s = liveSeeds.size.toLong
    val isSeed = col("node").isin(liveSeeds: _*)
    val base = Scale * 15 / 100 / s
    // AQE off for the pinned loop — the q103/pageRank rationale
    graft.core.Adaptive.withNoAqe(spark) {
    graft.core.Adaptive.withShufflePartitions(spark, parts) {
      val nodes = nodesAll.coalesce(parts).localCheckpoint()
      val eo = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
        .coalesce(parts).localCheckpoint()
      e.unpersist(blocking = false)
      nodesAll.unpersist(blocking = false)
      var tr = nodes.withColumn("tr",
        when(isSeed, lit(Scale / s)).otherwise(lit(0L)))
      var prevCheckpointed: DataFrame = null
      (1 to iterations).foreach { _ =>
        val contrib = eo.join(tr, eo("src") === tr("node"))
          .select(col("dst"), expr("tr div outdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("c"))
        val next = nodes
          .join(contrib, nodes("node") === contrib("dst"), "left")
          .select(col("node"),
            (when(isSeed, lit(base)).otherwise(lit(0L)) +
              expr("(85 * coalesce(c, 0L)) div 100")).as("tr"))
          .localCheckpoint()
        if (prevCheckpointed != null) prevCheckpointed.unpersist()
        prevCheckpointed = next
        tr = next
      }
      if (prevCheckpointed != null) {
        nodes.unpersist(blocking = false)
        eo.unpersist(blocking = false)
      }
      tr
    }
    }
    }
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own community; each round it adopts the most frequent
    * label among its neighbors, ties to the SMALLEST label (and an
    * isolated node keeps its own) — fully deterministic, unlike the
    * async/random-order formulations. Complements
    * [[Dedup.clusterAssignments]]: CC merges anything connected, LP
    * finds densely-linked groups inside one component. Per round: one
    * join of the symmetric edge list against current labels + one
    * (node, label) count aggregation + a per-node argmax window — all
    * hash-partitioned, labels localCheckpoint'd so lineage stays O(1). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.core.Adaptive.withSmallShuffleCoalesce(edges.sparkSession) {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val und = sym.union(sym.select(col("b"), col("a"))).distinct()
      .localCheckpoint()
    val nodes = und.select(col("a").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
    (1 to rounds).foreach { _ =>
      val neigh = und.join(labels, und("b") === labels("node"))
        .select(col("a").as("node"), col("label"))
        .groupBy("node", "label").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("cnt").desc, col("label").asc)
      val next = neigh.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
      labels.unpersist()
      labels = next
    }
    labels
    }
  }

  /** Single-source BFS hop distance over the undirected simple graph, the
    * reachability primitive (crawl-frontier depth, citation distance,
    * "within k hops of a trusted seed" curation filters). Synchronous
    * frontier expansion for `maxDepth` rounds: each round joins ONLY the
    * current frontier against the edge list (never the whole visited
    * set), dedups, and anti-joins visited — both joins hash-partitioned
    * on node, frontier persisted per round with O(1) lineage. Unreached
    * nodes are simply absent (no infinity sentinel). Deterministic: a
    * node's level is the round that first reached it. */
  /** Bounded-round k-core peel: repeatedly remove nodes whose UNDIRECTED
    * distinct-neighbor degree is below `k` (self-loops dropped); after
    * `rounds` synchronous rounds the survivors are a superset of the
    * true k-core, equal to it once a round removes nothing — the classic
    * degeneracy/quality filter (spam clusters and boilerplate link farms
    * peel away; the dense core is what link-quality weighting should
    * trust). Bounded rounds keep the operator deterministic and
    * oracle-unrollable (the [[pageRank]] discipline).
    *
    * Per round: one map-side-combined degree aggregation, then two
    * semi-joins of the edge frame against the localCheckpoint'd
    * surviving-node set; the edge frame shrinks monotonically, lineage
    * stays O(1) via per-round localCheckpoints, and the loop runs at
    * the counted-graph width ([[graft.core.Adaptive.partsFor]]). A
    * round that removes no edge proves the peel converged — remaining
    * rounds are no-ops and are skipped (the [[Dedup.clusterAssignments]]
    * convergence-probe discipline; the edge count is free off the
    * already-checkpointed frame), so `rounds` is a CAP, not a cost.
    * Output: (node, degree) within the surviving subgraph after the
    * last effective round — materialized INSIDE the pinned-width scope
    * so the tiny survivor aggregate never pays defaultParallelism
    * near-empty tasks. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int = 4): DataFrame =
    kCoreWithRounds(edges, srcCol, dstCol, k, rounds)._1

  /** [[kCore]] plus the number of peel rounds actually EXECUTED — the
    * convergence probe's observable (specs assert a pre-converged graph
    * pays one round, not the cap). */
  private[graft] def kCoreWithRounds(edges: DataFrame, srcCol: String,
      dstCol: String, k: Int, rounds: Int): (DataFrame, Int) = {
    val spark = edges.sparkSession
    graft.core.Adaptive.withSmallShuffleCoalesce(spark) {
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
    // ONE materialization: checkpoint the AQE-coalesced distinct, then
    // count the checkpoint (near-free). The former persist→count→
    // coalesce→re-checkpoint shape paid two full passes over the edge
    // set before round 1 — over half of q231's bench wall (r12 floor
    // decomposition). Round 1 reads the checkpoint at its coalesced
    // width; every later round is checkpointed at the counted width.
    val sym0 = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    val m = sym0.count()
    val parts = graft.core.Adaptive.partsFor(spark, m)
    // AQE off for the pinned loop (q103's rationale): every input is a
    // checkpoint at the counted width, so AQE only adds a job per
    // shuffle stage per round — pure driver floor on a small graph
    graft.core.Adaptive.withNoAqe(spark) {
    graft.core.Adaptive.withShufflePartitions(spark, parts) {
      var alive = sym0
      var prev: DataFrame = alive
      var aliveEdges = m
      var round = 1
      var executed = 0
      var converged = aliveEdges == 0L
      while (round <= rounds && !converged) {
        val keep = alive.groupBy("a").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select("a")
          .localCheckpoint(eager = false)
        val next = alive.join(keep, Seq("a"), "left_semi")
          .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
          .select("a", "b")
          .localCheckpoint(eager = false)
        val nextEdges = next.count() // materializes keep + next lazily
        prev.unpersist(blocking = false)
        keep.unpersist(blocking = false)
        prev = next
        alive = next
        converged = nextEdges == aliveEdges || nextEdges == 0L
        aliveEdges = nextEdges
        executed = round
        round += 1
      }
      val out = alive
        .groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
        .localCheckpoint()
      alive.unpersist(blocking = false)
      (out, executed)
    }
    }
    }
  }

  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
      source: String, maxDepth: Int = 3): DataFrame =
    bfsLevelsWithDepth(edges, srcCol, dstCol, source, maxDepth)._1

  /** [[bfsLevels]] plus the number of expansion rounds actually EXECUTED
    * (the round that discovered an empty frontier counts — it did the
    * probing join; everything after it is skipped). */
  private[graft] def bfsLevelsWithDepth(edges: DataFrame, srcCol: String,
      dstCol: String, source: String, maxDepth: Int): (DataFrame, Int) = {
    val s = edges.sparkSession
    graft.core.Adaptive.withSmallShuffleCoalesce(s) {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = sym.union(sym.select(col("b"), col("a"))).distinct()
      .localCheckpoint()
    var visited = s.range(1)
      .select(lit(source).as("node"), lit(0).as("lvl")).localCheckpoint()
    var frontier = visited
    var depth = 1
    var exhausted = false
    // an empty frontier proves every reachable node is visited —
    // remaining rounds are no-op joins and are skipped (maxDepth is a
    // CAP; the emptiness probe is free off the checkpointed frontier)
    while (depth <= maxDepth && !exhausted) {
      val next = und
        .join(frontier.select(col("node").as("a")), "a")
        .select(col("b").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("lvl", lit(depth))
        .localCheckpoint()
      // release superseded per-round frames once the new union is
      // checkpointed — without this, cached blocks accrue linearly in
      // maxDepth on a long-lived session (clusterAssignments' per-round
      // unpersist pattern). Round 1's frontier IS visited; skip it.
      val prevVisited = visited
      val prevFrontier = frontier
      exhausted = next.isEmpty
      visited =
        if (exhausted) visited else visited.unionByName(next).localCheckpoint()
      if (exhausted) next.unpersist(blocking = false)
      else prevVisited.unpersist(blocking = false)
      if (prevFrontier ne prevVisited) prevFrontier.unpersist(blocking = false)
      frontier = next
      depth += 1
    }
    frontier.unpersist(blocking = false)
    und.unpersist()
    (visited, depth - 1)
    }
  }

  /** Common-neighbor link prediction over the undirected simple graph:
    * for every NON-adjacent pair sharing at least `minCommon` neighbors,
    * the shared-neighbor count plus two classic scores — Resource
    * Allocation Σ 1/deg(via) (Zhou/Lü/Zhang 2009) and Adamic–Adar
    * Σ 1/ln(deg(via)) — the "these two domains should probably be the
    * same community / this citation is probably missing" primitive that
    * link-curation and crawl-expansion pipelines run over web graphs.
    *
    * Determinism/FP: RA is micro-units by INTEGER division
    * (`1000000 div deg` — bit-exact cross-engine); AA weights round
    * ln(deg) at scale 8 first, then the per-via micro weight half-up to
    * a LONG (the q82 rounded-ln discipline), so both scores are sums of
    * longs — no double partial-sum order anywhere. Every shared
    * neighbor of two distinct nodes has deg ≥ 2, so ln(deg) > 0 by
    * construction.
    *
    * Scale shape: candidate pairs come from ONE wedge self-join of the
    * symmetric edge list through the via node — Σ deg(via)² rows, never
    * all-pairs — and via nodes with deg > `maxViaDegree` are EXCLUDED
    * before the join (documented approximation, the df-capped
    * posting-list discipline: a hub shared by everyone carries ~zero
    * evidence — its RA/AA weight is 1/hub — but would alone contribute
    * deg² wedges; the cap bounds the join at nodes·cap² regardless of
    * skew). Existing edges leave via one anti-join on the canonical
    * pair; the final cut is orderBy+limit → TakeOrderedAndProject on the
    * (ra desc, pair) total order, never a global sort. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Int = 2, maxViaDegree: Int = 64, topK: Int = 1000): DataFrame = {
    import graft.functions.SafeMath
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = sym.union(sym.select(col("b"), col("a"))).distinct()
      .localCheckpoint()
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // per-via micro weights, both computed ONCE on the degree frame
    // (vocabulary-sized) before the wedge fan-out
    // deg >= 2 is a no-op on the RESULT (a neighbor shared by two
    // distinct endpoints has degree ≥ 2 by construction) but keeps the
    // ln(deg)=0 division out of the weight expression for leaf nodes
    val viaW = deg.filter(col("deg") <= maxViaDegree && col("deg") >= 2)
      .select(col("node").as("via"),
        expr("1000000L div deg").as("ra_w"),
        SafeMath.roundHalfUp(
          lit(1000000.0) / SafeMath.roundHalfUp(log(col("deg")), 8), 0)
          .cast("long").as("aa_w"))
      .localCheckpoint()
    val left = und.join(viaW, und("b") === viaW("via"))
      .select(col("a").as("u"), col("via"), col("ra_w"), col("aa_w"))
    val right = und.select(col("b").as("via"), col("a").as("v"))
    val cand = left.join(right, "via")
      .filter(col("u") < col("v"))
      .groupBy(col("u").as("a"), col("v").as("b"))
      .agg(count(lit(1)).as("common"),
        sum(col("ra_w")).as("ra_micro"),
        sum(col("aa_w")).as("aa_micro"))
      .filter(col("common") >= minCommon)
    // canonical und edges with a < b are exactly the sym-canonicalized set
    val existing = und.filter(col("a") < col("b"))
    cand.join(existing, Seq("a", "b"), "left_anti")
      .orderBy(col("ra_micro").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /** Per-node triangle counts over the undirected simple graph induced by
    * `edges` (self-loops dropped, direction and multiplicity collapsed).
    * Compact-forward with DEGREE orientation: every edge points from its
    * lower-degree endpoint to its higher-degree endpoint (ties broken by
    * id), so each triangle is found exactly once as e(u,v)⋈e(v,w) checked
    * against the closing e(u,w) — two hash-partitioned joins, never an
    * all-pairs expansion. Orienting by degree (not id) bounds each node's
    * out-degree by O(√E)/arboricity, so the wedge join's per-key fan-out
    * stays bounded even when a power-law hub touches millions of edges —
    * with id orientation a high-id hub becomes the source of its entire
    * edge set and the wedge join fans out quadratically in hub degree
    * (asserted against a synthetic hub in GraphsSpec). The oriented edge
    * list is materialized once (localCheckpoint) and reused by all three
    * join legs; the degree frame is one aggregate of the canonical edge
    * set. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // a < b by construction, so on equal degrees the id tie-break keeps
    // a→b; otherwise the lower-degree endpoint becomes the source.
    val fwd = col("da") <= col("db")
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint()
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .as("w")
      .join(oriented.as("e3"),
        col("w.a") === col("e3.u") && col("w.c") === col("e3.v"))
      .select(col("w.a").as("a"), col("w.b").as("b"), col("w.c").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** HITS (Kleinberg 1999) hubs & authorities over `iterations`
    * synchronous rounds — the complementary prior to [[pageRank]] for
    * link-graph curation: authorities are the pages worth keeping, hubs
    * the index/listing pages that FIND them (and that dedup should often
    * drop). Same fixed-point integer discipline as [[pageRank]]: scores
    * are longs at scale 10¹², each half-round is one edge⋈score join +
    * one map-side-combined shuffle, and the L1 normalization is exact
    * integer arithmetic — raw sums and the ×Scale product run in
    * DECIMAL(38,0) (raw ≤ maxdeg·Scale, product ≤ m·10²⁴ ≪ 10³⁸), the
    * normalized score `raw·Scale div sum` is back in [0, Scale] so the
    * output columns are plain BIGINT (never DECIMAL — the gate-render
    * rule). Per round the two L1 sums are 1-row aggregates collected to
    * the driver (bounded by construction) and spliced back as literals.
    *
    * h⁰ = Scale for every node; a = normalize(Σ_{u→v} h(u)),
    * h = normalize(Σ_{u→v} a(v)). Nodes with no in-edges get auth 0,
    * no out-edges get hub 0. Returns (node, hub, auth) — a node-sized
    * localCheckpoint (every intermediate block is released before
    * return); the CALLER unpersists the returned frame when done. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(iterations >= 1)
    val spark = edges.sparkSession
    graft.core.Adaptive.withSmallShuffleCoalesce(spark) {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodesAll = e0.select(col("src").as("node"))
      .union(e0.select(col("dst"))).distinct().persist()
    val n = nodesAll.count()
    val m = e0.count()
    val parts = graft.core.Adaptive.partsFor(spark, math.max(n, m))
    // AQE off for the pinned loop — the q103/pageRank rationale
    graft.core.Adaptive.withNoAqe(spark) {
    graft.core.Adaptive.withShufflePartitions(spark, parts) {
      val nodes = nodesAll.coalesce(parts).localCheckpoint()
      val e = e0.coalesce(parts).localCheckpoint()
      e0.unpersist(blocking = false)
      nodesAll.unpersist(blocking = false)
      // one half-round: raw(v) = Σ over the joined side, then exact L1
      // normalization to [0, Scale]; scoreOf joins on the given edge end
      def halfRound(scores: DataFrame, joinEnd: String,
          groupEnd: String): DataFrame = {
        val raw = e.join(scores, e(joinEnd) === scores("node"))
          .groupBy(col(groupEnd).as("node"))
          .agg(sum(col("s").cast(DecimalType(38, 0))).as("raw"))
        val tot = raw.agg(sum(col("raw"))).collect()(0) // 1 row — bounded
          .getDecimal(0).toBigInteger
        require(tot.signum > 0, "HITS needs at least one live edge")
        nodes.join(raw, Seq("node"), "left")
          .select(col("node"),
            coalesce(
              expr(s"CAST(raw * ${Scale}L AS DECIMAL(38,0)) div " +
                s"CAST('$tot' AS DECIMAL(38,0))"),
              lit(0L)).as("s"))
      }
      var h = nodes.withColumn("s", lit(Scale))
      var a: DataFrame = null
      var prevCheckpointed: Seq[DataFrame] = Nil
      // try/finally: halfRound's require (edgeless graph / zero score
      // mass) throws MID-LOOP — without the finally the nodes/e
      // checkpoints and the last rounds' blocks stay pinned for the
      // session (review r12; the doc promises full release)
      try {
        (1 to iterations).foreach { _ =>
          a = halfRound(h, "src", "dst").localCheckpoint()
          h = halfRound(a, "dst", "src").localCheckpoint()
          prevCheckpointed.foreach(_.unpersist(blocking = false))
          prevCheckpointed = Seq(a, h)
        }
        // materialize the node-sized result, then release every block
        // this call pinned (final a/h rounds, nodes, e) — advice r11
        h.select(col("node"), col("s").as("hub"))
          .join(a.select(col("node"), col("s").as("auth")), Seq("node"))
          .localCheckpoint()
      } finally {
        // unpersist a/h directly (null-guarded): if the SECOND halfRound
        // of a round throws, the just-checkpointed `a` is not yet in
        // prevCheckpointed and would otherwise stay pinned (advice r12)
        (Seq(a, h).filter(_ != null) ++ prevCheckpointed).distinct
          .foreach(_.unpersist(blocking = false))
        nodes.unpersist(blocking = false)
        e.unpersist(blocking = false)
      }
    }
    }
    }
  }
}
