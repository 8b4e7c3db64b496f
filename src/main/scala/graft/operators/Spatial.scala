package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial nearest-neighbor join — the geo complement of
  * the [[IpGeo]] range lookup: assign every point its nearest site
  * within a radius (store coverage, probe→POP assignment, crawl-host
  * affinity). Coordinates are integer micro-degrees, distances squared
  * integers — every comparison is exact, so the DuckDB oracle matches
  * bit-for-bit with zero FP discipline needed.
  *
  * The naive form is a cross join (points × sites). This one buckets
  * both sides into grid cells and joins each point's cell against the
  * site side expanded to its 3×3 cell neighborhood — an EQUI-join on
  * (cx, cy). Because the cell edge equals the search radius, any site
  * within Euclidean `radius` of a point is necessarily inside the
  * point's own or an adjacent cell (|dx| ≤ r ∧ |dy| ≤ r), so the 3×3
  * expansion is EXHAUSTIVE — proved against a brute-force scan in
  * SpatialSpec.
  *
  * STAGED search (r09): with a fixed radius, candidates per point grow
  * with site DENSITY — the r08 sf3 sweep measured 12.5× wall on 3× data
  * because every point paid the full radius-sized neighborhood. Phase 1
  * reruns the same exhaustive scheme on a radius/4 grid: any site with
  * d ≤ r/4 of a point implies |dx|,|dy| ≤ r/4, so the fine 3×3 finds
  * EVERY site with d² ≤ (r/4)² — if one exists, the global nearest is
  * among them (anything farther can't beat a ≤ r/4 hit) and the point
  * is resolved touching a 16×-smaller candidate area. Only points with
  * no fine hit escalate to the full radius. Dense data resolves almost
  * everything in phase 1 (near-linear growth); sparse data pays a cheap
  * empty phase 1 and the classic full pass. Results are bit-identical
  * to the unstaged form, ties included (min struct (d², site)).
  *
  * Scale shape: the site side (expanded ≤9× per phase) broadcasts when
  * small — then points stream through map-side with NO shuffle until
  * the keyed min-aggregates; with huge site tables the same plan
  * degrades gracefully to shuffled equi-joins on the cell key. Left
  * semantics: every point returns exactly one row, (site, d2) null when
  * nothing is within the radius.
  */
object Spatial {

  /** Requires non-negative integer coordinates (micro-degrees or any
    * micro-unit grid); `radius` in the same unit. Ties (equal d²) break
    * to the smallest site id via the struct min. `stageFactor` controls
    * the phase-1 grid (edge = radius/stageFactor); ≤ 1 disables staging
    * (single classic pass). */
  def nearestWithin(points: DataFrame, idCol: String, pxCol: String,
      pyCol: String, sites: DataFrame, siteCol: String, sxCol: String,
      syCol: String, radius: Long,
      broadcastSites: Boolean = true, stageFactor: Int = 4): DataFrame = {
    require(radius > 0, "radius must be positive")
    val p = points.select(col(idCol).as("__id"),
      col(pxCol).cast("long").as("__px"),
      col(pyCol).cast("long").as("__py"))
    // a FRESH projection per phase (each .as() mints new attribute ids):
    // both phases touching one shared site frame would make phase 2's
    // join condition ambiguous against the site lineage buried in the
    // phase-1 anti-join subtree
    def s() = sites.select(col(siteCol).as("__site"),
      col(sxCol).cast("long").as("__sx"),
      col(syCol).cast("long").as("__sy"))
    val fine = if (stageFactor > 1) radius / stageFactor else 0L
    val out =
      if (fine > 0L) {
        // materialized ONCE: the anti-join (broadcast build) and the
        // union leg need different distributions of the phase-1
        // aggregate — identical subplans never hit ReuseExchange across
        // exchange kinds (the q30/q133 finding), so without the
        // checkpoint the dominant fine-grid pass ran twice. The final
        // frame is checkpointed too so the phase-1 blocks can be
        // released before returning.
        val resolved = bestWithin(p, s(), fine, broadcastSites,
          leftSide = false).localCheckpoint()
        val rest = p.join(resolved.select("__id"), Seq("__id"), "left_anti")
        val merged = resolved.unionByName(
            bestWithin(rest, s(), radius, broadcastSites, leftSide = true))
          .localCheckpoint()
        resolved.unpersist(blocking = false)
        merged
      } else bestWithin(p, s(), radius, broadcastSites, leftSide = true)
    out.select(col("__id").as(idCol),
      col("__best.__site").as("site"),
      col("__best.__d2").as("d2"))
  }

  /** One exhaustive grid pass: per-point min (d², site) over candidates
    * with d² ≤ edge² inside the 3×3 of edge-sized cells. `leftSide`
    * keeps candidate-less points (null site/d2); the inner form returns
    * only resolved points (phase 1). */
  private def bestWithin(p: DataFrame, sIn: DataFrame, edge: Long,
      broadcastSites: Boolean, leftSide: Boolean): DataFrame = {
    // `div` (integer division), never `/` (Spark's `/` on longs is DOUBLE
    // division — an FP quotient truncated back to long can land one cell
    // off near exact multiples)
    val pc = p
      .withColumn("__cx", expr(s"__px div ${edge}L"))
      .withColumn("__cy", expr(s"__py div ${edge}L"))
    // 9 neighbor offsets on the SITE side (the small one): dx, dy ∈ {-1,0,1}
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val sRaw = sIn
      .withColumn("__o", explode(offsets))
      .select(col("__site"), col("__sx"), col("__sy"),
        expr(s"__sx div ${edge}L") + col("__o.dx") as "__cx",
        expr(s"__sy div ${edge}L") + col("__o.dy") as "__cy")
    val s = if (broadcastSites) broadcast(sRaw) else sRaw
    val dx = pc("__px") - s("__sx")
    val dy = pc("__py") - s("__sy")
    val cond = pc("__cx") === s("__cx") && pc("__cy") === s("__cy") &&
      dx * dx + dy * dy <= lit(edge * edge)
    val joined = pc.join(s, cond, if (leftSide) "left" else "inner")
      .select(pc("__id"), s("__site"),
        when(s("__site").isNotNull, dx * dx + dy * dy).as("__d2"))
    joined.groupBy(col("__id"))
      .agg(min(struct(col("__d2"), col("__site"))).as("__best"))
  }
}
