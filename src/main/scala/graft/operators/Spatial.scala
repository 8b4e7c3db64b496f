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
  * both sides into `radius`-sized grid cells and joins each point's cell
  * against the site side expanded to its 3×3 cell neighborhood — an
  * EQUI-join on (cx, cy). Because the cell edge equals the radius, any
  * site within Euclidean `radius` of a point is necessarily inside the
  * point's own or an adjacent cell (|dx| ≤ r ∧ |dy| ≤ r), so the 3×3
  * expansion is EXHAUSTIVE — proved against a brute-force scan in
  * SpatialSpec. Candidates per point are bounded by site density, not
  * corpus size.
  *
  * Scale shape: the site side (expanded ≤9×) broadcasts when small —
  * then points stream through map-side with NO shuffle until the one
  * keyed min-aggregate; with huge site tables the same plan degrades
  * gracefully to a shuffled equi-join on the cell key. Left semantics:
  * every point returns exactly one row, (site, d2) null when nothing is
  * within the radius — the distance test lives INSIDE the join
  * condition so unmatched points survive.
  */
object Spatial {

  /** Requires non-negative integer coordinates (micro-degrees or any
    * micro-unit grid); `radius` in the same unit. Ties (equal d²) break
    * to the smallest site id via the struct min. */
  def nearestWithin(points: DataFrame, idCol: String, pxCol: String,
      pyCol: String, sites: DataFrame, siteCol: String, sxCol: String,
      syCol: String, radius: Long,
      broadcastSites: Boolean = true): DataFrame = {
    require(radius > 0, "radius must be positive")
    // `div` (integer division), never `/` (Spark's `/` on longs is DOUBLE
    // division — an FP quotient truncated back to long can land one cell
    // off near exact multiples)
    val p = points.select(col(idCol).as("__id"),
      col(pxCol).cast("long").as("__px"),
      col(pyCol).cast("long").as("__py"))
      .withColumn("__cx", expr(s"__px div ${radius}L"))
      .withColumn("__cy", expr(s"__py div ${radius}L"))
    // 9 neighbor offsets on the SITE side (the small one): dx, dy ∈ {-1,0,1}
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val sRaw = sites.select(col(siteCol).as("__site"),
      col(sxCol).cast("long").as("__sx"),
      col(syCol).cast("long").as("__sy"))
      .withColumn("__o", explode(offsets))
      .select(col("__site"), col("__sx"), col("__sy"),
        expr(s"__sx div ${radius}L") + col("__o.dx") as "__cx",
        expr(s"__sy div ${radius}L") + col("__o.dy") as "__cy")
    val s = if (broadcastSites) broadcast(sRaw) else sRaw
    val dx = p("__px") - s("__sx")
    val dy = p("__py") - s("__sy")
    val joined = p.join(s,
      p("__cx") === s("__cx") && p("__cy") === s("__cy") &&
        dx * dx + dy * dy <= lit(radius * radius), "left")
      .select(p("__id"), s("__site"),
        when(s("__site").isNotNull, dx * dx + dy * dy).as("__d2"))
    joined.groupBy(col("__id"))
      .agg(min(struct(col("__d2"), col("__site"))).as("__best"))
      .select(col("__id").as(idCol),
        col("__best.__site").as("site"),
        col("__best.__d2").as("d2"))
  }
}
