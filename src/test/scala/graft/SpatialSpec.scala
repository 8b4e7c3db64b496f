package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Spatial

/** The grid-join's load-bearing claim: with cell edge = radius, the 3×3
  * neighbor expansion sees EVERY site within Euclidean radius — proved
  * here against a brute-force all-pairs scan on adversarial coordinates
  * (cell-boundary multiples, exact-radius distances, d² ties). */
class SpatialSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val R = 100L

  /** Deterministic LCG coordinates, salted so points and sites differ;
    * multiples of R/2 land exactly on cell boundaries. */
  private def coords(seed: Long, n: Int): Seq[(Long, Long, Long)] =
    (1 to n).map { i =>
      val a = (seed * i * 48271L) % 1000L
      val b = (seed * i * 16807L) % 1000L
      // every 5th point snapped to a cell-boundary multiple of R/2
      val x = if (i % 5 == 0) (a / 50L) * 50L else a
      val y = if (i % 7 == 0) (b / 50L) * 50L else b
      (i.toLong, x, y)
    }

  test("grid nearest-within matches the brute-force scan exactly") {
    val pts = coords(13L, 200)
    val sts = coords(29L, 23)
    val points = pts.toDF("id", "px", "py")
    val sites = sts.toDF("st", "sx", "sy")
    val got = Spatial.nearestWithin(points, "id", "px", "py",
      sites, "st", "sx", "sy", radius = R)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    // brute force: min (d2, site) over ALL sites with d2 <= R²
    val want = pts.map { case (id, px, py) =>
      val cands = sts.flatMap { case (st, sx, sy) =>
        val d2 = (px - sx) * (px - sx) + (py - sy) * (py - sy)
        if (d2 <= R * R) Some((d2, st)) else None
      }
      id -> (if (cands.isEmpty) None
             else { val m = cands.min; Some((m._2, m._1)) })
    }.toMap
    assert(got.size === want.size)
    for ((id, w) <- want) assert(got(id) === w, s"point $id")
    // the no-site branch genuinely fires on this layout
    assert(want.values.exists(_.isEmpty), "need at least one unmatched point")
    assert(want.values.exists(_.isDefined), "need at least one matched point")
  }

  test("exact-radius sites are included, ties break to the smaller site id") {
    val points = Seq((1L, 500L, 500L)).toDF("id", "px", "py")
    // site 10 at exactly d = R (d2 = R²), sites 7/9 tied at d2 = 2500
    val sites = Seq((10L, 500L + R, 500L), (9L, 550L, 500L),
      (7L, 450L, 500L)).toDF("st", "sx", "sy")
    val r = Spatial.nearestWithin(points, "id", "px", "py",
      sites, "st", "sx", "sy", radius = R).collect().head
    assert(r.getLong(1) === 7L && r.getLong(2) === 2500L)
    // with the tied closer sites removed, the exact-radius one matches
    val only10 = Spatial.nearestWithin(points, "id", "px", "py",
      sites.filter(col("st") === 10L), "st", "sx", "sy", radius = R)
      .collect().head
    assert(only10.getLong(1) === 10L && only10.getLong(2) === R * R)
  }

  test("staged search escalates exactly: fine hits, mid-ring, misses") {
    import graft.operators.Spatial
    // radius 1000, fine grid edge 250: site A inside the fine ring of
    // p1; p2's nearest lies between r/4 and r (escalation path); p3 has
    // nothing within r (null path); p4 ties two sites at equal d2
    val sites = Seq((1L, 1000L, 1000L), (2L, 2600L, 1000L),
      (3L, 9000L, 9000L), (4L, 5000L, 5000L), (5L, 5400L, 5000L))
      .toDF("st", "sx", "sy")
    val points = Seq((10L, 1100L, 1000L), (20L, 2000L, 1000L),
      (30L, 6800L, 200L), (40L, 5200L, 5000L)).toDF("id", "px", "py")
    def run(sf: Int) = Spatial.nearestWithin(points, "id", "px", "py",
        sites, "st", "sx", "sy", radius = 1000L, stageFactor = sf)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    val staged = run(4)
    assert(staged === run(0)) // bit-identical to the unstaged pass
    assert(staged === Set(
      (10L, Some(1L), Some(10000L)),   // fine-phase hit (d=100 ≤ 250)
      (20L, Some(2L), Some(360000L)),  // escalated: d=600 ∈ (250, 1000]
      (30L, None, None),               // nothing within r
      (40L, Some(4L), Some(40000L)))) // tie d2=40000 → smaller site id
  }
}
