package graft.score

/** Perceived-quality scoring model (SURVEY.md §2.8 F8-F10, §2.5 A4).
  *
  * Semantics reproduced from the reference's config-driven scorer
  * (`CONSOLE/util/ScoreHelper.java:29-95`, `CONSOLE/score/PQMath.java:7-112`,
  * `CONSOLE/score/Score.java:44-90`), re-expressed as immutable Scala data
  * compiled to Catalyst expressions:
  *
  *  - a criteria set maps protocol → weighted metrics;
  *  - each metric has outlier rules (any hit ⇒ the WHOLE record scores 0),
  *    and interval bands `(a,b]` / `[a,b)` / `(a,+)` with a score range
  *    [lower, upper] linearly interpolated within the band;
  *  - direction `up` = smaller is better (interp against the band max),
  *    `down` = larger is better (interp against the band min);
  *  - a value outside every band takes the LAST band's `lower × weight`;
  *  - a null metric contributes 0 (the reference skips unreadable fields);
  *  - the weighted sum is clamped to [0,100] and rounded to 2 decimals.
  *
  * Divergence from the reference, by design: arithmetic is Double
  * end-to-end (the reference mixes float/double, which loses precision in
  * the interpolation); unbounded-band sentinels keep the reference's
  * constants so interpolation in `+` bands degenerates identically.
  */
sealed trait Direction
object Direction {
  /** Smaller is better (latency-like). */ case object Up extends Direction
  /** Larger is better (throughput-like). */ case object Down extends Direction
}

/** One score band: value interval → score range [lower, upper]. */
final case class Band(
    upper: Double,
    lower: Double,
    min: Option[Double],
    max: Option[Double],
    minInclusive: Boolean,
    maxInclusive: Boolean) {
  /** Interpolation endpoints for unbounded sides — the reference substitutes
    * `Float.MIN_VALUE` / `Float.MAX_VALUE/100` (`Score.java:46-60`). */
  def minVal: Double = min.getOrElse(java.lang.Float.MIN_VALUE.toDouble)
  def maxVal: Double = max.getOrElse((java.lang.Float.MAX_VALUE / 100).toDouble)
}

object Band {
  /** Parse the reference's interval syntax: `(0,30]`, `[768,+)`, `(+,4)`.
    * `(`/`)` exclusive, `[`/`]` inclusive, `+` unbounded. */
  def parse(upper: Double, lower: Double, interval: String): Band = {
    val Array(lo, hi) = interval.trim.split(",").map(_.trim)
    val (minV, minInc) =
      if (lo.contains("+")) (None, false)
      else (Some(lo.substring(1).toDouble), lo.startsWith("["))
    val (maxV, maxInc) =
      if (hi.contains("+")) (None, false)
      else (Some(hi.dropRight(1).toDouble), hi.endsWith("]"))
    Band(upper, lower, minV, maxV, minInc, maxInc)
  }
}

/** One outlier rule, e.g. `<=:0`. Ops: `>` `<` `>=` `<=` or `=` (default). */
final case class OutlierRule(op: String, value: Double)

object OutlierRule {
  /** Parse `"<=:0,>=:5000"` → rules (reference `PQMath.eqOutlier`). */
  def parseAll(spec: String): Seq[OutlierRule] =
    if (spec == null || spec.trim.isEmpty) Seq.empty
    else spec.split(",").toSeq.map { part =>
      val Array(sym, v) = part.trim.split(":")
      OutlierRule(sym, v.toDouble)
    }
}

final case class PQMetric(
    name: String,
    direction: Direction,
    weight: Double,
    outliers: Seq[OutlierRule],
    bands: Seq[Band])

final case class PQCriteria(
    id: Long,
    protocol: String,
    metrics: Seq[PQMetric])

final case class PQConfig(criteria: Seq[PQCriteria]) {
  val byProtocol: Map[String, PQCriteria] =
    criteria.map(c => c.protocol -> c).toMap
}
