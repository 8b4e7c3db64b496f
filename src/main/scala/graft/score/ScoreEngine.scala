package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles a [[PQConfig]] into executable form — twice, from the same
  * model: a Catalyst `Column` (a pure `when/otherwise` chain, fully inside
  * whole-stage codegen; no UDF) and an equivalent ANSI SQL `CASE`
  * expression (used as the DuckDB oracle for the correctness gate).
  *
  * All constants (band widths, interpolation denominators) are folded in
  * Scala so both backends evaluate literally identical double arithmetic.
  *
  * Reference behavior reproduced: `CONSOLE/util/ScoreHelper.java:29-95`
  * (SPEED short-circuit, outlier ⇒ 0, clamp, round 2),
  * `CONSOLE/score/PQMath.java:7-112` (band compare + interpolation).
  */
object ScoreEngine {

  /** Pairs a Spark column with its SQL rendering so the two backends are
    * built from one metric-source mapping. */
  final case class Source(column: Column, sql: String)

  // ---------------------------------------------------------------- Column

  private def bandCond(b: Band, v: Column): Column = {
    val lo = b.min.map(m => if (b.minInclusive) v >= m else v > m)
    val hi = b.max.map(m => if (b.maxInclusive) v <= m else v < m)
    (lo, hi) match {
      case (Some(l), Some(h)) => l && h
      case (Some(l), None)    => l
      case (None, Some(h))    => h
      case (None, None)       => lit(true)
    }
  }

  private def interp(m: PQMetric, b: Band, v: Column): Column = {
    val span = b.upper - b.lower
    val denom = b.maxVal - b.minVal
    val frac = m.direction match {
      case Direction.Up   => (lit(b.maxVal) - v) / denom
      case Direction.Down => (v - lit(b.minVal)) / denom
    }
    (lit(b.lower) + lit(span) * frac) * m.weight
  }

  /** Per-metric weighted score; null value contributes 0; out-of-band
    * falls back to the last band's `lower × weight`. */
  def metricScore(m: PQMetric, v: Column): Column = {
    val fallback = lit(m.bands.last.lower * m.weight)
    m.bands.foldLeft(when(v.isNull, lit(0.0))) { (acc, b) =>
      acc.when(bandCond(b, v), interp(m, b, v))
    }.otherwise(fallback)
  }

  /** True when any outlier rule fires (null never fires). */
  def outlierCond(m: PQMetric, v: Column): Column =
    if (m.outliers.isEmpty) lit(false)
    else v.isNotNull && m.outliers.map { r =>
      r.op match {
        case ">"  => v > r.value
        case "<"  => v < r.value
        case ">=" => v >= r.value
        case "<=" => v <= r.value
        case _    => v === r.value
      }
    }.reduce(_ || _)

  /** Score for one criteria set given a metric-name → source mapping.
    *
    * The [0,100] clamp is `least/greatest`, NOT a `when(total>100)/
    * when(total<0)/otherwise(total)` chain: the chain references the
    * (large) `total` subtree three times, which tripled the generated
    * code of the 14-protocol dispatch past janino's method limits and
    * dropped the whole projection out of whole-stage codegen. Values are
    * identical — both forms return `total` unchanged in range, and the
    * boundary comparisons are exact FP equality on both engines. */
  def scoreFor(c: PQCriteria, src: String => Source): Column = {
    val outlier = c.metrics.map(m => outlierCond(m, src(m.name).column)).reduce(_ || _)
    val total = c.metrics.map(m => metricScore(m, src(m.name).column)).reduce(_ + _)
    val clamped = least(lit(100.0), greatest(lit(0.0), total))
    when(outlier, lit(0.0)).otherwise(graft.functions.SafeMath.roundHalfUp(clamped, 2))
  }

  /** Full protocol dispatch: one `when` chain over the config's protocols.
    * SPEED is hardcoded to 0 before criteria lookup (`ScoreHelper.java:30-33`);
    * unknown protocols score 0. */
  def scoreAll(cfg: PQConfig, protocol: Column, src: String => Source): Column =
    cfg.criteria.filterNot(_.protocol == "SPEED")
      .foldLeft(when(protocol === "SPEED", lit(0.0))) { (acc, c) =>
        acc.when(protocol === c.protocol, scoreFor(c, src))
      }.otherwise(lit(0.0))

  /** DataFrame transform: add a `score` column, metrics resolved by name. */
  def withScore(df: DataFrame, cfg: PQConfig, protocolCol: String,
      out: String = "score"): DataFrame =
    df.withColumn(out,
      scoreAll(cfg, col(protocolCol), name => Source(col(name), name)))

  // ------------------------------------------------------------------- SQL

  /** Render a double constant so ANY engine parses it DIRECTLY as a
    * DOUBLE. Two traps otherwise: DuckDB parses bare `21.81` as an exact
    * DECIMAL (constant arithmetic then differs from Spark's binary doubles
    * by an ulp), and `CAST('0.39999999999999997' AS DOUBLE)` goes through
    * DECIMAL division and is NOT correctly rounded. Scientific notation
    * hits the strtod path, which is — and Scala's `Double.toString`
    * shortest-repr guarantees an exact round-trip. */
  private[graft] def fmtD(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s"($s)" else s"(${s}E0)"
  }

  private def bandCondSql(b: Band, v: String): String = {
    val lo = b.min.map(m => s"($v) ${if (b.minInclusive) ">=" else ">"} ${fmtD(m)}")
    val hi = b.max.map(m => s"($v) ${if (b.maxInclusive) "<=" else "<"} ${fmtD(m)}")
    (lo ++ hi).mkString("(", " AND ", ")")
  }

  private def interpSql(m: PQMetric, b: Band, v: String): String = {
    val span = b.upper - b.lower
    val denom = b.maxVal - b.minVal
    // parenthesization must mirror the Column build exactly: the fraction
    // divides BEFORE the span multiply, or results drift by an ulp.
    val frac = m.direction match {
      case Direction.Up   => s"((${fmtD(b.maxVal)} - ($v)) / ${fmtD(denom)})"
      case Direction.Down => s"((($v) - ${fmtD(b.minVal)}) / ${fmtD(denom)})"
    }
    s"(${fmtD(b.lower)} + ${fmtD(span)} * $frac) * ${fmtD(m.weight)}"
  }

  def metricScoreSql(m: PQMetric, v: String): String = {
    val bands = m.bands
      .map(b => s"WHEN ${bandCondSql(b, v)} THEN ${interpSql(m, b, v)}")
      .mkString(" ")
    val fallback = m.bands.last.lower * m.weight
    s"(CASE WHEN ($v) IS NULL THEN 0.0E0 $bands ELSE ${fmtD(fallback)} END)"
  }

  def outlierCondSql(m: PQMetric, v: String): String =
    if (m.outliers.isEmpty) "FALSE"
    else {
      val rules = m.outliers.map { r =>
        val op = r.op match { case ">" | "<" | ">=" | "<=" => r.op; case _ => "=" }
        s"($v) $op ${fmtD(r.value)}"
      }.mkString(" OR ")
      s"(($v) IS NOT NULL AND ($rules))"
    }

  def scoreForSql(c: PQCriteria, src: String => Source): String = {
    val outlier = c.metrics.map(m => outlierCondSql(m, src(m.name).sql)).mkString("(", " OR ", ")")
    val total = c.metrics.map(m => metricScoreSql(m, src(m.name).sql)).mkString("(", " + ", ")")
    // least/greatest mirrors the Column build (see scoreFor) — same value
    // as the former CASE chain, one reference to the total subtree
    val clamped = s"LEAST(100.0E0, GREATEST(0.0E0, $total))"
    s"(CASE WHEN $outlier THEN 0.0E0 ELSE ${graft.functions.SafeMath.roundHalfUpSql(clamped, 2)} END)"
  }

  def scoreAllSql(cfg: PQConfig, protocolSql: String, src: String => Source): String = {
    val branches = cfg.criteria.filterNot(_.protocol == "SPEED")
      .map(c => s"WHEN ($protocolSql) = '${c.protocol}' THEN ${scoreForSql(c, src)}")
      .mkString(" ")
    s"(CASE WHEN ($protocolSql) = 'SPEED' THEN 0.0E0 $branches ELSE 0.0E0 END)"
  }
}
