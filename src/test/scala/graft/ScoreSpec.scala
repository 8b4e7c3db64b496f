package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.score._
import graft.score.ScoreEngine.Source

/** Golden + differential tests for the perceived-quality score compiler.
  *
  * A tiny scalar interpreter re-implements the reference semantics
  * (`ScoreHelper.java` / `PQMath.java`) directly in Scala; the Catalyst
  * expression must agree with it on a grid of inputs covering every band,
  * boundary inclusivity, outliers, nulls, out-of-band fallback and clamp.
  */
class ScoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ----- scalar reference interpreter (independent of ScoreEngine) -----
  private def inBand(b: Band, x: Double): Boolean = {
    val lo = b.min.forall(m => if (b.minInclusive) x >= m else x > m)
    val hi = b.max.forall(m => if (b.maxInclusive) x <= m else x < m)
    lo && hi
  }
  private def interp(m: PQMetric, b: Band, x: Double): Double = {
    val frac = m.direction match {
      case Direction.Up   => (b.maxVal - x) / (b.maxVal - b.minVal)
      case Direction.Down => (x - b.minVal) / (b.maxVal - b.minVal)
    }
    (b.lower + (b.upper - b.lower) * frac) * m.weight
  }
  private def metricScore(m: PQMetric, v: Option[Double]): Double = v match {
    case None => 0.0
    case Some(x) => m.bands.find(inBand(_, x)) match {
      case Some(b) => interp(m, b, x)
      case None    => m.bands.last.lower * m.weight
    }
  }
  private def isOutlier(m: PQMetric, v: Option[Double]): Boolean = v.exists { x =>
    m.outliers.exists { r =>
      r.op match {
        case ">"  => x > r.value
        case "<"  => x < r.value
        case ">=" => x >= r.value
        case "<=" => x <= r.value
        case _    => x == r.value
      }
    }
  }
  private def refScore(c: PQCriteria, vals: Map[String, Option[Double]]): Double = {
    if (c.metrics.exists(m => isOutlier(m, vals.getOrElse(m.name, None)))) 0.0
    else {
      val sum = c.metrics.map(m => metricScore(m, vals.getOrElse(m.name, None))).sum
      val clamped = if (sum > 100) 100.0 else if (sum < 0) 0.0 else sum
      math.floor(clamped * 100 + 0.5) / 100
    }
  }

  private def sparkScores(c: PQCriteria, rows: Seq[Map[String, Option[Double]]]): Seq[Double] = {
    val names = c.metrics.map(_.name).distinct
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("row_id",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
      names.map(n => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val data = rows.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(
        i +: names.map(n => r.getOrElse(n, None).map(Double.box).orNull))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList, 2), schema)
    df.select(col("row_id"),
        ScoreEngine.scoreFor(c, n => Source(col(n), n)).as("score"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
  }

  val ping: PQCriteria = PQDefaults.config.byProtocol("PING")

  test("golden PING vectors") {
    // rtt band (0,30], lost_rate band [0,0.01]
    val rows = Seq(
      Map("rtt" -> Some(20.0), "lost_rate" -> Some(0.005)),
      Map("rtt" -> Some(30.0), "lost_rate" -> Some(0.01)),   // boundary incl
      Map("rtt" -> Some(30.000001), "lost_rate" -> Some(0.01)), // next band
      Map("rtt" -> Some(5000.0), "lost_rate" -> Some(0.0)),  // rtt outlier >=5000
      Map("rtt" -> Some(0.0), "lost_rate" -> Some(0.5)),     // rtt outlier <=0
      Map("rtt" -> Some(100.0), "lost_rate" -> Some(100.0)), // lost outlier >=100
      Map("rtt" -> Some(2500.0), "lost_rate" -> Some(0.5)),  // (2000,+) band
      Map("rtt" -> None, "lost_rate" -> Some(0.05)),         // null metric skipped
      Map("rtt" -> Some(50.0), "lost_rate" -> Some(200.0)))  // outlier wins
    val got = sparkScores(ping, rows)
    val want = rows.map(refScore(ping, _))
    assert(got === want)
    // sanity anchors computed by hand:
    assert(want(3) === 0.0 && want(4) === 0.0 && want(5) === 0.0 && want(8) === 0.0)
    assert(want(0) === math.floor(((90 + 10 * ((30.0 - 20) / 30)) * 0.5 +
      (90 + 10 * ((0.01 - 0.005) / 0.01)) * 0.5) * 100 + 0.5) / 100)
  }

  test("out-of-band falls back to worst band lower*weight") {
    val flash = PQDefaults.config.byProtocol("FLASH")
    // pause_count -0.5: not an outlier (<=-1 / >=10 both miss), below every
    // band → last band (5,+) lower=0 → contributes 0*0.25
    val vals = Map("conn_cost" -> Some(50.0), "first_byte_cost" -> Some(100.0),
      "pause_count" -> Some(-0.5), "carlton_rate" -> Some(0.05),
      "avg_speed" -> Some(2000.0))
    assert(sparkScores(flash, Seq(vals)) === Seq(refScore(flash, vals)))
  }

  test("differential grid across all protocols") {
    val grid = Seq(-10.0, -1.0, -0.5, 0.0, 0.005, 0.01, 0.05, 0.5, 1.0, 5.0,
      25.0, 64.0, 100.0, 333.3, 512.0, 999.0, 2000.0, 4999.0, 5000.0, 1e7)
    for (c <- PQDefaults.config.criteria; if c.protocol != "SPEED") {
      val rows = grid.map(v => c.metrics.map(m => m.name -> Option(v)).toMap) ++
        grid.map(v => c.metrics.zipWithIndex
          .map { case (m, i) => m.name -> Option(v + i * 7.77) }.toMap)
      val got = sparkScores(c, rows)
      val want = rows.map(refScore(c, _))
      assert(got === want, s"protocol ${c.protocol}")
    }
  }

  test("scoreAll dispatch: SPEED and unknown protocols score 0") {
    import spark.implicits._
    val df = Seq(("SPEED", 50.0), ("NOPE", 50.0), ("PING", 20.0))
      .toDF("proto", "rtt")
    val src = (n: String) =>
      if (n == "rtt") Source(col("rtt"), "rtt")
      else Source(lit(null).cast("double"), "NULL")
    val got = df.select(
      ScoreEngine.scoreAll(PQDefaults.config, col("proto"), src).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got(0) === 0.0 && got(1) === 0.0 && got(2) > 0.0)
  }

  test("band parsing handles all interval syntaxes") {
    val b1 = Band.parse(100, 90, "(0,30]")
    assert(b1.min.contains(0.0) && !b1.minInclusive && b1.max.contains(30.0) && b1.maxInclusive)
    val b2 = Band.parse(100, 90, "[768,+)")
    assert(b2.min.contains(768.0) && b2.minInclusive && b2.max.isEmpty)
    val b3 = Band.parse(50, 0, "(+,4)")
    assert(b3.min.isEmpty && b3.max.contains(4.0) && !b3.maxInclusive)
  }

  test("XML loader round-trips the reference config format") {
    val xml = """<perceived_quality><criteria_set>
      <criteria id="1" protocol="PING" table="gw_ping">
        <metric name="rtt" direction="up" weight="0.5" unit="ms" outlier="&lt;=:0,&gt;=:5000">
          <score level="a" upper="100" lower="90">(0,30]</score>
          <score level="b" upper="90" lower="80">(30,100]</score>
          <score level="c" upper="80" lower="70">(100,500]</score>
          <score level="d" upper="70" lower="50">(500,2000]</score>
          <score level="e" upper="50" lower="0">(2000,+)</score>
        </metric>
        <metric name="lost_rate" direction="up" weight="0.5" outlier="&gt;=:100,&lt;=:-1">
          <score level="a" upper="100" lower="90">[0,0.01]</score>
          <score level="b" upper="90" lower="80">(0.01,0.1]</score>
          <score level="c" upper="80" lower="70">(0.1,0.3]</score>
          <score level="d" upper="70" lower="50">(0.3,0.7]</score>
          <score level="e" upper="50" lower="0">(0.7,100]</score>
        </metric>
      </criteria>
    </criteria_set></perceived_quality>"""
    val cfg = PQXml.loadString(xml)
    assert(cfg.byProtocol("PING") === ping.copy(id = cfg.byProtocol("PING").id))
  }
}
