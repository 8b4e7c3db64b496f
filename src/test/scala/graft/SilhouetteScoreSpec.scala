package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.ArrayDot.array_dot
import graft.expressions.NearestCentroid.nearest_centroid
import graft.expressions.SilhouetteScore.silhouette_score

/** SilhouetteScore must be bit-identical to the Column formulation it
  * replaced (q309's gate hash rides on it): cosine-argmin assignment,
  * Euclidean a/b via sqrt(max((v·v − 2·v·c) + c·c, 0)), LONG-floor
  * rounding at scale 8, zero-max guard, and the null contract. */
class SilhouetteScoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The replaced Column formulation, verbatim from the pre-fusion
    * operator (CaseWhen chains over literal-array dots). */
  private def columnForm(cents: IndexedSeq[Seq[Double]])(v: Column): Column = {
    def dotLit(c: Seq[Double]) = array_dot(v, array(c.map(lit): _*))
    val assigned = nearest_centroid(v, cents)
    val vv = array_dot(v, v)
    val dists = cents.map { c =>
      val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
      sqrt(greatest(vv - (lit(2.0) * dotLit(c)) + lit(cc), lit(0.0)))
    }
    val a = dists.init.zipWithIndex
      .foldRight(dists.last: Column) { case ((d, j), rest) =>
        when(assigned === j, d).otherwise(rest)
      }
    val b = least(dists.zipWithIndex.map { case (d, j) =>
      when(assigned === j, lit(Double.MaxValue)).otherwise(d)
    }: _*)
    val g = greatest(a, b)
    when(g === 0.0, lit(0.0))
      .otherwise(graft.functions.SafeMath.roundHalfUp((b - a) / g, 8))
  }

  test("matches the Column form on random float vectors") {
    val rnd = new scala.util.Random(41)
    val cents = IndexedSeq.fill(5)(Seq.fill(12)(rnd.nextDouble() * 2 - 1))
    val df = (1L to 300L).map(i =>
      i -> Array.fill(12)(rnd.nextFloat() * 2 - 1)).toDF("id", "v")
    val got = df.select(col("id"),
        silhouette_score(col("v"), cents).as("a"),
        columnForm(cents)(col("v")).as("b"))
      .collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
      s"id=${r.getLong(0)}: fused=${r.getDouble(1)} col=${r.getDouble(2)}"))
  }

  test("point ON a centroid: a = 0, s = 1; duplicate centroids: s = 0") {
    val c0 = Seq(1.0, 0.0)
    val cents = IndexedSeq(c0, Seq(0.0, 1.0))
    val r = Seq(1L -> Array(1.0f, 0.0f)).toDF("id", "v")
      .select(silhouette_score(col("v"), cents).as("s")).collect()(0)
    assert(r.getDouble(0) === 1.0)
    // both centroids identical: a = b everywhere ⇒ s = 0 (not NaN/error)
    val dup = IndexedSeq(c0, c0)
    val r2 = Seq(1L -> Array(1.0f, 0.0f)).toDF("id", "v")
      .select(silhouette_score(col("v"), dup).as("s")).collect()(0)
    assert(r2.getDouble(0) === 0.0)
  }

  test("null contract and column-form parity on degenerate rows") {
    val cents = IndexedSeq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val df = Seq(
        (1L, Array(1.0f, 2.0f)),
        (2L, Array(1.0f, 2.0f, 3.0f)),
        (3L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
      .unionByName(Seq(4L).toDF("id")
        .withColumn("v", array(lit(1.0f), lit(null).cast("float"))))
    val got = df.select(col("id"),
        silhouette_score(col("v"), cents).as("a"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).sortBy(_._1)
    assert(got === Seq((1L, false), (2L, true), (3L, true), (4L, true)))
  }

  test("interpreted eval matches codegen") {
    val rnd = new scala.util.Random(43)
    val cents = IndexedSeq.fill(4)(Seq.fill(8)(rnd.nextDouble()))
    val rows = (1L to 100L).map(i => i -> Array.fill(8)(rnd.nextFloat()))
    val viaCodegen = rows.toDF("id", "v")
      .select(col("id"), silhouette_score(col("v"), cents).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val interp = graft.expressions.SilhouetteScore(
      org.apache.spark.sql.GraftColumnBridge.expression(
        lit(null).cast("array<double>")), cents)
    rows.foreach { case (id, v) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(v.map(_.toDouble))
      val got = interp.nullSafeEval(arr).asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(viaCodegen(id)), s"id=$id")
    }
  }
}
