package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.NearestCentroid.nearest_centroid
import graft.expressions.ArrayDot.array_dot

/** NearestCentroid must be bit-identical to the literal-array argmin it
  * replaced — every kmeans/IVF/PQ gate hash depends on it — including
  * the ordering edge cases (ties to the lowest index, NaN sorts
  * greatest, -0.0 == 0.0) and the null contract (null array / wrong
  * length / null element → null), on BOTH float and double inputs. */
class NearestCentroidSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The replaced Column formulation, verbatim:
    * array_position(dists, array_min(dists)) - 1 over
    * array(-dot(v, c)/|c|). */
  private def literalForm(cents: IndexedSeq[Seq[Double]])(
      vec: org.apache.spark.sql.Column) = {
    def dists = array(cents.map { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      -array_dot(vec, array(c.map(lit): _*)) / lit(norm)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  test("matches the literal argmin on random float vectors") {
    val rnd = new scala.util.Random(11)
    val cents = IndexedSeq.fill(8)(Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    val rows = (1 to 300).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
        nearest_centroid(col("v"), cents).as("a"),
        literalForm(cents)(col("v")).as("b"))
      .collect()
    got.foreach(r => assert(r.getInt(1) === r.getInt(2), s"id=${r.getLong(0)}"))
  }

  test("matches on double vectors and duplicated centroids (tie to lowest)") {
    val rnd = new scala.util.Random(13)
    val c0 = Seq.fill(8)(rnd.nextDouble())
    // centroid 2 duplicates centroid 0 — distances tie EXACTLY; both
    // forms must pick index 0
    val cents = IndexedSeq(c0, Seq.fill(8)(rnd.nextDouble() - 2), c0)
    val df = (1 to 50).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble()))).toDF("id", "v")
    val got = df.select(
        nearest_centroid(col("v"), cents).as("a"),
        literalForm(cents)(col("v")).as("b"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // at least one row must actually land on the duplicated pair
    assert(got.exists(_.getInt(0) == 0))
    assert(!got.exists(_.getInt(0) == 2), "tie must go to the LOWEST index")
  }

  test("zero vector (-0.0 distances) and all-zero centroid ordering match") {
    // dot == 0 ⇒ dist = -0.0/norm = -0.0 for every centroid: the argmin
    // must still tie to index 0 in both forms (-0.0 == 0.0 in Spark's
    // double ordering)
    val cents = IndexedSeq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq((1L, Array(0.0, 0.0))).toDF("id", "v")
    val r = df.select(
      nearest_centroid(col("v"), cents).as("a"),
      literalForm(cents)(col("v")).as("b")).collect()(0)
    assert(r.getInt(0) === r.getInt(1))
    assert(r.getInt(0) === 0)
  }

  test("NaN distances sort greatest in both forms") {
    // a NaN element poisons the whole row to null in both forms (null
    // contract), so inject NaN via a centroid instead: NaN/|c| = NaN
    // distance for that centroid only — it must never win
    val nanCent = Seq(Double.NaN, 1.0)
    val cents = IndexedSeq(nanCent, Seq(1.0, 1.0))
    val df = Seq((1L, Array(0.5, 0.5))).toDF("id", "v")
    val r = df.select(
      nearest_centroid(col("v"), cents).as("a"),
      literalForm(cents)(col("v")).as("b")).collect()(0)
    assert(r.getInt(0) === r.getInt(1))
    assert(r.getInt(0) === 1, "the NaN-distance centroid must lose")
  }

  test("null contract: null array, wrong length, null element -> null") {
    val cents = IndexedSeq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val df = Seq(
        (1L, Array(1.0, 2.0)),          // fine
        (2L, Array(1.0, 2.0, 3.0)),     // wrong length
        (3L, null.asInstanceOf[Array[Double]])) // null array
      .toDF("id", "v")
      .unionByName(Seq(4L).toDF("id")
        .withColumn("v", array(lit(1.0), lit(null).cast("double"))))
    val got = df.select(col("id"),
        nearest_centroid(col("v"), cents).as("a"),
        literalForm(cents)(col("v")).as("b"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) ===
      Seq((1L, false), (2L, true), (3L, true), (4L, true)))
    got.foreach(t => assert(t._2 === t._3, s"null parity at id=${t._1}"))
  }

  test("interpreted eval matches codegen") {
    val rnd = new scala.util.Random(17)
    val cents = IndexedSeq.fill(4)(Seq.fill(8)(rnd.nextDouble()))
    val rows = (1 to 100).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat())))
    val df = rows.toDF("id", "v")
    val viaCodegen = df.select(col("id"),
      nearest_centroid(col("v"), cents).as("c")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expr = graft.expressions.NearestCentroid(
      org.apache.spark.sql.GraftColumnBridge.expression(col("v")), cents)
    rows.foreach { case (id, v) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(v.map(_.toDouble))
      // nullSafeEval takes the raw ArrayData; element type is double here
      val centsD = cents
      val interp = graft.expressions.NearestCentroid(
        org.apache.spark.sql.GraftColumnBridge.expression(
          lit(null).cast("array<double>")), centsD)
      assert(interp.nullSafeEval(arr) === viaCodegen(id))
    }
  }
}
