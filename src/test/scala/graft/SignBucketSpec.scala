package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.expressions.ArrayDot.array_dot

/** SignBucket must be bit-identical to the when/shiftleft Column chain
  * it replaced — every sign-LSH blocking key in the dedup/ANN family
  * rides on it — including the unusual null contract (null dots fall to
  * an UNSET bit: null array / wrong length / null element → bucket 0,
  * never null), NaN poisoning, the >= 0 boundary, and parity with the
  * driver-side lshBucketLocal. */
class SignBucketSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The replaced Column chain, verbatim. */
  private def chainForm(dim: Int, bits: Int, seed: Int)(vec: Column): Column = {
    def dotLit(q: Seq[Double]) = array_dot(vec, array(q.map(lit): _*))
    (0 until bits).map { b =>
      when(dotLit(Similarity.plane(seed, b, dim)) >= 0, shiftleft(lit(1L), b))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  test("matches the Column chain on random float vectors across widths") {
    val rnd = new scala.util.Random(59)
    for (bits <- Seq(1, 6, 12)) {
      val dim = 16
      val df = (1L to 200L).map(i =>
        i -> Array.fill(dim)(rnd.nextFloat() * 2 - 1)).toDF("id", "v")
      val got = df.select(col("id"),
          Similarity.lshBucket(col("v"), dim, bits).as("a"),
          chainForm(dim, bits, 42)(col("v")).as("b"))
        .collect()
      got.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"bits=$bits id=${r.getLong(0)}"))
      // buckets actually spread (not all zero)
      assert(got.map(_.getLong(1)).distinct.length > 1)
    }
  }

  test("matches lshBucketLocal for a known vector") {
    val rnd = new scala.util.Random(61)
    val q = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val viaExpr = Seq(Tuple1(q.map(_.toFloat).toArray)).toDF("v")
      .select(Similarity.lshBucket(
        col("v").cast("array<double>"), 8, 10).as("b"))
      .collect()(0).getLong(0)
    // lshBucketLocal folds doubles; cast the floats back the same way
    val viaLocal = Similarity.lshBucketLocal(
      q.map(_.toFloat.toDouble), bits = 10)
    assert(viaExpr === viaLocal)
  }

  test("null contract: null array, wrong length, null element, NaN -> bucket 0") {
    val dim = 2
    val df = Seq(
        (1L, Array(0.5f, 0.5f)),                  // real bucket
        (2L, Array(1.0f, 2.0f, 3.0f)),            // wrong length
        (3L, null.asInstanceOf[Array[Float]]),    // null array
        (5L, Array(Float.NaN, 1.0f)))             // NaN element
      .toDF("id", "v")
      .unionByName(Seq(4L).toDF("id")
        .withColumn("v", array(lit(1.0f), lit(null).cast("float"))))
    val got = df.select(col("id"),
        Similarity.lshBucket(col("v"), dim, 6).as("a"),
        chainForm(dim, 6, 42)(col("v")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    got.foreach { case (id, a, b) => assert(a === b, s"id=$id") }
    // null-dot rows land in bucket 0, never null; the NaN row lands in
    // the all-ones bucket (Spark's >= is NaN-greatest, NaN >= 0 is TRUE)
    got.filter(t => t._1 >= 2L && t._1 <= 4L).foreach { case (id, a, _) =>
      assert(a === 0L, s"id=$id must land in bucket 0")
    }
    assert(got.find(_._1 == 5L).get._2 === 63L)
  }

  test("dot exactly 0.0 sets the bit (>= boundary) in both forms") {
    // v orthogonal to plane 0's restriction? Simpler: a zero vector has
    // dot 0.0 with EVERY plane -> all bits set in both forms
    val dim = 4
    val bits = 5
    val r = Seq(Tuple1(Array.fill(dim)(0.0f))).toDF("v")
      .select(Similarity.lshBucket(col("v"), dim, bits).as("a"),
        chainForm(dim, bits, 42)(col("v")).as("b"))
      .collect()(0)
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) === (1L << bits) - 1)
  }

  test("interpreted eval matches codegen") {
    val rnd = new scala.util.Random(67)
    val dim = 8
    val planes = (0 until 7).map(b => Similarity.plane(42, b, dim))
    val rows = (1L to 100L).map(i => i -> Array.fill(dim)(rnd.nextFloat()))
    val viaCodegen = rows.toDF("id", "v")
      .select(col("id"),
        graft.expressions.SignBucket.sign_bucket(col("v"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val interp = graft.expressions.SignBucket(
      org.apache.spark.sql.GraftColumnBridge.expression(
        lit(null).cast("array<double>")), planes)
    rows.foreach { case (id, v) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(v.map(_.toDouble))
      val row = org.apache.spark.sql.catalyst.InternalRow(arr)
      // eval reads the child expression; bind a direct input reference
      val bound = graft.expressions.SignBucket(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true), planes)
      assert(bound.eval(row) === viaCodegen(id), s"id=$id")
    }
    // and a null input through the bound form -> 0L
    val boundNull = graft.expressions.SignBucket(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true), planes)
    assert(boundNull.eval(
      org.apache.spark.sql.catalyst.InternalRow(null)) === 0L)
    assert(interp != null)
  }
}
