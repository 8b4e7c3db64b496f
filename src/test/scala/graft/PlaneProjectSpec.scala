package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.expressions.ArrayDot.array_dot

/** PlaneProject must be bit-identical to the array-of-rounded-dots
  * Column form it replaced (q241's gate hash rides on it): ArrayDot
  * folds, /divisor then LONG-floor rounding, and the null contract
  * (malformed row → array of nulls, never a null array). */
class PlaneProjectSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The replaced Column formulation, verbatim from randomProject. */
  private def chainForm(dim: Int, outDim: Int, seed: Int, scale: Int)(
      vec: Column): Column = {
    val comps = (0 until outDim).map { b =>
      val row = Similarity.plane(seed, b, dim)
      graft.functions.SafeMath.roundHalfUp(
        array_dot(vec, array(row.map(lit): _*)) / lit(outDim.toDouble), scale)
    }
    array(comps: _*)
  }

  test("matches the Column form on random float vectors") {
    val rnd = new scala.util.Random(71)
    val (dim, outDim) = (16, 8)
    val df = (1L to 200L).map(i =>
      i -> Array.fill(dim)(rnd.nextFloat() * 2 - 1)).toDF("id", "v")
    val got = df.select(col("id"),
        graft.expressions.PlaneProject.plane_project(col("v"),
          (0 until outDim).map(b => Similarity.plane(7, b, dim)),
          outDim.toDouble, 6).as("a"),
        chainForm(dim, outDim, 7, 6)(col("v")).as("b"))
      .collect()
    got.foreach { r =>
      val a = r.getSeq[Any](1)
      val b = r.getSeq[Any](2)
      assert(a.length === b.length)
      a.zip(b).zipWithIndex.foreach { case ((x, y), c) =>
        assert(java.lang.Double.doubleToLongBits(x.asInstanceOf[Double]) ===
          java.lang.Double.doubleToLongBits(y.asInstanceOf[Double]),
          s"id=${r.getLong(0)} comp=$c")
      }
    }
  }

  test("null contract: malformed rows give arrays of nulls (parity)") {
    val (dim, outDim) = (2, 4)
    val planes = (0 until outDim).map(b => Similarity.plane(7, b, dim))
    val df = Seq(
        (1L, Array(1.0f, 2.0f)),
        (2L, Array(1.0f, 2.0f, 3.0f)),
        (3L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
      .unionByName(Seq(4L).toDF("id")
        .withColumn("v", array(lit(1.0f), lit(null).cast("float"))))
    val got = df.select(col("id"),
        graft.expressions.PlaneProject.plane_project(col("v"), planes,
          outDim.toDouble, 6).as("a"),
        chainForm(dim, outDim, 7, 6)(col("v")).as("b"))
      .collect().sortBy(_.getLong(0))
    got.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), "output array is never null")
      val a = r.getSeq[Any](1)
      val b = r.getSeq[Any](2)
      assert(a === b, s"id=${r.getLong(0)}")
      if (r.getLong(0) >= 2L) assert(a.forall(_ == null), s"id=${r.getLong(0)}")
    }
  }

  test("interpreted eval matches codegen") {
    val rnd = new scala.util.Random(73)
    val (dim, outDim) = (8, 5)
    val planes = (0 until outDim).map(b => Similarity.plane(7, b, dim))
    val rows = (1L to 80L).map(i => i -> Array.fill(dim)(rnd.nextFloat()))
    val viaCodegen = rows.toDF("id", "v")
      .select(col("id"), graft.expressions.PlaneProject.plane_project(
        col("v"), planes, outDim.toDouble, 6).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, v) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(v.map(_.toDouble))
      val bound = graft.expressions.PlaneProject(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true),
        planes, outDim.toDouble, 6)
      val got = bound.eval(org.apache.spark.sql.catalyst.InternalRow(arr))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      got.zip(viaCodegen(id)).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ===
          java.lang.Double.doubleToLongBits(y), s"id=$id")
      }
    }
  }
}
