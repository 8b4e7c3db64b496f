package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Int8QueryCosine must be bit-identical to the Column composition it
  * fuses — `dequantCosine(quantizeInt8(v), q)` — on every value q58's
  * gate hash can see, including the degenerate scales (all-zero vector
  * ⇒ scale 0 ⇒ cosine NaN both ways... which rounds to NaN) and the
  * null contract (null array / wrong length / null element → null),
  * on BOTH float and double inputs, plus interpreted-vs-codegen parity.
  */
class Int8QueryCosineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The split Column composition, verbatim from q58's pre-fusion gate. */
  private def splitForm(query: Seq[Double])(vec: org.apache.spark.sql.Column) =
    Curation.dequantCosine(Curation.quantizeInt8(vec), query)

  private def assertParity(rows: Seq[(Long, Array[Float])],
      query: Seq[Double]): Unit = {
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
        Curation.int8QueryCosine(col("v"), query).as("a"),
        splitForm(query)(col("v")).as("b"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null parity id=${r.getLong(0)}")
      if (!r.isNullAt(1)) {
        val (a, b) = (r.getDouble(1), r.getDouble(2))
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"id=${r.getLong(0)}: fused=$a split=$b")
      }
    }
  }

  test("matches the split form on random float vectors") {
    val rnd = new scala.util.Random(23)
    val query = Seq.fill(16)(rnd.nextDouble() * 2 - 1)
    val rows = (1L to 300L).map(i =>
      i -> Array.fill(16)(rnd.nextFloat() * 2 - 1))
    assertParity(rows, query)
  }

  test("matches on double vectors") {
    val rnd = new scala.util.Random(29)
    val query = Seq.fill(8)(rnd.nextDouble())
    val df = (1L to 100L).map(i =>
        i -> Array.fill(8)(rnd.nextDouble() * 4 - 2)).toDF("id", "v")
    val got = df.select(
        Curation.int8QueryCosine(col("v"), query).as("a"),
        splitForm(query)(col("v")).as("b"))
      .collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("degenerate scales: all-zero vector, single huge component, NaN") {
    val query = Seq(1.0, 2.0, 3.0)
    val rows = Seq(
      1L -> Array(0.0f, 0.0f, 0.0f),              // maxAbs 0 ⇒ scale 0
      2L -> Array(1e30f, 0.0f, 0.0f),             // extreme scale
      3L -> Array(1e-30f, -1e-30f, 1e-30f),       // tiny maxAbs
      4L -> Array(Float.NaN, 1.0f, 2.0f),         // NaN poisons via maxAbs
      5L -> Array(-1.5f, 1.5f, -0.0f))            // negative maxAbs source
    // the split form's zero-denominator division RAISES under ANSI
    // (Spark 4 default); its defined value surface is non-ANSI, where
    // Spark's division-by-zero yields NULL — the fused form implements
    // exactly that (null), so compare under non-ANSI
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try assertParity(rows, query)
    finally spark.conf.unset("spark.sql.ansi.enabled")
    // and the all-zero row must be NULL (never NaN-sorts-first garbage)
    val z = Seq(1L -> Array(0.0f, 0.0f, 0.0f)).toDF("id", "v")
      .select(Curation.int8QueryCosine(col("v"), query).as("a")).collect()(0)
    assert(z.isNullAt(0))
  }

  test("null contract: null array, wrong length, null element -> null") {
    val query = Seq(1.0, 2.0)
    val df = Seq(
        (1L, Array(1.0f, 2.0f)),
        (2L, Array(1.0f, 2.0f, 3.0f)),
        (3L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
      .unionByName(Seq(4L).toDF("id")
        .withColumn("v", array(lit(1.0f), lit(null).cast("float"))))
    val got = df.select(col("id"),
        Curation.int8QueryCosine(col("v"), query).as("a"),
        splitForm(query)(col("v")).as("b"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) ===
      Seq((1L, false), (2L, true), (3L, true), (4L, true)))
    got.foreach(t => assert(t._2 === t._3, s"null parity at id=${t._1}"))
  }

  test("interpreted eval matches codegen") {
    val rnd = new scala.util.Random(31)
    val query = Seq.fill(8)(rnd.nextDouble())
    val rows = (1L to 100L).map(i => i -> Array.fill(8)(rnd.nextFloat()))
    val viaCodegen = rows.toDF("id", "v")
      .select(col("id"), Curation.int8QueryCosine(col("v"), query).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val interp = graft.expressions.Int8QueryCosine(
      org.apache.spark.sql.GraftColumnBridge.expression(
        lit(null).cast("array<double>")), query, 6)
    rows.foreach { case (id, v) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(v.map(_.toDouble))
      val got = interp.nullSafeEval(arr).asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(viaCodegen(id)), s"id=$id")
    }
  }
}
