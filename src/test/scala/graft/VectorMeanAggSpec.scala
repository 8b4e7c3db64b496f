package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** VectorMeanAgg must reproduce the posexplode formulation's per-position
  * SUM/COUNT exactly — every Lloyd-trained centroid (kmeans, IVF, PQ)
  * rides on these means — including null-element denominators, the
  * long-overflow banking, and the serialize/merge path. */
class VectorMeanAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The replaced posexplode formulation, verbatim from lloydLoop. */
  private def generatorForm(df: org.apache.spark.sql.DataFrame,
      snap: Int): Map[(Int, Int), Double] =
    df.select(col("__cell"), posexplode(col("__v")).as(Seq("pos", "v")))
      .groupBy("__cell", "pos")
      .agg((sum(graft.functions.SafeMath.roundHalfUp(col("v"), snap)
          .cast(DecimalType(28, snap))).cast("double") / count(lit(1)))
        .as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

  private def aggForm(df: org.apache.spark.sql.DataFrame, dim: Int,
      snap: Int): Map[(Int, Int), Double] =
    df.groupBy("__cell")
      .agg(graft.expressions.VectorMeanAgg
        .vector_mean(col("__v"), dim, snap).as("__m"))
      .collect()
      .flatMap { r =>
        val m = r.getStruct(1)
        val sums = m.getSeq[java.math.BigDecimal](0)
        val counts = m.getSeq[Long](1)
        sums.indices.collect {
          case i if counts(i) > 0 =>
            (r.getInt(0), i) -> sums(i).doubleValue / counts(i).toDouble
        }
      }.toMap

  test("matches the posexplode means bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(47)
    val dim = 7
    val df = (1 to 400).map(i =>
        (i % 5, Array.fill(dim)(rnd.nextDouble() * 4 - 2)))
      .toDF("__cell", "__v").repartition(4)
    val a = aggForm(df, dim, snap = 10)
    val g = generatorForm(df, snap = 10)
    assert(a.keySet === g.keySet)
    g.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(a(k)) ===
        java.lang.Double.doubleToLongBits(v), s"mismatch at $k")
    }
  }

  test("null elements count in the denominator, not the numerator") {
    val dim = 2
    val rows = Seq(
      (0, Array[java.lang.Double](2.0, 4.0)),
      (0, Array[java.lang.Double](null, 8.0)), // pos 0: count yes, sum no
      (0, null.asInstanceOf[Array[java.lang.Double]])) // no contribution
    val df = rows.toDF("__cell", "__v")
      .select(col("__cell"), col("__v").cast("array<double>").as("__v"))
    val a = aggForm(df, dim, snap = 10)
    val g = generatorForm(df, snap = 10)
    assert(a === g)
    assert(a((0, 0)) === 1.0) // 2.0 / 2 rows
    assert(a((0, 1)) === 6.0) // (4 + 8) / 2
  }

  test("long-overflow banking keeps the mean exact past 2^63") {
    val dim = 1
    // p10 = 4e5·1e10 = 4e15 per row (inside the 2^52 per-value guard);
    // 3000 rows → 1.2e19 > Long.MaxValue, so the sum banks
    val df = (1 to 3000).map(_ => (0, Array(400000.0))).toDF("__cell", "__v")
      .repartition(3)
    val a = aggForm(df, dim, snap = 10)
    assert(a((0, 0)) === 400000.0)
  }

  test("per-value 2^52 oracle-round-trip bound throws loudly (advice r10)") {
    // |9e5 * 10^10| = 9e15 > 2^52: past the double round-trip the oracle
    // replays, the engines could silently disagree by an ulp — the
    // guard must fail the job instead
    val df = Seq((0, Array(900000.0))).toDF("__cell", "__v")
    val ex = intercept[org.apache.spark.SparkException] {
      aggForm(df, 1, snap = 10)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("2^52")))
  }

  test("serialize/deserialize round-trips sums, counts, and banked lanes") {
    val agg = graft.expressions.VectorMeanAgg(
      org.apache.spark.sql.GraftColumnBridge.expression(
        lit(null).cast("array<double>")), 3, 10)
    val buf = agg.createAggregationBuffer()
    buf.addLong(0, Long.MaxValue - 5)
    buf.addLong(0, 100L) // banks
    buf.counts(0) = 7
    buf.addLong(2, -9L)
    buf.counts(2) = 1
    val back = agg.deserialize(agg.serialize(buf))
    (0 until 3).foreach { k =>
      assert(back.total(k) === buf.total(k), s"sum k=$k")
      assert(back.counts(k) === buf.counts(k), s"count k=$k")
    }
  }
}
