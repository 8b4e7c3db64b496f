package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** MomentSumAgg must produce the EXACT sums of the generator formulation
  * it replaced (explode i ≤ j → floor(v_i·v_j·10^snap + 0.5) → DECIMAL
  * sum) — every pc1 gate hash rides on these integers — including the
  * long-overflow banking path, the null-element contract, and the
  * cross-partition merge. */
class MomentSumAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The replaced generator formulation, verbatim. */
  private def generatorForm(df: org.apache.spark.sql.DataFrame, dim: Int,
      snap: Int): Map[(Int, Int), java.math.BigDecimal] = {
    val p = math.pow(10, snap)
    df.select(col("__v"), explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .select(col("__v"), col("i"),
        explode(sequence(col("i"), lit(dim - 1))).as("j"))
      .select(col("i"), col("j"),
        floor(element_at(col("__v"), col("i") + 1) *
          element_at(col("__v"), col("j") + 1) * lit(p) + lit(0.5))
          .cast("long").cast(DecimalType(38, 0)).as("p9"))
      .groupBy("i", "j").agg(sum(col("p9")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
  }

  private def aggForm(df: org.apache.spark.sql.DataFrame, dim: Int,
      snap: Int): Map[(Int, Int), java.math.BigDecimal] = {
    val pairs = (for { i <- 0 until dim; j <- i until dim } yield (i, j))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
    df.agg(graft.expressions.MomentSumAgg.moment_sums(col("__v"), dim, snap)
        .as("__s"))
      .select(posexplode(col("__s")).as(Seq("__k", "s")))
      .join(broadcast(pairs.toDF("__k", "i", "j")), Seq("__k"))
      .select("i", "j", "s")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
  }

  test("matches the generator sums exactly on random vectors") {
    val rnd = new scala.util.Random(37)
    val dim = 6
    val df = (1 to 500).map(_ => Tuple1(Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
      .toDF("__v").repartition(4)
    val a = aggForm(df, dim, snap = 9)
    val g = generatorForm(df, dim, snap = 9)
    assert(a.size === dim * (dim + 1) / 2)
    g.foreach { case (k, v) =>
      assert(a(k).compareTo(v) === 0, s"mismatch at $k: agg=${a(k)} gen=$v")
    }
  }

  test("long-overflow banking: totals beyond 2^63 stay exact") {
    val dim = 2
    // per-row p9 = floor(3e3·3e3·1e9 + 0.5) = 9e15; 2000 rows → 1.8e19,
    // past Long.MaxValue (~9.22e18) — the long lane must bank into
    // BigInteger and the total must be the exact product
    val df = (1 to 2000).map(_ => Tuple1(Array(3000.0, 0.0))).toDF("__v")
      .repartition(3)
    val a = aggForm(df, dim, snap = 9)
    assert(a((0, 0)) ===
      new java.math.BigDecimal(new java.math.BigInteger("9000000000000000")
        .multiply(java.math.BigInteger.valueOf(2000))))
    assert(a((0, 1)).compareTo(java.math.BigDecimal.ZERO) === 0)
    assert(a((1, 1)).compareTo(java.math.BigDecimal.ZERO) === 0)
  }

  test("null rows, short rows, and null elements follow the row contract") {
    val dim = 3
    val rows = Seq(
      Tuple1(Array[java.lang.Double](1.0, 2.0, 3.0)),
      Tuple1(null.asInstanceOf[Array[java.lang.Double]]),     // null row
      Tuple1(Array[java.lang.Double](1.0, 2.0)),               // short: in-range pairs
      Tuple1(Array[java.lang.Double](1.0, null, 2.0)))         // null element
    val df = rows.toDF("__v").select(col("__v").cast("array<double>").as("__v"))
    val a = aggForm(df, dim, snap = 9)
    // row 1 full; row 3 contributes its in-range pairs (the non-ANSI
    // generator's out-of-range element_at was a skipped null product);
    // row 4 contributes only pairs not touching the null element
    def bd(x: Long) = java.math.BigDecimal.valueOf(x)
    assert(a((0, 0)).compareTo(bd(3000000000L)) === 0)   // 1 + 1 + 1
    assert(a((0, 1)).compareTo(bd(4000000000L)) === 0)   // 2 + 2
    assert(a((0, 2)).compareTo(bd(5000000000L)) === 0)   // 3 + 2
    assert(a((1, 1)).compareTo(bd(8000000000L)) === 0)   // 4 + 4
    assert(a((1, 2)).compareTo(bd(6000000000L)) === 0)   // 6 (row1 only)
    assert(a((2, 2)).compareTo(bd(13000000000L)) === 0)  // 9 + 4
  }

  test("arrays longer than dim contribute their top-left block (matches generator)") {
    val rnd = new scala.util.Random(53)
    val dim = 3 // over 5-wide vectors: element_at stays in range both ways
    val df = (1 to 100).map(_ => Tuple1(Array.fill(5)(rnd.nextDouble() * 2 - 1)))
      .toDF("__v").repartition(2)
    val a = aggForm(df, dim, snap = 9)
    val g = generatorForm(df, dim, snap = 9)
    assert(a.keySet === g.keySet)
    g.foreach { case (k, v) => assert(a(k).compareTo(v) === 0, s"at $k") }
  }

  test("serialize/deserialize round-trips the banked buffer") {
    val agg = graft.expressions.MomentSumAgg(
      org.apache.spark.sql.GraftColumnBridge.expression(
        lit(null).cast("array<double>")), 2, 9)
    val buf = agg.createAggregationBuffer()
    buf.addLong(0, Long.MaxValue - 5)
    buf.addLong(0, 100L) // overflows → banks
    buf.addLong(2, -7L)
    val back = agg.deserialize(agg.serialize(buf))
    (0 until 3).foreach(k => assert(back.total(k) === buf.total(k), s"k=$k"))
    assert(back.total(0) ===
      java.math.BigInteger.valueOf(Long.MaxValue - 5)
        .add(java.math.BigInteger.valueOf(100L)))
  }
}
