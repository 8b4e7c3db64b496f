package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.MinhashSig.minhash_sig

/** MinhashSig must be bit-identical to the HOF fold it replaced — the
  * q31 gate hash depends on it (signatures feed the band-hash join
  * keys) — including empty-array and null-element contracts. */
class MinhashSigSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val N = 16
  private val P = 2147483647L

  /** The exact pre-round-6 HOF chain, kept as the reference semantics. */
  private def hofSig(keys: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(keys, array_repeat(lit(Long.MaxValue), N), (acc, h) =>
      zip_with(acc,
        array((0 until N).map(i =>
          (h * graft.operators.Dedup.mhA(i) +
            graft.operators.Dedup.mhB(i)) % P): _*),
        (a, b) => least(a, b)))

  test("minhash_sig equals the HOF fold on random key arrays") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(60))(
        java.lang.Long.valueOf((rnd.nextLong() & 0x7fffffffL) % P)))
    } ++ Seq(
      (500L, Seq.empty[java.lang.Long]),      // empty → all-MaxValue init
      (501L, Seq[java.lang.Long](null, 42L)), // null key leaves acc alone
      (502L, null))
    val df = rows.toDF("id", "keys")
    val got = df.select(col("id"),
        minhash_sig(col("keys"), N).as("s"),
        hofSig(col("keys")).as("h"))
      .withColumn("eq", col("s") === col("h") ||
        (col("s").isNull && col("h").isNull))
    assert(got.filter(!col("eq")).count() === 0)
    val nonTrivial = got.filter(col("id") < 500L &&
      !array_contains(col("s"), Long.MaxValue))
    assert(nonTrivial.count() > 100, "signatures all degenerate")
  }

  test("gate corpora keep every band bucket under the hot-bucket cap") {
    // the hot-band-bucket cap (maxBandBucket=2000) is NOT modeled in the
    // q31/q215/q218 oracle SQL: a gate bucket ever exceeding it would
    // drop candidate pairs the uncapped oracle keeps — an opaque hash
    // mismatch. Assert headroom at the smoke and correctness SFs so a
    // data/parameter change fails HERE with a readable message instead.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        val c = graft.queries.DedupQueries.corpus(spark, dir)
        val mx = graft.operators.Dedup.maxBandBucketSize(
          c, "doc_id", "text", numHashes = 16, bands = 4, k = 3)
        assert(mx <= 2000L,
          s"$sf: largest (band, bh) bucket holds $mx rows — over the " +
            "q31/q215/q218 hot-bucket cap; the capped Spark plan now " +
            "DIVERGES from the uncapped oracle SQL")
      }
    }
  }
}
