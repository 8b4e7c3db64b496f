package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.SimhashVotes.simhash_votes

/** SimhashVotes must be bit-identical to the HOF fold it replaced — the
  * q32 gate hash depends on it — including the null-key quirk. */
class SimhashVotesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val Bits = 60

  /** The exact pre-round-6 HOF chain, kept as the reference semantics. */
  private def hofVotes(keys: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val votes = aggregate(keys, array_repeat(lit(0L), Bits),
      (acc, h) => zip_with(acc,
        array((0 until Bits).map(j =>
          when(h.bitwiseAND(lit(1L << j)) =!= 0, lit(1L)).otherwise(lit(-1L))): _*),
        (a, b) => a + b))
    aggregate(
      zip_with(votes, array((0 until Bits).map(j => lit(1L << j)): _*),
        (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  test("simhash_votes equals the HOF fold on random key arrays") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(
        java.lang.Long.valueOf(rnd.nextLong() & ((1L << Bits) - 1))))
    } ++ Seq(
      (500L, Seq.empty[java.lang.Long]),
      (501L, Seq[java.lang.Long](null, 7L)), // null key votes -1 everywhere
      (502L, null))
    val df = rows.toDF("id", "keys")
    val got = df.select(col("id"),
        simhash_votes(col("keys"), Bits).as("s"),
        hofVotes(col("keys")).as("h"))
      .withColumn("eq", col("s") === col("h") ||
        (col("s").isNull && col("h").isNull))
    assert(got.filter(!col("eq")).count() === 0)
    assert(got.filter(col("s") =!= 0L).count() > 100, "all fingerprints zero")
  }
}
