package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.WordShingles.word_shingles

/** WordShingles must be bit-identical to the HOF formulation it replaced
  * (`transform(sequence(0, size(t)-k), i => concat_ws(" ", slice(t, i+1,
  * k)))` over `filter(split(text, "\\s+"), _ != "")`) — the dedup-family
  * gate hashes depend on it — in both evaluation modes. */
class WordShinglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def hofShingles(text: org.apache.spark.sql.Column, k: Int) = {
    val t = filter(split(text, "\\s+"), x => x =!= "")
    when(size(t) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + lit(1), lit(k)))))
  }

  private val tricky = Seq(
    "a b c d e",
    "  leading and   multiple   spaces  ",
    "tabs\tand\nnewlines\rand\fformfeeds",
    "one",
    "two words",
    "",
    "   ",
    "unicode héllo wörld ütf8 ✓ emoji 🎉 end",
    "a a a a a",
    "punct, marks! stay? (attached) to-tokens",
  )

  test("word_shingles equals the HOF chain bit-for-bit, k = 1, 2, 3, 5") {
    val df = tricky.zipWithIndex.map(_.swap).toDF("id", "text")
    Seq(1, 2, 3, 5).foreach { k =>
      val got = df.select(col("id"),
          word_shingles(col("text"), k).as("w"),
          hofShingles(col("text"), k).as("h"))
        .filter(!(col("w") === col("h")))
      assert(got.count() === 0, s"k=$k mismatch")
    }
  }

  test("random corpora match the HOF chain, including on real documents") {
    val rnd = new scala.util.Random(11)
    val words = Vector("lorem", "ipsum", "x", "Data", "42", "a,b", "‰", "end.")
    val rows = (1 to 500).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ =>
        words(rnd.nextInt(words.size))).mkString(
          if (rnd.nextBoolean()) " " else "  "))
    }
    val df = rows.toDF("id", "text")
    val got = df.select(
        word_shingles(col("text"), 3).as("w"),
        hofShingles(col("text"), 3).as("h"))
      .filter(!(col("w") === col("h")))
    assert(got.count() === 0)
  }

  test("null text yields null; codegen path compiles (CODEGEN_ONLY)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((1L, "a b c d"), (2L, null)).toDF("id", "text")
      val out = df.select(col("id"), word_shingles(col("text"), 3).as("w"))
        .orderBy("id").collect()
      assert(out(0).getSeq[String](1) === Seq("a b c", "b c d"))
      assert(out(1).isNullAt(1))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
