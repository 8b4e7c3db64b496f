package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.CharEntropy.char_entropy
import graft.functions.SafeMath

/** CharEntropy must be bit-identical to the HOF formulation it replaced —
  * the q125 gate hash depends on it — across ASCII, CJK, punctuation,
  * empty and single-char inputs, in BOTH evaluation modes. */
class CharEntropySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The exact pre-round-6 HOF chain, kept as the reference semantics. */
  private def hofEntropy(text: org.apache.spark.sql.Column,
      scale: Int = 6): org.apache.spark.sql.Column = {
    import graft.functions.TextFunctions.bindOnce
    val chars = when(length(text) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text)),
        i => text.substr(i, lit(1))))
    bindOnce(chars) { ch =>
      bindOnce(size(ch).cast("double")) { n =>
        val folded = aggregate(array_sort(array_distinct(ch)), lit(0.0),
          (acc, c) => acc + bindOnce(
              size(filter(ch, x => x === c)).cast("double") / n) { p =>
            p * SafeMath.roundHalfUp(log(p), 8)
          })
        SafeMath.roundHalfUp(-folded, scale)
      }
    }
  }

  test("char_entropy equals the HOF fold bit-for-bit on varied text") {
    val rnd = new scala.util.Random(11)
    val alphabets = Seq(
      "abcdefgh", "aab", "的一是不了人我在有他这中大来上",
      " \t\n.,;!?", "0123456789abcdefABCDEF+/=")
    val rows = (1 to 120).map { i =>
      val alpha = alphabets(i % alphabets.size)
      val len = rnd.nextInt(200)
      (i.toLong, (0 until len).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString)
    } ++ Seq((1000L, ""), (1001L, "x"), (1002L, "aaaa"), (1003L, null))
    val df = rows.toDF("id", "text")
    val got = df.select(col("id"),
        char_entropy(col("text"), 6).as("e"),
        hofEntropy(col("text")).as("h"))
      .withColumn("eq", col("e") === col("h") ||
        (col("e").isNull && col("h").isNull))
    assert(got.filter(!col("eq")).count() === 0)
    assert(got.filter(col("e") > 0.5).count() > 50, "entropies all degenerate")
  }

  test("codegen path compiles and matches interpreted eval") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val texts = Seq("hello world", "αβγαβγ", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    def values(): Seq[Double] =
      df.select(col("id"), char_entropy(col("text"), 6)).orderBy(col("id"))
        .collect().map(_.getDouble(1)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = try values() finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try values() finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(gen === interp)
    assert(gen(2) === 0.0, "empty text must score 0.0")
  }
}
