package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions

/** Scratch profiling main (not part of the driver contract): times the
  * stages of the dedup pipeline separately to locate bottlenecks. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val d = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = d.unionByName(
      d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    time("corpus count")(corpus.count())
    val exploded = corpus.select(col("doc_id").as("doc"),
      explode(TextFunctions.shingles(col("text"), 3)).as("sh_str"))
    time("explode shingles")(exploded.count())
    val idx = exploded.select(col("doc"), xxhash64(col("sh_str")).as("sh")).distinct()
    time("idx distinct")(idx.count())
    time("idx distinct again")(idx.count())
    val co = idx.as("x").join(idx.as("y"), col("x.sh") === col("y.sh"))
      .filter(col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("co self-join")(co.count())
    val keys = exploded.select(col("doc"),
      (TextFunctions.md5Key60(col("sh_str")) % 2147483647L).as("key"))
    time("md5 keys")(keys.count())
    val sig = corpus.select(col("doc_id").as("doc"),
      graft.operators.Dedup.minhashSignature(col("text"), 16, 3).as("sig"))
    time("minhash signatures (array fold)")(sig.count())
    time("full jaccardPairs")(
      graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.8).count())
    time("full minhashLsh")(
      graft.operators.Dedup.minhashLsh(corpus, "doc_id", "text", 16, 4, 3, 0.8).count())
    spark.stop()
  }
}
