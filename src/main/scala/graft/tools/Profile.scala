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
    // stages of the CURRENT jaccardPairs formulation
    val idx = corpus.select(col("doc_id").as("doc"),
        explode(array_distinct(TextFunctions.shingles(col("text"), 3))).as("sh_str"))
      .select(col("doc"), xxhash64(col("sh_str")).as("sh"))
    time("index explode (array_distinct)")(idx.count())
    val byShingle = idx.groupBy("sh").agg(collect_list("doc").as("docs"))
      .filter(size(col("docs")) <= 100)
    val cached = byShingle.persist()
    time("byShingle group+cache")(cached.count())
    val sizes = cached.select(explode(col("docs")).as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("n_sh"))
    time("sizes")(sizes.count())
    val co = cached.filter(size(col("docs")) >= 2)
      .select(explode(flatten(transform(col("docs"), a =>
        transform(filter(col("docs"), b => b > a),
          b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("pair gen + count")(co.count())
    cached.unpersist()
    time("full jaccardPairs")(
      graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.8).count())
    time("full minhashLsh")(
      graft.operators.Dedup.minhashLsh(corpus, "doc_id", "text", 16, 4, 3, 0.8).count())
    time("full clusterAssignments")(
      graft.operators.Dedup.clusterAssignments(
        graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.8)).count())
    spark.stop()
  }
}
