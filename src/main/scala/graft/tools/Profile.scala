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

    if (args.contains("kmeans")) {
      import org.apache.spark.sql.types.DecimalType
      import graft.operators.Similarity
      val emb = Tables.load(spark, sfDir, "embeddings")
      time("emb count")(emb.count())
      val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("__v")).cache()
      val cents0 = time("init collect")(e.orderBy(col("vec_id")).limit(8)
        .select(col("__v")).collect().toIndexedSeq
        .map(_.getSeq[Double](0).toSeq))
      def nearestCol(cents: IndexedSeq[Seq[Double]]) = {
        val dists = array(cents.map(c =>
          -Similarity.dotLit(col("__v"), c) / lit(Similarity.normLit(c))): _*)
        graft.functions.TextFunctions.bindOnce(dists) { dd =>
          (array_position(dd, array_min(dd)) - 1).cast("int")
        }
      }
      val byCell = time("mean recompute")(e
        .select(nearestCol(cents0).as("__cell"), col("__v"))
        .select(col("__cell"), posexplode(col("__v")).as(Seq("pos", "v")))
        .groupBy("__cell", "pos")
        .agg((sum(graft.functions.SafeMath.roundHalfUp(col("v"), 10)
            .cast(DecimalType(28, 10))).cast("double") / count(lit(1)))
          .as("m"))
        .collect())
      val cents1 = (0 until 8).map(i =>
        byCell.groupBy(_.getInt(0)).map { case (c, rs) =>
          c -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }.getOrElse(i, cents0(i)))
      time("final assignment count")(
        e.select(col("vec_id"), nearestCol(cents1).as("cluster")).count())
      time("full kmeans")(Similarity.kmeans(
        emb, "vec_id", "embedding", k = 8, iters = 2).count())
      spark.stop()
      return
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
