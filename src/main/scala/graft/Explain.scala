package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Plan-book generator: writes the formatted physical plan of the given
  * query names (default: the `bench = true` headline set) to a markdown
  * file, so scan pushdown (`PushedFilters`, `ReadSchema`), broadcast
  * joins, partial aggregation, and exchange reuse can be reviewed per
  * query. Writing the file directly (instead of scraping sbt stdout)
  * keeps log noise out of the book by construction.
  *
  * Gated dedup queries end in `localCheckpoint`, whose executed plan is
  * just `Scan ExistingRDD` — for those, the book prints the
  * PRE-checkpoint lazy plan through the operators' plan seams
  * ([[operators.Dedup.jaccardPairsPlan]], [[operators.Dedup.minhashLshParts]],
  * [[operators.Dedup.ccRound]]) so the real join trees are visible.
  *
  * Usage: runMain graft.Explain [sfDir] [outFile] [name ...]
  */
object Explain {

  /** Pre-checkpoint plan producers for the checkpoint-terminated gates.
    * Persisted intermediates leak for the process lifetime — fine for a
    * one-shot book build. */
  private def seams(sfDir: String): Map[String, SparkSession => DataFrame] =
    Map(
      "q30_jaccard_pairs" -> { s =>
        graft.operators.Dedup.jaccardPairsPlan(
          graft.queries.DedupQueries.corpus(s, sfDir), "doc_id", "text",
          k = 3, threshold = 0.8)._1
      },
      "q31_minhash_lsh" -> { s =>
        graft.operators.Dedup.minhashLshParts(
          graft.queries.DedupQueries.corpus(s, sfDir), "doc_id", "text",
          numHashes = 16, bands = 4, k = 3, threshold = 0.8,
          maxBandBucket = 2000).out
      },
      "q47_dedup_clusters" -> { s =>
        // the iterative CC loop checkpoints per round by design; the
        // reviewable unit is ONE propagation round's join tree over the
        // symmetric edge set and the fused init labels
        val pairs = graft.operators.Dedup.jaccardPairs(
          graft.queries.DedupQueries.corpus(s, sfDir), "doc_id", "text",
          k = 3, threshold = 0.8)
        val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .distinct()
        val labels = edges.groupBy(col("src").as("node"))
          .agg(min(col("dst")).as("m"))
          .select(col("node"), least(col("node"), col("m")).as("cluster"))
        graft.operators.Dedup.ccRound(edges, labels)
      },
      "q215_minhash_ingest" -> { s =>
        val d = graft.core.Tables.load(s, sfDir, "documents")
          .select("doc_id", "text")
        val incoming = d.select(
          (col("doc_id") + 1000000L).as("doc_id"), col("text"))
        graft.operators.Dedup.minhashLshIngestPlan(d, incoming,
          "doc_id", "text", numHashes = 16, bands = 4, k = 3,
          threshold = 0.8, maxBandBucket = 2000)._1
      },
      "q228_cross_doc_spans" -> { s =>
        graft.operators.Dedup.crossDocSpanStatsPlan(
          spanCorpus(s, sfDir), "doc_id", "text", n = 5, minDocs = 2)
      },
      "q229_remove_cross_doc_spans" -> { s =>
        graft.operators.Dedup.removeCrossDocSpansPlan(
          spanCorpus(s, sfDir), "doc_id", "text", n = 5, minDocs = 2)
      },
      "q231_k_core" -> { s =>
        // the bounded-round peel checkpoints per round by design; the
        // reviewable unit is ONE round: the degree census feeding the
        // two semi-joins over the symmetric edge set
        val o = graft.core.Tables.load(s, sfDir, "orders")
        val dir = o.select(
            concat(lit("n"), col("o_custkey") % 1000).as("a"),
            concat(lit("n"), col("o_orderkey") % 1000).as("b"))
          .filter(col("a") =!= col("b"))
        val sym = dir
          .union(dir.select(col("b").as("a"), col("a").as("b"))).distinct()
        val keep = sym.groupBy("a").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 22).select("a")
        sym.join(keep, Seq("a"), "left_semi")
          .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
          .select("a", "b")
      },
      "q240_pc1_projection" -> { s =>
        // the gate's executed plan is just the final dot-product
        // projection (the component is collected driver-side); the
        // reviewable unit is the moment SCAN — stacked generators +
        // map-side-combined (i, j) aggregate
        graft.operators.Spectral.momentPlan(
          graft.core.Tables.load(s, sfDir, "embeddings"),
          "embedding", dim = 64)
      },
      "q247_bitext_margin" -> { s =>
        val e = graft.core.Tables.load(s, sfDir, "embeddings")
        graft.operators.Similarity.bitextMarginMinePlan(
          e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", dim = 64, k = 4, threshold = 1.0,
          bits = 6, seed = 42, pin = identity)
      })

  /** The q228/q229 gate corpus: documents plus a half-truncated copy. */
  private def spanCorpus(s: SparkSession, sfDir: String): DataFrame = {
    val d = graft.core.Tables.load(s, sfDir, "documents")
      .select("doc_id", "text")
    d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("substring(text, 1, CAST(floor(length(text) / 2) AS INT))")
        .as("text")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val names = if (args.length > 2) args.drop(2).toSeq
      else Registry.all.filter(_.bench).map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val seamMap = seams(sfDir)
    val out = new PrintWriter(new File(outFile))
    try {
      out.println("# PLANS.md — generated physical-plan book (bench headline set)")
      out.println()
      out.println("GENERATED by `graft.Explain` — do not edit by hand; regenerate with:")
      out.println()
      out.println("```bash")
      out.println("SPARK_GRAFT_CPUS=4 sbt -batch \"runMain graft.Explain /root/testdata/sf0.001 PLANS.md\"")
      out.println("```")
      out.println()
      out.println("The formatted physical plan of every `bench = true` query, for direct")
      out.println("review of the plan-quality invariants PlanSpec asserts mechanically:")
      out.println("filters and column pruning reaching the parquet scans (`PushedFilters`,")
      out.println("`ReadSchema`), dimension joins broadcast (`BroadcastHashJoin` /")
      out.println("`BroadcastExchange`), partial aggregation before every shuffle")
      out.println("(`HashAggregate` below `Exchange`), top-k as `TakeOrderedAndProject`,")
      out.println("and no cartesian products outside the deliberate brute-force baselines.")
      out.println("Checkpoint-terminated dedup gates (q30/q31/q47/q215/q228/q229) and")
      out.println("the per-round iterative q231 are printed through their pre-checkpoint")
      out.println("plan seams so the join trees are visible.")
      out.println("Plans are compiled at sf0.001 (plan SHAPE is scale-independent; AQE")
      out.println("re-optimizes sizes at runtime).")
      out.println()
      out.println("```")
      names.foreach { n =>
        out.println(s"\n========== $n ==========")
        try {
          val df = seamMap.get(n).map(f => f(spark))
            .getOrElse(Registry.byName(n).run(spark, sfDir))
          out.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable => out.println(s"failed: ${e.getMessage}")
        }
        out.flush()
      }
      out.println("```")
    } finally out.close()
    println(s"wrote $outFile (${names.size} plans)")
    spark.stop()
  }
}
