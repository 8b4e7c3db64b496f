package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, Similarity}

/** The materialized ANN index must (1) agree with the scan-time LSH
  * probe, and (2) actually PRUNE I/O — the probe scan reads only the
  * probed buckets' files, not the whole index. */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val dim = 8
  private lazy val vecs = (0 until 200).map { i =>
    i.toLong -> Array.tabulate(dim)(d => math.sin(i * dim + d).toFloat)
  }.toDF("vec_id", "embedding")

  test("index probe matches scan-time LSH probe and prunes partitions") {
    val path = java.nio.file.Files.createTempDirectory("annidx")
      .resolve("idx").toString
    AnnIndex.build(vecs, "vec_id", "embedding", path, dim, bits = 6)
    val q = vecs.filter(col("vec_id") === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toSeq.map(_.toDouble)

    val fromIndex = AnnIndex.topK(AnnIndex.load(spark, path),
      "vec_id", "embedding", q, k = 5, bits = 6)
    val fromScan = Similarity.lshCosineTopK(vecs, "vec_id", "embedding", q,
      k = 5, bits = 6)
    assert(fromIndex.collect().toSeq === fromScan.collect().toSeq)

    // the I/O claim: the physical scan's SELECTED partitions (after
    // partition pruning — Dataset.inputFiles ignores partition filters
    // and reports the whole relation) are a strict subset of the index,
    // restricted to the probed bucket directories
    val probed = AnnIndex.probeBuckets(q, bits = 6).toSet
    val scan = fromIndex.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val probeFiles = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    val allFiles = spark.read.parquet(path).inputFiles
    assert(probeFiles.nonEmpty && probeFiles.length < allFiles.length)
    val bucketOf = "__bucket=(\\d+)".r
    assert(probeFiles.forall(f =>
      bucketOf.findFirstMatchIn(f).exists(m => probed.contains(m.group(1).toInt))))
  }
}
