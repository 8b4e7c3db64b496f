package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqIndex, Similarity}

/** The materialized IVF-PQ index must (1) serve the same ranking as the
  * inline ivfPqTopK composition, (2) PRUNE I/O to the probed cell
  * directories, and (3) never materialize the raw vector column in the
  * probe scan (the 64× byte pruning is the point of PQ). */
class PqIndexSpec extends AnyFunSuite {
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

  test("index probe matches inline IVF-PQ, prunes cells, reads no vectors") {
    val path = java.nio.file.Files.createTempDirectory("pqidx")
      .resolve("idx").toString
    val model = PqIndex.train(vecs, "vec_id", "embedding",
      nCells = 8, m = 2, ks = 4, iters = 2)
    PqIndex.build(vecs, "vec_id", "embedding", path, model)
    val q = vecs.filter(col("vec_id") === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toSeq.map(_.toDouble)

    val fromIndex = PqIndex.topK(PqIndex.load(spark, path),
      "vec_id", q, k = 5, model, nProbe = 3)
    val inline = Similarity.ivfPqTopK(vecs, "vec_id", "embedding", q,
      topK = 5, nCells = 8, nProbe = 3, m = 2, ks = 4, iters = 2)
    assert(fromIndex.collect().toSeq === inline.collect().toSeq)

    // partition pruning: the probe's selected files all live under the
    // probed __cell directories and are strictly fewer than the index's
    val probed = PqIndex.probeCells(model, q, nProbe = 3).toSet
    val scan = fromIndex.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val probeFiles = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    val allFiles = spark.read.parquet(path).inputFiles
    assert(probeFiles.nonEmpty && probeFiles.length < allFiles.length)
    val cellOf = "__cell=(\\d+)".r
    assert(probeFiles.forall(f =>
      cellOf.findFirstMatchIn(f).exists(m => probed.contains(m.group(1).toInt))))
    // byte pruning: the probe scan's read schema carries codes only —
    // no array column (the raw vectors were never written)
    assert(!scan.schema.fields.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
      s"probe scan must not read vector arrays: ${scan.schema.simpleString}")
  }

  test("a batch-built index accepts streamed appends: one shared layout") {
    // build() writes __cell=c/__batch=-1/, appendBatch __cell=c/__batch=b/
    // — mixed partition DEPTHS would make Spark's partition discovery
    // reject the directory ('conflicting directory structures')
    val path = java.nio.file.Files.createTempDirectory("pqidx-mixed")
      .resolve("idx").toString
    val standing = vecs.filter(col("vec_id") < 150)
    val arriving = vecs.filter(col("vec_id") >= 150)
    val model = PqIndex.train(standing, "vec_id", "embedding",
      nCells = 8, m = 2, ks = 4, iters = 2)
    PqIndex.build(standing, "vec_id", "embedding", path, model)
    PqIndex.appendBatch(arriving, "vec_id", "embedding", path, model,
      batchId = 0L)
    val loaded = PqIndex.load(spark, path)
    assert(loaded.count() === 200L)
    assert(!loaded.columns.contains("__batch")) // probe-layout-agnostic
    // the appended rows are probe-visible alongside the base build
    val q = vecs.filter(col("vec_id") === 160).select("embedding")
      .collect()(0).getSeq[Float](0).toSeq.map(_.toDouble)
    val ids = PqIndex.topK(loaded, "vec_id", q, k = 200, model, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(160L) && ids.contains(3L))
  }
}
