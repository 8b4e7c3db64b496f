package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized IVF-PQ index — [[AnnIndex]]'s I/O pruning composed with
  * [[Similarity.pqEncode]]'s byte pruning: the corpus is written ONCE as
  * (id, code_0..code_{m-1}) partitioned by coarse cell, so a probe
  *
  *  - reads only its nProbe cell DIRECTORIES (partition pruning — the
  *    AnnIndex property), and
  *  - reads only m small int columns per row (the raw `array<float>`
  *    never leaves the build — 64× fewer bytes at dim=64, m=4), and
  *  - scores with [[Similarity.adcScore]]'s literal lookup tables — no
  *    join, no shuffle, one `TakeOrderedAndProject`.
  *
  * At 100 TB that stacks three prunings: directories ×(nProbe/nCells),
  * bytes ×(m/4·dim), and zero shuffle — each query is a small scan of
  * compressed postings, the layout production vector stores ship.
  *
  * The model (coarse centroids + subspace codebooks) is trained once on
  * the standing corpus and FROZEN — the invariant that makes streamed
  * maintenance sound: codes written yesterday stay comparable with codes
  * written today (re-training would silently re-key the whole index).
  */
object PqIndex {

  /** The frozen model: coarse centroids (cell routing) + per-subspace
    * PQ codebooks (code assignment + ADC luts). */
  final case class Model(cents: IndexedSeq[Seq[Double]],
      books: IndexedSeq[IndexedSeq[Seq[Double]]])

  /** One deterministic training pass over the standing corpus (the
    * [[Similarity.pqCodebooks]] Lloyd scan + Lloyd-TRAINED coarse
    * centroids — `iters` rounds each, so cell routing survives corpus
    * skew); only nCells·dim + m·ks·subDim doubles reach the driver. */
  def train(embeddings: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, m: Int = 4, ks: Int = 8, iters: Int = 2): Model =
    Model(
      Similarity.coarseCentroids(embeddings, idCol, vecCol, nCells, iters),
      Similarity.pqCodebooks(embeddings, idCol, vecCol, m, ks, iters))

  /** Build the index: one scan, written partitioned by cell. The base
    * build lands under `__cell=c/__batch=-1/` — the SAME two-level
    * layout [[appendBatch]] writes — so a batch-built index can be
    * stream-maintained afterwards (mixed partition depths would make
    * Spark's partition discovery reject the directory outright). */
  def build(embeddings: DataFrame, idCol: String, vecCol: String,
      path: String, model: Model): Unit =
    encodedRow(embeddings, idCol, vecCol, model)
      .withColumn("__batch", lit(-1L))
      .write.mode("overwrite").partitionBy("__cell", "__batch").parquet(path)

  /** id + codes + cell in ONE projection (cell spelled alongside the
    * codes — no self-join; everything is literal arithmetic). */
  private def encodedRow(vecs: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val m = model.books.size
    val sub = model.books.head.head.size
    vecs
      .select(col(idCol) +:
        Similarity.nearestCellExpr(model.cents)(col(vecCol)).as("__cell") +:
        (0 until m).map(j =>
          slice(col(vecCol), j * sub + 1, sub).as(s"__s$j")): _*)
      .select(col(idCol) +: col("__cell") +: (0 until m).map(j =>
        Similarity.pqNearest(model.books(j))(col(s"__s$j"))
          .as(s"code_$j")): _*)
  }

  /** Streamed maintenance: append one micro-batch under
    * `__cell=c/__batch=id/` via dynamic partition overwrite — a replayed
    * batch rewrites exactly its own partitions (the [[AnnIndex]]
    * idempotency recipe), probes keep pruning on `__cell` alone, and the
    * FROZEN model keeps new codes comparable with old ones. */
  def appendBatch(newVecs: DataFrame, idCol: String, vecCol: String,
      path: String, model: Model, batchId: Long): Unit =
    encodedRow(newVecs, idCol, vecCol, model)
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__cell", "__batch").parquet(path)

  /** The nProbe cell ids a query reads — exposed so callers (and specs)
    * can reason about exactly which partitions a probe touches. */
  def probeCells(model: Model, query: Seq[Double], nProbe: Int): Seq[Int] =
    Similarity.probeCells(model.cents, query, nProbe)

  /** Open the index (batch-built or stream-maintained) once per serving
    * session; `__batch` is dropped so probe code is layout-agnostic. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (df.columns.contains("__batch")) df.drop("__batch") else df
  }

  /** Serve a top-k: partition filter prunes to the probed cell
    * directories, ADC luts score the codes, TakeOrderedAndProject cuts
    * the k. */
  def topK(index: DataFrame, idCol: String, query: Seq[Double], k: Int,
      model: Model, nProbe: Int = 4, scale: Int = 6): DataFrame =
    index
      .filter(col("__cell").isInCollection(
        Similarity.probeCells(model.cents, query, nProbe)))
      .select(col(idCol),
        graft.functions.SafeMath.roundHalfUp(
          Similarity.adcScore(model.books, query), scale).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
}
