package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized ANN index: the LSH bucket projection of a corpus written
  * ONCE, partitioned by bucket, so a probe reads only its candidate
  * buckets' files instead of scanning the corpus.
  *
  * [[Similarity.lshCosineTopK]] prunes the COSINE — every probe still
  * scans and re-buckets all N vectors, which at 100 TB is a full corpus
  * pass per query. This index prunes the I/O: `build` pays one scan +
  * shuffle-free write; `topK` filters on the PARTITION column, so Spark's
  * file listing keeps only the ~(bits+1)/2^bits probed directories and
  * the scan never touches the rest (verified by the plan/inputFiles check
  * in AnnIndexSpec). That is the difference between "each query is
  * O(corpus)" and "each query is O(corpus / 2^bits)" on a cluster.
  *
  * The reference has no ANN operator; this is the training-data-pipeline
  * extension mandated by SURVEY §6 (similarity search at scale).
  */
object AnnIndex {

  /** One pass over the corpus: compute each vector's random-hyperplane
    * sign bucket and write partitioned by it. `dim` is the vector width;
    * `bits` ≤ 16 keeps the partition count (2^bits) filesystem-friendly
    * while pruning ~(1 - (bits+1)/2^bits) of probe I/O. */
  def build(embeddings: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, bits: Int = 8, seed: Int = 42): Unit =
    embeddings
      .select(col(idCol), col(vecCol),
        // int, not long: partition-directory values round-trip as
        // IntegerType on read, and the probe filter must compare the
        // SAME type or the cast blocks partition pruning
        Similarity.lshBucket(col(vecCol), dim, bits, seed)
          .cast("int").as("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)

  /** The probe buckets for a query: its own bucket plus every one-bit
    * flip (multi-probe recovers most of the recall a single bucket
    * loses). */
  def probeBuckets(query: Seq[Double], bits: Int, seed: Int = 42): Seq[Int] = {
    val qBucket = Similarity.lshBucketLocal(query, bits, seed)
    (qBucket +: (0 until bits).map(b => qBucket ^ (1L << b))).map(_.toInt)
  }

  /** Open the index once per serving session: the returned frame carries
    * the partition listing (InMemoryFileIndex), so repeated probes prune
    * against the cached listing instead of re-listing 2^bits directories
    * per query — at a few thousand partitions the relisting dominates
    * small-probe latency. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Serve a top-k probe from a loaded index: the partition filter prunes
    * the listing to the probed bucket directories, then one small scan
    * scores and TakeOrderedAndProject cuts the top-k. */
  def topK(index: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 8, seed: Int = 42): DataFrame =
    index
      .filter(col("__bucket").isInCollection(probeBuckets(query, bits, seed)))
      .select(col(idCol), Similarity.cosineLit(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** OR-construction index: `tables` independent hyperplane families, the
    * corpus written once per table under `__table=t/__bucket=b/` (L× the
    * storage — that is the standard recall-for-space trade; the recall
    * curve it buys is measured by q154's [[Similarity.annRecallMultiTable]]
    * sweep). Still ONE corpus scan: all L buckets are computed in a single
    * projection and the L-way replication happens in the explode, not in
    * re-reads. */
  def buildMulti(embeddings: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, bits: Int = 8, tables: Int = 2,
      seed: Int = 42): Unit =
    embeddings
      .select(col(idCol), col(vecCol), explode(array((0 until tables).map {
        t =>
          struct(lit(t).as("t"),
            Similarity.lshBucket(col(vecCol), dim, bits,
              Similarity.tableSeed(seed, t)).cast("int").as("b"))
      }: _*)).as("p"))
      .select(col(idCol), col(vecCol),
        col("p.t").as("__table"), col("p.b").as("__bucket"))
      .write.mode("overwrite")
      .partitionBy("__table", "__bucket").parquet(path)

  /** Top-k probe over a multi-table index: per table, the query's bucket
    * plus 1-bit flips; the filter is a disjunction of per-table partition
    * predicates, so the file listing keeps only the probed directories of
    * EACH table. A vector found by several tables is collapsed to one
    * candidate (identical cosine) before the top-k cut. */
  def topKMulti(index: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 8, tables: Int = 2,
      seed: Int = 42): DataFrame = {
    val pred = (0 until tables).map { t =>
      col("__table") === t && col("__bucket").isInCollection(
        probeBuckets(query, bits, Similarity.tableSeed(seed, t)))
    }.reduce(_ || _)
    index.filter(pred)
      .select(col(idCol), Similarity.cosineLit(col(vecCol), query).as("cos"))
      .groupBy(col(idCol)).agg(max(col("cos")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Streaming index maintenance: append one micro-batch of new vectors
    * into the bucket layout WITHOUT rebuilding — each batch writes its
    * rows under `__bucket=b/__batch=id/`, so (1) a replayed batch
    * OVERWRITES exactly its own `__batch` partitions (dynamic partition
    * overwrite — the idempotent-per-batch recipe the streamed-sketch
    * sinks use), never touching other batches, and (2) probes keep
    * pruning on `__bucket` alone, transparently reading base + streamed
    * files. Pair with `foreachBatch((df, id) => appendBatch(df, …, id))`.
    *
    * Batch-built and stream-maintained indexes serve identical results
    * (gated by q155 against the batch rebuild) — the freshness path adds
    * files, not a different layout. */
  def appendBatch(newVecs: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, bits: Int, batchId: Long,
      seed: Int = 42): Unit =
    newVecs
      .select(col(idCol), col(vecCol),
        Similarity.lshBucket(col(vecCol), dim, bits, seed)
          .cast("int").as("__bucket"),
        lit(batchId).as("__batch"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket", "__batch").parquet(path)

  /** Open a stream-maintained index: same listing semantics as [[load]];
    * `__batch` is dropped so downstream probe code is layout-agnostic. */
  def loadStreamed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__batch")
}
