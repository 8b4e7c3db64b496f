package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Multimodal, Similarity}

/** Similarity search over the embeddings table (64-dim float vectors) and
  * multimodal binary-column plumbing.
  */
object VectorQueries {

  private val Dim = 64

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === 0)
      .select("embedding").collect()(0)
      .getSeq[Float](0).toSeq.map(_.toDouble)

  /** DuckDB twin of Similarity.cosineLit: element-indexed double products,
    * left-fold sums — identical FP op order to the Spark expression. */
  private def cosSql(vecExpr: String, qExpr: String): String = {
    def dot(a: String, b: String) =
      s"""list_reduce(list_transform(range(1, ${Dim + 1}),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""
    s"""(FLOOR((${dot(vecExpr, qExpr)} /
        (sqrt(${dot(vecExpr, vecExpr)}) * sqrt(${dot(qExpr, qExpr)})))
        * 1000000.0E0 + 0.5E0) / 1000000.0E0)"""
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q33_cosine_topk",
      (s, dir) => Similarity.cosineTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10),
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, ${cosSql("embedding", "qv")} AS cos
        FROM embeddings, q
        ORDER BY cos DESC, vec_id ASC LIMIT 10"""),
      bench = true),

    // LSH/IVF variants prune via engine-side hashing/centroids → rows-only
    // gate; recall vs brute force is asserted in SimilaritySpec.
    GraftQuery(
      "q34_lsh_cosine_topk",
      (s, dir) => Similarity.lshCosineTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10, bits = 8),
      None,
      bench = true),

    GraftQuery(
      "q35_ivf_topk",
      (s, dir) => Similarity.ivfTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10, nCells = 16, nProbe = 4),
      None),

    GraftQuery(
      "q37_embedding_near_dup",
      (s, dir) => {
        // dup-guaranteed corpus (id-shifted copy) so pairs exist at every
        // SF; brute-force pass = the oracle-checkable baseline.
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val corpus = e.unionByName(
          e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        graft.operators.Dedup.embeddingNearDups(corpus, "vec_id", "embedding", 0.95)
      },
      Some {
        val corpus = s"""(SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings)"""
        s"""SELECT id_a, id_b, cos FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ${cosSql("a.embedding", "b.embedding")} AS cos
          FROM $corpus a JOIN $corpus b ON a.vec_id < b.vec_id)
          WHERE cos >= 0.95E0"""
      }),

    GraftQuery(
      "q38_embedding_near_dup_lsh",
      (s, dir) => {
        // the scale path: LSH sign-bucket blocking, exact verify in-bucket.
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val corpus = e.unionByName(
          e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        graft.operators.Dedup.embeddingNearDupsLsh(
          corpus, "vec_id", "embedding", Dim, threshold = 0.95, bits = 12)
      },
      None,
      bench = true),

    GraftQuery(
      "q36_multimodal_meta",
      (s, dir) => {
        // binary media column + stub decode through the real mapPartitions
        // batch plumbing (size-binned partitioning, typed meta schema).
        val d = Multimodal.withBinaryFromText(
          Tables.load(s, dir, "documents"), "text")
        Multimodal.decodeMeta(d, "doc_id", "media_bytes")
      },
      Some("""SELECT doc_id AS media_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'jpeg'
             WHEN octet_length(encode(text)) % 3 = 1 THEN 'png'
             ELSE 'webp' END AS format,
        CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
        CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
        CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames,
        CAST(octet_length(encode(text)) * 40 AS BIGINT) AS duration_ms
        FROM documents"""))
  )
}
