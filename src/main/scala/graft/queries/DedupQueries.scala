package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Deduplication operators gated over a corpus with guaranteed duplicates:
  * the documents table unioned with an id-shifted copy of itself, so exact
  * groups, Jaccard pairs, and LSH candidates are all non-trivial at every
  * scale factor (natural near-dups, if any, surface too).
  */
object DedupQueries {

  private val Shift = 1000000L

  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("doc_id", "text")
    d.unionByName(d.select((col("doc_id") + Shift).as("doc_id"), col("text")))
  }

  private val CorpusSql =
    s"""(SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + $Shift AS doc_id, text FROM documents)"""

  /** DuckDB twin of TextFunctions.shingles (k=3): same tokenization, same
    * slice windows, same separator. */
  private val ShinglesSql =
    """list_transform(
         range(0, greatest(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) - 2, 0)),
         i -> array_to_string(
           list_slice(list_filter(string_split_regex(text, '\s+'), x -> x <> ''), i + 1, i + 3), ' '))"""

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q29_exact_dedup",
      (s, dir) => Dedup.exactGroups(corpus(s, dir), "doc_id", "text"),
      Some(s"""SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
        MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        FROM $CorpusSql GROUP BY 1 HAVING COUNT(*) > 1"""),
      bench = true),

    GraftQuery(
      "q30_jaccard_pairs",
      (s, dir) => Dedup.jaccardPairs(corpus(s, dir), "doc_id", "text",
        k = 3, threshold = 0.8),
      Some(s"""WITH idx AS (
          SELECT DISTINCT doc_id AS doc, sh FROM (
            SELECT doc_id, unnest($ShinglesSql) AS sh FROM $CorpusSql)),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
        co AS (
          SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS inter
          FROM idx x JOIN idx y ON x.sh = y.sh AND x.doc < y.doc
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) AS jaccard
        FROM co
        JOIN sizes a ON a.doc = doc_a
        JOIN sizes b ON b.doc = doc_b
        WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0"""),
      bench = true),

    GraftQuery(
      "q47_dedup_clusters",
      (s, dir) => {
        // connected components over the near-dup pairs: each doc →
        // min-id of its component (the canonical survivor).
        val pairs = Dedup.jaccardPairs(corpus(s, dir), "doc_id", "text",
          k = 3, threshold = 0.8)
        Dedup.clusterAssignments(pairs)
      },
      Some(s"""WITH RECURSIVE
        edges AS (
          SELECT doc_a, doc_b FROM (
            WITH idx AS (
              SELECT DISTINCT doc_id AS doc, sh FROM (
                SELECT doc_id, unnest($ShinglesSql) AS sh FROM $CorpusSql)),
            sizes AS (SELECT doc, COUNT(*) AS n_sh FROM idx GROUP BY doc),
            co AS (
              SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS inter
              FROM idx x JOIN idx y ON x.sh = y.sh AND x.doc < y.doc
              GROUP BY 1, 2)
            SELECT doc_a, doc_b
            FROM co JOIN sizes a ON a.doc = doc_a JOIN sizes b ON b.doc = doc_b
            WHERE CAST(inter AS DOUBLE) / (a.n_sh + b.n_sh - inter) >= 0.8E0)),
        sym AS (
          SELECT doc_a AS src, doc_b AS dst FROM edges
          UNION SELECT doc_b, doc_a FROM edges),
        reach(src, dst) AS (
          SELECT src, dst FROM sym
          UNION
          SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster
        FROM reach GROUP BY src"""),
      bench = true),

    // MinHash banding + SimHash use engine-internal hash functions with no
    // DuckDB equivalent → rows-only gate; semantics covered by DedupSpec.
    GraftQuery(
      "q31_minhash_lsh",
      (s, dir) => Dedup.minhashLsh(corpus(s, dir), "doc_id", "text",
        numHashes = 16, bands = 4, k = 3, threshold = 0.8),
      None,
      bench = true),

    GraftQuery(
      "q32_simhash",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(col("doc_id"), Dedup.simhash(col("text")).as("simhash64"))
      },
      None)
  )
}
