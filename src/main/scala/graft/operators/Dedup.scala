package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication family for training-data pipelines. Four tiers, cheapest
  * first — at 100 TB you run exact + MinHash-LSH; the exact-Jaccard pass
  * is the verifier on LSH candidates, never a full cross-join.
  *
  *  - [[exactGroups]]: hash-groupBy on a canonical fingerprint — one
  *    shuffle of (hash, id), no text movement.
  *  - [[jaccardPairs]]: exact n-gram Jaccard via shingle inverted index:
  *    explode shingles → self-join on shingle → count co-occurrences.
  *    Shuffles scale with Σ shingles, not |docs|² — but hot shingles blow
  *    up, so LSH is the scale path and this the verifier.
  *  - [[minhashLsh]]: MinHash signatures banded into LSH buckets; only
  *    same-bucket docs become candidate pairs, verified with exact
  *    Jaccard. Tunable (numHashes × bands) precision/recall.
  *  - [[simhash]]: 64-bit near-dup fingerprint; hamming-close docs
  *    cluster by rotating prefix blocks.
  */
object Dedup {

  /** Exact duplicate groups: canonical id = min doc id per fingerprint.
    * Input needs (idCol, textCol); output one row per duplicated content. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Distinct (id, shingle-hash) pairs — the inverted-index rows. Shingles
    * are joined by xxhash64, not by string: the shuffle ships 8-byte keys
    * instead of ~40-byte text, and the join is a long-compare. Collision
    * probability over even 10^9 distinct shingles is ~where
    * n²/2^65 ≈ 3% — and a collision only inflates one intersection count
    * by 1; for exact-exact guarantees join the strings. */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(TextFunctions.shingles(col(textCol), k)).as("sh_str"))
      .select(col("doc"), xxhash64(col("sh_str")).as("sh"))
      .distinct()

  /** Exact n-gram Jaccard similar pairs (a < b, jaccard ≥ threshold). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val idx = shingleIndex(docs, idCol, textCol, k).cache()
    val sizes = idx.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val co = idx.as("x").join(idx.as("y"), col("x.sh") === col("y.sh"))
      .filter(col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature: for hash seed i, min over shingles of
    * xxhash64(shingle, seed=i). Returns array<long> of length numHashes.
    *
    * Computed as ONE fold over the shingle array producing all minima at
    * once — the naive `array(array_min(transform(sh, ...)), ...)` form
    * embeds the shingle computation once per hash index, and Catalyst's
    * projection collapse then re-inlines that whole tree at every
    * downstream reference (16 hashes × 3 references = 48 tokenizations
    * per row — measured 350+ s at sf0.1 vs <2 s for this form). */
  def minhashSignature(text: Column, numHashes: Int, k: Int = 3): Column = {
    val sh = TextFunctions.shingles(text, k)
    val maxSig = array_repeat(lit(Long.MaxValue), numHashes)
    when(size(sh) === 0, array().cast("array<bigint>"))
      .otherwise(aggregate(sh, maxSig, (acc, s) =>
        zip_with(acc,
          array((0 until numHashes).map(i => xxhash64(s, lit(i))): _*),
          (a, b) => least(a, b))))
  }

  /** LSH candidate pairs + exact-Jaccard verification.
    * bands × rowsPerBand = numHashes; docs sharing any band-hash become
    * candidates. The band join shuffles (bandId, bandHash) keys only. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, k: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = docs.select(col(idCol).as("doc"),
      minhashSignature(col(textCol), numHashes, k).as("sig"))
      .filter(size(col("sig")) > 0)
    // materialize before the self-join: projection collapse would
    // otherwise inline the signature computation into BOTH join sides
    val banded = sig.select(col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b).as("bh")))))
      .select(col("doc"), col("col.band").as("band"), col("col.bh").as("bh"))
      .cache()
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard (join back the shingle sets)
    val idx = shingleIndex(docs, idCol, textCol, k).cache()
    val sizes = idx.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = candidates
      .join(idx.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(idx.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs, brute force: every (a < b)
    * pair scored. Quadratic — the correctness baseline and the verifier
    * for [[embeddingNearDupsLsh]]; never run this on the full corpus at
    * scale. */
  def embeddingNearDups(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosineCols(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Embedding near-dups at scale: random-hyperplane LSH bucket blocking —
    * pairs form only inside a bucket (one shuffle on the bucket id), then
    * exact cosine verification. Near-identical vectors agree on every
    * sign bit, so true near-dups stay in one bucket. */
  def embeddingNearDupsLsh(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, bits: Int = 12, seed: Int = 42): DataFrame = {
    val bucketed = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.lshBucket(col(vecCol), dim, bits, seed).as("bucket"))
    bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cos", Similarity.cosineCols(col("x.v"), col("y.v")))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cos"))
  }

  /** Connected-component cluster assignment over near-dup pairs: every
    * document in a component gets the component's minimum id as its
    * cluster (= the canonical survivor). Iterative min-label propagation —
    * each round is one shuffle join; rounds ≈ log(component diameter),
    * and near-dup graphs have tiny diameters. The GraphX-free formulation
    * keeps the whole pipeline in DataFrames (AQE, broadcast of the
    * shrinking frontier, etc.). */
  def clusterAssignments(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("cluster", col("node"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("cluster")).as("n_cluster"))
      val next = labels.join(viaNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster")))
            .as("cluster"))
        .cache()
      val changed = next.as("n").join(labels.as("o"), "node")
        .filter(col("n.cluster") =!= col("o.cluster")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** 64-bit SimHash over token xxhash64s: bit j of the fingerprint is the
    * sign of Σ±1 over tokens' bit j. Pure expressions via bit arithmetic. */
  def simhash(text: Column): Column = {
    val hs = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val votes = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
