package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

/** Semantics tests for the training-data-pipeline operators: dedup family
  * (exact / Jaccard / MinHash-LSH / SimHash), similarity search
  * (brute-force vs LSH vs IVF recall), text analysis, multimodal plumbing.
  */
class LlmOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "THE  quick   brown fox jumps over the lazy dog"), // exact after normalize
    (4L, "completely different content about spark engines"),
    (5L, "the quick brown fox jumps over the lazy dog")     // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups normalize case and whitespace") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 1)
    assert(groups(0).getAs[Long]("canonical_id") === 1L)
    assert(groups(0).getAs[Long]("n_copies") === 3L) // docs 1, 3, 5
  }

  test("jaccard pairs find near-dups above threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 5L)) === 1.0)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH candidates recover the exact-jaccard pairs on dups") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", k = 2, threshold = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 16, bands = 8, k = 2, threshold = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs agree on every band → always candidates; verified
    // jaccard then matches the exact pass
    assert(exact.subsetOf(lsh) || lsh.subsetOf(exact))
    assert(lsh.contains((1L, 5L)))
  }

  test("cluster assignment: chained pairs collapse to one component min") {
    // components: {1,2,3,5} via chain 1-2, 2-3, 1-5; {7,8}; isolated nodes absent
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 5L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val clusters = Dedup.clusterAssignments(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("cluster assignment works for STRING doc ids (changed-row probe)") {
    // the decimal-sum convergence probe only applies to numeric ids;
    // string ids exercise the join-based changed-row fallback
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDF("doc_a", "doc_b")
    val clusters = Dedup.clusterAssignments(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(clusters === Map(
      "a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("applyClusters drops non-canonical members, keeps unclustered docs") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (9L, "solo"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "cluster")
    val kept = Dedup.applyClusters(docs, "doc_id", clusters)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 9L)) // 2 dropped; 9 untouched
  }

  test("simhash: identical docs equal, near-dups hamming-close, different docs far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(5L))
    assert(hamming(h(1L), h(2L)) < hamming(h(1L), h(4L)))
    assert(hamming(h(1L), h(2L)) <= 16)
  }

  test("LSH and IVF similarity recall the brute-force top-1") {
    val vecs = (0 until 100).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 7).collect()(0)
      .getSeq[Float](1).map(_.toDouble).toSeq
    val brute = Similarity.cosineTopK(vecs, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0))
    assert(brute.head === 7L) // self is nearest
    val lsh = Similarity.lshCosineTopK(vecs, "vec_id", "embedding", q, 5, bits = 6)
      .collect().map(_.getLong(0))
    assert(lsh.contains(7L))
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, 5, nCells = 8, nProbe = 4)
      .collect().map(_.getLong(0))
    assert(ivf.contains(7L))
    // IVF-PQ: coarse probe + compressed ADC scan still lands the target
    // in its top-5 (codebook granularity coarsens scores, so membership,
    // not rank-1, is the contract)
    val ivfpq = Similarity.ivfPqTopK(vecs, "vec_id", "embedding", q, 5,
        nCells = 8, nProbe = 4, m = 4, ks = 8, iters = 2)
      .collect().map(_.getLong(0))
    assert(ivfpq.contains(7L))
  }

  test("trained IVF coarse quantizer bounds cell skew where first-k degenerates") {
    val dim = 8
    // the first-k-by-id trap corpus: ids 0..7 (the init picks) are all
    // the IDENTICAL hot vector, so the OLD untrained quantizer had 8
    // equal centroids and first-min argmin sent EVERY vector to cell 0
    // (max cell share 1.0 — probe pruning a no-op, index partitions
    // all in one directory). 100 more jittered hot copies + a 92-vector
    // spread tail complete the skew.
    val rows = (0 until 108).map { i =>
      val v = Array.fill(dim)(0.0f); v(0) = 1.0f
      if (i >= 8) v(1) = 0.001f * ((i % 7) + 1)
      (i.toLong, v.toSeq)
    } ++ (108 until 200).map { i =>
      val v = Array.fill(dim)(0.0f); v(1 + i % 7) = 1.0f
      (i.toLong, v.toSeq)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val census = Similarity
      .ivfCellCensus(vecs, "vec_id", "embedding", nCells = 8, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(census.values.sum === 200L) // every vector lands somewhere
    // Lloyd training separates the hot blob from the tail: the global
    // max cell share is bounded well below the degenerate 1.0
    val maxShare = census.values.max.toDouble / 200.0
    assert(maxShare <= 0.6, s"trained census still skewed: $census")
    assert(census.size >= 2, s"trained census degenerate: $census")
  }

  test("kmeans separates two well-split directions and is deterministic") {
    // two tight angular clusters around (1,0,...) and (0,1,...)
    val vecs = (0 until 40).map { i =>
      val v = Array.fill(8)(0.0f)
      v(i % 2) = 1.0f
      v(2 + i % 3) = 0.05f * (i % 3)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val r1 = Similarity.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r2 = Similarity.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r1 === r2) // replay-deterministic
    // members of the same parity share a direction → one cluster each
    val even = (0 until 40 by 2).map(i => r1(i.toLong)).toSet
    val odd = (1 until 40 by 2).map(i => r1(i.toLong)).toSet
    assert(even.size === 1 && odd.size === 1 && even != odd)
  }

  test("silhouette: tight planted clusters score near 1, split ones lower") {
    // same two-direction fixture as the kmeans test: every point sits
    // far closer to its own centroid than to the other → s near 1
    val vecs = (0 until 40).map { i =>
      val v = Array.fill(8)(0.0f)
      v(i % 2) = 1.0f
      v(2 + i % 3) = 0.05f * (i % 3)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.simplifiedSilhouette(
        vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.size === 2)
    assert(rows.values.map(_._1).sum === 40L)
    rows.foreach { case (c, (_, s)) =>
      assert(s > 0.8, s"cluster $c must be cohesive, mean_sil=$s")
    }
    // one smeared blob forced into k=2: the split is arbitrary, so the
    // mean silhouette must be far from 1 (boundary points sit between)
    val blob = (0 until 40).map { i =>
      val v = Array.fill(8)(1.0f)
      v(i % 8) = 1.0f + 0.01f * (i % 5)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val blobRows = Similarity.simplifiedSilhouette(
        blob, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getDouble(2))
    assert(blobRows.forall(_ < 0.8),
      s"an arbitrary split must score low: ${blobRows.toSeq}")
    // determinism: replay-identical
    val again = Similarity.simplifiedSilhouette(
        vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again === rows)
  }

  test("pq: hand-traced codebooks, encode, and ADC ranking") {
    // dim 4, m=2 subspaces of 2, ks=2 codes; iters=1 keeps the codebook
    // at its init (the first two vectors' subvectors) so every
    // assignment and lut value is hand-checkable.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), // init code (0,0)
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)), // init code (1,1)
      (2L, Seq(0.9f, 0.1f, 0.2f, 0.9f)), // nearest (0,0)
      (3L, Seq(0.1f, 0.9f, 0.9f, 0.1f))  // nearest (1,1)
    ).toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    assert(books === IndexedSeq(
      IndexedSeq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      IndexedSeq(Seq(0.0, 1.0), Seq(1.0, 0.0))))
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(codes === Map(0L -> (0, 0), 1L -> (1, 1),
      2L -> (0, 0), 3L -> (1, 1)))
    // query (1,0,0,1): luts = sub0 [1.0, 0.0], sub1 [1.0, 0.0] → score
    // 2.0 for codes (0,0), 0.0 for (1,1); ties break by vec_id
    val top = Similarity.pqAdcTopK(vecs, "vec_id", "embedding",
        Seq(1.0, 0.0, 0.0, 1.0), topK = 4, m = 2, ks = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq === Seq((0L, 2.0), (2L, 2.0), (1L, 0.0), (3L, 0.0)))
    // iters=2 retrains: each cell's centroid becomes the mean of its two
    // members — codes must be unchanged (members stay nearest their mean)
    val books2 = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = 2, ks = 2, iters = 2)
    assert(books2(0)(0).map(x => math.rint(x * 100) / 100) === Seq(0.95, 0.05))
    val codes2 = Similarity.pqEncode(vecs, "vec_id", "embedding", books2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(codes2 === codes)
  }

  test("kmeans releases its cached projection (no leak per invocation)") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(4)(d => math.sin(i * 4 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Similarity.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 2)
    assert(out.count() === 20L)
    // only the localCheckpoint of the RESULT may remain pinned — the
    // internal (id, vec) cache must be gone the moment kmeans returns
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"kmeans leaked ${leaked.size} persistent RDDs (expected ≤1: the " +
        "checkpointed result)")
  }

  test("duplicate passages: shared run surfaces, scattered overlap does not") {
    val shared = (1 to 9).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"zeta eta $shared theta iota kappa"),
      // doc 3 has the same words but SCATTERED — no consecutive run
      (3L, (1 to 9).map(i => s"common$i pad$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatePassages(docs, "doc_id", "text",
        k = 3, minRun = 3, dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 9 shared tokens with k=3 ⇒ 7 consecutive shingles
    assert(out((1L, 2L)) === 7L)
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)))
  }

  test("semdedup drops in-cluster near-dups greedily by id, keeps originals") {
    // two angular clusters; ids 100+ are exact copies of 0..9 and must
    // all drop; the distinct directions must all survive
    val base = (0 until 10).map { i =>
      val v = Array.fill(8)(0.0f)
      v(i % 2) = 1.0f
      v(2 + i % 3) = 0.1f * (i + 1) // unique magnitude ⇒ distinct directions
      (i.toLong, v.toSeq)
    }
    val dups = base.map { case (id, v) => (id + 100L, v) }
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    val r = Similarity.semDedup(vecs, "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.999)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    (0 until 10).foreach(i => assert(r(i.toLong), s"original $i dropped"))
    (0 until 10).foreach(i => assert(!r(i + 100L), s"dup ${i + 100} kept"))
  }

  test("embedding near-dup: LSH blocking recovers the brute-force pairs") {
    val base = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 16 + d).toFloat).toSeq)
    }
    // 3 near-identical copies (tiny perturbation of vec 5)
    val dups = (0 until 3).map { j =>
      (100L + j, base(5)._2.map(v => v + 1e-4f * j))
    }
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    val brute = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupsLsh(vecs, "vec_id", "embedding",
      dim = 16, threshold = 0.999, bits = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(brute.contains((5L, 100L)))
    assert(lsh === brute) // identical sign patterns → same buckets
  }

  test("text functions: tokens, bpe estimate, quality bounds, lang id") {
    val t = Seq((1L, "Hello world, this is a test with the and of in 42!"))
      .toDF("id", "text")
    val r = t.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.bpeTokenEstimate(col("text")).as("bpe"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langId(col("text")).as("lang")).collect()(0)
    assert(r.getAs[Int]("n") === 12)
    assert(r.getAs[Long]("bpe") > 12) // subwords + punct + digits ≥ words
    assert(r.getAs[Double]("q") >= 0.0 && r.getAs[Double]("q") <= 1.0)
    assert(r.getAs[String]("lang") === "en")
    val zh = t.select(TextFunctions.langId(lit("这是一个中文测试文档内容")).as("l"))
      .collect()(0).getString(0)
    assert(zh === "zh")
  }

  test("multimodal: stub decode preserves ids, size binning, meta schema") {
    val d = Multimodal.withBinaryFromText(docs, "text")
    val meta = Multimodal.decodeMeta(d, "doc_id", "media_bytes", sizeBins = 4)
    assert(meta.schema === Multimodal.mediaMetaSchema)
    val rows = meta.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("byte_len") === "the quick brown fox jumps over the lazy dog".length)
    val planned = Multimodal.frameSamplePlan(
      Multimodal.resizeStub(meta, 320, 240), 4)
    val p1 = planned.filter(col("media_id") === 1).collect()(0)
    assert(p1.getAs[Int]("resized_width") <= 320)
    assert(p1.getAs[scala.collection.Seq[Int]]("sample_frames").nonEmpty)
  }

  test("dsir: target-like docs score positive, off-target negative") {
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", "tgt"),
      (2L, "alpha beta alpha gamma beta", "tgt"),
      (3L, "delta epsilon zeta delta epsilon", "raw"),
      (4L, "alpha beta gamma delta", "raw"),
      (5L, "", "raw")
    ).toDF("doc_id", "text", "kind")
    val r = graft.operators.Curation
      .dsirScore(d, "doc_id", "text", col("kind") === "tgt")
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Double]("llr"), x.getAs[Boolean]("keep"))).toMap
    assert(r(1)._1 > 0 && r(1)._2)      // pure target vocabulary
    assert(r(3)._1 < 0 && !r(3)._2)     // pure off-target vocabulary
    assert(r(5)._1 === 0.0 && !r(5)._2) // empty doc: neutral, dropped
    assert(r(4)._1 > r(3)._1)           // mixed doc between the extremes
  }

  test("canonical url: variants collapse, case/fragment/utm/slash rules") {
    val urls = Seq(
      "HTTP://Shop1.Example.COM/item/7?utm_source=news&ref=a",
      "http://shop1.example.com/item/7?ref=a&utm_campaign=x",
      "http://shop1.example.com/item/7?ref=a#frag",
      "http://shop1.example.com/Item/7/",
      "https://other.org/?utm_only=1"
    ).toDF("u")
    val c = urls.select(TextFunctions.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    assert(c(0) === "http://shop1.example.com/item/7?ref=a")
    assert(c(1) === c(0) && c(2) === c(0))
    assert(c(3) === "http://shop1.example.com/Item/7") // path case kept
    assert(c(4) === "https://other.org")
  }

  test("triangle counts: one triangle plus a dangling edge") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("b", "a"))
      .toDF("src", "dst")
    val r = graft.operators.Graphs.triangleCounts(e, "src", "dst")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a" -> 1L, "b" -> 1L, "c" -> 1L)) // d in no triangle
  }

  test("triangle counts: power-law hub stays correct (degree orientation)") {
    // Star hub h touching 40 spokes, spokes chained s_i—s_{i+1}: each
    // chain edge closes one triangle with the hub. Degree orientation
    // points every hub edge INTO h (spoke deg ≤ 3 << 41), so the wedge
    // join never fans out quadratically in hub degree — id orientation
    // would make low-id "a00" the source of all 40 hub edges here.
    val spokes = (0 until 40).map(i => f"s$i%02d")
    val hubEdges = spokes.map(s => ("a00", s)) // hub id SORTS FIRST on purpose
    val chain = (0 until 39).map(i => (spokes(i), spokes(i + 1)))
    val e = (hubEdges ++ chain).toDF("src", "dst")
    val r = graft.operators.Graphs.triangleCounts(e, "src", "dst")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a00") === 39L)                    // one per chain edge
    assert(r("s00") === 1L && r("s39") === 1L)  // chain ends
    assert((1 until 39).forall(i => r(f"s$i%02d") === 2L))
  }

  test("embeddingNearDupsLsh scans the corpus once (cached self-join)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val dir = java.nio.file.Files.createTempDirectory("nearduplsh").toString
    (0 until 100).map { i => // i and i+50 are exact dups → pairs exist
      i.toLong -> Array.tabulate(8)(d => math.sin((i % 50) * 8 + d).toFloat)
    }.toDF("id", "v").write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    val (out, bucketed) = Dedup.embeddingNearDupsLshPlan(
      vecs, "id", "v", dim = 8, threshold = 0.9, bits = 6, seed = 42)
    try {
      // both self-join sides must read the persisted bucketed projection
      // (one underlying corpus scan), never the parquet files directly
      val plan = out.queryExecution.sparkPlan
      val fileScans = plan.collect { case f: FileSourceScanExec => f }
      val cacheScans = plan.collect { case m: InMemoryTableScanExec => m }
      assert(fileScans.isEmpty,
        s"self-join re-scans the corpus: ${fileScans.mkString(", ")}")
      assert(cacheScans.length === 2)
      assert(out.collect().nonEmpty) // and the plan actually runs
    } finally bucketed.unpersist(blocking = true)
  }

  test("decodeImageStats really decodes: gradient PNG means, channel " +
      "order, corrupt payload isolation") {
    // horizontal red gradient + constant green/blue: mean_r is the
    // gradient mean, and r≠g≠b catches a BGR/ARGB channel swap that a
    // solid-gray fixture would miss
    val w = 16; val h = 4
    val png = Multimodal.pngBytes(w, h,
      (x, _) => (x * 16 << 16) | (40 << 8) | 200)
    val expectedR = (0 until w).map(_ * 16).sum.toDouble / w
    val rows = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "bytes")
    val out = Multimodal.decodeImageStats(rows, "id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getInt(1) === w && ok.getInt(2) === h)
    assert(ok.getDouble(3) === expectedR)
    assert(ok.getDouble(4) === 40.0)
    assert(ok.getDouble(5) === 200.0)
    assert(out(2L).isNullAt(1)) // corrupt row survives as null stats
    // magic-byte sniff is decoder-independent
    assert(Multimodal.sniffFormat(png) === "png")
    assert(Multimodal.sniffFormat(
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)) === "jpeg")
    assert(Multimodal.sniffFormat("junk".getBytes("UTF-8")) === null)
    // ImageIoCodec through the decodeMeta seam
    val meta = Multimodal.decodeMeta(rows, "id", "bytes",
      codec = Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getString(2) === "png" &&
      meta(1L).getInt(3) === w && meta(1L).getInt(4) === h &&
      meta(1L).getInt(5) === 1)
    assert(meta(2L).isNullAt(3))
  }

  test("decodeAudioStats really parses WAV: known sums, corrupt isolation") {
    val samples = Array[Short](100, -200, 300, -32768, 32767)
    val wav = Multimodal.wavBytes(8000f, samples)
    val rows = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("id", "bytes")
    val out = Multimodal.decodeAudioStats(rows, "id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getInt(1) === 8000)
    assert(ok.getLong(2) === samples.length.toLong)
    assert(ok.getLong(3) === samples.map(_.toLong).sum)
    assert(ok.getLong(4) === samples.map(s => s.toLong * s).sum)
    assert(out(2L).isNullAt(1)) // corrupt payload survives as null stats
  }

  test("resizeImageStats nearest-neighbor sampling: upsample repeats, " +
      "downsample picks the ⌊x·sw/tw⌋ grid") {
    // 2×2 source with four distinct channel-coded pixels
    val p = Array(Array(10, 20), Array(30, 40)) // p(y)(x) red values
    val png2 = Multimodal.pngBytes(2, 2, (x, y) => p(y)(x) << 16)
    // 4×4 source, red = 10x + y
    val png4 = Multimodal.pngBytes(4, 4, (x, y) => (10 * x + y) << 16)
    val rows = Seq((1L, png2), (2L, png4)).toDF("id", "bytes")
    val out = Multimodal.resizeImageStats(rows, "id", "bytes", 4, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // upsample 2→4: sx = x*2/4 = [0,0,1,1] — each pixel ×4 → plain mean
    assert(out(1L).getInt(1) === 2 && out(1L).getInt(3) === 4)
    assert(out(1L).getDouble(5) === (10 + 20 + 30 + 40) / 4.0)
    // identity 4→4: mean of 10x+y over the full grid
    val exp4 = (for (x <- 0 until 4; y <- 0 until 4) yield 10 * x + y)
      .sum / 16.0
    assert(out(2L).getDouble(5) === exp4)
    // downsample 4→2: picks (0,0),(2,0),(0,2),(2,2)
    val down = Multimodal.resizeImageStats(rows.filter($"id" === 2L),
      "id", "bytes", 2, 2).collect()(0)
    assert(down.getDouble(5) === (0 + 20 + 2 + 22) / 4.0)
  }

  test("embeddingNearDupsLsh bounds pair generation on a degenerate " +
      "(single hot bucket) corpus") {
    // 1200 IDENTICAL vectors: every one lands in the same sign bucket,
    // so the uncapped self-join would emit C(1200,2) = 719,400 pairs.
    // With maxBucket=100 the bucket sub-splits into ⌈1200/100⌉ = 12
    // hash cells → candidate pairs ≈ 12·C(100,2) ≈ 59k, O(cap·n) not
    // O(n²). Bound asserted with slack for hash imbalance, far below
    // quadratic.
    val n = 1200
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(d).toFloat).toSeq)
    }.toDF("id", "v")
    val out = Dedup.embeddingNearDupsLsh(vecs, "id", "v",
      dim = 8, threshold = 0.999, bits = 6, maxBucket = 100)
    val m = out.count()
    assert(m > 0L)
    assert(m < 200000L, // quadratic would be 719,400
      s"hot-bucket cap not bounding pair generation: $m pairs")
    // emitted pairs still pass exact verification
    assert(out.filter(col("cos") < 0.999).count() === 0L)
    // and a corpus with NO hot bucket is untouched by the cap: the
    // capped and uncapped pair sets are identical (the plan carries no
    // sub column at all — asserted by the single-scan test above)
    val spread = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat).toSeq)
    }.toDF("id", "v")
    val capped = Dedup.embeddingNearDupsLsh(spread, "id", "v",
      dim = 8, threshold = 0.9, bits = 6, maxBucket = 100)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val open = Dedup.embeddingNearDupsLsh(spread, "id", "v",
      dim = 8, threshold = 0.9, bits = 6, maxBucket = Int.MaxValue)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === open)
  }

  test("canonicalUrl: anchored utm rules preserve non-utm params") {
    val urls = Seq(
      "http://h.com/p?xutm_source=1&b=2",        // embedded utm_ NOT stripped
      "http://h.com/p?utm_source_platform=tw&b=2", // underscore name fully stripped
      "http://h.com/p?utm_a=1&utm_b=2&c=3",      // consecutive utm run
      "http://h.com/p?utm_a=1&utm_b=2"           // run + tail
    ).toDF("u")
    val c = urls.select(TextFunctions.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    assert(c(0) === "http://h.com/p?xutm_source=1&b=2")
    assert(c(1) === "http://h.com/p?b=2")
    assert(c(2) === "http://h.com/p?c=3")
    assert(c(3) === "http://h.com/p")
  }

  test("cooccurrence pmi: collocated pair beats independent pair") {
    val d = Seq.tabulate(12)(i =>
      (i.toLong, s"new york w$i filler${i % 2} mid w$i end"))
      .toDF("doc_id", "text")
    val r = graft.operators.Curation.cooccurrencePmi(d, "text", minCount = 3)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    val ny = r(("new", "york"))
    assert(ny._1 === 12L && ny._2 > 0) // always adjacent: high PMI
    // "york"–"w_i" pairs never reach minCount=3 (w_i unique per doc)
    assert(!r.keySet.exists { case (a, b) => a.startsWith("w") && b == "york" })
  }

  test("char entropy: uniform > skewed > constant, empty = 0") {
    val d = Seq((1L, "abcd"), (2L, "aaab"), (3L, "aaaa"), (4L, ""))
      .toDF("id", "text")
    val r = d.select(col("id"),
        TextFunctions.charEntropy(col("text")).as("e"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1) > r(2) && r(2) > r(3))
    assert(r(3) === 0.0 && r(4) === 0.0)
    assert(math.abs(r(1) - math.log(4.0)) < 1e-5) // uniform over 4 chars
  }

  test("incremental ingest: existing dups dropped, in-batch dups collapse") {
    val existing = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "SEEN   before"),   // normalizes to existing 1 → dropped
      (11L, "brand new text"),  // kept
      (12L, "brand new text"),  // in-batch dup of 11 → dropped
      (13L, "another fresh one") // kept
    ).toDF("doc_id", "text")
    val kept = graft.operators.Dedup
      .incrementalIngest(existing, incoming, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(11L, 13L))
  }

  test("source KL: a divergent source scores higher than a typical one") {
    val d = (Seq.tabulate(8)(i => (i.toLong, "common words shared by all", "a")) ++
      Seq.tabulate(8)(i => (100L + i, "common words shared by all", "b")) ++
      Seq.tabulate(8)(i => (200L + i, "utterly disjoint vocabulary here", "c")))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Curation.sourceKl(d, "source", "text")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("c") > r("a") && r("c") > r("b"))
  }

  test("budget select: greedy by quality, first overflow included") {
    val mk = (q: Int) => ("word " * (10 * q)).trim // token count 10q
    val d = Seq((1L, mk(3), "s"), (2L, mk(2), "s"), (3L, mk(1), "s"))
      .toDF("doc_id", "text", "source")
    // all same quality band? longer docs score higher length term →
    // order 1,2,3; budget 35: doc1 (30 before=0) + doc2 (before=30 < 35)
    // kept, doc3 (before=50 ≥ 35) cut.
    val kept = graft.operators.Curation
      .budgetSelect(d, "doc_id", "source", "text", budgetTokens = 35L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 2L))
  }

  test("bpe merges: deterministic argmax, non-overlapping merge, compression") {
    val d = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    val r = graft.operators.Tokenizer.bpeMerges(d, "text", rounds = 2)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2),
        x.getLong(3), x.getLong(4)))
    // round 1: (l,o) and (o,w) both count 5 — lexicographic tie-break
    assert(r(0) === ((1, "l", "o", 5L, 15L))) // 20 symbols - 5 merges
    // round 2: the merged "lo" pairs with w, count 5
    assert(r(1) === ((2, "lo", "w", 5L, 10L)))
  }

  test("weighted median: heavy row pulls the median, ties break low") {
    val d = Seq(
      (1L, "g", 1.0, 1L), (2L, "g", 2.0, 1L), (3L, "g", 3.0, 10L),
      (4L, "h", 5.0, 1L), (5L, "h", 6.0, 1L)
    ).toDF("id", "grp", "v", "wt")
    val r = graft.operators.Curation
      .weightedMedian(d, "grp", "id", "v", "wt")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("g") === 3.0) // weight-10 row holds the median
    assert(r("h") === 5.0) // even split: first value reaching half
  }

  test("source overlap: identical sources share everything, disjoint nothing") {
    val d = Seq(
      (1L, "a", "alpha beta gamma delta epsilon"),
      (2L, "b", "alpha beta gamma delta epsilon"),
      (3L, "c", "utterly different words entirely here")
    ).toDF("doc_id", "source", "text")
    val r = graft.operators.Dedup.sourceOverlap(d, "source", "text", k = 3)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3))
      .toMap
    assert(r(("a", "b")) === 1.0)
    assert(!r.contains(("a", "c")) && !r.contains(("b", "c"))) // no shared shingle
  }

  test("tfidf cosine pairs: exact dup = 1.0, unrelated docs absent") {
    val d = Seq(
      (1L, "rare alpha rare beta rare gamma common common"),
      (2L, "rare alpha rare beta rare gamma common common"),
      (3L, "totally unrelated text with other words common common")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .tfidfCosinePairs(d, "doc_id", "text", k = 1, threshold = 0.3,
        dfCap = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs.keySet === Set((1L, 2L))) // df cap drops 'common' terms
  }

  test("fk audit: orphans, null FKs, and duplicate parent keys counted") {
    val parent = Seq((1L, "a"), (2L, "b"), (2L, "b2")).toDF("pk", "v")
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val r = graft.operators.Audit
      .fkAudit("t", child, "fk", parent, "pk").collect()(0)
    assert(r.getLong(1) === 4L) // n_child
    assert(r.getLong(2) === 1L) // null fk
    assert(r.getLong(3) === 1L) // orphan 99
    assert(r.getLong(4) === 2L) // distinct parent keys
    assert(r.getLong(5) === 1L) // pk 2 duplicated
  }

  test("skew profile: hot key dominates the ratio") {
    val d = (Seq.fill(50)(0L) ++ (1L to 50L)).toDF("k")
    val r = graft.operators.SkewTools.skewProfile("t", d, "k").collect()(0)
    assert(r.getLong(1) === 100L) // rows
    assert(r.getLong(2) === 51L)  // keys
    assert(r.getLong(3) === 50L)  // hottest
    assert(r.getDouble(5) > 20.0) // 50 / (100/51) = 25.5
  }

  test("profile card: nulls, distincts, min/max as strings") {
    val d = Seq((Some(1L), "b"), (Some(2L), "a"), (None, "a"))
      .toDF("id", "s")
    val r = graft.operators.Audit.profileCard(d, Seq("id", "s"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("id").getLong(2) === 1L && r("id").getLong(3) === 2L)
    assert(r("id").getString(4) === "1" && r("id").getString(5) === "2")
    assert(r("s").getLong(2) === 0L && r("s").getString(4) === "a")
  }

  test("cdc chunks: shared passage yields identical chunk hashes across docs") {
    // w5/w7/w22 hash to 0 mod 16 (md5Key60) → known chunk boundaries
    val base = "a b c w5 d e f w7 g h i j w22 k l m"
    val d = Seq(
      (1L, base),
      (2L, "prefix words here " + base) // same tail content
    ).toDF("doc_id", "text")
    val ch = graft.operators.Curation.cdcChunks(d, "doc_id", "text")
      .collect()
    val h1 = ch.filter(_.getLong(0) == 1L).map(_.getString(2)).toSet
    val h2 = ch.filter(_.getLong(0) == 2L).map(_.getString(2)).toSet
    // content-defined boundaries realign after the insertion: every chunk
    // of doc1 after the first boundary reappears in doc2
    assert((h1 intersect h2).size >= 2)
    // chunk token counts cover each doc exactly
    val n1 = ch.filter(_.getLong(0) == 1L).map(_.getLong(3)).sum
    assert(n1 === 16L)
  }

  test("gap fill: holes carry the last value, leading gaps stay null") {
    val d = Seq(("a", 10L, 5L), ("a", 13L, 7L), ("b", 12L, 1L))
      .toDF("k", "d", "v")
    val r = graft.operators.TimeSeries.gapFill(d, "k", "d", "v")
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        (if (x.isNullAt(2)) None else Some(x.getLong(2)), x.getBoolean(3)))
      .toMap
    assert(r(("a", 11L)) === ((Some(5L), true)))  // filled from d=10
    assert(r(("a", 12L)) === ((Some(5L), true)))
    assert(r(("a", 13L)) === ((Some(7L), false))) // observed
    assert(r(("b", 10L)) === ((None, true)))      // before first obs
    assert(r(("b", 13L)) === ((Some(1L), true)))
    assert(r.size === 8) // 2 keys × days 10..13
  }

  test("edit-one pairs: substitutions and insertions found, distance-2 not") {
    val d = Seq("kitten", "sitten", "kittens", "mitten", "sittin", "apple")
      .toDF("name")
    val pairs = graft.operators.Dedup.editOnePairs(d, "name")
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(pairs.contains(("kitten", "sitten")))  // substitution
    assert(pairs.contains(("kitten", "kittens"))) // insertion
    assert(pairs.contains(("kitten", "mitten")))
    assert(!pairs.exists { case (a, b) => a == "apple" || b == "apple" })
    assert(!pairs.contains(("kitten", "sittin"))) // distance 2
  }

  test("ols trend: exact fit on a perfect line, null on degenerate x") {
    val d = Seq(("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L),
      ("b", 4L, 1L), ("b", 4L, 3L)).toDF("k", "x", "y")
    val r = graft.operators.TimeSeries.olsTrend(d, "k", "x", "y")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getDouble(2) === 2.0 && r("a").getDouble(3) === 3.0)
    assert(r("b").isNullAt(2) && r("b").isNullAt(3)) // single x value
  }

  test("chi-square shift: shifted source scores higher than a typical one") {
    val d = (Seq.tabulate(40)(i => ("a", 50L + i)) ++
      Seq.tabulate(40)(i => ("b", 50L + i)) ++
      Seq.tabulate(40)(i => ("c", 850L + i))) // far bin
      .toDF("source", "v")
    val r = graft.operators.Curation
      .chiSquareShift(d, "source", "v", binWidth = 100L, bins = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("c") > r("a") && r("c") > r("b"))
    assert(r("c") === 2.0) // fully disjoint bins: chi2 = sum p + sum q = 2
  }

  test("frequent sequences: the dominant trigram wins, order by ts") {
    val d = (0 until 10).flatMap(u => Seq(
      (u.toLong, 1L + u * 10, "view", u * 100L),
      (u.toLong, 2L + u * 10, "click", u * 100L + 1),
      (u.toLong, 3L + u * 10, "buy", u * 100L + 2),
      (u.toLong, 4L + u * 10, "view", u * 100L + 3)))
      .toDF("user_id", "ts", "event_type", "event_id")
    val top = graft.operators.Funnel.frequentSequences(
      d, "user_id", "ts", "event_type", "event_id", n = 3, topK = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    // both trigrams occur 10×; the tie breaks lexicographically
    assert(top(0) === (("click>buy>view", 10L)))
    assert(top(1) === (("view>click>buy", 10L)))
  }

  test("temperature mix: flattens toward uniform, keeps the largest domain") {
    val d = (Seq.fill(800)("big") ++ Seq.fill(50)("small"))
      .zipWithIndex.map { case (dom, i) => (i.toLong, dom) }
      .toDF("id", "dom")
    val kept = graft.operators.Curation
      .temperatureMix(d, "id", "dom", temperature = 2.0)
      .groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_big = 800^0.5/800 ≈ .0354, w_small = 50^0.5/50 ≈ .1414 (max)
    // → small keeps ~100%, big keeps ~25% — ratio flattens 16:1 → ~4:1
    assert(kept("small") > 40L)
    assert(kept("big") < 300L && kept("big") > 120L)
  }

  test("dedup report: per-source dup counts and rate") {
    val d = Seq(
      (1L, "a", "x x"), (2L, "a", "x x"), (3L, "a", "y"),
      (4L, "b", "z")
    ).toDF("id", "src", "text")
    val r = graft.operators.Dedup.dedupReport(d, "src", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getLong(1) === 3L && r("a").getLong(2) === 2L)
    assert(r("a").getLong(3) === 1L && r("a").getDouble(4) === 0.3333)
    assert(r("b").getLong(3) === 0L && r("b").getDouble(4) === 0.0)
  }

  test("cdc chunks: chunk token counts always reassemble the document") {
    // property: for any doc, Σ n_chunk_tokens == token count
    val d = Seq.tabulate(30)(i =>
      (i.toLong, (0 to i * 3).map(j => s"w${(i * 7 + j) % 200}").mkString(" ")))
      .toDF("doc_id", "text")
    val sums = graft.operators.Curation.cdcChunks(d, "doc_id", "text")
      .groupBy("doc_id").agg(sum("n_chunk_tokens").as("s"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    (0 until 30).foreach { i =>
      assert(sums(i.toLong) === (i * 3 + 1).toLong, s"doc $i")
    }
  }

  test("label propagation: two cliques converge to their min labels") {
    val clique = (ns: Seq[String]) =>
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val e = (clique(Seq("a1", "a2", "a3")) ++ clique(Seq("z7", "z8", "z9")))
      .toDF("src", "dst")
    val r = graft.operators.Graphs.labelPropagation(e, "src", "dst", 2)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(Set("a1", "a2", "a3").map(r) === Set("a1"))
    assert(Set("z7", "z8", "z9").map(r) === Set("z7"))
  }

  test("curriculum bins: stages are ordered by difficulty and cover 1..4") {
    val d = Seq.tabulate(40)(i => (i.toLong, ("tok " * (i + 1)).trim))
      .toDF("doc_id", "text")
    val r = graft.operators.Curation.curriculumBins(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(r.values.toSet === Set(1, 2, 3, 4))
    // monotone: a longer doc never lands in an earlier stage
    (0L until 39L).foreach(i => assert(r(i) <= r(i + 1)))
  }

  test("repeated-span removal drops only non-first 4-gram occurrences") {
    val d = Seq(
      (1L, "a b c d a b c d"),          // doubled: tail vanishes
      (2L, "x y z w q"),                // no repeats: untouched
      (3L, "p q r s t p q r s")         // partial repeat of first 4
    ).toDF("doc_id", "text")
    val r = Dedup.removeRepeatedSpans(d, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_kept"),
          x.getAs[String]("cleaned"))).toMap
    assert(r(1L) === ((8L, 4L, "a b c d")))
    assert(r(2L) === ((5L, 5L, "x y z w q")))
    // grams: pqrs(0) qrst(1) rstp(2) stpq(3) tpqr(4) pqrs(5,dup) →
    // positions 5..8 covered
    assert(r(3L) === ((9L, 5L, "p q r s t")))
  }

  test("cross-doc span stats merge covered runs per document") {
    val d = Seq(
      (1L, "a b c d e f g h"),          // shares "a b c d" with doc 2
      (2L, "x y a b c d z w"),
      (3L, "p q r s t u"),              // unique: all zeros
      (4L, "a b c"),                    // exactly one window, shared
      (5L, "a b c q q1 q2 b c d"),      // TWO disjoint runs: islands split
      (6L, "a b c m1 m2 m3"),           // dup windows at 0 and 3: TOUCHING
      (7L, "m1 m2 m3 zz z2")            // shares "m1 m2 m3" with doc 6
    ).toDF("doc_id", "text")
    val r = Dedup.crossDocSpanStats(d, "doc_id", "text", n = 3, minDocs = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("dup_windows"),
          x.getAs[Long]("dup_spans"), x.getAs[Long]("dup_tokens")))).toMap
    // hand-traced: d1 dup 3-grams "a b c"(0) "b c d"(1) merge to [0,4)
    assert(r(1L) === ((8L, 2L, 1L, 4L)))
    assert(r(2L) === ((8L, 2L, 1L, 4L)))  // starts 2,3 merge to [2,6)
    assert(r(3L) === ((6L, 0L, 0L, 0L)))
    assert(r(4L) === ((3L, 1L, 1L, 3L)))
    // d5: "a b c"(0) and "b c d"(6) are separated by a gap → two spans
    assert(r(5L) === ((9L, 2L, 2L, 6L)))
    // d6: window 3 starts exactly where window 0's coverage ends (i ==
    // pmax) — touching runs merge into ONE contiguous covered span [0,6)
    assert(r(6L) === ((6L, 2L, 1L, 6L)))
    assert(r(7L) === ((5L, 1L, 1L, 3L)))
  }

  test("cross-doc span removal enforces the (doc, pos) packing bounds") {
    // a >2^20-token document would silently corrupt the doc·2²⁰+pos
    // first-occurrence election — it must fail LOUDLY instead
    val big = ("x " * ((1 << 20) + 4)).trim
    val tooLong = Seq((1L, big), (2L, "x x x x")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.removeCrossDocSpans(tooLong, "doc_id", "text", n = 3, minDocs = 2)
    }
    assert(e1.getMessage.contains("2^20"))
    // ids at/above 2^43 (or negative) overflow the packing the same way
    val badId = Seq((1L << 43, "a b c d"), (7L, "a b c d"))
      .toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.removeCrossDocSpans(badId, "doc_id", "text", n = 3, minDocs = 2)
    }
    assert(e2.getMessage.contains("2^43"))
    // in-bounds corpora still work end-to-end after the guard
    val ok = Seq((1L, "a b c d"), (2L, "a b c d z"))
      .toDF("doc_id", "text")
    val kept = Dedup.removeCrossDocSpans(ok, "doc_id", "text",
      n = 3, minDocs = 2).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_kept")).toMap
    assert(kept === Map(1L -> 4L, 2L -> 1L))
  }

  test("cross-doc span removal keeps the globally-first occurrence") {
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "z a b c d w"),
      (3L, "q r s"),
      (4L, "a b c d e"),     // verbatim copy of doc 1
      (5L, "a b c x a b c")  // cross-doc dup gram repeated INTRA-doc
    ).toDF("doc_id", "text")
    val r = Dedup.removeCrossDocSpans(d, "doc_id", "text", n = 3, minDocs = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("n_kept"),
          x.getAs[String]("cleaned")))).toMap
    // doc 1 is the global first for "a b c"/"b c d"/"c d e": untouched
    assert(r(1L) === ((5L, 5L, "a b c d e")))
    // doc 2 loses its copy of the run, keeps its unique frame tokens
    assert(r(2L) === ((6L, 2L, "z w")))
    assert(r(3L) === ((3L, 3L, "q r s")))
    assert(r(4L) === ((5L, 0L, "")))   // verbatim copy empties out
    assert(r(5L) === ((7L, 1L, "x")))  // both intra-doc occurrences drop
  }

  test("mmr select prefers diverse candidates over near-duplicates") {
    // hand-traced (micro-units): rel(2)≈951807 > rel(1)=rel(3)≈948683,
    // so vec 2 is rank 1. Vec 1 is nearly parallel to vec 2
    // (sim≈999946) while vec 3 diverges (sim≈902962): at λ=0.7 the
    // objective 7·rel−3·maxSim puts 3 ahead of 1 despite equal rel.
    val e = Seq(
      (1L, Array(0.9f, 0.3f, 0.0f)),
      (2L, Array(0.9f, 0.29f, 0.0f)),
      (3L, Array(0.9f, 0.0f, 0.3f))
    ).toDF("vec_id", "embedding")
    val rows = graft.operators.Similarity.mmrSelect(e, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), k = 3, poolSize = 3, lambdaTenths = 7)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 3L, 1L))
    // rank 1 records the pure-relevance objective 7·rel
    assert(rows(0).getAs[Long]("mmr_score") ===
      7L * rows(0).getAs[Long]("rel_micro"))
    // later picks pay a diversity penalty: mmr < 7·rel
    assert(rows(1).getAs[Long]("mmr_score") <
      7L * rows(1).getAs[Long]("rel_micro"))
  }

  test("k-core peel cascades: pendant drops, triangle survives at k=2") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .toDF("src", "dst")
    val core2 = graft.operators.Graphs.kCore(e, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("degree")).toMap
    // d (degree 1) peels in round 1; the triangle is the 2-core
    assert(core2 === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // k=3: a survives round 1 (degree 3) but the cascade empties the rest
    val core3 = graft.operators.Graphs.kCore(e, "src", "dst", k = 3, rounds = 3)
    assert(core3.count() === 0L)
  }

  test("pageRank unrolled and checkpointed forms produce identical ranks") {
    // a graph with a dangling node (z has no out-edges) and asymmetric
    // degrees — exercises the left join's coalesce(0) and `div outdeg`
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "z"))
      .toDF("src", "dst")
    def ranks(unrollBelow: Long) = graft.operators.Graphs
      .pageRankImpl(e, "src", "dst", iterations = 3, unrollBelow)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("pr")).toMap
    val unrolled = ranks(Long.MaxValue)
    val checkpointed = ranks(0L)
    assert(unrolled === checkpointed)
    // fixed-point mass sanity: every rank positive, z (dangling, one
    // in-edge from the hub c) below the hub's rank
    assert(unrolled.values.forall(_ > 0L))
    assert(unrolled("z") < unrolled("c"))
  }

  test("iterative graph ops stop early once converged (rounds are a cap)") {
    // a triangle IS its own 2-core: round 1 removes nothing → converged,
    // the other 49 budgeted rounds never run
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val (core, kRounds) = graft.operators.Graphs
      .kCoreWithRounds(tri, "src", "dst", k = 2, rounds = 50)
    assert(kRounds === 1)
    assert(core.collect().map(r =>
      r.getString(0) -> r.getAs[Long]("degree")).toMap ===
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // the pendant graph needs one real peel round + one no-op probe
    val pend = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .toDF("src", "dst")
    val (_, kRounds2) = graft.operators.Graphs
      .kCoreWithRounds(pend, "src", "dst", k = 2, rounds = 50)
    assert(kRounds2 === 2)
    // BFS on a 2-hop path exhausts its frontier at depth 3 — depths
    // 4..50 are skipped, and the result equals the uncapped semantics
    val path = Seq(("s", "m"), ("m", "t")).toDF("src", "dst")
    val (lvls, depth) = graft.operators.Graphs
      .bfsLevelsWithDepth(path, "src", "dst", "s", maxDepth = 50)
    assert(depth === 3) // round 3 probed the empty frontier, then stopped
    assert(lvls.collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ===
      Map("s" -> 0, "m" -> 1, "t" -> 2))
  }

  test("rrf fusion is rank-based and deterministic under ties") {
    val a = Seq((1L, 10L), (2L, 5L), (3L, 5L)).toDF("id", "score")
    val b = Seq((1L, 1L), (2L, 9L), (3L, 2L)).toDF("id", "score")
    val r = graft.operators.InvertedIndex.rrfFuse(Seq(a, b), "id", "score")
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Int]("r1"), x.getAs[Int]("r2"))).toMap
    // ties in a (ids 2,3 score 5) break by id asc
    assert(r(1L) === ((1, 3)))
    assert(r(2L) === ((2, 1)))
    assert(r(3L) === ((3, 2)))
  }

  test("bigram NLL: doubled-bigram docs score lower than shuffled docs") {
    val d = Seq(
      (1L, "a b a b a b a b"),  // all bigrams frequent
      (2L, "a a b b b a a b"),  // rarer transitions, same unigrams
      (3L, "z")                 // <2 tokens → n_bigrams 0
    ).toDF("doc_id", "text")
    val r = graft.operators.Curation.bigramLogProb(d, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Double]("nll"))).toMap
    assert(r(1L)._1 === 7L && r(2L)._1 === 7L)
    assert(r(3L) === ((0L, 0.0)))
    assert(r(1L)._2 < r(2L)._2,
      s"frequent-transition doc must score lower NLL: $r")
  }

  test("interval join: [s,e) boundaries, cross-cell spans, empty intervals") {
    val pts = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, 399L),
      (6L, 400L)).toDF("pid", "sec")
    val iv = Seq((10L, 100L, 400L),  // spans cells 1..3 at bucket=100
      (11L, 0L, 100L),               // exactly one cell; 100 excluded
      (12L, 50L, 50L),               // empty: e == s matches nothing
      (13L, 60L, 40L)                // inverted: matches nothing
    ).toDF("iid", "s", "e")
    val got = graft.operators.TimeSeries
      .intervalJoin(pts, "sec", iv, "s", "e", bucketSec = 100L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 3L), (10L, 4L), (10L, 5L),  // 400 excluded
      (11L, 1L), (11L, 2L)))                             // 100 excluded
  }

  test("bpeEncode applies merges in rank order, chained through outputs") {
    // "theater": t h e a t e r → (t,h) → (th,e) → (e,r) → (a,t) gives
    // [the, at, er] = 3 tokens — rule 2 consumes rule 1's output, rule 8
    // must NOT re-merge the 'a t' consumed by... it does: at survives.
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t")
    val docs = Seq((1L, "The theater is there!"), (2L, ""), (3L, "  ?!  "))
      .toDF("doc_id", "text")
    val got = graft.operators.Tokenizer
      .bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the=1 tok, theater=[the,at,er]=3, is=2, there=[the,r? ...]:
    // t h e r e → th e r e → the r e → (r,e)→re → [the, re] = 2
    assert(got(1L) === ((4L, 8L, 17L)))
    assert(got(2L) === ((0L, 0L, 0L))) // empty doc
    assert(got(3L) === ((0L, 0L, 0L))) // punctuation-only doc
  }

  test("trained bpeMerges output plugs into bpeEncode and compresses") {
    val corpus = Seq((1L, "banana bandana banana"), (2L, "banana banana"))
      .toDF("doc_id", "text")
    val merges = graft.operators.Tokenizer.bpeMerges(corpus, "text", rounds = 3)
      .orderBy("merge_round")
      .collect().map(r => r.getString(1) -> r.getString(2)).toSeq
    assert(merges.nonEmpty)
    val enc = graft.operators.Tokenizer
      .bpeEncode(corpus, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    enc.foreach { case (nTok, nChars) =>
      assert(nTok < nChars, "merges must compress below char-level")
      assert(nTok > 0)
    }
  }

  test("hllOverlap inclusion-exclusion tracks true intersection") {
    val rows = ((1L to 1000L).map(k => ("a", k)) ++
      (501L to 1500L).map(k => ("b", k))).toDF("g", "k")
    val r = graft.operators.Sketches.hllOverlap(rows, "g", "k", "a", "b")
      .collect()(0)
    val (ea, eb, eu, ei) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
    assert(math.abs(ea - 1000) < 150 && math.abs(eb - 1000) < 150)
    assert(math.abs(eu - 1500) < 225)
    // intersection error compounds the three estimates — loose band
    assert(ei > 200 && ei < 800, s"overlap estimate $ei out of band")
  }

  test("kAnonymize: every released class reaches k; escalation over displayed tuples") {
    val rows = (Seq.fill(5)(("A", "x")) ++ // (A,x): 5 ≥ k → released level 0
      Seq.fill(2)(("A", "y")) ++           // (A,y): 2 < k; (A,*) holds only
      Seq(("B", "z"))                      //   the 2 survivors < k → escalate;
    ).toDF("g1", "g2")                     //   residue (*,*) = 2+1 = 3 rows
    val got = graft.operators.Audit.kAnonymize(rows, Seq("g1", "g2"), k = 4)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getLong(3))).toSet
    // the old original-partition count would release ("A","*") with only
    // 2 rows (the (A) partition had 7 ≥ k, but 5 of those were already
    // released at level 0) — the escalation fixpoint coarsens them into
    // the residue instead, so every released class is ≥ k
    assert(got === Set(("A", "x", 0, 5L), ("*", "*", 2, 3L)))
    got.filter(_._3 < 2).foreach { g =>
      assert(g._4 >= 4, s"released class below k: $g")
    }
    // a corpus smaller than k collapses entirely into the reported residue
    val tiny = Seq(("C", "q")).toDF("g1", "g2")
    val res = graft.operators.Audit.kAnonymize(tiny, Seq("g1", "g2"), k = 4)
      .collect()
    assert(res.length === 1 && res(0).getInt(2) === 2 &&
      res(0).getString(0) === "*" && res(0).getLong(3) === 1L)
  }

  test("lDiversityAudit flags homogeneous released classes") {
    // class A: 3 rows, all sensitive 's1' → k-anonymous at k=2 but
    // l-diverse only at l=1 — the homogeneity leak the audit exists for.
    // class B: 2 rows, two distinct values → meets l=2.
    // class C: 1 row < k → escalates to the residue, which then holds
    // one row with one value.
    val rows = Seq(("A", "s1"), ("A", "s1"), ("A", "s1"),
      ("B", "s1"), ("B", "s2"), ("C", "s3")).toDF("g", "sens")
    val got = graft.operators.Audit
      .lDiversityAudit(rows, Seq("g"), "sens", k = 2, l = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got === Set(
      ("A", 0, 3L, 1L, false),
      ("B", 0, 2L, 2L, true),
      ("*", 1, 1L, 1L, false)))
  }

  test("minhashLsh bounds candidate volume on a hot band bucket") {
    // pathological corpus: 2000 byte-identical documents — every band
    // bucket holds all 2000 docs, so the uncapped band self-join would
    // emit C(2000,2) ≈ 2.0M candidate pairs (10¹² at a 10⁶-copy
    // boilerplate bucket). With maxBandBucket=100 the bucket census
    // sub-splits each into ⌈2000/100⌉ = 20 id-hash cells: ~20·C(100,2)
    // ≈ 100k in-cell pairs per band, identical across bands → ~100k
    // distinct candidates, linear in corpus size.
    val docs = (1L to 2000L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val parts = graft.operators.Dedup.minhashLshParts(docs, "doc_id",
      "text", numHashes = 16, bands = 4, k = 3, threshold = 0.8,
      maxBandBucket = 100)
    try {
      val nCand = parts.candidates.count()
      assert(nCand <= 120000L, s"hot-bucket candidates not bounded: $nCand")
      assert(nCand >= 80000L, s"in-cell pairs went missing: $nCand")
    } finally parts.caches.foreach(_.unpersist(blocking = false))
  }

  test("minhashLshIngest pairs new docs against the corpus, never corpus-self") {
    val existing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta epsilon zeta") // in-corpus dup of 1
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (11L, "alpha beta gamma delta epsilon zeta"), // twin of 1 and 3
      (12L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .minhashLshIngest(existing, incoming, "doc_id", "text",
        numHashes = 16, bands = 4, k = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // cross-day twins found at jaccard 1; the (1,3) in-corpus dup pair
    // must NOT appear (that's the self-join's job, already paid for)
    assert(got === Set((11L, 1L, 1.0), (11L, 3L, 1.0)))
  }

  test("prioritySample: exact k, deterministic, zero-weight rows excluded") {
    val docs = (1L to 200L)
      .map(i => (i, if (i % 50 == 0) 0.0 else i.toDouble))
      .toDF("id", "w")
    val s1 = graft.operators.Curation.prioritySample(docs, "id", col("w"), 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val s2 = graft.operators.Curation.prioritySample(docs, "id", col("w"), 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(s1.toSeq === s2.toSeq, "sample must be replay-stable")
    assert(s1.length === 20)
    assert(s1.forall { case (id, p) => id % 50 != 0 && p > 0 })
    // weighted bias: ids 101..200 carry ~3x the total mass of 1..100,
    // so they must dominate the sample (deterministic given the fixed
    // md5 draws — this pins the weighting direction, not a p-value)
    assert(s1.count(_._1 > 100) > 10)
  }

  test("kAnonymizeApply rows aggregate back to the kAnonymize census") {
    val rows = (Seq.fill(5)(("A", "x")) ++ Seq.fill(2)(("A", "y")) ++
      Seq(("B", "z"))).toDF("g1", "g2")
    val applied = graft.operators.Audit
      .kAnonymizeApply(rows, Seq("g1", "g2"), k = 4, carryCols = Seq())
      .groupBy("g1", "g2", "suppression_level")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    // row-level release re-aggregates to exactly the census kAnonymize
    // publishes — same classes, same sizes
    assert(applied === Set(("A", "x", 0, 5L), ("*", "*", 2, 3L)))
  }

  test("sampleFrameStats: stride sampling, container skip, bad-magic null row") {
    val docs = Seq(7L).toDF("doc_id") // n = 7%6+2 = 3 frames → sample 0, 2
    val vids = graft.operators.Multimodal.attachSyntheticVideo(docs, "doc_id")
    val got = graft.operators.Multimodal
      .sampleFrameStats(vids, "media_id", "media_bytes", everyN = 2)
      .collect().map(r => (r.getInt(2), r.getInt(3), r.getInt(4),
        r.getDouble(5))).sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0, 2), "stride must sample frames 0,2")
    assert(got.forall { case (_, w, h, _) => w == 9 && h == 5 }) // 7%8+2, 7%4+2
    assert(got.map(_._4).toSeq === Seq((7 * 7) % 256, (7 * 7 + 22) % 256)
      .map(_.toDouble))
    // a non-GMJ1 payload keeps its id with null stats, never throws
    val bad = Seq((9L, "not a container".getBytes("UTF-8")))
      .toDF("media_id", "media_bytes")
    val nulls = graft.operators.Multimodal
      .sampleFrameStats(bad, "media_id", "media_bytes", everyN = 2).collect()
    assert(nulls.length === 1 && nulls(0).getLong(0) === 9L &&
      nulls(0).isNullAt(1))
    // poison pills past the magic check: a truncated container and a
    // garbage frame length (would allocate ~2 GB) both yield the null
    // row instead of killing the task
    val full = vids.collect()(0).getAs[Array[Byte]](1)
    val truncated = full.take(full.length / 2)
    val garbageLen = {
      val b = full.clone()
      // first frame length prefix lives at offset 8: overwrite with a
      // huge value that no remaining-bytes budget can back
      b(8) = 0x7f.toByte; b(9) = 0xff.toByte
      b(10) = 0xff.toByte; b(11) = 0xff.toByte
      b
    }
    val poison = Seq((11L, truncated), (12L, garbageLen))
      .toDF("media_id", "media_bytes")
    val got2 = graft.operators.Multimodal
      .sampleFrameStats(poison, "media_id", "media_bytes", everyN = 2)
      .collect().sortBy(_.getLong(0))
    assert(got2.length === 2)
    assert(got2.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    assert(got2.map(_.getLong(0)).toSeq === Seq(11L, 12L))
  }

  test("dHashBands: gradient saturates all bits, flat image none, bad bytes null") {
    // gray rises strictly in x (r=g=b=10x; 9-wide so sampling is the
    // identity) → every gradient sign positive → all four bands 0xffff
    val rising = Seq((1L,
      graft.operators.Multimodal.pngBytes(9, 8, (x, _) =>
        (x * 10 << 16) | (x * 10 << 8) | x * 10)))
      .toDF("media_id", "media_bytes")
    val r = graft.operators.Multimodal
      .dHashBands(rising, "media_id", "media_bytes").collect()(0)
    assert((1 to 4).map(r.getInt) === Seq(0xffff, 0xffff, 0xffff, 0xffff))
    // solid fill → zero gradients everywhere → all bands 0
    val flat = Seq((2L, graft.operators.Multimodal.pngBytes(5, 3,
      (_, _) => 0x804020))).toDF("media_id", "media_bytes")
    val f = graft.operators.Multimodal
      .dHashBands(flat, "media_id", "media_bytes").collect()(0)
    assert((1 to 4).map(f.getInt) === Seq(0, 0, 0, 0))
    val bad = Seq((3L, "junk".getBytes("UTF-8"))).toDF("media_id", "media_bytes")
    val b = graft.operators.Multimodal
      .dHashBands(bad, "media_id", "media_bytes").collect()(0)
    assert(b.getLong(0) === 3L && b.isNullAt(1))
  }

  test("imageNearDupPairs: copy collapse, pigeonhole boundary, null exclusion") {
    val hashes = Seq(
      (10L, 7, 0, 0, 0),   // base
      (11L, 7, 0, 0, 0),   // exact copy → collapses into rep 10
      (12L, 6, 0, 0, 0),   // 1 bit from base → pair (10,12) hamming 1
      (13L, 7, 15, 0, 0),  // 4 bits, all in band 1 → over maxHamming
      (14L, 6, 1, 1, 1)    // 1 bit per band vs base → hamming 4 → out
    ).toDF("media_id", "b0", "b1", "b2", "b3")
      .unionByName(Seq((15L, null, null, null, null))
        .toDF("media_id", "b0", "b1", "b2", "b3")
        .select(col("media_id").cast("long").as("media_id"),
          col("b0").cast("int").as("b0"), col("b1").cast("int").as("b1"),
          col("b2").cast("int").as("b2"), col("b3").cast("int").as("b3")))
    val got = graft.operators.Multimodal.imageNearDupPairs(hashes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (10,13): bands 0/2/3 equal but hamming 4 → correctly dropped;
    // (12,13): differs 5 bits → dropped; (12,14): b2/b3 differ → only
    // shares band 0 value 6 → hamming 3 (b1 1 bit + b2 1 + b3 1) → kept
    assert(got === Set((10L, 12L, 1), (12L, 14L, 3)))
  }

  test("bandNearDupPairs bounds candidates when distinct hashes crowd a band") {
    // 3000 DISTINCT hashes all sharing band 0's value (b0=0) but far
    // apart elsewhere: the uncapped band-0 bucket would emit
    // C(3000,2) ≈ 4.5M candidate pairs. With maxBucket=100 the census
    // sub-splits it into 30 rep-hash cells → ~30·C(100,2) ≈ 150k.
    // (Bands 1–3 stay spread: distinct values → no pairs from them.)
    val hashes = (0 until 3000).map(i =>
      (i.toLong, 0, i % 97, (i * 31) % 65536, (i * 57) % 65536))
      .toDF("media_id", "b0", "b1", "b2", "b3")
    val out = graft.operators.Multimodal
      .imageNearDupPairs(hashes, maxHamming = 3, maxBucket = 100)
    // every released pair still honors the hamming contract
    assert(out.filter(col("hamming") > 3).count() === 0L)
    // and a corpus with no hot bucket is untouched by the cap: capped
    // and uncapped pair sets identical
    val small = (0 until 50).map(i =>
      (i.toLong, i % 3, i % 5, i % 7, i % 11))
      .toDF("media_id", "b0", "b1", "b2", "b3")
    def pairs(mb: Int) = graft.operators.Multimodal
      .imageNearDupPairs(small, maxHamming = 3, maxBucket = mb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs(100000) === pairs(Int.MaxValue))
  }

  test("audioEnvelopeBands: rising envelope saturates, flat is zero, bad null") {
    def wav(samples: Array[Short]) =
      graft.operators.Multimodal.wavBytes(8000f, samples)
    // 32 samples → 16 frames of 2; |amp| rises per frame → all 15 bits
    val rising = Seq((1L, wav(Array.tabulate(32)(i => (i * 100).toShort))))
      .toDF("media_id", "media_bytes")
    val r = graft.operators.Multimodal
      .audioEnvelopeBands(rising, "media_id", "media_bytes").collect()(0)
    assert((r.getInt(1), r.getInt(2)) === (0xff, 0x7f))
    // constant amplitude → every envelope gradient flat → no bit set
    val flat = Seq((2L, wav(Array.fill(32)(5.toShort))))
      .toDF("media_id", "media_bytes")
    val f = graft.operators.Multimodal
      .audioEnvelopeBands(flat, "media_id", "media_bytes").collect()(0)
    assert((f.getInt(1), f.getInt(2)) === (0, 0))
    val bad = Seq((3L, "noise".getBytes("UTF-8"))).toDF("media_id", "media_bytes")
    val b = graft.operators.Multimodal
      .audioEnvelopeBands(bad, "media_id", "media_bytes").collect()(0)
    assert(b.getLong(0) === 3L && b.isNullAt(1))
  }

  test("lastTouchAttribution: lookback bound, direct fallback, tie order") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1: click chA at t=100, purchase at t=200 → chA
      (1L, 1L, ts(100), "click", 0.0, "A"),
      (2L, 1L, ts(200), "purchase", 10.0, ""),
      // user 2: click chB at t=0, purchase at t=700000 (beyond 604800) → direct
      (3L, 2L, ts(0), "click", 0.0, "B"),
      (4L, 2L, ts(700000), "purchase", 20.0, ""),
      // user 3: purchase before any click → direct
      (5L, 3L, ts(50), "purchase", 30.0, ""),
      (6L, 3L, ts(60), "click", 0.0, "C"),
      // user 4: same-ts click (smaller id) then purchase → attributed
      (7L, 4L, ts(500), "click", 0.0, "D"),
      (8L, 4L, ts(500), "purchase", 40.0, "")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "ch")
    val got = graft.operators.Funnel.lastTouchAttribution(ev, "user_id",
        "ts", "event_id", "event_type", "click", "purchase",
        channel = col("ch"), lookbackSec = 604800L)
      .select("event_id", "channel").as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "A", 4L -> "direct", 5L -> "direct",
      8L -> "D"))
  }

  test("hotKeySaltedJoin is row-identical to the plain join, salts only hot keys") {
    val facts = ((1L to 900L).map(i => (7L, i)) ++        // hot key: 900 rows
      (1L to 50L).map(i => (i % 20 + 100L, i)) ++          // cold keys
      Seq((999L, 0L))                                      // unmatched key
    ).toDF("k", "payload")
    val dim = ((1L to 200L) :+ 7L).distinct.map(k => (k, s"d$k"))
      .toDF("k", "attr")
    val plain = facts.join(dim, Seq("k")).select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val salted = graft.operators.SkewTools
      .hotKeySaltedJoin(facts, dim, "k", saltN = 4, hotThreshold = 100L)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted === plain)
    // left join keeps unmatched fact rows exactly once
    val leftPlain = facts.join(dim, Seq("k"), "left").count()
    val leftSalted = graft.operators.SkewTools
      .hotKeySaltedJoin(facts, dim, "k", 4, 100L, "left").count()
    assert(leftSalted === leftPlain)
    // no hot keys → plain join path
    val cold = graft.operators.SkewTools
      .hotKeySaltedJoin(facts, dim, "k", 4, 10000L).count()
    assert(cold === plain.size)
  }

  test("cmsJoinSize overestimates and tracks the exact self-join size") {
    val keys = (1L to 500L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
      .toDF("k")
    val exact = keys.groupBy("k").count()
      .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    val est = graft.operators.Sketches.cmsJoinSize(keys, "k", keys, "k")
      .collect()(0).getLong(0)
    assert(est >= exact, "CM inner product must never underestimate")
    // collision overhead ≈ (Σc)²/width per depth row (~2.2k here): well
    // inside 2× of the true 5.5k — the operating regime of the estimate
    assert(est <= exact * 2, s"est $est far above exact $exact")
  }

  test("cmsJoinSize on disjoint key sets stays near zero") {
    val a = (1L to 300L).toDF("k")
    val b = (10001L to 10300L).toDF("k")
    val est = graft.operators.Sketches.cmsJoinSize(a, "k", b, "k")
      .collect()(0).getLong(0)
    // true join size 0; only hash collisions contribute
    assert(est < 100L, s"disjoint-key estimate $est too large")
  }

  test("snapshotDiff classifies added/removed/changed incl. NULL edits") {
    val old = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, None), (5L, Option("NULL"))).toDF("k", "v")
    val neu = Seq((1L, Option("a")),        // unchanged
      (2L, Option("B")),                    // changed
      // 3 removed
      (4L, Option("NULL")),                 // NULL -> 'NULL' must be a change
      (5L, Option("NULL")),                 // unchanged
      (6L, Option("f"))).toDF("k", "v")     // added
    val got = graft.operators.Audit.snapshotDiff(old, neu, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("hardNegatives: ranked in-bucket, near-dups excluded by hi bound") {
    val dim = 8
    val base = Seq.tabulate(dim)(i => if (i == 0) 1.0f else 0.1f)
    val vecs = Seq(
      (1L, base),                                      // anchor
      (2L, base),                                      // exact dup: cos=1, excluded
      (3L, base.updated(1, 0.9f)),                     // close neighbor
      (4L, base.updated(2, 0.7f)),                     // farther neighbor
      (5L, base.map(x => -x))                          // opposite halfspace
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.hardNegatives(
      vecs, "vec_id", "embedding", dim, bits = 4, lo = 0.0, hi = 0.999, m = 2)
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) !== r.getLong(1), "no self pairs")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 0.999)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 2)
    }
    val anchor1 = got.filter(_.getLong(0) == 1L).sortBy(_.getInt(3))
    // duplicates (cos 1.0) excluded; in-bucket neighbors ranked by cos
    // (vec 4 is the closer one: cos≈0.878 vs vec 3's ≈0.813)
    assert(!anchor1.exists(_.getLong(1) == 2L))
    assert(anchor1.map(_.getLong(1)).toSeq === Seq(4L, 3L))
  }

  test("linkPrediction scores the square's diagonals, exactly") {
    // 4-cycle a-b-c-d-a: the only non-adjacent pairs are the diagonals,
    // each sharing both its endpoints' neighbors (deg 2 everywhere)
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val r = graft.operators.Graphs.linkPrediction(e, "src", "dst",
        minCommon = 2, maxViaDegree = 64, topK = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Long]("common"), x.getAs[Long]("ra_micro"),
          x.getAs[Long]("aa_micro"))).toMap
    // ra: 2 × (1000000 div 2); aa: 2 × round(1e6 / round8(ln 2))
    assert(r === Map(
      ("a", "c") -> ((2L, 1000000L, 2885390L)),
      ("b", "d") -> ((2L, 1000000L, 2885390L))))
  }

  test("linkPrediction hub cap drops evidence through hot via nodes") {
    // star: every leaf pair's ONLY shared neighbor is the hub (deg 5) —
    // capping via degree at 4 removes all candidates, uncapped keeps them
    val e = (1 to 5).map(i => ("h", s"x$i")).toDF("src", "dst")
    assert(graft.operators.Graphs.linkPrediction(e, "src", "dst",
      minCommon = 1, maxViaDegree = 4).count() === 0L)
    val open = graft.operators.Graphs.linkPrediction(e, "src", "dst",
      minCommon = 1, maxViaDegree = 5)
    assert(open.count() === 10L) // C(5,2) leaf pairs
    // existing edges never appear: no (h, x_i) row
    assert(!open.collect().exists(r =>
      r.getString(0) == "h" || r.getString(1) == "h"))
  }

  test("balancedShards snake draft equalizes per-shard token totals") {
    val docs = Seq(80L, 70L, 60L, 50L, 40L, 30L, 20L, 10L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    val r = graft.operators.Curation
      .balancedShards(docs, "doc_id", col("t"), nShards = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("shard"))).toMap
    // rank order = token desc; blocks of 2 serpentine: 0,1 | 1,0 | 0,1 | 1,0
    assert(r(0L) === ((80L, 0L)) && r(1L) === ((70L, 1L)))
    assert(r(2L) === ((60L, 1L)) && r(3L) === ((50L, 0L)))
    assert(r(4L) === ((40L, 0L)) && r(5L) === ((30L, 1L)))
    assert(r(6L) === ((20L, 1L)) && r(7L) === ((10L, 0L)))
    val totals = r.values.groupMapReduce(_._2)(_._1)(_ + _)
    assert(totals === Map(0L -> 180L, 1L -> 180L))
  }

  test("pngHeaderDims: header peek matches real PNGs, rejects garbage") {
    val png = Multimodal.pngBytes(19, 7, (_, _) => 0x336699)
    val rows = Seq(
      (1L, png),
      (2L, "definitely not a png".getBytes("UTF-8")),
      (3L, png.take(20)), // truncated before the dims
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "media_bytes")
    val r = Multimodal.pngHeaderDims(rows, "id", "media_bytes")
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)), Option(x.get(2)), Option(x.get(3)))).toMap
    assert(r(1L) === ((Some(19L), Some(7L), Some(2714L)))) // 19000 div 7
    assert(r(2L) === ((None, None, None)))
    assert(r(3L) === ((None, None, None)))
    assert(r(4L) === ((None, None, None)))
  }

  test("semanticContamination flags planted dups with min-id best match") {
    val base = Seq(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(0.9f, 0.1f, 0f, 0f))
    val corpus = base.toDF("vec_id", "embedding")
    // two identical benchmark copies of vector 1 → best match = min id
    val bench = Seq(100L -> Array(1f, 0f, 0f, 0f),
      101L -> Array(1f, 0f, 0f, 0f)).toDF("bench_id", "embedding")
    val r = graft.operators.Similarity.semanticContamination(
        corpus, "vec_id", "embedding", bench, "bench_id", "embedding",
        dim = 4, bits = 2, threshold = 0.995)
      .collect().map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Long]("bench_id"), x.getAs[Double]("cos"))).toMap
    assert(r.contains(1L) && r(1L) === ((100L, 1.0)))
    assert(!r.contains(2L)) // orthogonal — never near the benchmark
    val cleaned = graft.operators.Similarity.semanticDecontaminate(
      corpus, "vec_id", "embedding", bench, "bench_id", "embedding",
      dim = 4, bits = 2, threshold = 0.995)
    assert(cleaned.select("vec_id").collect().map(_.getLong(0)).toSet
      === base.map(_._1).toSet - 1L)
  }

  test("retrieveContext keeps the cosine-ranked prefix within budget") {
    // one query; three same-direction candidates (all share the LSH
    // bucket of the query) with descending cosine and 5 tokens each
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 0f), 5L),
      (11L, Array(0.9f, 0.1f, 0f, 0f), 5L),
      (12L, Array(0.8f, 0.2f, 0f, 0f), 5L)
    ).toDF("id", "embedding", "n_toks")
    val qs = Seq(1L -> Array(1f, 0f, 0f, 0f)).toDF("qid", "embedding")
    val r = graft.operators.Similarity.retrieveContext(
        corpus, "id", "embedding", "n_toks", qs, "qid", "embedding",
        dim = 4, bits = 1, budgetTokens = 12L)
      .orderBy("rk").collect()
    // budget 12 fits ranks 1-2 (cum 5, 10); rank 3 would hit 15
    assert(r.map(_.getAs[Long]("id")).toSeq === Seq(10L, 11L))
    assert(r.map(_.getAs[Int]("rk")).toSeq === Seq(1, 2))
    assert(r.map(_.getAs[Long]("cum_tokens")).toSeq === Seq(5L, 10L))
    assert(r(0).getAs[Double]("cos") === 1.0)
  }

  test("hllOverlap of identical groups: union equals each side") {
    val rows = ((1L to 400L).map(k => ("a", k)) ++
      (1L to 400L).map(k => ("b", k))).toDF("g", "k")
    val r = graft.operators.Sketches.hllOverlap(rows, "g", "k", "a", "b")
      .collect()(0)
    assert(r.getDouble(2) === r.getDouble(3)) // same keys → same sketch
    assert(r.getDouble(4) === r.getDouble(2)) // union of equals is equal
    // overlap = a + b − union = a exactly (same rounded doubles)
    assert(r.getDouble(5) === r.getDouble(2))
  }

  test("trainLogistic learns a separable boundary and is deterministic") {
    import graft.operators.Curation
    // y=1 rows have feature ≈ 0.9, y=0 rows ≈ 0.1 — cleanly separable
    val rows = (1L to 200L).map { i =>
      val y = i % 2
      val f = if (y == 1) 0.9 + (i % 5) * 0.01 else 0.1 + (i % 5) * 0.01
      (i, y, f)
    }.toDF("id", "y", "f")
    val out = Curation.trainLogistic(rows, "id", col("y"), Seq(col("f")),
      epochs = 20, lr = 5.0).collect()
    val acc = out.count(r => (r.getAs[Long]("y") == 1L) ==
      r.getAs[Boolean]("pred")).toDouble / out.length
    assert(acc === 1.0, s"separable data must reach accuracy 1.0, got $acc")
    // replay-determinism: identical run, identical scores
    val out2 = Curation.trainLogistic(rows, "id", col("y"), Seq(col("f")),
      epochs = 20, lr = 5.0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq ===
      out2.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq)
  }

  test("knBigramLogProb: repeated bigrams score cheaper than rare ones") {
    import graft.operators.Curation
    val d = Seq(
      (1L, "a b a b a b a b"),  // only (a,b)/(b,a) — high-count bigrams
      (2L, "a b c d e f g h"), // mostly once-seen bigrams
      (3L, "x")                // no bigrams at all
    ).toDF("doc_id", "text")
    val m = Curation.knBigramLogProb(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("kn_nll"))).toMap
    assert(m(3L) === ((0L, 0.0)))
    assert(m(1L)._1 === 7L && m(2L)._1 === 7L)
    assert(m(1L)._2 < m(2L)._2, "frequent bigrams must have lower NLL")
    assert(m.values.forall(_._2 >= 0.0))
  }

  test("zipfFit recovers the slope of an exact power-law corpus") {
    import graft.operators.Curation
    // token t_r appears round(1000 / r) times: freq = 1000·rank^(-1)
    val words = (1 to 20).flatMap { r =>
      Seq.fill(math.round(1000.0 / r).toInt)(f"tok$r%02d") }
    val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = Curation.zipfFit(d, "text").collect()(0)
    assert(row.getAs[Long]("n_types") === 20L)
    val slope = row.getAs[Double]("slope")
    assert(slope < -0.95 && slope > -1.05,
      s"pure 1/rank corpus must fit slope ≈ −1, got $slope")
    assert(row.getAs[Double]("r2") > 0.99)
  }

  test("pc1Component recovers the dominant axis of an anisotropic cloud") {
    import graft.operators.Spectral
    // variance 100x along a fixed diagonal direction in 8 dims; noise
    // elsewhere — power iteration from all-ones must align with it
    val dim = 8
    val axis = (0 until dim).map(d => if (d % 2 == 0) 0.5 else -0.5)
    val rows = (1L to 400L).map { i =>
      val t = ((i * 2654435761L) % 2001L).toDouble / 100.0 - 10.0 // ±10
      val noise = (0 until dim).map(d =>
        (((i * 31 + d * 17) % 201).toDouble / 1000.0) - 0.1)      // ±0.1
      (i, (0 until dim).map(d => (t * axis(d) + noise(d)).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val v = Spectral.pc1Component(rows, "embedding", dim)
    val cos = {
      val dot = v.zip(axis).map { case (a, b) => a * b }.sum
      val na = math.sqrt(v.map(x => x * x).sum)
      val nb = math.sqrt(axis.map(x => x * x).sum)
      math.abs(dot) / (na * nb)
    }
    assert(cos > 0.999, s"pc1 must align with the planted axis, |cos|=$cos")
    // determinism: identical input, identical component
    assert(Spectral.pc1Component(rows, "embedding", dim) === v)
  }

  test("winnowingFingerprints: shared runs yield shared fingerprints") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // doc 2 shares the long middle run with doc 1 (>= w+k-1 = 6 tokens)
      (2L, "xx yy gamma delta epsilon zeta eta theta zz ww"),
      (3L, "completely different words entirely unrelated content here now"),
      (4L, "ab")  // fewer than k tokens: no grams, no fingerprints
    ).toDF("doc_id", "text")
    val m = Dedup.winnowingFingerprints(d, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_fps"),
          r.getAs[Long]("n_shared_fps"))).toMap
    assert(m(4L) === ((0L, 0L, 0L)))
    assert(m(1L)._2 > 0 && m(2L)._2 > 0)
    // winnowing guarantee: a shared token run of >= w+k-1 tokens shares
    // at least one fingerprint hash
    assert(m(1L)._3 > 0 && m(2L)._3 > 0,
      s"docs sharing a 6-token run must share a fingerprint: $m")
    assert(m(3L)._3 === 0L, "unrelated doc must share nothing")
  }

  test("softDedupWeights: cluster members weigh 1/size, singletons 1.0") {
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val m = Dedup.softDedupWeights(ids, "doc_id", pairs)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("cluster_size"),
          r.getAs[Double]("weight"))).toMap
    assert(m(1L) === ((1L, 3L, 0.333333)))
    assert(m(2L) === ((1L, 3L, 0.333333)))
    assert(m(5L) === ((1L, 3L, 0.333333)))
    assert(m(3L) === ((3L, 1L, 1.0)))
    assert(m(4L) === ((4L, 1L, 1.0)))
  }

  test("blocklistFilter counts phrase hits case-insensitively") {
    import graft.operators.Curation
    val d = Seq(
      (1L, "clean text with nothing wrong at all"),
      (2L, "Spam Phrase here and spam phrase again"),
      (3L, "BAD WORD"),
      (4L, "overlap test: ababab")  // "abab": non-overlapping => 1 hit
    ).toDF("doc_id", "text")
    val out = Curation.blocklistFilter(d, "doc_id", "text",
      Seq("spam" -> Seq("spam phrase", "abab"), "adult" -> Seq("bad word")))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("hits_spam"), r.getAs[Long]("hits_adult"),
          r.getAs[Long]("total_hits"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) === ((0L, 0L, 0L, true)))
    assert(out(2L) === ((2L, 0L, 2L, false)))
    assert(out(3L) === ((0L, 1L, 1L, false)))
    assert(out(4L) === ((1L, 0L, 1L, false)))
  }

  test("fertilityByGroup: trained-language text has lower fertility") {
    import graft.operators.Tokenizer
    // merges cover "the"/"and" patterns: English-like text compresses,
    // the letter-soup group stays near 1 token per char-word
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"))
    val d = Seq(
      (1L, "en", "the and the and the and the"),
      (2L, "en", "and the and the the"),
      (3L, "xx", "zq wv kp zq wv kp zq wv")
    ).toDF("doc_id", "lang", "text")
    val m = Tokenizer.fertilityByGroup(d, "doc_id", "text", "lang", merges)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("fertility"),
          r.getAs[Double]("chars_per_token"))).toMap
    assert(m("en")._1 === 2L && m("xx")._1 === 1L)
    assert(m("en")._2 < m("xx")._2,
      s"merge-covered language must have lower fertility: $m")
    assert(m("en")._3 > m("xx")._3)
  }

  test("bitextMarginMine suppresses hub matches and finds true pairs") {
    import graft.operators.Similarity
    val dim = 8
    // xs: 0,2,4 | ys: 1 (twin of 0), 3 (twin of 2), 5 (orthogonal-ish)
    def v(base: Seq[Double], eps: Double): Array[Float] =
      base.map(x => (x + eps).toFloat).toArray
    val a = Seq(1.0, 0.0, 0.5, 0.0, 0.2, 0.0, 0.1, 0.0)
    val b = Seq(0.0, 1.0, 0.0, 0.5, 0.0, 0.2, 0.0, 0.1)
    val c = Seq(0.5, 0.5, -0.5, 0.5, 0.3, -0.3, 0.2, 0.2)
    val df = Seq(
      (0L, v(a, 0.0)), (1L, v(a, 0.01)),
      (2L, v(b, 0.0)), (3L, v(b, 0.01)),
      (4L, v(c, 0.0)), (5L, v(c, 0.01))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bitextMarginMine(
      df.filter(col("vec_id") % 2 === 0), df.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", dim, k = 2, threshold = 0.0, bits = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every x's best match must be its planted twin (when they share
    // a bucket — twins always do: near-identical vectors agree on signs)
    out.foreach { case (x, y) => assert(y === x + 1,
      s"x=$x must mine its twin, got $y") }
    assert(out.nonEmpty)
  }

  test("StreamSample.foldBatch is replay-idempotent and order-invariant") {
    import graft.streaming.StreamSample
    val dir = java.nio.file.Files.createTempDirectory("graft-res").toString
    val state = s"$dir/state"
    def batch(ids: Seq[Long]) = StreamSample.prioritized(
      ids.toDF("id"), "id", col("id") % 3 + 1)
    StreamSample.foldBatch(batch(1L to 40L), state, "id", k = 10)
    StreamSample.foldBatch(batch(30L to 80L), state, "id", k = 10) // overlap
    val s1 = StreamSample.current(spark, state, "id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // replaying the second batch must not change the state
    StreamSample.foldBatch(batch(30L to 80L), state, "id", k = 10)
    val s2 = StreamSample.current(spark, state, "id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 === s2)
    // and the stream fold equals the batch sample over the union
    val all = batch(1L to 80L)
      .orderBy(col("priority").asc, col("id").asc).limit(10)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 === all)
  }

  test("doremiWeights upweights the highest-excess-loss domain") {
    import graft.operators.Curation
    // domain "rare" is all hapax tokens (max NLL); "common" repeats one
    val d = Seq(
      (1L, "common", "aa aa aa aa aa aa aa aa"),
      (2L, "common", "aa aa aa aa aa aa aa aa"),
      (3L, "rare", "q1 q2 q3 q4 q5 q6 q7 q8")
    ).toDF("doc_id", "source", "text")
    val m = Curation.doremiWeights(d, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("excess"), r.getAs[Double]("weight"))).toMap
    assert(m("rare")._1 > 0.0 && m("common")._1 === 0.0)
    assert(m("rare")._2 > m("common")._2)
    val ws = m.values.map(_._2).sum
    assert(math.abs(ws - 1.0) < 1e-4, s"weights must sum to ~1, got $ws")
  }

  test("truncationRecall is 1.0 when subDim = dim and degrades sanely") {
    import graft.operators.Similarity
    val dim = 8
    val rows = (0L to 99L).map { i =>
      (i, (0 until dim).map(d =>
        (((i * 13 + d * 7) % 200).toFloat / 100.0f) - 1.0f).toArray)
    }.toDF("vec_id", "embedding")
    val q = rows.filter(col("vec_id") === 0).collect()(0)
      .getSeq[Float](1).map(_.toDouble)
    val full = Similarity.truncationRecall(rows, "vec_id", "embedding",
      subDim = dim, q, ks = Seq(5, 10)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(full(5L) === 1.0 && full(10L) === 1.0)
    val half = Similarity.truncationRecall(rows, "vec_id", "embedding",
      subDim = 2, q.take(2), ks = Seq(5, 10)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(half.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("stream-folded moments reproduce the batch pc1 exactly") {
    import graft.operators.Spectral
    val dim = 8
    val rows = (1L to 300L).map { i =>
      (i, (0 until dim).map(d =>
        (((i * 31 + d * 17) % 201).toFloat / 100.0f) - 1.0f).toArray)
    }.toDF("vec_id", "embedding")
    val state = java.nio.file.Files.createTempDirectory("graft-mom")
      .resolve("m").toString
    Spectral.appendMomentsBatch(
      rows.filter(col("vec_id") % 2 === 0), state, "embedding", dim, 0L)
    Spectral.appendMomentsBatch(
      rows.filter(col("vec_id") % 2 === 1), state, "embedding", dim, 1L)
    // replayed batch: same partition rewritten, no double count
    Spectral.appendMomentsBatch(
      rows.filter(col("vec_id") % 2 === 1), state, "embedding", dim, 1L)
    val streamed = Spectral.pc1FromMomentState(spark, state, dim)
    val batch = Spectral.pc1Component(rows, "embedding", dim)
    assert(streamed === batch)
  }

  test("jsonlQuarantine routes garbage, keeps schema-drift rows ok") {
    import graft.sources.Ingest
    import org.apache.spark.sql.types.StructType
    val lines = Seq(
      (1L, """{"k":1,"name":"alice"}"""),        // clean
      (2L, """{"k":2"""),                        // truncated → quarantine
      (3L, "not json at all"),                   // garbage → quarantine
      (4L, """{"k":4}""")                        // missing field → ok, null
    ).toDF("line_id", "value")
    val out = Ingest.jsonlQuarantine(lines, "line_id", "value",
      StructType.fromDDL("k LONG, name STRING"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)))).toMap
    assert(out(1L) === ((true, Some(1L), Some("alice"), None)))
    assert(out(2L)._1 === false && out(2L)._4 === Some("""{"k":2"""))
    assert(out(3L)._1 === false && out(3L)._4 === Some("not json at all"))
    assert(out(4L) === ((true, Some(4L), None, None)))
  }

  test("templateMining: templated group scores near-zero entropy") {
    import graft.operators.Curation
    val tpl = (1L to 20L).map(i =>
      (i, "tpl", s"click here to claim prize number $i now"))
    val org = (21L to 40L).map(i =>
      (i, "org", s"w${i * 7 % 13} w${i * 11 % 17} w${i * 3 % 19} unique text ${i}"))
    val d = (tpl ++ org).toDF("doc_id", "source", "text")
    val m = Curation.templateMining(d, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_pos_entropy"))).toMap
    assert(m("tpl")._1 === 20L && m("org")._1 === 20L)
    assert(m("tpl")._2 < 0.5, s"template group must be low entropy: $m")
    assert(m("org")._2 > m("tpl")._2 * 2,
      s"organic group must scatter: $m")
  }

  test("StreamDrift: clean batch stays calm, novel batch alarms, replay idempotent") {
    import graft.streaming.StreamDrift
    val corpus = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog ran in the park")).toDF("doc_id", "text")
    val base = StreamDrift.baseline(corpus, "text").localCheckpoint()
    val r = base.agg(sum(col("cnt_b")), count(lit(1))).head()
    val (tot, voc) = (r.getLong(0), r.getLong(1))
    val state = java.nio.file.Files.createTempDirectory("graft-drift")
      .resolve("s").toString
    StreamDrift.foldBatch(corpus, "text", base, tot, voc, state, 0L, 0.5)
    val novel = Seq((3L, "zz qq ww zz qq ww zz qq")).toDF("doc_id", "text")
    StreamDrift.foldBatch(novel, "text", base, tot, voc, state, 1L, 0.5)
    StreamDrift.foldBatch(novel, "text", base, tot, voc, state, 1L, 0.5) // replay
    val rows = spark.read.parquet(state)
      .select(col("batch").cast("long"), col("kl"), col("alarm"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(rows.size === 2, s"replay must rewrite, not duplicate: $rows")
    assert(rows(0L)._1 < 0.5 && !rows(0L)._2)
    assert(rows(1L)._1 > 0.5 && rows(1L)._2,
      s"all-novel batch must alarm: ${rows(1L)}")
  }

  test("minhashRecallAudit counts are internally consistent") {
    val r = Dedup.minhashRecallAudit(docs, "doc_id", "text",
      numHashes = 8, bands = 4, k = 2, threshold = 0.5).collect()(0)
    val (nT, nF, nC) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nC <= nT && nC <= nF)
    assert(nT > 0, "the fixture has exact near-dup pairs")
    val rec = r.getAs[Double]("pair_recall")
    assert(rec >= 0.0 && rec <= 1.0)
    assert(r.getAs[Double]("pair_precision") >= 0.0)
  }

  test("randomProject preserves relative distances approximately") {
    import graft.operators.Spectral
    val dim = 32
    def vec(seed: Long): Array[Float] = (0 until dim).map(d =>
      ((((seed * 131 + d * 7919) % 2001) - 1000).toFloat / 1000.0f)).toArray
    val base = vec(5)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val far = vec(99)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val m = Spectral.randomProject(df, "vec_id", "embedding", dim, outDim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2(m(1L), m(2L)) < d2(m(1L), m(3L)),
      "a tiny perturbation must stay closer than an unrelated vector")
  }

  test("intervalCensus matches the hand-traced +1/−1 sweep") {
    import graft.operators.TimeSeries
    // [0,50] and [30,100] overlap (active 2 in buckets 3–5); [200,210]
    // is isolated; buckets of 10 s
    val iv = Seq((0L, 50L), (30L, 100L), (200L, 210L)).toDF("s", "e")
    val got = TimeSeries.intervalCensus(iv, "s", "e", bucketSeconds = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Seq((0L, 1L, 1L), (30L, 1L, 2L), (60L, -1L, 1L),
      (110L, -1L, 0L), (200L, 1L, 1L), (220L, -1L, 0L)))
  }

  test("ewmaMicro matches the hand-traced integer recurrence") {
    import graft.operators.TimeSeries
    // α=1/8: s₁=8; s₂=(7·8+16)>>3=9; s₃=(7·9+0)>>3=7; key isolation
    val df = Seq(("a", 1L, 8L), ("a", 2L, 16L), ("a", 3L, 0L),
      ("b", 1L, 100L)).toDF("k", "t", "x")
    val got = TimeSeries.ewmaMicro(df, "k", "t", "x", num = 1L, shift = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sorted
    assert(got === Seq(("a", 1L, 8L), ("a", 2L, 9L), ("a", 3L, 7L),
      ("b", 1L, 100L)))
  }

  test("rrfFuse: ids high on both lists beat a single #1") {
    val r1 = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val r2 = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(r1, r2), "id", "rank", topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 20 is rank 2+1 → 16129+16393 = 32522, beating both solo #1s
    assert(got === Array((20L, 32522L, 2L), (10L, 16393L, 1L),
      (30L, 16129L, 1L)))
  }

  test("consistent hashing: adding a shard moves keys ONLY to the new shard") {
    import graft.sources.Sharding
    val before = Sharding.ring((0 until 4).map(i => s"s$i"), vnodes = 32)
    val after = Sharding.ring((0 until 5).map(i => s"s$i"), vnodes = 32)
    val keys = (1L to 2000L).toDF("k")
    val rep = Sharding.rebalanceReport(keys, "k", before, after)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val moved = rep.filter(r => r._1 != r._2)
    assert(moved.nonEmpty, "a 5th shard must attract some keys")
    assert(moved.forall(_._2 == "s4"),
      s"keys must only move TO the new shard, got: ${moved.mkString(",")}")
    val movedN = moved.map(_._3).sum
    assert(movedN < 2000L * 45 / 100,
      s"moved $movedN of 2000 — far above the ~1/5 consistent-hash bound")
    // assignment matches a driver-side brute force of the same ring
    val brute = (1L to 50L).map { k =>
      val kt = Sharding.token60(s"key-$k")
      val owner = before.find(_._1 >= kt).getOrElse(before.head)._2
      k -> owner
    }.toMap
    val got = keys.filter(col("k") <= 50L)
      .select(col("k"), Sharding.shardOf(col("k"), before).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === brute)
  }

  test("holtMicro matches the hand-traced truncating recurrence") {
    import graft.operators.TimeSeries
    // α=1/4, β=1/2 on a collapsing series — the trend goes NEGATIVE and
    // must TRUNCATE toward zero (floor would give b₂=-13, not -12):
    // l₁=100,b₁=0; l₂=(0+3·100)//4=75, b₂=(75-100+0)//2=-25//2=-12;
    // l₃=(0+3·(75-12))//4=189//4=47, b₃=(47-75-12)//2=-40//2=-20
    val df = Seq(("a", 1L, 100L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("b", 1L, 7L)).toDF("k", "t", "x")
    val got = TimeSeries.holtMicro(df, "k", "t", "x", num = 1L, shift = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
      .sorted
    assert(got === Seq(
      ("a", 1L, 100L, 0L, 100L), ("a", 2L, 75L, -12L, 63L),
      ("a", 3L, 47L, -20L, 27L), ("b", 1L, 7L, 0L, 7L)))
  }

  test("kCenterSelect walks farthest-first with id tie-breaks") {
    // collinear points: seed = min id (0,0); farthest = (10,0); then
    // (5,0) at min(25,25)=25; then (1,0) at min(1,16)=1 — each pick's
    // dist_micro is the squared L2 that made it the farthest point
    val e = Seq(
      (1L, Array(0f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(10f, 0f)), (4L, Array(5f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(e, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Array((1, 1L, 0L), (2, 3L, 100000000L),
      (3, 4L, 25000000L), (4, 2L, 1000000L)))
  }

  test("kCenterSelect stops early when k exceeds the corpus") {
    val e = Seq((1L, Array(0f)), (2L, Array(3f))).toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(e, "vec_id", "embedding", k = 5)
    assert(got.count() === 2L)
  }

  test("char_gram_keys packs the same byte windows as the driver twin") {
    import graft.expressions.CharGramKeys
    val df = Seq(("a", "spark and flink"), ("b", "ab"), ("c", ""))
      .toDF("id", "text")
    val got = df.select(col("id"),
        CharGramKeys.char_gram_keys(col("text"), 3).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === CharGramKeys.keysOf("spark and flink", 3))
    assert(got("b").isEmpty && got("c").isEmpty)
    // the pack is injective on distinct windows: 's','p','a' big-endian
    assert(got("a").head ===
      (('s'.toLong << 16) | ('p'.toLong << 8) | 'a'.toLong))
    // n=8 edge: full-width mask, one window per position
    val wide = Seq(("w", "abcdefghi")).toDF("id", "text")
      .select(CharGramKeys.char_gram_keys(col("text"), 8).as("g"))
      .collect()(0).getSeq[Long](0)
    assert(wide === CharGramKeys.keysOf("abcdefghi", 8) &&
      wide.length === 2)
  }

  test("trigramSearch verifies candidates — gram cover alone is not a match") {
    import graft.operators.InvertedIndex
    val docs = Seq(
      (1L, "we run abc def daily"),     // true match
      (2L, "abc bc c d de def"),        // every trigram, no substring
      (3L, "nothing relevant"),
      (4L, "abc def")                   // exact
    ).toDF("doc_id", "text")
    val got = InvertedIndex.trigramSearch(docs, "doc_id", "text", "abc def")
      .collect().map(_.getLong(0)).sorted
    assert(got === Array(1L, 4L))
  }

  test("trustRank: mass reaches only link-proximate nodes, never strays") {
    import graft.operators.Graphs
    val e = Seq(("s", "a"), ("a", "b"), ("c", "c"))
      .toDF("src", "dst")
    val got = Graphs.trustRank(e, "src", "dst", seeds = Seq("s"),
        iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("s") === 150000000000L)            // teleport only
    assert(got("a") === 127500000000L)            // 0.85 · tr₁(s)
    assert(got("b") === 722500000000L)            // 0.85 · tr₁(a)
    assert(got("c") === 0L)                       // unreachable: ZERO
  }

  test("hits: two hand-traced rounds of the integer fixed point") {
    import graft.operators.Graphs
    // 1→2, 1→3, 2→3: node 1 is the pure hub, node 3 the pure authority
    val e = Seq(("1", "2"), ("1", "3"), ("2", "3")).toDF("src", "dst")
    val got = Graphs.hits(e, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // round 1: a = (0, S/3, 2S/3); h ∝ (a2+a3, a3, 0) = exactly (0.6S,
    //   0.4S, 0). round 2: a_raw = (0, h1, h1+h2) → a = (0, 0.375S,
    //   0.625S); h_raw = (a2+a3, a3, 0) = (S, 0.625S, 0) over 1.625S
    assert(got("1") === ((615384615384L, 0L)))    // 1e24 div 1.625e12
    assert(got("2") === ((384615384615L, 375000000000L)))
    assert(got("3") === ((0L, 625000000000L)))
    // L1 mass: hubs and auths each sum to ~Scale (≤ n truncation loss)
    assert(got.values.map(_._1).sum > Graphs.Scale - 3)
    assert(got.values.map(_._2).sum > Graphs.Scale - 3)
  }

  test("goldenRecord merges fields from their latest non-null versions") {
    import graft.operators.KeepLatest
    val u = Seq(
      (1L, 1L, Some("a"), Some("x")),
      (1L, 2L, None, Some("y")),     // sparse update: only field2
      (1L, 3L, Some("c"), None),     // sparse update: only field1
      (2L, 1L, None, None)
    ).toDF("e", "ts", "f1", "f2")
    val got = KeepLatest.goldenRecord(u, "e", Seq(col("ts")),
        Seq("f1", "f2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    // keep-latest alone would give (c, null); survivorship gives (c, y)
    assert(got === Array((1L, "c", "y", 3L), (2L, null, null, 1L)))
  }

  test("rboTruncated: identical lists score 1.0, disjoint lists 0") {
    val a = (1L to 20L).map(i => (i, i)).toDF("id", "rank")
    val b = (1L to 20L).map(i => (i + 100L, i)).toDF("id", "rank")
    val same = Similarity.rboTruncated(a, a, "id", "rank", k = 20)
      .collect().head
    // truncated RBO of identical lists approaches 1 from below (the
    // tail mass beyond depth 20 is never credited)
    assert(same.getLong(1) === 20L)
    assert(same.getLong(2) > 850000L && same.getLong(2) <= 1000000L)
    val diff = Similarity.rboTruncated(a, b, "id", "rank", k = 20)
      .collect().head
    assert(diff.getLong(1) === 0L && diff.getLong(2) === 0L)
    // weights fold: pw(1)=1e6, pw(2)=9e5, pw(3)=81e4
    assert(Similarity.rboWeights(3, 9L, 10L) ===
      Seq(1 -> 1000000L, 2 -> 900000L, 3 -> 810000L))
  }

  test("kaplanMeierMicro folds the exact product-limit curve") {
    import graft.operators.TimeSeries
    // durations: t=1 ×2 (1 churn), t=2 ×1 (churn), t=3 ×1 (censored)
    // n at risk: 4, 2, 1 → S = 750000, 375000, 375000
    val subj = Seq((1L, 1L), (1L, 0L), (2L, 1L), (3L, 0L))
      .toDF("dur", "churned")
    val got = TimeSeries.kaplanMeierMicro(subj, "dur", "churned")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got === Array((1L, 4L, 1L, 1L, 750000L),
      (2L, 2L, 1L, 0L, 375000L), (3L, 1L, 0L, 1L, 375000L)))
  }

  test("benfordAudit counts leading digits and keeps exact shares") {
    import graft.operators.Audit
    val df = ((1L to 9L) ++ Seq(0L, -5L, 100L)).toDF("v")
    val got = Audit.benfordAudit(df, "v")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // 0 and -5 excluded; 10 positives; digit 1 appears twice (1, 100)
    assert(got.map(_._2).sum === 10L)
    assert(got.head === ((1, 2L, 200000L)))
    assert(Audit.benfordMicro.head === (1 -> 301030L))
  }

  test("mergeIntervals unions overlaps AND touches, splits true gaps") {
    import graft.operators.TimeSeries
    val iv = Seq(("u", 1L, 5L), ("u", 5L, 8L), ("u", 3L, 4L),
      ("u", 10L, 12L), ("v", 2L, 3L)).toDF("k", "s", "e")
    val got = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    // [1,5)+[3,4)+[5,8) merge (touch at 5, half-open); [10,12) is a gap
    assert(got === Seq(("u", 1L, 8L, 3L), ("u", 10L, 12L, 1L),
      ("v", 2L, 3L, 1L)))
  }

  test("rateSpikes flags only 4-sigma days with a full 7-day baseline") {
    import graft.operators.TimeSeries
    val rows = (1L to 7L).map(d => ("a", d, 10L)) ++
      Seq(("a", 8L, 100L), ("a", 9L, 11L), ("b", 1L, 500L))
    val df = rows.toDF("k", "d", "n")
    val got = TimeSeries.rateSpikes(df, "k", "d", "n", w = 7, z = 4)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getBoolean(5)))
      .toMap
    assert(got(("a", 8L)) === true)   // (700-70)² = 396900 > 16·7·70
    assert(got(("a", 9L)) === false)  // within noise
    assert(got(("a", 3L)) === false)  // no 7-day baseline yet
    assert(got(("b", 1L)) === false)  // single point, no baseline
  }

  test("fleschScore: exact ratios on a punctuated toy doc") {
    val df = Seq((1L, "the cat. the dog."), (2L, "")).toDF("id", "text")
    val got = df.select(col("id"),
        TextFunctions.fleschScore(col("text")).as("f"),
        TextFunctions.sentenceCount(col("text")).as("s"),
        TextFunctions.syllableEstimate(col("text")).as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // W=4, S=2, Syl=4 → 206.835 − 1.015·2 − 84.6·1 = 120.205
    assert(got(0) === ((1L, 120.205, 2L, 4L)))
    assert(got(1)._2 === 0.0)
  }

  test("linearAttribution splits cents exactly, remainder to last touch") {
    import graft.operators.Funnel
    val ev = Seq(
      (1L, 10L, "2024-01-01 00:00:00", "click", 0.0, "a"),
      (2L, 10L, "2024-01-01 01:00:00", "click", 0.0, "b"),
      (3L, 10L, "2024-01-01 02:00:00", "click", 0.0, "a"),
      (4L, 10L, "2024-01-01 03:00:00", "purchase", 0.10, ""),
      (5L, 20L, "2024-01-01 00:00:00", "purchase", 0.07, "")
    ).toDF("event_id", "user_id", "ts0", "event_type", "value", "ch0")
      .withColumn("ts", to_timestamp(col("ts0")))
    val got = Funnel.linearAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "click", "purchase", col("ch0"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long"), 604800L)
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(4))).sorted
    // purchase 4: 10 cents over 3 touches → 3,3,4 (remainder to last);
    // purchase 5: no touches → direct 7
    assert(got === Array((4L, "a", 3L), (4L, "a", 4L), (4L, "b", 3L),
      (5L, "direct", 7L)))
  }

  test("trustRank renormalizes teleport mass over PRESENT seeds only") {
    import graft.operators.Graphs
    val e = Seq(("s", "a"), ("a", "b")).toDF("src", "dst")
    // a ghost seed absent from the graph must NOT siphon teleport mass:
    // results equal the single-live-seed run exactly
    val withGhost = Graphs.trustRank(e, "src", "dst",
        seeds = Seq("s", "ghost"), iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val solo = Graphs.trustRank(e, "src", "dst",
        seeds = Seq("s"), iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(withGhost === solo)
    intercept[IllegalArgumentException] {
      Graphs.trustRank(e, "src", "dst", seeds = Seq("ghost"), iterations = 1)
    }
  }

  test("goldenRecord is deterministic when orderCols tie (content hash)") {
    import graft.operators.KeepLatest
    // three versions share ts=1: without a tiebreaker the fill and the
    // pick float with shuffle arrival order — the full-row hash pins them
    val u = Seq(
      (1L, 1L, Some("a"), None),
      (1L, 1L, None, Some("y")),
      (1L, 1L, Some("b"), Some("x"))
    ).toDF("e", "ts", "f1", "f2")
    val runs = Seq(1, 3, 7).map { p =>
      KeepLatest.goldenRecord(u.repartition(p), "e", Seq(col("ts")),
          Seq("f1", "f2"))
        .collect().map(_.toSeq).toSet
    }
    assert(runs.distinct.size === 1)
  }

  test("bm25Scores: tf saturation, idf weighting, zero for no-match docs") {
    import graft.operators.InvertedIndex
    val docs = Seq(
      (1L, "join join join window scan"),   // both terms, high tf
      (2L, "join scan scan scan scan"),     // one common term
      (3L, "window scan"),                  // one rare term
      (4L, "scan merge"),                   // no query term
      (5L, "")                              // empty doc
    ).toDF("doc_id", "text")
    val got = InvertedIndex.bm25Scores(docs, "doc_id", "text",
        Seq("join", "window"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(4L) === ((0L, 0.0)))
    assert(got(5L) === ((0L, 0.0)))
    assert(got(1L)._1 === 2L && got(2L)._1 === 1L && got(3L)._1 === 1L)
    // doc 1 matches both terms -> strictly top
    assert(got(1L)._2 > got(2L)._2 && got(1L)._2 > got(3L)._2)
    // "window" (df=2) is rarer than "join" (df=2)... both df=2 here, but
    // doc 3 is much shorter than doc 2 (dl 2 vs 5): same idf, higher
    // length-normalized tf -> doc 3 beats doc 2
    assert(got(3L)._2 > got(2L)._2)
    // replay-stable: identical rerun, identical doubles
    val again = InvertedIndex.bm25Scores(docs, "doc_id", "text",
        Seq("join", "window"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.map { case (k, v) => k -> v._2 } === again)
    intercept[IllegalArgumentException] {
      InvertedIndex.bm25Scores(docs, "doc_id", "text", Seq("a", "a"))
    }
  }
}
