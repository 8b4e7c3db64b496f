package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Semantics of the curation operators: deterministic sampling,
  * concatenate-and-chunk packing, decontamination, int8 quantization. */
class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("labelModel reports per-LF coverage/overlaps/conflicts + majority") {
    // rows: (x, y) drive two LFs; hand-traced 4-row matrix
    //   r1: +1, +1   → both vote, agree;        majority +1
    //   r2: +1, -1   → both vote, conflict;     majority tie → abstain
    //   r3: null, -1 → only lf_y votes;         majority -1
    //   r4: null, null → nobody votes;          majority abstains
    val df = Seq((1, 1), (1, -1), (0, -1), (0, 0)).toDF("x", "y")
    val out = Curation.labelModel(df, Seq(
        "lf_x" -> when(col("x") =!= 0, col("x").cast("long")),
        "lf_y" -> when(col("y") =!= 0, col("y").cast("long"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out("lf_x") === ((2L, 0L, 0.5, 0.5, 0.25)))
    assert(out("lf_y") === ((1L, 2L, 0.75, 0.5, 0.25)))
    // majority: votes on r1 (+1) and r3 (−1); r2's tie abstains; its
    // only conflict is r3? no — r3 has no dissent; zero conflicts
    assert(out("__majority") === ((1L, 1L, 0.5, 0.5, 0.0)))
  }

  test("labelModelK resolves plurality, abstains ties, flags dissent") {
    // 3 class-voting LFs over 4 hand-traced rows (classes 0/1/2):
    //   rA: (1, 1, 2)        → plurality 1; every voter sees dissent
    //   rB: (0, null, 2)     → 0 vs 2 tie of DIFFERENT classes → abstain
    //   rC: (null,null,null) → nobody votes
    //   rD: (2, 2, 2)        → unanimous 2; zero conflicts
    val df = Seq((1, 1, 2), (0, -1, 2), (-1, -1, -1), (2, 2, 2))
      .toDF("a", "b", "c")
    def lf(c: String) = when(col(c) >= 0, col(c).cast("long"))
    val out = Curation.labelModelK(df, Seq(
        "lf_a" -> lf("a"), "lf_b" -> lf("b"), "lf_c" -> lf("c")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    //                 n_votes n_classes coverage overlaps conflicts
    assert(out("lf_a") === ((3L, 3L, 0.75, 0.75, 0.5)))
    assert(out("lf_b") === ((2L, 2L, 0.5, 0.5, 0.25)))
    assert(out("lf_c") === ((3L, 1L, 0.75, 0.75, 0.5)))
    // majority: rA → 1, rD → 2; rB's cross-class tie abstains; rA's
    // resolution overrode a dissenting LF (conflicts), rD's did not
    assert(out("__majority") === ((2L, 2L, 0.5, 0.5, 0.25)))
  }

  test("labelModelK same-class tie is NOT a tie (plurality stands)") {
    // (1, 1, 0): class 1 reaches maxc through two DIFFERENT LFs — same
    // class, so the plurality stands (n_votes 1, against one dissenter)
    // where a DIFFERENT-class pair at maxc would abstain (n_votes 0)
    val df = Seq((1, 1, 0)).toDF("a", "b", "c")
    val out = Curation.labelModelK(df, Seq(
        "lf_a" -> col("a").cast("long"), "lf_b" -> col("b").cast("long"),
        "lf_c" -> col("c").cast("long")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(5)))).toMap
    assert(out("__majority") === ((1L, 1.0))) // resolved, over dissent
  }

  test("groupSplit keeps every group in exactly one split") {
    val docs = (0L until 40L).toDF("doc_id")
    // pair 2k with 2k+1: clusters of two, canonical id = the even one
    val clusters = (0L until 40L).map(i => (i, i - (i % 2)))
      .toDF("node", "cluster")
    val census = Curation.groupSplit(docs, "doc_id", clusters)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // every doc is clustered; docs = 2 × groups in every split (a split
    // never receives half a group)
    assert(census.values.map(_._1).sum === 40L)
    census.values.foreach { case (nDocs, nGroups, nClustered) =>
      assert(nDocs === 2 * nGroups)
      assert(nClustered === nDocs)
    }
    // per-doc assignment is a pure function of the group: both members
    // land identically under splitBucket
    val asg = docs.join(clusters, col("doc_id") === col("node"))
      .select(col("doc_id"),
        Curation.splitBucket(col("cluster").cast("string"), 80, 10,
          "graft").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 40L by 2).foreach(i => assert(asg(i) === asg(i + 1)))
  }

  test("chi2Keywords scores a perfectly-separating token highest") {
    // 6 docs: 3 target all contain "pos", 3 rest all contain "neg";
    // "both" appears everywhere (chi2 = 0), "rare" once (df < minDf cut)
    val docs = Seq(
      (1L, "pos both", true), (2L, "pos both", true),
      (3L, "pos both rare", true),
      (4L, "neg both", false), (5L, "neg both", false),
      (6L, "neg both", false)
    ).toDF("doc_id", "text", "t")
    val out = Curation.chi2Keywords(docs, "doc_id", "text", col("t"),
        topK = 10, minDf = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!out.contains("rare"))
    // perfect separation: chi2 = n = 6; uniform token: 0
    assert(out("pos") === ((3L, 0L, 6.0)))
    assert(out("neg") === ((0L, 3L, 6.0)))
    assert(out("both") === ((3L, 3L, 0.0)))
  }

  test("lineDedup keeps only the first (doc, pos) occurrence of a line") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "header\nalpha\nfooter"),
      (2L, "header\nbeta\nfooter"),   // header+footer claimed by doc 1
      (3L, "header\nfooter"),         // every line claimed → empty doc
      (4L, "alpha\nalpha\ngamma")     // within-doc repeat: alpha already
                                      // doc 1's; 2nd copy also drops
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("header\nalpha\nfooter", 3L, 0L)))
    assert(out(2L) === (("beta", 1L, 2L)))
    assert(out(3L) === (("", 0L, 2L)))
    assert(out(4L) === (("gamma", 1L, 2L)))
  }

  test("perplexityBuckets cuts each language into rank tiers") {
    // two langs; per-doc NLL ordering is driven by text repetitiveness.
    // 6 docs per lang → tiers of exactly 2 by the ((r-1)·3) div n rule.
    val docs = (0 until 12).map { i =>
      val lang = if (i < 6) "aa" else "bb"
      // i-dependent texts with increasingly rare continuations
      val text = (0 to (i % 6) + 1).map(j => s"w${i % 6} x$j").mkString(" ")
      (i.toLong, text, lang)
    }.toDF("doc_id", "text", "lang")
    val out = Curation.perplexityBuckets(docs, "doc_id", "text", "lang",
      buckets = 3)
    val rows = out.collect()
    // every (lang, bucket) tier holds exactly 2 of its language's 6 docs
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getLong(2) === 2L)
      assert(r.getDouble(3) <= r.getDouble(4)) // min_nll <= max_nll
    }
    // tiers are ordered: bucket 1's max never exceeds bucket 3's min
    val byLang = rows.groupBy(_.getString(0))
    byLang.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getDouble(4) <= sorted.last.getDouble(3))
    }
  }

  test("ngramDiversity counts shared trigrams across docs, never within") {
    val docs = Seq(
      (1L, "a b c d"),     // trigrams: "a b c", "b c d"
      (2L, "a b c x"),     // trigrams: "a b c", "b c x"
      (3L, "z z z z z"),   // "z z z" ×3 positions → ONE distinct gram
      (4L, "q w")          // shorter than k → no grams, no output row
    ).toDF("doc_id", "text")
    val out = Curation.ngramDiversity(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // hand-traced: "a b c" is the only cross-doc gram (docs 1 and 2);
    // doc 3's repeated gram stays df=1 because (doc, gram) is distinct
    assert(out === Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((1L, 0L, 0.0))))
  }

  test("stratified sample is deterministic and rate-shaped") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val s1 = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "zh" -> 0.1), defaultRate = 0.0)
    val s2 = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "zh" -> 0.1), defaultRate = 0.0)
    // identical across runs (no RNG)
    assert(s1.collect().map(_.getLong(0)).toSet ===
      s2.collect().map(_.getLong(0)).toSet)
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates hold to within a few percent at n=2000 per stratum
    assert(math.abs(byLang("en") - 1000L) < 150, byLang)
    assert(math.abs(byLang("zh") - 200L) < 80, byLang)
    // different salt → different sample
    val s3 = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "zh" -> 0.1), defaultRate = 0.0, salt = "other")
    assert(s3.collect().map(_.getLong(0)).toSet !==
      s1.collect().map(_.getLong(0)).toSet)
  }

  test("packBins lays documents head-to-tail per stream") {
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 100L), ("a", 4L, 3000L),
      ("b", 1L, 2049L)).toDF("lang", "doc_id", "tok")
    val out = Curation.packBins(df, "lang", "doc_id", col("tok"), 2048L)
      .select("lang", "doc_id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("a", 1L)) === 0L) // starts at token 0
    assert(out(("a", 2L)) === 0L) // starts at 1000
    assert(out(("a", 3L)) === 0L) // starts at 2000
    assert(out(("a", 4L)) === 1L) // starts at 2100 → second chunk
    assert(out(("b", 1L)) === 0L) // independent stream
  }

  test("decontamination flags exactly the overlapping docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta epsilon different tail"),
      (4L, "too short to shingle")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("xx alpha beta gamma delta epsilon yy"))
      .toDF("text")
    val out = Curation.flagContaminated(docs, "doc_id", "text", bench, "text")
      .select("doc_id", "is_contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) === true)  // shares "alpha beta gamma delta epsilon"
    assert(out(2L) === false)
    assert(out(3L) === true)
    assert(out(4L) === false) // < 5 tokens → no shingles
  }

  test("decontamination broadcast guard: large benchmark falls back to a " +
      "shuffle semi-join with identical results") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated words here nothing shared")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("xx alpha beta gamma delta epsilon yy")).toDF("text")
    def plan(maxRows: Long): (Map[Long, Boolean], String) = {
      val df = Curation.flagContaminated(docs, "doc_id", "text", bench, "text",
        maxBroadcastRows = maxRows)
      (df.select("doc_id", "is_contaminated").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap,
        df.queryExecution.executedPlan.toString)
    }
    // kill auto-broadcast so the ONLY broadcast source is the guard's
    // explicit hint — otherwise AQE broadcasts the tiny test frame in
    // both modes and the plans are indistinguishable
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val (smallRes, smallPlan) = plan(maxRows = 100)
      val (bigRes, bigPlan) = plan(maxRows = 0) // force the fallback
      assert(smallRes === Map(1L -> true, 2L -> false))
      assert(bigRes === smallRes)
      assert(smallPlan.contains("BroadcastHashJoin"))
      assert(!bigPlan.contains("BroadcastHashJoin"))
    } finally spark.conf.set(key, prev)
  }

  test("line quality filter keeps good lines, drops short/unpunctuated/boilerplate") {
    val docs = Seq((1L, Seq(
      "this is a perfectly fine sentence.",
      "ok",
      "no terminal punctuation here",
      "please enable javascript to continue.",
      "short words count too!").mkString("\n"))).toDF("doc_id", "text")
    val r = Curation.lineQualityFilter(docs, "doc_id", "text").collect()(0)
    assert(r.getString(1) ===
      "this is a perfectly fine sentence.\nshort words count too!")
    assert(r.getLong(2) === 2L && r.getLong(3) === 3L)
  }

  test("pii redaction masks emails/ips/phones and counts hits") {
    val docs = Seq(
      (1L, "mail bob.smith+x@corp.example.org from 192.168.1.77 or call 555-123-4567 now"),
      (2L, "no pii in this one, just words and 1234 numbers"))
      .toDF("doc_id", "text")
    val r = Curation.redactPii(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getString(1) ===
      "mail <EMAIL> from <IP> or call <PHONE> now")
    assert(r(0).getLong(2) === 1L && r(0).getLong(3) === 1L &&
      r(0).getLong(4) === 1L)
    assert(r(1).getString(1) ===
      "no pii in this one, just words and 1234 numbers")
    assert(r(1).getLong(2) === 0L && r(1).getLong(3) === 0L &&
      r(1).getLong(4) === 0L)
  }

  test("epoch shuffle: dense per-shard positions, replay-stable, salt-sensitive") {
    val docs = (0L until 200L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val r1 = Curation.shuffleOrder(docs, "doc_id", "epoch0", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
    val r2 = Curation.shuffleOrder(docs, "doc_id", "epoch0", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
    assert(r1.map(_.toSeq).toSet === r2.map(_.toSeq).toSet)
    // positions are dense 0..n-1 within each shard
    r1.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (0L until rows.length).toSeq)
    }
    val other = Curation.shuffleOrder(docs, "doc_id", "epoch1", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
    assert(other.map(_.toSeq).toSet !== r1.map(_.toSeq).toSet)
  }

  test("domain mix thins over-represented domains toward target weights") {
    val docs = ((0 until 600).map(i => (i.toLong, "big")) ++
      (600 until 700).map(i => (i.toLong, "small"))).toDF("doc_id", "dom")
    // equal targets: 'small' (100 rows) kept in full, 'big' thinned to ~100
    val kept = Curation.mixToTarget(docs, "doc_id", "dom",
      Map("big" -> 1.0, "small" -> 1.0), defaultWeight = 1.0).collect()
    val byDom = kept.groupBy(_.getString(1)).map { case (d, r) => d -> r.length }
    assert(byDom("small") === 100)
    assert(math.abs(byDom("big") - 100) < 30) // hash noise around the target
  }

  test("unigram NLL ranks rare-token docs as more surprising") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common rare1 rare2")).toDF("doc_id", "text")
    val r = Curation.unigramLogProb(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(2L) > r(1L))
  }

  test("tfidf keywords surface doc-specific terms over ubiquitous ones") {
    val docs = Seq(
      (1L, "shared shared unique1 unique1 unique1"),
      (2L, "shared other"),
      (3L, "shared third")).toDF("doc_id", "text")
    val top = Curation.tfidfKeywords(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) === "unique1") // high tf, low df beats the shared term
    assert(top(2L) === "other" && top(3L) === "third")
  }

  test("zscore flags the planted spike and only the spike") {
    val vals = (1 to 99).map(i => (i.toLong, "g", 10.0 + (i % 3))) :+
      (100L, "g", 500.0)
    val r = Curation.zscoreFlag(vals.toDF("id", "grp", "v"), "grp", "v")
      .select("id", "is_outlier")
      .collect().map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(r(100L) === true)
    assert((1 to 99).forall(i => !r(i.toLong)))
  }

  test("incremental agg merge equals full recompute") {
    import org.apache.spark.sql.types.DecimalType
    val rows = (1 to 100).map(i => (i.toLong, s"t${i % 3}", i * 1.25))
      .toDF("id", "typ", "v")
    def leaf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("typ").agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(18, 2))).as("sv"))
    val merged = graft.operators.IncrementalAgg.merge(
        leaf(rows.filter(col("id") <= 60)), leaf(rows.filter(col("id") > 60)),
        Seq("typ"))
      .select(col("typ"), col("n"), col("sv").cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = leaf(rows)
      .select(col("typ"), col("n"), col("sv").cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged === full)
  }

  test("domain cap keeps at most n docs per domain, deterministically") {
    val docs = (0 until 100).map(i => (i.toLong, s"d${i % 4}"))
      .toDF("doc_id", "dom")
    val r1 = Curation.domainCap(docs, "doc_id", "dom", cap = 5).collect()
    val r2 = Curation.domainCap(docs, "doc_id", "dom", cap = 5).collect()
    assert(r1.map(_.toSeq).toSet === r2.map(_.toSeq).toSet)
    val perDom = r1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perDom.values.toSet === Set(5) && perDom.size === 4)
  }

  test("count-min sketch: estimates bound true counts; sketches merge") {
    import graft.operators.Sketches
    val toks = (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++
      (1 to 40).map(i => s"u$i")).toDF("tok")
    val sk = Sketches.cmSketch(toks, "tok", width = 64, depth = 4)
    val est = Sketches.cmsEstimate(sk, Seq("hot", "warm", "absent"),
      width = 64, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 50L && est("warm") >= 7L) // CM never underestimates
    assert(est("hot") <= 50L + 40 + 7)             // bounded by collisions
    // sketches over two halves merged = sketch over the union
    val (a, b) = ((Seq.fill(30)("hot") ++ (1 to 20).map(i => s"u$i")).toDF("tok"),
      (Seq.fill(20)("hot") ++ Seq.fill(7)("warm") ++
        (21 to 40).map(i => s"u$i")).toDF("tok"))
    val merged = graft.operators.IncrementalAgg.merge(
      Sketches.cmSketch(a, "tok", width = 64, depth = 4),
      Sketches.cmSketch(b, "tok", width = 64, depth = 4),
      Seq("j", "bucket"))
    val full = Sketches.cmSketch(toks, "tok", width = 64, depth = 4)
    assert(merged.collect().map(_.toSeq).toSet ===
      full.collect().map(_.toSeq).toSet)
  }

  test("bloom filter: no false negatives; filters merge by bit_or") {
    import graft.operators.Sketches
    val keys = (1 to 60).map(i => s"k$i").toDF("k")
    val bloom = Sketches.bloomBuild(keys, "k", mBits = 512, k = 4)
    val probes = ((1 to 60).map(i => s"k$i") ++ (1 to 40).map(i => s"x$i"))
      .toDF("k")
    val res = Sketches.bloomMightContain(bloom, probes, "k",
        mBits = 512, k = 4)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (1 to 60).foreach(i => assert(res(s"k$i"), s"false negative on k$i"))
    // two half-filters OR-merged per word == the full filter
    val (a, b) = ((1 to 30).map(i => s"k$i").toDF("k"),
      (31 to 60).map(i => s"k$i").toDF("k"))
    val merged = Sketches.bloomBuild(a, "k", mBits = 512, k = 4)
      .unionByName(Sketches.bloomBuild(b, "k", mBits = 512, k = 4))
      .groupBy("word").agg(bit_or(col("bits")).as("bits"))
    assert(merged.collect().map(_.toSeq).toSet ===
      bloom.collect().map(_.toSeq).toSet)
  }

  test("frequent-line removal drops corpus boilerplate, keeps rare lines") {
    val docs = (1 to 100).map { i =>
      val rare = if (i <= 3) "\nrare promo line" else ""
      (i.toLong, s"unique opening $i\nCopyright Notice.$rare\nunique close $i")
    }.toDF("doc_id", "text")
    val out = Curation.dropFrequentLines(docs, "doc_id", "text",
        maxDocFrac = 0.05)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) === (("unique opening 10\nunique close 10", 2L, 1L)))
    assert(out(2L) ===
      (("unique opening 2\nrare promo line\nunique close 2", 3L, 1L)))
  }

  test("length band filter drops the extreme tails only") {
    val docs = ((1 to 96).map(i => (i.toLong, Seq.fill(50 + i % 7)("w").mkString(" "))) ++
      Seq((97L, "w"), (98L, Seq.fill(5000)("w").mkString(" "))))
      .toDF("doc_id", "text")
    val kept = Curation.lengthBandFilter(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(97L) && !kept.contains(98L))
    assert(kept.size >= 90) // the mid-band survives
  }

  test("portable HLL estimates within ~10% across cardinality regimes") {
    import graft.operators.Sketches
    // small group (linear-counting range) and large group (raw estimate)
    val rows = ((1 to 40).map(i => ("small", s"u$i")) ++
      (1 to 5000).flatMap(i => Seq(("big", s"v$i"), ("big", s"v$i"))))
      .toDF("grp", "k")
    val est = Sketches.hllDistinct(rows, "grp", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("small") - 40.0) / 40.0 < 0.1)
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.1)
    // deterministic: same inputs → identical estimate
    val again = Sketches.hllDistinct(rows, "grp", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again === est)
  }

  test("split assignment is deterministic and roughly proportional") {
    val docs = (1L to 1000L).toDF("doc_id")
    val counts = Curation.splitAssign(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    // replay-stable: same assignment on a second run
    val again = Curation.splitAssign(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }

  test("bm25 ranks the term-dense short doc above a diluted long one") {
    val docs = Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark " + Seq.fill(60)("filler").mkString(" ")),
      (3L, "completely unrelated words only")
    ).toDF("doc_id", "text")
    val scores = Curation.bm25(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    assert(scores(3L) === 0.0)
  }

  test("int8 quantization bounds the cosine error") {
    val vecs = (1 to 50).map { i =>
      (i.toLong, (0 until 64).map(d =>
        math.sin(i * 64 + d).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val query = (0 until 64).map(d => math.cos(d * 0.1))
    val exact = graft.operators.Similarity
      .cosineTopK(vecs, "vec_id", "embedding", query, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val quant = vecs
      .select(col("vec_id"), Curation.quantizeInt8(col("embedding")).as("q"))
      .select(col("vec_id"), Curation.dequantCosine(col("q"), query).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    quant.foreach { case (id, c) =>
      assert(math.abs(c - exact(id)) < 0.02, s"vec $id: $c vs ${exact(id)}")
    }
  }

  test("driver-read operators tolerate an empty corpus (library hygiene)") {
    // Every operator that collect()s a global aggregate to the driver
    // must survive the NULL row an empty input produces — these are
    // library entry points, not just gate plumbing. Each call below
    // NPE'd or threw ArrayIndexOutOfBounds before the guards.
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val srcDocs = Seq.empty[(String, String)].toDF("source", "text")
    val vals = Seq.empty[(String, Double)].toDF("source", "v")
    assert(Curation.dsirScore(docs, "doc_id", "text",
      lit(false)).count() === 0)
    assert(Curation.sourceKl(srcDocs, "source", "text").count() === 0)
    assert(Curation.chiSquareShift(vals, "source", "v", 10L, 4)
      .count() === 0)
    assert(Curation.cooccurrencePmi(docs, "text").count() === 0)
    assert(Curation.curriculumBins(docs, "doc_id", "text").count() === 0)
    assert(Curation.lengthBandFilter(docs, "doc_id", "text").count() === 0)
    assert(graft.operators.Tokenizer.bpeMerges(docs, "text").count() === 0)
    assert(graft.operators.TimeSeries.gapFill(
      Seq.empty[(String, Long, Double)].toDF("k", "bucket", "v"),
      "k", "bucket", "v").count() === 0)
    // no near-dup pairs at all (both id flavors): CC must return an
    // empty label frame, not loop or NPE on the null convergence sum
    assert(graft.operators.Dedup.clusterAssignments(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() === 0)
    assert(graft.operators.Dedup.clusterAssignments(
      Seq.empty[(String, String)].toDF("doc_a", "doc_b")).count() === 0)
  }

  test("table checksum localizes a single-row mutation to its bucket") {
    import graft.operators.Audit
    val base = Seq((1L, 10L, "A", "x"), (2L, 10L, "B", "y"),
      (3L, 20L, "C", "z")).toDF("id", "bucket", "s1", "s2")
    // mutate one field of one row in bucket 10; bucket 20 untouched
    val mutated = Seq((1L, 10L, "A", "x"), (2L, 10L, "B", "Y"),
      (3L, 20L, "C", "z")).toDF("id", "bucket", "s1", "s2")
    def chk(df: org.apache.spark.sql.DataFrame) =
      Audit.tableChecksum(df, "bucket", Seq("id", "s1", "s2"))
        .collect().map(r => r.getAs[Long]("bucket") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_key"))).toMap
    val (cb, cm) = (chk(base), chk(mutated))
    assert(cb(20L) === cm(20L), "untouched bucket must match")
    assert(cb(10L)._1 === cm(10L)._1, "counts equal — only content moved")
    assert(cb(10L)._2 !== cm(10L)._2, "mutated bucket must diverge")
    // order independence: reversed input produces identical checksums
    assert(chk(base.orderBy(col("id").desc)) === cb)
  }

  test("exactKPerGroup returns exactly min(k, |group|) rows per group") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 103L).map(i => (i, "small"))).toDF("id", "grp")
    val out = Curation.exactKPerGroup(df, "grp", "id", k = 10, salt = "t")
    val sizes = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("big" -> 10L, "small" -> 3L))
    // replay-stable: same rows under a different physical layout
    val out2 = Curation.exactKPerGroup(df.repartition(7), "grp", "id",
      k = 10, salt = "t")
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      out2.select("id").collect().map(_.getLong(0)).toSet)
  }

  private def unimaxDocs(counts: (String, Int)*) =
    counts.toSeq.map { case (d, c) => (d, ("t " * c).trim) }
      .toDF("domain", "text")

  test("unimaxAllocation matches the hand-traced waterfilling") {
    // A=B=C=10 tokens, D=100; E=2, budget=100. Ascending order caps the
    // three small domains at 2 epochs (20 each), D takes the remaining 40.
    val out = Curation.unimaxAllocation(
      unimaxDocs("A" -> 10, "B" -> 10, "C" -> 10, "D" -> 100),
      "text", "domain", budgetTokens = 100L, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(out("A") === ((10L, 20L, true, 2000L)))
    assert(out("B") === ((10L, 20L, true, 2000L)))
    assert(out("C") === ((10L, 20L, true, 2000L)))
    assert(out("D") === ((100L, 40L, false, 400L)))
    assert(out.values.map(_._2).sum === 100L, "allocation exhausts budget")
  }

  test("unimaxAllocation: all-capped leaves budget unused; remainder goes to the largest domain") {
    // budget far above E·total: everything caps at maxEpochs
    val all = Curation.unimaxAllocation(
      unimaxDocs("A" -> 10, "B" -> 10, "D" -> 100),
      "text", "domain", budgetTokens = 1000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(all === Map("A" -> 20L, "B" -> 20L, "D" -> 200L))
    // two uncapped domains with an odd remainder: the last (largest)
    // domain absorbs the leftover token
    val rem = Curation.unimaxAllocation(
      unimaxDocs("A" -> 10, "B" -> 60, "C" -> 61),
      "text", "domain", budgetTokens = 101L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rem === Map("A" -> 20L, "B" -> 40L, "C" -> 41L))
  }

  test("heapsFit matches the hand-traced two-checkpoint OLS") {
    // ids 1..4, J=2 → buckets (1,1,2,2): n=(2,4); vocab a|b|a|c → v=(2,3)
    // slope through the two snapped ln-points = (1099−693)/(1386−693)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
      .toDF("doc_id", "text")
    val r = Curation.heapsFit(df, "doc_id", "text", checkpoints = 2).head
    assert(r.getAs[Long]("n_points") === 2L)
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(math.abs(r.getAs[Double]("beta") - 406.0 / 693.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-5,
      "two points fit exactly")
    // empty corpus degrades to a zero row, not an exception
    val empty = Curation.heapsFit(df.filter(col("doc_id") < 0L),
      "doc_id", "text", checkpoints = 4).head
    assert(empty.getAs[Long]("n_points") === 0L)
  }

  test("ksShift matches the hand-traced CDF gap") {
    // A = {0,0,8} → bins (0,0,1); B = {8,8,24} → bins (1,1,3); the CDF
    // gap peaks at bin 0: F_A = 2/3 vs F_rest = 0 → D = 2/3 for both
    val df = Seq(("A", 0L), ("A", 0L), ("A", 8L),
      ("B", 8L), ("B", 8L), ("B", 24L)).toDF("src", "v")
    val out = Curation.ksShift(df, "src", "v", binWidth = 8L, bins = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out("A") - 2.0 / 3.0) < 1e-5)
    assert(math.abs(out("B") - 2.0 / 3.0) < 1e-5)
    // identical distributions → D = 0
    val same = Seq(("A", 1L), ("A", 9L), ("B", 1L), ("B", 9L))
      .toDF("src", "v")
    val out2 = Curation.ksShift(same, "src", "v", 8L, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out2("A") === 0.0 && out2("B") === 0.0)
  }

  test("gopherRules: each rule rejects its crafted offender and passes clean text") {
    val good = ("the of " + ("abcd " * 48)).trim            // 50 words
    val short = "the of abcd"                                // 3 words
    val hashy = ("the of " + ("abcd " * 48) + ("# " * 10)).trim // 60 words
    val numeric = ("the of " + ("abcd " * 48) + ("12 " * 20)).trim // 70 words
    val noStops = ("abcd " * 60).trim                        // 0 stopwords
    val df = Seq((1L, good), (2L, short), (3L, hashy), (4L, numeric),
      (5L, noStops)).toDF("doc_id", "text")
    val out = Curation.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // good: mean len = (3+2+4*48)*1000 div 50 = 3940, alpha 1000, 2 stops
    assert(out(1L).getAs[Long]("n_words") === 50L)
    assert(out(1L).getAs[Long]("mean_len_milli") === 3940L)
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("ok_words") &&
      !out(2L).getAs[Boolean]("pass"))
    // hashy: 10 of 60 words are '#' → symbol ratio 166‰ ≥ 100‰
    assert(out(3L).getAs[Long]("symbol_milli") === 166L)
    assert(!out(3L).getAs[Boolean]("ok_symbol"))
    // numeric: 50 alphabetic of 70 → 714‰ < 800‰
    assert(out(4L).getAs[Long]("alpha_milli") === 714L)
    assert(!out(4L).getAs[Boolean]("ok_alpha"))
    assert(out(5L).getAs[Long]("n_stop") === 0L)
    assert(!out(5L).getAs[Boolean]("ok_stops"))
  }

  test("paretoFrontier keeps exactly the non-dominated rows (hand-traced)") {
    // frontier sweep by descending x: (5,1) global-max x; (4,3) beats
    // M=1; (3,9) beats M=3; (2,9) TIED with (3,9)'s y → dominated;
    // (1,10), (0,12) climb past. (4,0) and (3,3) lose to same-x rows.
    // exact duplicates (5,1)×2: neither dominates, both survive.
    val df = Seq((5L, 1L), (5L, 1L), (4L, 3L), (4L, 0L), (3L, 3L),
      (3L, 9L), (2L, 9L), (1L, 10L), (0L, 12L)).toDF("x", "y")
    val got = Curation.paretoFrontier(df, "x", "y", numParts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got === Seq((0L, 12L), (1L, 10L), (3L, 9L), (4L, 3L),
      (5L, 1L), (5L, 1L)))
    // every kept row must be undominated against the full input (brute)
    val all = Seq((5L, 1L), (5L, 1L), (4L, 3L), (4L, 0L), (3L, 3L),
      (3L, 9L), (2L, 9L), (1L, 10L), (0L, 12L))
    for (k <- got)
      assert(!all.exists(o => o._1 >= k._1 && o._2 >= k._2 &&
        (o._1 > k._1 || o._2 > k._2)), s"$k is dominated")
  }

  test("deltaJoin maintenance equals the full post-delta recompute") {
    import graft.operators.IncrementalAgg
    val a0 = Seq((1L, "a1"), (2L, "a2"), (2L, "a2b")).toDF("k", "av")
    val da = Seq((2L, "da2"), (3L, "da3"), (9L, "da9")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    val db = Seq((2L, "db2"), (3L, "db3")).toDF("k", "bv")
    val view0 = a0.join(b0, Seq("k"))
    val maintained = IncrementalAgg.deltaJoin(view0, a0, da, b0, db, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted
    val recompute = a0.unionByName(da).join(b0.unionByName(db), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted
    assert(maintained === recompute)
    // the dA⋈dB corner genuinely fires: (3, da3, db3) exists ONLY there
    assert(maintained.contains((3L, "da3", "db3")))
    // unmatched delta keys (9) contribute nothing, as in the recompute
    assert(!maintained.exists(_._1 == 9L))
  }

  test("decisionStump finds the hand-traced perfect split and tie-breaks") {
    // y = (x >= 3): split at v=2 is perfect — S = (0²+2²)·10⁶/2 +
    // (2²+0²)·10⁶/2 = 4,000,000; the decoy feature z is constant →
    // no valid split (its only threshold leaves an empty right side)
    val df = Seq((1L, 7L, false), (2L, 7L, false), (3L, 7L, true),
      (4L, 7L, true)).toDF("x", "z", "y")
    val r = Curation.decisionStump(df, "y", Seq("x", "z")).collect().head
    assert(r.getString(0) === "x" && r.getLong(1) === 2L)
    assert(r.getLong(2) === 4000000L)
    assert(r.getLong(3) === 2L && r.getLong(4) === 0L)
    assert(r.getLong(5) === 2L && r.getLong(6) === 2L)
    assert(!r.getBoolean(7) && r.getBoolean(8))
  }

  test("giniConcentration: balanced → 0, hand-traced skew, single domain → 0") {
    val even = Seq("a", "a", "b", "b", "c", "c").toDF("d")
    val r1 = Curation.giniConcentration(even, "d").collect().head
    assert(r1.getLong(0) === 3L && r1.getLong(1) === 6L)
    assert(r1.getDouble(2) === 0.0)
    // counts (1, 3): s1 = 1·1 + 2·3 = 7 → G = (14 − 3·4)/(2·4) = 0.25
    val skew = Seq("a", "b", "b", "b").toDF("d")
    val r2 = Curation.giniConcentration(skew, "d").collect().head
    assert(r2.getDouble(2) === 0.25)
    val one = Seq("a", "a").toDF("d")
    assert(Curation.giniConcentration(one, "d").collect().head
      .getDouble(2) === 0.0)
  }

  test("quantileNormalize maps group ranks onto the pooled distribution") {
    // pooled sorted: 1,5,6,7,8,100 (N=6); A (ng=2): r=1→rank 3→6,
    // r=2→rank 6→100; B (ng=4): ranks 1,3,4,6 → 1,6,7,100
    val df = Seq((1L, "A", 1L), (2L, "A", 100L),
      (3L, "B", 5L), (4L, "B", 6L), (5L, "B", 7L), (6L, "B", 8L))
      .toDF("id", "g", "v")
    val got = Curation.quantileNormalize(df, "id", "g", "v")
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted
    assert(got === Seq((1L, 6L), (2L, 100L), (3L, 1L), (4L, 6L),
      (5L, 7L), (6L, 100L)))
  }

  test("setCoverSelect walks greedy marginal gains and stops when covered") {
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "e f g"),
      (4L, "c d e")).toDF("doc_id", "text")
    val got = Curation.setCoverSelect(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // doc1 covers 4 of {a..g}; doc3 covers the remaining {e,f,g};
    // round 3 has nothing left to gain — the loop stops at 2 picks
    assert(got === Array((1, 1L, 4L), (2, 3L, 3L)))
  }

  test("conformalThreshold picks the ceil((n+1)(1-alpha)) order statistic") {
    val df = (1L to 20L).map(i => ("g", i, i)).toDF("grp", "id", "s")
    val r = Curation.conformalThreshold(df, "grp", "id", "s", alphaPct = 10)
      .collect().head
    // n=20 → target = ceil(21·0.9) = 19 → 19th smallest = 19
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((20L, 19L, 19L)))
    // tiny n clamps to n
    val t = Seq(("g", 1L, 5L)).toDF("grp", "id", "s")
    val r2 = Curation.conformalThreshold(t, "grp", "id", "s", 10)
      .collect().head
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) === ((1L, 1L, 5L)))
  }

  test("sourceAblation: leave-one-out means are exact integers") {
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L)).toDF("src", "v")
    val got = Curation.sourceAblation(df, "src", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // N=3, S=6, mean=2e6; drop A → 3/1 = 3e6; drop B → 3/2 = 1.5e6
    assert(got === Array(("A", 2L, 2000000L, 3000000L, 1000000L),
      ("B", 1L, 2000000L, 1500000L, -500000L)))
  }

  test("exactKth finds order statistics via range narrowing") {
    import graft.operators.GlobalSort
    val small = Seq(5L, 1L, 9L, 3L, 7L).toDF("v")
    val r = GlobalSort.exactKth(small, "v", 3L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5L, 3L, 5L)))
    // wide domain forces multiple census passes (width 10⁶ > 2^16 radix)
    val wide = (1L to 1000L).map(_ * 1000L).toDF("v")
    val r2 = GlobalSort.exactKth(wide, "v", 500L).collect().head
    assert(r2.getLong(2) === 500000L)
    // exactMedian = exactKth at k=(n+1)/2, k derived from the head agg
    val m = GlobalSort.exactMedian(wide, "v").collect().head
    assert((m.getLong(0), m.getLong(1), m.getLong(2)) ===
      ((1000L, 500L, 500000L)))
    val modd = GlobalSort.exactMedian(Seq(3L, 1L, 2L).toDF("v"), "v")
      .collect().head
    assert((modd.getLong(1), modd.getLong(2)) === ((2L, 2L)))
  }

  test("isotonicFitMicro pools adjacent violators (minimax form)") {
    // rates [1/2, 0/2, 2/2] — PAV merges bins 1,2 to 1/4
    val bins = Seq((1L, 1L, 2L), (2L, 0L, 2L), (3L, 2L, 2L))
      .toDF("bin", "pos", "n")
    val got = Curation.isotonicFitMicro(bins, "bin", "pos", "n")
      .collect().map(r => (r.getLong(0), r.getLong(4))).sorted
    assert(got === Seq((1L, 250000L), (2L, 250000L), (3L, 1000000L)))
  }

  test("reassembleChunks inverts chunkOverlap including all-overlap tails") {
    // 5 tokens, width 4, stride 2 → chunks [t1..t4], [t3,t4,t5], [t5]:
    // the last chunk is ENTIRELY overlap and must contribute nothing
    val docs = Seq((1L, "t1 t2 t3 t4 t5"), (2L, "a"), (3L, ""))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkOverlap(docs, "doc_id", "text",
      width = 4, stride = 2)
    val got = Curation.reassembleChunks(chunks, "doc_id", "chunk_id",
        "chunk_text", width = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got === Seq((1L, "t1 t2 t3 t4 t5"), (2L, "a"), (3L, "")))
  }

  test("emdShift integrates the CDF gap — one full bin of moved mass = 1.0") {
    val df = Seq(("A", 0L), ("A", 0L), ("B", 8L), ("B", 8L))
      .toDF("src", "v")
    val got = Curation.emdShift(df, "src", "v", binWidth = 8L, bins = 4)
      .collect().map(r => (r.getString(0), r.getDouble(2))).sorted
    assert(got === Seq(("A", 1.0), ("B", 1.0)))
  }

  test("vocabCoverage reports the exact head size per mass threshold") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val got = Curation.vocabCoverage(docs, "text", Seq(50, 100))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(got === Array((50, 1L, 2L, 4L), (100, 2L, 2L, 4L)))
  }

  test("ipwTotals: rate 1.0 reproduces the true totals exactly") {
    val df = Seq(("x", 1L, 5L), ("x", 2L, 7L), ("y", 3L, 11L))
      .toDF("g", "k", "v")
    val got = Curation.ipwTotals(df, "k", "g", "v",
        Map("x" -> 1.0), defaultRate = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got === Array(("x", 2L, 2L, 12L, 12L, 0L),
      ("y", 1L, 1L, 11L, 11L, 0L)))
  }

  test("bootstrapCi: constant values collapse the interval to the mean") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 10L),
      ("g", 4L, 10L)).toDF("grp", "id", "v")
    val r = Curation.bootstrapCi(df, "grp", "id", "v", b = 5, m = 16)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((4L, 10000000L, 10000000L, 10000000L)))
  }

  test("exactKth ignores NULLs and survives full-64-bit-range domains") {
    import graft.operators.GlobalSort
    // NULLs excluded from the ranked universe (n counts non-null only)
    val withNulls = Seq(Some(5L), None, Some(1L), None, Some(9L)).toDF("v")
    val r = GlobalSort.exactKth(withNulls, "v", 2L).collect().head
    assert((r.getLong(0), r.getLong(2)) === ((3L, 5L)))
    // domain spanning the whole Long range: `hi - lo + 1` overflows —
    // the BigInt step/bounds math must still converge to exact answers
    val extreme = Seq(Long.MinValue, -1L, 0L, 7L, Long.MaxValue).toDF("v")
    assert(GlobalSort.exactKth(extreme, "v", 1L).collect().head.getLong(2)
      === Long.MinValue)
    assert(GlobalSort.exactKth(extreme, "v", 4L).collect().head.getLong(2)
      === 7L)
    assert(GlobalSort.exactKth(extreme, "v", 5L).collect().head.getLong(2)
      === Long.MaxValue)
  }

  test("mixToTarget stays distributed at 10^6 domains (no driver fold)") {
    // one row per domain, uniform weights: c = 1, every threshold hits
    // the full 10^4 keep band -> all rows survive. The point is the
    // SHAPE: census + thresholds ride a broadcast join, never a
    // collected Map or a 10^6-branch CaseWhen (advice r08).
    val docs = spark.range(0, 1000000L).select(col("id").as("doc_id"),
      concat(lit("d"), col("id")).as("dom"))
    val kept = Curation.mixToTarget(docs, "doc_id", "dom",
      Map("d0" -> 1.0), defaultWeight = 1.0)
    assert(kept.count() === 1000000L)
    assert(kept.columns.toSeq === Seq("doc_id", "dom"))
  }

  test("ksShift/emdShift clamp negative values into bin 0 — no lost mass") {
    // -9 with binWidth=8 lands in ghost bin -1 without the clamp
    // (counted in totals, absent from the grid), deflating both meters;
    // -5 would NOT exercise the fix — `div`//`//` truncate toward zero,
    // so -5 div 8 = 0 already (review r09)
    val df = Seq(("a", -9L), ("a", 1L), ("b", 9L), ("b", 17L))
      .toDF("src", "v")
    val emd = Curation.emdShift(df, "src", "v", binWidth = 8L, bins = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // hand-traced: a -> bins {0,0}, b -> {1,2}; gaps 4,2,0 -> EMD 6/4
    assert(emd === Map("a" -> ((2L, 1.5)), "b" -> ((2L, 1.5))))
    val ks = Curation.ksShift(df, "src", "v", binWidth = 8L, bins = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ks === Map("a" -> 1.0, "b" -> 1.0)) // max gap 4 / (2*2)
    intercept[IllegalArgumentException] {
      Curation.emdShift(df, "src", "v", binWidth = 0L, bins = 3)
    }
  }
}
