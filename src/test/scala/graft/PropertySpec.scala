package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.score.{PQDefaults, ScoreEngine}
import graft.score.ScoreEngine.Source
import graft.functions.TimeBuckets

/** Property-based invariants (SURVEY.md §5 item 2): score bounds and
  * outlier behavior across random metric vectors; time-bucket ordering and
  * idempotence; explosion count preservation. Generators run with fixed
  * seeds so failures reproduce.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val metricGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-100.0, 10000.0),
    Gen.oneOf(0.0, -1.0, 100.0, 5000.0, 0.01, 0.7), // rule boundaries
    Gen.choose(0.0, 1.0))

  test("property: hdr bucket is monotone; lower bound within 2^-m relative error") {
    import graft.operators.Sketches
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("x"))
    val cap = 64L
    val df = spark.range(1L, 300001L).select(col("id").as("x"))
      .withColumn("b", Sketches.hdrBucket(col("x"), 6))
      .withColumn("lb", when(col("b") < 2L * cap, col("b")).otherwise(
        (lit(cap) + col("b") % cap) *
          pow(lit(2.0), (expr("b div 64") - 1L).cast("double")).cast("long")))
    // lb ≤ x (lower bound), (x − lb)·2^m < max(lb, 2^m) (relative error),
    // and bucket ids never decrease as x grows
    val bad = df
      .withColumn("pb", lag(col("b"), 1).over(w))
      .filter(col("lb") > col("x") ||
        (col("x") - col("lb")) * cap >= greatest(col("lb"), lit(cap)) ||
        (col("pb").isNotNull && col("pb") > col("b")))
    assert(bad.count() === 0L)
  }

  test("property: every protocol score is in [0,100] for any input batch") {
    val ping = PQDefaults.config.byProtocol("PING")
    val game = PQDefaults.config.byProtocol("GAME")
    for (seed <- 1L to 10L) {
      val triples = sample(Gen.listOfN(50, Gen.zip(metricGen, metricGen, metricGen)), seed)
      val df = triples.toDF("rtt", "lost_rate", "tcp_delay")
        .withColumn("conn_cost", col("rtt") + 1)
      val scores = df.select(
          ScoreEngine.scoreFor(ping, n => Source(col(n), n)).as("p"),
          ScoreEngine.scoreFor(game, n => Source(col(n), n)).as("g"))
        .collect()
      scores.foreach { r =>
        assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 100.0, s"seed $seed")
        assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 100.0, s"seed $seed")
      }
    }
  }

  test("property: any fired outlier rule zeroes the whole score") {
    val ping = PQDefaults.config.byProtocol("PING")
    val outlierRtt = Gen.oneOf(Gen.choose(-1000.0, 0.0), Gen.choose(5000.0, 1e7))
    val rows = (1L to 40L).map(seed =>
      (sample(outlierRtt, seed), sample(Gen.choose(0.0, 99.0), seed)))
    val scores = rows.toDF("rtt", "lost_rate")
      .select(ScoreEngine.scoreFor(ping, n => Source(col(n), n)))
      .collect().map(_.getDouble(0))
    assert(scores.forall(_ === 0.0))
  }

  test("property: bucket ordering ts_m <= ts_w|ts_d <= ts_h <= ts, idempotent") {
    val epochs = (1L to 50L).map(seed => sample(Gen.choose(0L, 4102444800L), seed))
    val rows = TimeBuckets.withBuckets(
        epochs.toDF("e").withColumn("ts", to_timestamp(col("e"))), "ts", "b")
      .select("e", "b_h", "b_d", "b_w", "b_m").collect()
    rows.foreach { r =>
      val (e, h, d, w, m) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // m and w are mutually unordered (a month can start mid-week)
      assert(m <= d && w <= d && d <= h && h <= e)
      assert(h % 3600 === 0 && d % 86400 === 0)
      assert(w % 86400 === 0 && d - w < 7 * 86400)
    }
    // idempotence: bucketing a bucket start returns itself
    val starts = rows.map(_.getLong(1))
    val again = TimeBuckets.withBuckets(
        starts.toSeq.toDF("e").withColumn("ts", to_timestamp(col("e"))), "ts", "b")
      .select("e", "b_h").collect()
    again.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("property: detail explosion preserves element counts") {
    for (seed <- 1L to 10L) {
      val sizes = sample(Gen.listOfN(5, Gen.choose(0, 6)), seed)
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(j => s"w$j").toArray)
      }.toDF("id", "elems")
      val exploded = docs.select(col("id"), explode(col("elems")))
      assert(exploded.count() === sizes.sum.toLong)
      val perParent = exploded.groupBy("id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      sizes.zipWithIndex.foreach { case (n, i) =>
        assert(perParent.getOrElse(i.toLong, 0L) === n.toLong)
      }
    }
  }

  test("property: canonicalUrl is idempotent over random url shapes") {
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
      host <- Gen.oneOf("Ex.COM", "a.b.org", "SHOP9.example.com")
      path <- Gen.oneOf("", "/x", "/x/Y", "/x/", "/")
      q <- Gen.oneOf("", "?a=1", "?utm_source=z", "?utm_a=1&b=2",
        "?b=2&utm_c=3", "?utm_a=1&utm_b=2&c=3")
      frag <- Gen.oneOf("", "#f", "#Sec2")
    } yield s"$scheme://$host$path$q$frag"
    for (seed <- 1L to 10L) {
      val urls = sample(Gen.listOfN(40, urlGen), seed)
      val once = urls.toDF("u")
        .select(graft.functions.TextFunctions.canonicalUrl(col("u")).as("c"))
        .collect().map(_.getString(0)).toSeq
      val twice = once.toDF("u")
        .select(graft.functions.TextFunctions.canonicalUrl(col("u")).as("c"))
        .collect().map(_.getString(0)).toSeq
      assert(once === twice, s"seed $seed")
      // no canonical form retains a fragment or utm param
      once.foreach { c =>
        assert(!c.contains("#") && !c.contains("utm_"), s"seed $seed: $c")
      }
    }
  }

  test("property: incrementalIngest is idempotent and never re-admits") {
    val textGen: Gen[String] =
      Gen.listOfN(5, Gen.oneOf("a", "b", "c", "D", " x", "Y ")).map(_.mkString(" "))
    for (seed <- 1L to 5L) {
      val existing = sample(Gen.listOfN(10, textGen), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val incoming = sample(Gen.listOfN(15, textGen), seed + 100)
        .zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("id", "text")
      val kept = graft.operators.Dedup
        .incrementalIngest(existing, incoming, "id", "text")
        .localCheckpoint()
      // re-ingesting what was just admitted (plus the corpus) admits nothing
      val again = graft.operators.Dedup.incrementalIngest(
        existing.unionByName(kept), kept, "id", "text")
      assert(again.count() === 0L, s"seed $seed")
      // kept rows are fingerprint-unique among themselves
      val fps = kept.select(
          graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .collect().map(_.getString(0))
      assert(fps.length === fps.distinct.length, s"seed $seed")
    }
  }

  test("property: semDedupLsh always drops an exact duplicate, keeps the min id") {
    // identical vectors share every hyperplane sign, hence every bucket —
    // at ANY bits setting an exact duplicate can never escape its
    // original's cell, so the greedy lower-id rule must drop it. Random
    // vectors, random duplicate choices, several bits settings.
    val dim = 8
    for (seed <- 1L to 3L; bits <- Seq(2, 6, 12)) {
      val rnd = new scala.util.Random(seed)
      val base = (0L until 40L).map(i =>
        (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      val dups = (0 until 10).map { j =>
        val (i, v) = base(rnd.nextInt(base.size))
        (1000L + j, i, v)
      }
      val df = (base.map { case (i, v) => (i, v) } ++
        dups.map { case (d, _, v) => (d, v) }).toDF("id", "v")
      val out = graft.operators.Similarity
        .semDedupLsh(df, "id", "v", dim, bits, threshold = 0.999999)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      dups.foreach { case (d, orig, _) =>
        assert(!out(d), s"seed=$seed bits=$bits: dup $d of $orig kept")
      }
      // dup ids are all above the base ids and random 8-dim vectors are
      // never cosine-0.999999-close by chance, so the drops are EXACTLY
      // the duplicates: every base row stays kept
      assert(out.values.count(identity) === base.size,
        s"seed=$seed bits=$bits: a base row was dropped")
    }
  }

  test("property: bloomPrefilter never drops a matching key (no false negatives)") {
    import graft.operators.JoinReduction
    for (seed <- 1L to 5L) {
      val buildKeys = sample(
        Gen.listOfN(60, Gen.choose(0L, 100000L)), seed).distinct
      val probe = spark.range(0L, 3000L)
        .select((col("id") * 37 % 100000L).as("k"))
      val build = buildKeys.toDF("bk")
      val reduced = JoinReduction.bloomPrefilter(probe, "k", build, "bk")
      val lost = probe.join(build, col("k") === col("bk"))
        .select("k").except(reduced.join(build, col("k") === col("bk"))
          .select("k"))
      assert(lost.count() === 0L, s"seed=$seed: matching keys lost")
    }
  }

  test("property: snapshotDiff of a snapshot against itself is all unchanged") {
    import graft.operators.Audit
    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(200,
        Gen.zip(Gen.choose(0L, 10000L), Gen.option(Gen.alphaStr))), seed)
        .distinctBy(_._1)
      val df = rows.toDF("k", "v")
      val got = Audit.snapshotDiff(df, df, "k", Seq("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("unchanged" -> rows.size.toLong), s"seed=$seed")
    }
  }

  test("property: bpeEncode token counts stay within [n_words, n_chars]") {
    import graft.operators.Tokenizer
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "n", "e" -> "r")
    for (seed <- 1L to 5L) {
      val texts = sample(Gen.listOfN(50, Gen.oneOf(
        Gen.alphaStr, Gen.asciiPrintableStr,
        Gen.listOfN(8, Gen.alphaLowerStr).map(_.mkString(" ")))), seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val bad = Tokenizer.bpeEncode(df, "doc_id", "text", merges)
        .filter(col("n_tokens") > col("n_chars") ||
          (col("n_chars") > 0 && col("n_tokens") < col("n_words")) ||
          col("n_tokens") < 0 || col("n_words") < 0)
      assert(bad.count() === 0L, s"seed=$seed: count bounds violated")
    }
  }

  test("property: hotKeySaltedJoin equals the plain join on random skew") {
    import graft.operators.SkewTools
    for (seed <- 1L to 3L) {
      val hotKey = sample(Gen.choose(0L, 50L), seed)
      val facts = (spark.range(0L, 2000L)
        .select(when(col("id") % 3 === 0, lit(hotKey))
          .otherwise(col("id") % 80L).as("k"), col("id").as("p")))
      val dim = (0L until 80L).map(k => (k, s"a$k")).toDF("k", "attr")
      val plain = facts.join(dim, Seq("k"))
        .select("k", "p", "attr").collect().map(_.toSeq).toSet
      val salted = SkewTools
        .hotKeySaltedJoin(facts, dim, "k", saltN = 5, hotThreshold = 200L)
        .select("k", "p", "attr").collect().map(_.toSeq).toSet
      assert(salted === plain, s"seed=$seed")
    }
  }

  test("property: cross-doc span stats bound span removal") {
    import graft.operators.Dedup
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (seed <- 1L to 3L) {
      val texts = sample(Gen.listOfN(30, Gen.choose(0, 25).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))), seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val stats = Dedup
        .crossDocSpanStats(df, "doc_id", "text", n = 3, minDocs = 2)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_windows"),
            r.getAs[Long]("dup_spans"), r.getAs[Long]("dup_tokens")))).toMap
      val rem = Dedup
        .removeCrossDocSpans(df, "doc_id", "text", n = 3, minDocs = 2)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
            r.getAs[String]("cleaned")))).toMap
      assert(stats.keySet === rem.keySet)
      stats.foreach { case (id, (nt, dw, dsp, dtok)) =>
        val ctx = s"seed=$seed doc=$id"
        assert(dtok <= nt, ctx)
        assert(dw >= dsp, ctx)                 // merged islands never grow
        assert(dtok >= 3L * dsp, ctx)          // every island covers >= n
        assert(dw <= math.max(nt - 2L, 0L), ctx) // <= window count
        val (nt2, kept, cleaned) = rem(id)
        assert(nt2 === nt, ctx)
        // removal drops only non-first occurrences; stats cover all
        // duplicated occurrences, so dropped <= dup_tokens
        val dropped = nt - kept
        assert(dropped >= 0L && dropped <= dtok, ctx)
        if (dw == 0L) assert(kept === nt, ctx) // untouched docs pass through
        val rebuilt =
          if (cleaned.isEmpty) 0L else cleaned.split(" ").length.toLong
        assert(rebuilt === kept, ctx)
      }
    }
  }

  test("property: holt and kaplan-meier folds are partitioning-invariant") {
    import graft.operators.TimeSeries
    val rnd = new scala.util.Random(11)
    val series = (1 to 3).flatMap(k => (1 to 40).map(t =>
      (s"k$k", t.toLong, rnd.nextInt(1000).toLong)))
    val subj = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(2).toLong))
    for (parts <- Seq(1, 3, 7)) {
      val df = series.toDF("k", "t", "x").repartition(parts)
      val holt = TimeSeries.holtMicro(df, "k", "t", "x")
        .collect().map(_.toSeq).sortBy(_.toString)
      val holtRef = TimeSeries.holtMicro(series.toDF("k", "t", "x"), "k",
        "t", "x").collect().map(_.toSeq).sortBy(_.toString)
      assert(holt === holtRef, s"holt drifted at parts=$parts")
      val km = TimeSeries.kaplanMeierMicro(
        subj.toDF("dur", "ev").repartition(parts), "dur", "ev")
        .collect().map(_.toSeq).sortBy(_.toString)
      val kmRef = TimeSeries.kaplanMeierMicro(subj.toDF("dur", "ev"),
        "dur", "ev").collect().map(_.toSeq).sortBy(_.toString)
      assert(km === kmRef, s"km drifted at parts=$parts")
    }
  }

  test("property: exactKth equals the sorted index, negatives included") {
    import graft.operators.GlobalSort
    val rnd = new scala.util.Random(17)
    (1 to 4).foreach { trial =>
      val vals = (1 to 500).map(_ =>
        rnd.nextLong() % 1000000L - 200000L)
      val sorted = vals.sorted
      val df = vals.toDF("v").repartition(trial * 2)
      Seq(1, 250, 500).foreach { k =>
        val r = GlobalSort.exactKth(df, "v", k.toLong).collect().head
        assert(r.getLong(2) === sorted(k - 1),
          s"trial=$trial k=$k: got ${r.getLong(2)}, want ${sorted(k - 1)}")
      }
    }
  }

  test("property: mergeIntervals spans are disjoint and cover exactly the union") {
    import graft.operators.TimeSeries
    val rnd = new scala.util.Random(23)
    val iv = (1 to 400).map { _ =>
      val s = rnd.nextInt(500).toLong
      (s"g${rnd.nextInt(4)}", s, s + 1 + rnd.nextInt(40))
    }
    val got = TimeSeries.mergeIntervals(iv.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    iv.groupBy(_._1).foreach { case (k, ivs) =>
      val covered = ivs.flatMap(t => t._2 until t._3).toSet
      val spans = got.filter(_._1 == k).sortBy(_._2)
      // disjoint with true gaps between consecutive spans
      spans.sliding(2).foreach {
        case Array(a, b) => assert(a._3 < b._2, s"$k: spans touch/overlap")
        case _ =>
      }
      val spanCover = spans.flatMap(s => s._2 until s._3).toSet
      assert(spanCover === covered, s"$k: coverage mismatch")
      assert(spans.map(_._4).sum === ivs.size.toLong, s"$k: n_merged sum")
    }
  }

  test("property: staged grid nearest equals unstaged and brute force") {
    import graft.operators.Spatial
    val rnd = new scala.util.Random(41)
    (1 to 3).foreach { trial =>
      val radius = Seq(60L, 200L, 997L)(trial - 1) // incl. non-divisible
      val pts = (1 to 150).map(i =>
        (i.toLong, rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
      val sts = (1 to 25).map(i =>
        (i.toLong, rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
      val points = pts.toDF("id", "px", "py")
      val sites = sts.toDF("st", "sx", "sy")
      def run(sf: Int) = Spatial.nearestWithin(points, "id", "px", "py",
          sites, "st", "sx", "sy", radius, stageFactor = sf)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      val brute = pts.map { case (id, px, py) =>
        val c = sts.flatMap { case (st, sx, sy) =>
          val d2 = (px - sx) * (px - sx) + (py - sy) * (py - sy)
          if (d2 <= radius * radius) Some((d2, st)) else None
        }
        id -> (if (c.isEmpty) None
               else { val m = c.min; Some((m._2, m._1)) })
      }.toMap
      Seq(0, 2, 4, 7).foreach { sf =>
        assert(run(sf) === brute, s"trial=$trial radius=$radius sf=$sf")
      }
    }
  }

  test("property: streamed semDedupLshIngest wave-union equals batch semDedupLsh") {
    // the q320 contract as an invariant over random corpora: for ANY
    // id-monotone wave split (including empty waves), the union of
    // per-wave ingest verdicts equals one batch pass. Vectors cluster
    // around shared prototypes (exact dups + near dups + noise) so the
    // 0.9 threshold and the 3-bit buckets both really fire; an all-zero
    // vector exercises the NaN-cosine comparison path identically on
    // both sides.
    import graft.operators.Similarity
    val dim = 4; val bits = 3; val thr = 0.9
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val protos = Array.fill(6)(Array.fill(dim)(rnd.nextInt(9) - 4.0f))
      val rows: Seq[(Long, Array[Float])] = (0 until 40).map { i =>
        val v: Array[Float] =
          if (i == 17) Array.fill(dim)(0.0f) // zero vector: NaN cosine
          else {
            val p = protos(rnd.nextInt(protos.length))
            if (rnd.nextBoolean()) p.clone()
            else p.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f)
          }
        (i.toLong, v)
      }
      val df = rows.toDF("vec_id", "embedding")
      val batch = Similarity
        .semDedupLsh(df, "vec_id", "embedding", dim, bits, thr)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      // random monotone split into 3 waves (cutpoints may coincide →
      // an empty middle wave)
      val c1 = rnd.nextInt(41); val c2 = c1 + rnd.nextInt(41 - c1)
      val waves = Seq(
        df.filter(col("vec_id") < c1),
        df.filter(col("vec_id") >= c1 && col("vec_id") < c2),
        df.filter(col("vec_id") >= c2))
      var standing = df.limit(0).select(col("vec_id"),
        lit(0L).as("cluster"), col("embedding"))
      val streamed = waves.flatMap { w =>
        val out = Similarity.semDedupLshIngest(standing, w,
          "vec_id", "embedding", dim, bits, thr)
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        standing = standing.unionByName(w.select(col("vec_id"),
          Similarity.lshBucket(col("embedding"), dim, bits).as("cluster"),
          col("embedding")))
        out
      }.toMap
      assert(streamed === batch, s"trial=$trial cut=($c1,$c2)")
    }
  }

  test("property: pageRank unrolled and checkpointed agree on random graphs") {
    import graft.operators.Graphs
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val n = 12 + trial * 5
      val edges = (1 to n * 3).map(_ =>
        (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("src", "dst")
      def ranks(unrollBelow: Long) = Graphs
        .pageRankImpl(df, "src", "dst", iterations = 3, unrollBelow)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val u = ranks(Long.MaxValue)
      val c = ranks(0L)
      assert(u === c, s"trial=$trial n=$n edges=${edges.size}")
      // total fixed-point mass stays within the truncation slack:
      // each node's rank loses < outdeg from integer division per round
      assert(u.values.sum <= Graphs.Scale)
      assert(u.values.forall(_ > 0L))
    }
  }
}
