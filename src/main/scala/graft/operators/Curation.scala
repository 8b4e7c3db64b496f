package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-data curation operators: deterministic sampling, sequence
  * packing, benchmark decontamination, and embedding quantization. All
  * pure expressions + at most one window/semi-join shuffle — and every
  * one is deterministic (hash-based, not RNG-based) so pipelines are
  * replay-safe and the driver gate can hash-compare them.
  */
object Curation {

  /** Deterministic keep/drop decision: md5-derived 60-bit key of
    * (salt || key) mod 10000 against rate×10000. Unlike rand()-based
    * sampling this is stable across retries/replays and engines. */
  def hashKeep(key: Column, rate: Double, salt: String): Column =
    TextFunctions.md5Key60(concat(lit(salt), key)) % 10000L <
      lit(math.round(rate * 10000).min(10000L))

  /** Stratified deterministic sampling: per-stratum rates with a default.
    * One scan, zero shuffle — the sample decision is a per-row hash. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val threshold = rates.foldLeft(
      when(lit(false), lit(0L))) { case (acc, (stratum, rate)) =>
        acc.when(col(strataCol) === stratum,
          lit(math.round(rate * 10000).min(10000L)))
      }.otherwise(lit(math.round(defaultRate * 10000).min(10000L)))
    df.filter(
      TextFunctions.md5Key60(concat(lit(salt), col(keyCol))) % 10000L
        < threshold)
  }

  /** Concatenate-and-chunk sequence packing (the standard LLM-pretraining
    * layout): documents ordered by `idCol` within each `groupCol` stream
    * are laid head-to-tail; a document's bin is the chunk its FIRST token
    * lands in. One window shuffle on the group key; at 100 TB the group
    * (language/source shard) bounds the window state. */
  def packBins(df: DataFrame, groupCol: String, idCol: String,
      tokens: Column, binTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df.withColumn("n_tokens", tokens)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      // tokens-before-this-doc / cap; exact in double (< 2^53)
      .withColumn("bin",
        ((col("__cum") - col("n_tokens")) / binTokens).cast("long"))
      .drop("__cum")
  }

  /** Balanced shard assignment for training-data export — the writer-side
    * complement of [[packBins]]: where packBins lays a stream head-to-tail
    * into fixed-token bins, this balances per-shard TOTALS when documents
    * must stay whole and the shard count is fixed (N output files, N data
    * loaders). Serpentine (boustrophedon) assignment over the global
    * token-descending rank: block b of N ranked docs goes 0..N-1 on even
    * blocks and N-1..0 on odd blocks — the classic greedy-equivalent
    * deterministic schedule (snake draft): each shard's total is within
    * one max-document of optimal, with no driver-side greedy loop and no
    * sequential dependency. The global rank is
    * [[GlobalSort.withGlobalRank]] (range-partitioned, never a
    * single-partition window), so the whole operator is two parallel
    * passes + one tiny driver prefix-sum at ANY corpus size. Output: the
    * input plus (n_tokens, shard). */
  def balancedShards(df: DataFrame, idCol: String, tokens: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val ranked = GlobalSort.withGlobalRank(
      df.withColumn("n_tokens", tokens),
      Seq(col("n_tokens").desc, col(idCol).asc), rankCol = "__rank")
    ranked
      .withColumn("__pos", col("__rank") - 1)
      .withColumn("__idx", pmod(col("__pos"), lit(nShards.toLong)))
      .withColumn("shard",
        when(pmod(expr(s"__pos div ${nShards}L"), lit(2L)) === 0L,
          col("__idx")).otherwise(lit(nShards.toLong - 1L) - col("__idx")))
      .drop("__rank", "__pos", "__idx")
  }

  /** C4-style line-level quality filtering: keep lines with at least
    * `minWords` words, terminal punctuation, and no boilerplate marker;
    * return the cleaned text plus kept/dropped counts. Pure per-row HOF
    * work — full scan speed, zero shuffle, so it composes into any
    * ingest pass for free at 100 TB. */
  def lineQualityFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3,
      boilerplate: Seq[String] = Seq("javascript", "cookie", "privacy policy")
  ): DataFrame = {
    def keepLine(l: Column): Column =
      size(filter(split(l, "\\s+"), t => t =!= "")) >= minWords &&
        l.rlike("[.!?\"]$") &&
        boilerplate.map(b => !lower(l).contains(b)).reduce(_ && _)
    // lines and the kept sublist are each bound once; the struct is one
    // expression so the line split can't be re-inlined per output column
    docs.select(col(idCol),
        TextFunctions.bindOnce(split(col(textCol), "\n")) { lines =>
          TextFunctions.bindOnce(filter(lines, keepLine(_))) { kept =>
            struct(
              array_join(kept, "\n").as("clean_text"),
              size(kept).cast("long").as("n_kept"),
              (size(lines) - size(kept)).cast("long").as("n_dropped"))
          }
        }.as("r"))
      .select(col(idCol), col("r.clean_text").as("clean_text"),
        col("r.n_kept").as("n_kept"), col("r.n_dropped").as("n_dropped"))
  }

  /** Corpus-level top-k most frequent word n-grams: one map-side-combined
    * shuffle of (ngram, count) pairs, TakeOrderedAndProject for the cut
    * (no global sort). Ties break on the gram text so the cut is
    * deterministic and hash-gateable. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int = 2,
      topK: Int = 20): DataFrame =
    docs.select(explode(TextFunctions.shingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(topK)

  /** Deterministic WEIGHTED Bernoulli sampling: keep each row with
    * probability `ppm/10^6`, where `ppm` is a per-row integer
    * parts-per-million weight expression (integer arithmetic end-to-end —
    * no double thresholds to drift cross-engine). Same replay contract
    * as [[hashKeep]]: the decision depends only on (salt, id, weight),
    * so re-runs and re-shards never flip a row, and upweighting a domain
    * only ADDS documents (monotone in ppm). Zero shuffle. */
  def weightedSample(df: DataFrame, idCol: String,
      ppm: org.apache.spark.sql.Column, salt: String): DataFrame =
    df.filter(
      TextFunctions.md5Key60(concat(lit(salt), col(idCol).cast("string")))
        % 1000000L < least(greatest(ppm.cast("long"), lit(0L)), lit(1000000L)))

  /** Exact-k WEIGHTED sample without replacement — Efraimidis–Spirakis
    * priority sampling: each row draws u ∈ (0,1) from the replay-stable
    * md5 family and gets priority −ln(u)/w; the k smallest priorities
    * ARE a weighted sample without replacement. Completes the sampling
    * family: [[weightedSample]] is per-row Bernoulli (approximate size),
    * [[Curation.exactKPerGroup]] is exact-k unweighted — this is exact-k
    * weighted. Plan: one scan computes priorities, the cut is
    * orderBy+limit → TakeOrderedAndProject (per-partition k, driver
    * merge), never a global sort. u is built from the 60-bit md5 key so
    * both engines draw the identical number; ln's libm ulp gap is
    * absorbed by rounding the priority to scale 8 BEFORE ordering, with
    * the id as total-order tie-break (the q82 rounded-ln discipline).
    * Rows with weight ≤ 0 are excluded (they have no sampling mass). */
  def prioritySample(df: DataFrame, idCol: String,
      weight: org.apache.spark.sql.Column, k: Int,
      salt: String = "graft-psample"): DataFrame = {
    import graft.functions.SafeMath
    val key = TextFunctions.md5Key60(
      concat(lit(salt), col(idCol).cast("string")))
    // 2^60 is a power of two — the double literal is exact on any engine
    val u = (key.cast("double") + lit(0.5)) / lit(1152921504606846976.0)
    df.select(col(idCol), weight.cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("priority",
        SafeMath.roundHalfUp(-log(u) / col("weight"), 8))
      .orderBy(col("priority").asc, col(idCol).asc)
      .limit(k)
  }

  /** Fixed-weight logistic quality classifier — the INFERENCE step of a
    * fasttext-style quality model run at corpus scale: per-row feature
    * extraction (length saturation, stopword density, punctuation soup,
    * mean token length) into a linear score and sigmoid. Training happens
    * offline; serving a frozen linear model over 100 TB is pure
    * projection work — no shuffle, full scan speed. The probability is
    * roundHalfUp'd at scale 8 so the exp() ulp gap between engines can't
    * flip a hash; the keep decision thresholds the ROUNDED value so the
    * boolean can't disagree either. */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val t = col(textCol)
    val n = TextFunctions.tokenCount(t).cast("double")
    val lenT = least(n / lit(100.0), lit(1.0))
    val stopT = TextFunctions.stopwordRatio(t)
    val punctT = TextFunctions.punctRatio(t)
    val mlenT = TextFunctions.meanTokenLen(t) / lit(10.0)
    val z = lit(-2.0) + lit(2.5) * lenT + lit(3.0) * stopT -
      lit(4.0) * punctT + lit(1.5) * mlenT
    docs.select(col(idCol),
        graft.functions.SafeMath.roundHalfUp(
          lit(1.0) / (lit(1.0) + exp(-z)), 8).as("quality_prob"))
      .withColumn("keep", col("quality_prob") >= threshold)
  }

  /** Split each document into overlapping token-window chunks — the RAG /
    * context-window prep step: chunk i covers tokens [i·stride,
    * i·stride + width). The tokenization is materialized in its OWN
    * projection below the explode (the ExtractGenerator trap: an
    * expensive expression in the same select as a generator re-evaluates
    * once per emitted row), and the generator itself expands a tiny
    * integer sequence, so the per-row cost is one tokenize + one slice
    * per chunk. Zero shuffle; empty documents yield one empty chunk so
    * no doc silently disappears. */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && width >= stride, "need 0 < stride <= width")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    toks
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(width)), " ")
          .as("chunk_text"),
        least(size(col("__toks")) - col("__start"), lit(width))
          .cast("long").as("n_tokens"))
  }

  /** Inverse of [[chunkOverlap]] — reassemble overlap-chunked documents
    * back into whitespace-normalized originals: chunk 0 contributes all
    * its tokens, every later chunk drops its first `width − stride`
    * tokens (exactly the overlap the chunker duplicated), and chunks
    * concatenate in chunk_id order. The ROUND-TRIP property
    * (reassemble ∘ chunk = tokens-normalize) is what makes an
    * overlap-chunked RAG/pretraining store lossless — and the q297 gate
    * asserts it against the original corpus, not against a replayed
    * chunker. One keyed aggregate; per-doc arrays bounded by document
    * length. */
  def reassembleChunks(chunks: DataFrame, idCol: String,
      chunkIdCol: String, textCol: String, width: Int,
      stride: Int): DataFrame = {
    require(stride > 0 && width >= stride, "need 0 < stride <= width")
    val overlap = width - stride
    val kept = chunks.select(col(idCol), col(chunkIdCol).as("__cid"),
      when(col(chunkIdCol) === 0, TextFunctions.tokens(col(textCol)))
        .otherwise(slice(TextFunctions.tokens(col(textCol)),
          overlap + 1, width)).as("__keep"))
    kept.groupBy(col(idCol))
      .agg(array_join(flatten(transform(
        array_sort(collect_list(struct(col("__cid"), col("__keep")))),
        c => c.getField("__keep"))), " ").as("text_norm"))
  }

  /** Deterministic train/val/test assignment: md5-derived bucket of the
    * (salted) id — replay-stable, engine-portable, zero shuffle. Same
    * contract as [[hashKeep]]: re-running the pipeline (or re-sharding
    * the input) never moves a document across splits. */
  def splitAssign(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10, salt: String = "graft-split"): DataFrame = {
    val bucket =
      TextFunctions.md5Key60(concat(lit(salt), col(idCol).cast("string"))) % 100L
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** BM25 relevance of every document against a small query term set —
    * the retrieval scorer for corpus curation (mining domain-relevant
    * documents at scale). Per-row term frequencies are HOF counts over
    * one bound tokenization; the corpus stats (N, avgdl, per-term df)
    * are ONE aggregate row broadcast back — no per-term shuffle, no
    * inverted index needed for a fixed query. Scores are roundHalfUp'd
    * so the ln() ulp gap between engines can't flip a hash. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      scale: Int = 6): DataFrame = {
    val terms = queryTerms.distinct
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__toks"), x => x === t)).cast("double").as(s"__tf$i")
    }
    val base = docs.select(
      (Seq(col(idCol), col(textCol),
        TextFunctions.tokens(col(textCol)).as("__toks")): _*))
      .select((Seq(col(idCol),
        size(col("__toks")).cast("double").as("__dl")) ++ tfCols): _*)
    val statCols = Seq(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1).otherwise(0))
          .cast("double").as(s"__df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val idf = log((col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5) + 1.0)
      // FP op order mirrored exactly by the oracle SQL: (idf * (tf*(k1+1)))
      // / (tf + k1*((1-b) + (dl/avgdl)*b)) — multiplications commuted
      // where Scala needs the Column on the left are bit-identical
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + col("__dl") / col("__avgdl") * b))
    }.reduce(_ + _)
    scored.select(col(idCol),
      graft.functions.SafeMath.roundHalfUp(score, scale).as("bm25"))
  }

  /** Benchmark decontamination: flag every document sharing at least one
    * word k-shingle with the benchmark set. Shuffles (hash, id) pairs
    * only; a real benchmark set is tiny → broadcast semi-join. The
    * broadcast is GUARDED: above `maxBroadcastRows` benchmark rows the
    * shingle set would OOM the driver, so the join falls back to a
    * shuffle semi-join (the row probe is a `limit(n+1).count()`, which
    * stops scanning at the threshold instead of counting the frame). */
  def flagContaminated(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, k: Int = 5,
      maxBroadcastRows: Long = 100000L): DataFrame = {
    // no distinct on the doc side: the semi join tests EXISTENCE, so
    // duplicate (doc, shingle) rows can't change the outcome and the
    // post-join per-doc distinct dedups hits — skipping it removes a
    // full shuffle of the largest intermediate
    val docSh = docs.select(col(idCol).as("__doc"),
        explode(TextFunctions.shingles(col(textCol), k)).as("__sh"))
    val benchSh = benchmark
      .select(explode(TextFunctions.shingles(col(benchTextCol), k)).as("__sh"))
      .distinct()
    val benchIsSmall =
      benchmark.limit((maxBroadcastRows + 1).toInt).count() <= maxBroadcastRows
    val benchSide = if (benchIsSmall) broadcast(benchSh) else benchSh
    val hits = docSh.join(benchSide, Seq("__sh"), "left_semi")
      .select(col("__doc")).distinct()
      .withColumn("__hit", lit(true))
    docs.join(hits, docs(idCol) === hits("__doc"), "left")
      .withColumn("is_contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__doc", "__hit")
  }

  /** Intra-document repetition statistics (the Gopher-style repetition
    * filter family): per-doc duplicate-token ratio (one per-row HOF pass,
    * no shuffle) and the frequency share of the most common word n-gram
    * (explode → two keyed aggregations — shuffles (doc, gram) pairs, not
    * text; the per-row alternative is O(len²) expression work on long
    * docs). Docs with fewer than n tokens have a null `top_ngram_frac`. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).as("doc"),
      TextFunctions.bindOnce(TextFunctions.tokens(col(textCol))) { t =>
        struct(
          size(t).cast("long").as("n_tokens"),
          when(size(t) === 0, lit(0.0))
            .otherwise(lit(1.0) -
              size(array_distinct(t)).cast("double") / size(t).cast("double"))
            .as("token_dup_ratio"))
      }.as("s"))
      .select(col("doc"), col("s.n_tokens").as("n_tokens"),
        col("s.token_dup_ratio").as("token_dup_ratio"))
    val top = docs.select(col(idCol).as("doc"),
        explode(TextFunctions.shingles(col(textCol), n)).as("g"))
      .groupBy("doc", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc")
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_ngram_frac"))
    base.join(top, Seq("doc"), "left")
  }

  /** Deterministic epoch shuffle for training-order randomization: every
    * row draws a stable pseudo-random key from (salt || id), lands in a
    * shard (key mod nShards), and gets its position within the shard —
    * shard-major traversal is the epoch order. Hash-based end to end: the
    * same salt replays the identical order (resumable epochs); a new salt
    * is a fresh epoch. The per-shard window runs in parallel across
    * shards — never a global single-partition sort; at 100 TB nShards is
    * sized to the target output file count. */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String,
      nShards: Int = 64): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key"), col(idCol))
    df.withColumn("__key",
        TextFunctions.md5Key60(concat(lit(salt), col(idCol))))
      .withColumn("shard", (col("__key") % nShards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__key")
  }

  /** Rebalance a corpus toward target domain proportions by deterministic
    * subsampling: keep rates are scaled so the domain most under-
    * represented relative to its target weight is kept in full and every
    * other domain is thinned toward proportionality. Two passes — a
    * count aggregate (domains are few by definition; collected to the
    * driver like a broadcast dim) and a zero-shuffle hash filter.
    * Domains missing from `weights` get `defaultWeight`. The keep
    * decision is [[hashKeep]]-style (md5 mod 10⁴ vs a per-domain
    * threshold), so the subsample is replay-stable. Rows with a NULL
    * domain are dropped (no equality match → threshold 0) — filter or
    * fill the domain column first if they must survive. */
  def mixToTarget(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double], defaultWeight: Double,
      salt: String = "graft-mix"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the domain census stays DISTRIBUTED (advice r08: the old collect +
    // per-domain CaseWhen fold was driver-unbounded AND the documented
    // giant-CASE codegen trap). Only ONE scalar (the min count/weight
    // ratio) crosses to the driver; per-domain thresholds ride a
    // broadcast join keyed on the domain — fine to millions of domains.
    val wdf = weights.toSeq.toDF("__dom", "__w")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .join(broadcast(wdf), Seq("__dom"), "left")
      .withColumn("__w", coalesce(col("__w"), lit(defaultWeight)))
      .localCheckpoint() // domain-sized; read twice (scalar + thresholds)
    val cRow = counts.agg(min(col("__n") / col("__w"))).collect()(0)
    require(!cRow.isNullAt(0), "mixToTarget: empty input")
    val c = cRow.getDouble(0)
    // identical fold order to the oracle: ((w*c)/n)*10000 + 0.5, floored
    val thrDf = counts.select(col("__dom"),
      floor(col("__w") * lit(c) / col("__n") * lit(10000.0) + lit(0.5))
        .cast("long").as("__thr"))
    df.join(broadcast(thrDf), col(domainCol) === col("__dom"), "left")
      .filter(TextFunctions.md5Key60(concat(lit(salt), col(idCol))) %
        10000L < coalesce(col("__thr"), lit(0L)))
      .drop("__dom", "__thr")
  }

  /** Unigram language-model scoring: build the corpus unigram table in
    * one token-keyed aggregation, then score every document by its mean
    * negative log-likelihood — the classic cheap perplexity proxy for
    * quality filtering (high NLL = unusual token mix for this corpus).
    * Shuffles: one groupBy(token), one token-keyed join (AQE broadcasts
    * the vocab side when it fits), one groupBy(doc). Per-token NLLs are
    * rounded and decimal-summed so the mean is partition-order-
    * independent. Token-less documents come back with n_tokens=0, nll=0. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    // tokenize once (checkpoint) — the vocab table and the scoring join
    // both read the materialized tokens, and the corpus total comes from
    // the vocab-sized freq frame, never a separate token-stream pass
    val toks = docs.select(col(idCol).as("__doc"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .localCheckpoint()
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totRow = freq.agg(sum(col("cnt"))).collect()(0)
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val per = toks.join(freq, "tok")
      .select(col("__doc"),
        SafeMath.roundHalfUp(
            -log(col("cnt").cast("double") / lit(total.toDouble)), 8)
          .cast(DecimalType(28, 8)).as("nll8"))
    val agg = per.groupBy("__doc")
      .agg(count(lit(1)).as("n_tokens"),
        SafeMath.roundHalfUp(
          sum(col("nll8")).cast("double") / count(lit(1)), scale).as("nll"))
    docs.select(col(idCol))
      .join(agg.withColumnRenamed("__doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("nll"), lit(0.0)).as("nll"))
  }

  /** Bigram language-model scoring — [[unigramLogProb]]'s context-aware
    * sibling (catches token SEQUENCES that are unusual even when every
    * token is common — shuffled/garbled text scores high here and
    * normal there; the pair is the classic cheap fluency filter).
    * Add-one smoothing: P(c|p) = (count(p,c)+1) / (count(p)+V). One
    * corpus pass builds both tables (bigrams via a zipped-successor
    * transform bound below its explode); scoring is two token-keyed
    * joins; per-bigram NLLs rounded and decimal-summed so the mean is
    * partition-order-independent. Docs with <2 tokens → n_bigrams=0. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val base = docs.select(col(idCol).as("__doc"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .localCheckpoint()
    val toks = base.select(col("__doc"), explode(col("toks")).as("tok"))
    val big = base
      .withColumn("bg", when(size(col("toks")) < 2,
          array().cast("array<struct<p:string,c:string>>"))
        .otherwise(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("p"),
            element_at(col("toks"), i + 2).as("c")))))
      .select(col("__doc"), explode(col("bg")).as("b"))
      .select(col("__doc"), col("b.p").as("p"), col("b.c").as("c"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("uc"))
      .localCheckpoint() // vocab-sized; count + join read it, not the corpus
    val vocab = uni.count()
    val bc = big.groupBy("p", "c").agg(count(lit(1)).as("bc"))
    val per = big.join(bc, Seq("p", "c"))
      .join(uni.select(col("tok").as("p"), col("uc")), Seq("p"))
      .select(col("__doc"), SafeMath.roundHalfUp(
          -log((col("bc") + 1).cast("double") /
            (col("uc") + vocab).cast("double")), 8)
        .cast(DecimalType(28, 8)).as("nll8"))
    val agg = per.groupBy("__doc")
      .agg(count(lit(1)).as("n_bigrams"),
        SafeMath.roundHalfUp(
          sum(col("nll8")).cast("double") / count(lit(1)), scale).as("nll"))
    docs.select(col(idCol))
      .join(agg.withColumnRenamed("__doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll"), lit(0.0)).as("nll"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the mean per-token log-likelihood ratio between a TARGET unigram LM
    * (built from the rows matching `targetFilter`) and the RAW corpus LM
    * (built from every row), both Laplace-smoothed over the shared
    * vocabulary. Positive score = the document looks more target-like
    * than the corpus average. This is the deterministic analog of DSIR's
    * importance resampling — threshold the weight instead of Gumbel
    * sampling, so the selection is replay-stable and hash-gateable.
    *
    * Scale shape: both LMs are token-keyed aggregates (bounded by VOCAB,
    * not corpus), built in ONE pass over the token stream with map-side
    * combine; scoring is one join of the token stream against the
    * vocab-sized llr table (broadcastable for real vocabularies) plus a
    * doc-keyed agg. The three corpus totals are a 1-row driver read.
    * Cross-engine FP: each ln() is roundHalfUp'd at scale 8 and the two
    * sides subtracted as DECIMALs, per-doc means are decimal sums — the
    * q82 recipe, so libm ulp gaps can't flip the gate hash. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val toks = docs.select(col(idCol).as("__doc"),
      targetFilter.as("__tgt"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(
      count(lit(1)).as("raw_cnt"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("tgt_cnt"))
      .persist()
    val Seq(rawTotal, tgtTotal, vocab) = {
      val r = freq.agg(sum("raw_cnt"), sum("tgt_cnt"), count(lit(1)))
        .collect()(0)
      // empty corpus: the sums are NULL — any totals work, the scoring
      // join below is over an empty freq frame either way
      if (r.isNullAt(0)) Seq(0L, 0L, 0L)
      else Seq(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def smoothed(cnt: Column, total: Long): Column =
      SafeMath.roundHalfUp(
          log((cnt + lit(1L)).cast("double") / lit((total + vocab).toDouble)),
          8)
        .cast(DecimalType(28, 8))
    // vocab-sized table; localCheckpoint materializes it eagerly so the
    // freq cache can be released before the (lazy) result is consumed
    val llr = freq.select(col("tok"),
      (smoothed(col("tgt_cnt"), tgtTotal) -
        smoothed(col("raw_cnt"), rawTotal)).as("llr8"))
      .localCheckpoint()
    freq.unpersist()
    val agg = toks.join(llr, "tok")
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_tokens"),
        SafeMath.roundHalfUp(
          sum(col("llr8")).cast("double") / count(lit(1)), scale).as("llr"))
    val out = docs.select(col(idCol))
      .join(agg.withColumnRenamed("__doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("llr"), lit(0.0)).as("llr"))
      .withColumn("keep", col("llr") > lit(0.0))
    out
  }

  /** Per-source unigram KL divergence against the rest of the corpus —
    * the domain-shift meter behind mixture decisions ("how far is src7
    * from everything else?"). SUPPORT-RESTRICTED KL: the sum runs over
    * the tokens the source actually contains, p = cnt_s/total_s exact,
    * q = Laplace-smoothed rest-of-corpus probability (so q is never
    * zero). Three token-keyed aggregations (all map-side combined,
    * bounded by vocab) and one join — no per-source corpus rescans, no
    * source×vocab cross product. Cross-engine: each ln at scale 8,
    * per-term products rounded and DECIMAL-summed, final KL at `scale`. */
  def sourceKl(docs: DataFrame, sourceCol: String, textCol: String,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val toks = docs.select(col(sourceCol).as("source"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val st = toks.groupBy("source", "tok").agg(count(lit(1)).as("cnt_s"))
    val g = toks.groupBy("tok").agg(count(lit(1)).as("cnt_g"))
      .localCheckpoint()
    val totals = toks.groupBy("source").agg(count(lit(1)).as("t_s"))
      .localCheckpoint()
    val Seq(nTok, vocab) = {
      val r = g.agg(sum("cnt_g"), count(lit(1))).collect()(0)
      if (r.isNullAt(0)) Seq(0L, 0L) else Seq(r.getLong(0), r.getLong(1))
    }
    val p = col("cnt_s").cast("double") / col("t_s").cast("double")
    val qProb = (col("cnt_g") - col("cnt_s") + lit(1L)).cast("double") /
      (lit(nTok) - col("t_s") + lit(vocab)).cast("double")
    val term = st.join(g, "tok").join(totals, "source")
      .select(col("source"),
        SafeMath.roundHalfUp(
            p * (SafeMath.roundHalfUp(log(p), 8) -
              SafeMath.roundHalfUp(log(qProb), 8)), 8)
          .cast(DecimalType(28, 8)).as("t8"))
    term.groupBy("source")
      .agg(SafeMath.roundHalfUp(sum(col("t8")).cast("double"), scale)
        .as("kl"))
      .join(totals.withColumnRenamed("t_s", "n_tokens"), "source")
      .select("source", "n_tokens", "kl")
  }

  /** Greedy per-domain token-budget selection — "give me the best
    * `budgetTokens` tokens from every source": order each domain's
    * documents by quality (desc, id tiebreak) and keep rows while the
    * tokens BEFORE them fit the budget (the first overflowing document
    * is included, so every domain reaches the budget). One window
    * shuffle partitioned by domain — parallel across domains, no global
    * sort; the quality score is the rounded deterministic heuristic, so
    * selection is replay-stable. */
  def budgetSelect(docs: DataFrame, idCol: String, domainCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("quality").desc, col(idCol))
    docs
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") - col("n_tokens") < budgetTokens)
      .select(col(idCol), col(domainCol), col("n_tokens"), col("quality"))
  }

  /** Content-defined chunking at token granularity — the rsync/dedup-
    * storage trick applied to text: a chunk boundary falls AFTER any
    * token whose hash ≡ 0 (mod `divisor`), so boundaries depend only on
    * LOCAL content. Insert a paragraph and only the chunks it touches
    * change — unlike fixed-size chunking ([[chunkOverlap]]) where one
    * insertion shifts every later chunk. Emitted chunk hashes therefore
    * join ACROSS documents to find shared passages at chunk granularity.
    * Pure per-row HOF work + one explode: full scan speed; the md5-keyed
    * boundary decision makes the chunking oracle-reproducible. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame = {
    val chunksCol = TextFunctions.bindOnce(
        TextFunctions.tokens(col(textCol))) { tk =>
      TextFunctions.bindOnce(size(tk)) { n =>
        when(n === 0,
          array().cast("array<struct<txt:string,ntok:int>>"))
          .otherwise(TextFunctions.bindOnce(
            filter(sequence(lit(1), n), i =>
              TextFunctions.md5Key60(element_at(tk, i)) % divisor === 0)) { bs =>
            TextFunctions.bindOnce(
              when(size(bs) === 0, array(n))
                .when(element_at(bs, -1) === n, bs)
                .otherwise(concat(bs, array(n)))) { ends =>
              transform(sequence(lit(1), size(ends)), j => {
                val start = when(j === 1, lit(1))
                  .otherwise(element_at(ends, j - 1) + 1)
                val len = element_at(ends, j) - start + 1
                struct(concat_ws(" ", slice(tk, start, len)).as("txt"),
                  len.as("ntok"))
              })
            }
          })
      }
    }
    docs.select(col(idCol), posexplode(chunksCol).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx"),
        md5(col("c.txt")).as("chunk_hash"),
        col("c.ntok").cast("long").as("n_chunk_tokens"))
  }

  /** Per-source chi-square histogram distance against the rest of the
    * corpus — the numeric-feature complement of [[sourceKl]] (which
    * compares token distributions): bucket `valueCol` into `bins`
    * fixed-width bins, then χ² = Σ_bins (p_i − q_i)²/(p_i + q_i) over
    * the source's vs the complement's bin PROPORTIONS. Bin counts are
    * one map-side-combined aggregation; every per-bin term is exact
    * integer counts → one double expression, roundHalfUp'd and
    * DECIMAL-summed across the (few) bins so partial order can't
    * perturb the statistic. Empty bins contribute 0 (dropped on both
    * engines — 0/0 guarded). */
  def chiSquareShift(df: DataFrame, sourceCol: String, valueCol: String,
      binWidth: Long, bins: Int, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val binned = df.select(col(sourceCol).as("source"),
      least(expr(s"CAST($valueCol AS BIGINT) div $binWidth"),
        lit(bins - 1L)).as("bin"))
    val sb = binned.groupBy("source", "bin").agg(count(lit(1)).as("c_sb"))
      .localCheckpoint()
    val gb = sb.groupBy("bin").agg(sum("c_sb").as("c_b"))
    val totals = sb.groupBy("source").agg(sum("c_sb").as("t_s"))
    val nRow = sb.agg(sum("c_sb")).collect()(0)
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    // full source × bin grid so a bin the source MISSES (but the rest
    // populates) still contributes its (0 − q)²/q term
    val grid = totals.select(col("source"), col("t_s"),
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
    val p = coalesce(col("c_sb"), lit(0L)).cast("double") /
      col("t_s").cast("double")
    val q = (coalesce(col("c_b"), lit(0L)) - coalesce(col("c_sb"), lit(0L)))
      .cast("double") / (lit(n) - col("t_s")).cast("double")
    val term = grid.join(sb, Seq("source", "bin"), "left")
      .join(gb, Seq("bin"), "left")
      .select(col("source"),
        SafeMath.roundHalfUp(
            when(p + q === 0.0, lit(0.0))
              .otherwise((p - q) * (p - q) / (p + q)), 8)
          .cast(DecimalType(28, 8)).as("t8"))
    term.groupBy("source")
      .agg(SafeMath.roundHalfUp(sum(col("t8")).cast("double"), scale)
        .as("chi2"))
  }

  /** Two-sample Kolmogorov–Smirnov drift per source — the CDF-distance
    * complement of [[sourceKl]] (token distributions) and
    * [[chiSquareShift]] (binned proportions): per source, compare the
    * source's value distribution against the REST of the corpus and
    * report D = max_bin |F_s − F_rest| — sensitive to location/shape
    * shifts that leave individual bin counts looking sane. INTEGER until
    * the final division: the CDF gap at support point b is
    * |scum·(N−n_s) − (gcum−scum)·n_s| (cross-multiplied, no per-point
    * division), maxed exactly, divided once per source. The products run
    * in DECIMAL(38,0) (oracle: HUGEINT) so corpus sizes far beyond 2⁶³⁄²
    * cannot wrap — only the one final value is cast to double.
    *
    * Scale shape: one (source, bin) count aggregation (map-side
    * combined); the grid is sources × `bins` via explode(sequence) —
    * never a cross join — and every cumulative window partitions by
    * source. Nothing global, nothing corpus-sized past the first
    * aggregate. */
  def ksShift(df: DataFrame, sourceCol: String, valueCol: String,
      binWidth: Long, bins: Int, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // clamp BOTH ends: a negative value would land in a negative bin that
    // is counted in n_s/n totals but never joins the 0..bins-1 grid,
    // silently understating cumulative mass (advice r08)
    val binned = df.select(col(sourceCol).as("source"),
      greatest(least(expr(s"CAST($valueCol AS BIGINT) div $binWidth"),
        lit(bins - 1L)), lit(0L)).as("bin"))
    val sb = binned.groupBy("source", "bin").agg(count(lit(1)).as("c_sb"))
      .localCheckpoint()
    val gb = sb.groupBy("bin").agg(sum("c_sb").as("c_b"))
    val totals = sb.groupBy("source").agg(sum("c_sb").as("n_s"))
    val nRow = sb.agg(sum("c_sb")).collect()(0)
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val grid = totals.select(col("source"), col("n_s"),
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
    val w = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wide = DecimalType(38, 0)
    val gap = grid.join(sb, Seq("source", "bin"), "left")
      .join(gb, Seq("bin"), "left")
      .withColumn("scum", sum(coalesce(col("c_sb"), lit(0L))).over(w))
      .withColumn("gcum", sum(coalesce(col("c_b"), lit(0L))).over(w))
      .select(col("source"), col("n_s"),
        abs(col("scum").cast(wide) * (lit(n) - col("n_s")).cast(wide) -
          (col("gcum") - col("scum")).cast(wide) * col("n_s").cast(wide))
          .as("gap"))
    gap.groupBy("source")
      .agg(max(col("n_s")).as("n_rows"),
        SafeMath.roundHalfUp(
          when(lit(n) === max(col("n_s")), lit(0.0))
            .otherwise(max(col("gap")).cast("double") /
              (max(col("n_s")).cast(wide) *
                (lit(n) - max(col("n_s"))).cast(wide)).cast("double")),
          scale).as("ks"))
  }

  /** Two-sample 1-D earth-mover (Wasserstein-1) drift per source — the
    * INTEGRAL of the CDF gap where [[ksShift]] takes its MAX: EMD =
    * Σ_bins |F_s − F_rest|, in bin-width units. KS fires on the single
    * worst point; EMD measures how much probability mass must MOVE, so
    * a broad small shift (every document 5% shorter) that never creates
    * a large single-point gap still registers. Identical exact-integer
    * discipline to ksShift: cross-multiplied gaps in DECIMAL(38,0)
    * (oracle HUGEINT), ONE division per source at the end. Same scale
    * shape too: one (source, bin) aggregate, a sources × bins grid via
    * explode(sequence), source-partitioned cumulative windows. */
  def emdShift(df: DataFrame, sourceCol: String, valueCol: String,
      binWidth: Long, bins: Int, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // same two-sided clamp as [[ksShift]] (advice r08)
    val binned = df.select(col(sourceCol).as("source"),
      greatest(least(expr(s"CAST($valueCol AS BIGINT) div $binWidth"),
        lit(bins - 1L)), lit(0L)).as("bin"))
    val sb = binned.groupBy("source", "bin").agg(count(lit(1)).as("c_sb"))
      .localCheckpoint()
    val gb = sb.groupBy("bin").agg(sum("c_sb").as("c_b"))
    val totals = sb.groupBy("source").agg(sum("c_sb").as("n_s"))
    val nRow = sb.agg(sum("c_sb")).collect()(0)
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val grid = totals.select(col("source"), col("n_s"),
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
    val w = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wide = DecimalType(38, 0)
    val gap = grid.join(sb, Seq("source", "bin"), "left")
      .join(gb, Seq("bin"), "left")
      .withColumn("scum", sum(coalesce(col("c_sb"), lit(0L))).over(w))
      .withColumn("gcum", sum(coalesce(col("c_b"), lit(0L))).over(w))
      .select(col("source"), col("n_s"),
        abs(col("scum").cast(wide) * (lit(n) - col("n_s")).cast(wide) -
          (col("gcum") - col("scum")).cast(wide) * col("n_s").cast(wide))
          .as("gap"))
    gap.groupBy("source")
      .agg(max(col("n_s")).as("n_rows"),
        SafeMath.roundHalfUp(
          when(lit(n) === max(col("n_s")), lit(0.0))
            .otherwise(sum(col("gap")).cast("double") /
              (max(col("n_s")).cast(wide) *
                (lit(n) - max(col("n_s"))).cast(wide)).cast("double")),
          scale).as("emd_bins"))
  }

  /** Temperature-flattened domain sampling — the multilingual-pretraining
    * mix rule (sample domain d ∝ count_d^(1/T)): T=1 keeps natural
    * proportions, T→∞ approaches uniform, T<1 sharpens. The target
    * fraction per domain is computed from the domain counts (one
    * vocab-bounded aggregate), normalized so the LARGEST reweighted
    * domain keeps 100% of its rows (pure downsampling — deterministic,
    * no replication), converted to integer ppm, and applied with the
    * [[weightedSample]] hash rule — replay-stable row decisions.
    * Cross-engine: the ^(1/T) powers are roundHalfUp'd at scale 8
    * before the ratio, and the ppm threshold is an exact integer on
    * both sides. */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
      temperature: Double, salt: String = "graft-temp"): DataFrame = {
    import graft.functions.SafeMath
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("c"))
    // w_d = c_d^(1/T) / c_d  (kept-fraction shape), scaled so max = 1
    val powered = counts.select(col(domainCol), col("c"),
      SafeMath.roundHalfUp(
        pow(col("c").cast("double"), lit(1.0 / temperature)) /
          col("c").cast("double"), 8).as("w"))
    // Empty input: max(w) is NULL — getDouble would NPE. Any non-zero
    // wMax yields the same (empty) result through the join below.
    val wMaxRow = powered.agg(max(col("w"))).collect()(0)
    val wMax = if (wMaxRow.isNullAt(0)) 1.0 else wMaxRow.getDouble(0)
    val ppm = powered.select(col(domainCol),
      floor(col("w") / lit(wMax) * 1000000.0 + lit(0.5))
        .cast("long").as("__ppm"))
    df.join(broadcast(ppm), domainCol)
      .filter(TextFunctions.md5Key60(
          concat(lit(salt), col(idCol).cast("string"))) % 1000000L
        < col("__ppm"))
      .drop("__ppm")
  }

  /** Per-group WEIGHTED median — "the median token's document quality":
    * order each group by (value, id), cumulative-sum the weights, and
    * take the first value whose cumulative weight reaches half the
    * group total. Exact and deterministic (the unweighted percentile
    * path can't express weights); one window shuffle partitioned by the
    * group key — parallel across groups, never a global sort. */
  def weightedMedian(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, weightCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("__tot",
        sum(col(weightCol)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("w_median"),
        max(col("__tot")).as("total_weight"))
  }

  /** Exact per-group WEIGHTED quantile — generalizes [[weightedMedian]]
    * to any q = qNum/qDen: the smallest value whose cumulative weight
    * reaches q of the group total (`cum·qDen ≥ total·qNum`, all-integer,
    * (value, id) total order). The statistic that answers "what length
    * is the p90 of the token MASS" — by-mass percentiles differ wildly
    * from by-count ones on heavy-tailed corpora, and the model trains
    * on mass. One partitioned cumulative window + one keyed min. */
  def weightedQuantile(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, weightCol: String, qNum: Long,
      qDen: Long): DataFrame = {
    require(qNum >= 1 && qNum <= qDen, "need 0 < q <= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("__tot",
        sum(col(weightCol)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__cum") * qDen >= col("__tot") * qNum)
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("w_quantile"),
        max(col("__tot")).as("total_weight"))
  }

  /** Skip-gram co-occurrence PMI — the word2vec/GloVe preprocessing pass:
    * count unordered token pairs within a ±`window` token distance, then
    * score each pair by pointwise mutual information against the unigram
    * marginals. Pair generation is a PER-ROW array transform (zero
    * shuffle — no posexplode self-join, no window function), so the only
    * shuffles are the pair-keyed and token-keyed aggregations, both
    * map-side combined and bounded by vocabulary², not corpus size; the
    * `minCount` support cut keeps the output to the statistically
    * meaningful pairs. PMI = ln((c_xy/D) / ((c_x/N)·(c_y/N))) computed
    * with the exact parenthesization mirrored in the oracle and
    * roundHalfUp'd at scale 6 (the cross-engine ln discipline). */
  def cooccurrencePmi(docs: DataFrame, textCol: String, window: Int = 2,
      minCount: Long = 3, scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath
    val pairsCol = TextFunctions.bindOnce(TextFunctions.tokens(col(textCol))) { tk =>
      val n = size(tk)
      val perGap = (1 to window).map { g =>
        when(n <= g, array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(0), n - lit(g + 1)), i => {
            val x = element_at(tk, i + 1)
            val y = element_at(tk, i + lit(g + 1))
            struct(least(x, y).as("w1"), greatest(x, y).as("w2"))
          }))
      }
      concat(perGap: _*)
    }
    val pairs = docs.select(explode(pairsCol).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    // vocab-sized; materialized eagerly so the corpus scan behind it runs
    // once (totals + both marginal joins reuse the checkpoint blocks)
    val uni = docs.select(
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val Seq(nTok, nPairs) = {
      val tRow = uni.agg(sum("c")).collect()(0)
      val dRow = docs.select(TextFunctions.tokenCount(col(textCol)).as("n"))
        .agg(sum(
          (1 to window).map(g => greatest(col("n") - g, lit(0L)))
            .reduce(_ + _)).as("d")).collect()(0)
      // empty corpus: both sums are NULL; the pair join is empty anyway
      Seq(if (tRow.isNullAt(0)) 0L else tRow.getLong(0),
        if (dRow.isNullAt(0)) 0L else dRow.getLong(0))
    }
    val out = pairs
      .join(uni.select(col("tok").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c_y")), "w2")
      .select(col("w1"), col("w2"), col("c_xy"),
        SafeMath.roundHalfUp(
          log((col("c_xy").cast("double") / lit(nPairs.toDouble)) /
            ((col("c_x").cast("double") / lit(nTok.toDouble)) *
              (col("c_y").cast("double") / lit(nTok.toDouble)))),
          scale).as("pmi"))
    out
  }

  /** Curriculum-learning difficulty bins: assign every document an ordinal
    * stage 1..`bins` by interpolated-percentile cutoffs of a difficulty
    * measure (token count here — swap in NLL for a model-based
    * curriculum). NOT an ntile: a global ntile needs a total sort through
    * one partition; cutoffs are one aggregate (bins−1 doubles to the
    * driver), assignment a zero-shuffle scan predicate — the same plan at
    * 60k rows and 100 TB (approx_percentile swaps in at the sketch-error
    * tradeoff). Ties land deterministically: bin = #cutoffs strictly
    * below the value + 1. */
  def curriculumBins(docs: DataFrame, idCol: String, textCol: String,
      bins: Int = 4): DataFrame = {
    val withN = docs.withColumn("difficulty",
      TextFunctions.tokenCount(col(textCol)).cast("long"))
    val ps = (1 until bins).map(_.toDouble / bins)
    val cutRow = withN.agg(
      percentile(col("difficulty"), typedLit(ps)).as("cuts")).collect()(0)
    // Interpolated cutoffs are engine-computed doubles: Spark percentile
    // and an oracle's quantile_cont can land 1 ulp apart, flipping the
    // `>` comparison when a cutoff sits exactly on an integer difficulty.
    // roundHalfUp both sides before comparing (the half-boundary rule in
    // ARCHITECTURE.md's correctness strategy).
    // empty input: percentile yields NULL — no cutoffs, every (zero)
    // row would land in stage 1
    val cuts =
      if (cutRow.isNullAt(0)) Seq.empty[Double]
      else cutRow.getSeq[Double](0)
        .map(graft.functions.SafeMath.roundHalfUpD(_, 6))
    val bin = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(col("difficulty") > lit(c), 1).otherwise(0)
    }
    withN.select(col(idCol), col("difficulty"), bin.as("stage"))
  }

  /** Per-document TF-IDF keyword extraction: term frequency in the doc ×
    * smoothed inverse document frequency (ln((N+1)/(df+1)) + 1), top `k`
    * terms per document by rounded score with ties to the lexically
    * smaller term. Shuffles: the (doc, term) aggregation, a term-keyed
    * df aggregation + join, and a per-doc window for the top-k cut —
    * the window partitions by doc, so it parallelizes across the corpus
    * (never a global sort). */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath
    val nDocs = docs.count()
    val tf = docs.select(col(idCol).as("__doc"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("__doc", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df_, "term")
      .withColumn("score", SafeMath.roundHalfUp(
        col("tf").cast("double") *
          (log(lit((nDocs + 1).toDouble) /
            (col("df").cast("double") + lit(1.0))) + lit(1.0)), scale))
    val w = Window.partitionBy(col("__doc"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= k)
      .select(col("__doc").as(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("kw_rank"))
  }

  /** Per-group z-score outlier flagging (metric anomalies, curation
    * outlier cuts): classic two-pass variance — mean first, then the sum
    * of squared deviations — because the one-pass E[x²]−m² form
    * catastrophically cancels AND its partial-sum order would differ
    * across engines. Both passes decimal-sum their terms, so mean and
    * stddev are partition-order-independent; groups with zero variance
    * get z=0. The group stats frame is tiny (one row per group) — both
    * joins broadcast. */
  /** Vocabulary build + per-document out-of-vocabulary rate: the top-V
    * tokens by corpus frequency (count desc, token asc — a deterministic
    * cut) become the vocab; each document then reports what fraction of
    * its tokens fall outside it. The OOV rate against a fixed vocab is
    * the cheap "how much of this text will tokenize badly" signal. Plan:
    * one token-explode shuffle for the counts, TakeOrderedAndProject for
    * the cut (never a global sort), and the vocab — V rows — broadcasts
    * into the per-doc join. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    val tk = docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val vocab = tk.groupBy("tok").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(true).as("__in_v"))
    val st = tk.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("__oov"))
    docs.select(col(idCol)).join(st, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("__oov").cast("double") / col("n_tokens"))
          .as("oov_rate"))
  }

  /** Top-p (nucleus) trimming per group: rank rows by integer weight
    * descending (id ascending tiebreak) and keep the smallest prefix
    * whose cumulative weight reaches `pNum/pDen` of the group total —
    * "keep the head of each domain's mass, drop the long tail". The
    * keep rule compares the EXCLUSIVE running sum against
    * floor(total·p) in integer arithmetic, so membership is engine-
    * exact and the boundary row (the one that crosses the threshold)
    * is always kept. One shuffle on the group; both window passes share
    * its sort. */
  def topPTrim(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, pNum: Int = 8, pDen: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy(col(groupCol))
      .orderBy(col(weightCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
    df.withColumn("cum_weight", sum(col(weightCol)).over(cumW))
      .withColumn("__tot", sum(col(weightCol)).over(totW))
      .filter(col("cum_weight") - col(weightCol) <
        expr(s"(__tot * $pNum) div $pDen"))
      .drop("__tot")
  }

  /** Robust (median/MAD) outlier flag — the heavy-tail-safe variant of
    * [[zscoreFlag]]: mean/stddev are themselves dragged by the outliers
    * they're meant to find, the median and the median absolute deviation
    * are not. Two exact-percentile aggregations (at 100 TB swap in
    * approx_percentile and accept sketch error) with the tiny per-group
    * stats broadcast back. The robust z is rounded BEFORE thresholding
    * so the boolean can't disagree cross-engine; a zero MAD (constant
    * group) flags nothing. */
  def madFlag(df: DataFrame, groupCol: String, valCol: String,
      threshold: Double = 3.0, scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath
    val v = col(valCol).cast("double")
    val med = df.groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("__med"))
    val withMed = df.join(med, Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(mad, Seq(groupCol))
      .withColumn("robust_z",
        when(col("__mad") === 0.0, lit(0.0))
          .otherwise(SafeMath.roundHalfUp(
            abs(v - col("__med")) / (lit(1.4826) * col("__mad")), scale)))
      .withColumn("is_outlier", col("robust_z") > threshold)
      .drop("__med", "__mad")
  }

  def zscoreFlag(df: DataFrame, groupCol: String, valCol: String,
      threshold: Double = 3.0, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val v = col(valCol).cast("double")
    val stats = df.groupBy(col(groupCol))
      .agg((sum(SafeMath.roundHalfUp(v, 8).cast(DecimalType(38, 8)))
          .cast("double") / count(lit(1))).as("__m"),
        count(lit(1)).as("__n"))
    val withM = df.join(stats, Seq(groupCol))
    val ssq = withM.groupBy(col(groupCol))
      .agg(sum(SafeMath.roundHalfUp((v - col("__m")) * (v - col("__m")), 8)
        .cast(DecimalType(38, 8))).cast("double").as("__ssq"))
    withM.join(ssq, Seq(groupCol))
      .withColumn("__sd", sqrt(col("__ssq") / col("__n")))
      .withColumn("z", when(col("__sd") === 0.0, lit(0.0))
        .otherwise(SafeMath.roundHalfUp((v - col("__m")) / col("__sd"), scale)))
      .withColumn("is_outlier", abs(col("z")) > threshold)
      .drop("__m", "__n", "__ssq", "__sd")
  }

  /** Cap each domain's contribution at `cap` documents, keeping a
    * deterministic hash-ordered sample — the standard guard against a
    * single host dominating a crawl. The window partitions by domain
    * (parallel across domains); the hash order means the kept subset is
    * replay-stable and unbiased by ingest order. */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
      cap: Int, salt: String = "graft-cap"): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__key"), col(idCol))
    df.withColumn("__key",
        TextFunctions.md5Key60(concat(lit(salt), col(idCol))))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap)
      .drop("__key", "__r")
  }

  /** Length-outlier cut: keep documents whose token count lies inside the
    * [pLo, pHi] interpolated-percentile band of the corpus. The cutoffs
    * are one global aggregate (two doubles to the driver — at 100 TB use
    * approx_percentile and accept the sketch error); the filter itself is
    * then a zero-shuffle scan predicate. */
  def lengthBandFilter(docs: DataFrame, idCol: String, textCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      precomputedTokens: Boolean = false): DataFrame = {
    // precomputedTokens: caller already carries `n_tokens` (e.g. curate's
    // checkpointed frame) — recomputing would tokenize twice per action
    val withN =
      if (precomputedTokens) docs
      else docs.withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast("long"))
    val cuts = withN.agg(
      percentile(col("n_tokens"), lit(pLo)).as("lo"),
      percentile(col("n_tokens"), lit(pHi)).as("hi")).collect()(0)
    // empty input: percentiles are NULL; any band keeps the zero rows
    val (lo, hi) =
      if (cuts.isNullAt(0)) (0.0, 0.0)
      else (cuts.getDouble(0), cuts.getDouble(1))
    withN.filter(col("n_tokens") >= lit(lo) && col("n_tokens") <= lit(hi))
  }

  /** The curation pipeline COMPOSED end to end: exact dedup (min-id per
    * content fingerprint — a row_number window, never a wide first()
    * aggregate) → corpus length band → quality threshold → stratified
    * language sampling → deterministic train/val/test split. Stage order
    * is part of the contract: the percentile cutoffs are computed on the
    * DEDUPED corpus, the sample on the quality-surviving one. Every
    * stage is hash-based/deterministic, so the whole pipeline is
    * replay-stable and oracle-checkable as one unit (q92). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, qualityMin: Double = 0.5,
      rates: Map[String, Double] = Map.empty, defaultRate: Double = 1.0,
      salt: String = "graft-curate"): DataFrame = {
    val fpW = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    // the dedup window (fingerprint + shuffle) and the tokenization feed
    // TWO actions — the percentile cutoff collect and the final pipeline
    // run. localCheckpoint the tokenized post-dedup frame once so neither
    // re-pays the scan+hash+shuffle (r09 verdict: q92's stages re-planned
    // the corpus per stage); at 100 TB this trades one materialization of
    // the deduped corpus for a full second dedup pass. The blocks live
    // until the RDD is GC'd — callers that loop (Verify/Bench) sweep
    // getPersistentRDDs between queries, the q163 discipline.
    // spread first: the fingerprint+tokenize projection is CPU-dense and
    // otherwise runs at the file's split count (2 splits at sf0.1 → 30 of
    // 32 cores idle, the q229 r09 lesson); no-op when splits ≥ cores
    val deduped = Similarity.spread(docs)
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(fpW))
      .filter(col("__rn") === 1).drop("__fp", "__rn")
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast("long"))
      // quality is the other CPU-dense per-doc expression — compute it
      // here too, so it rides the wide checkpoint stage (32 tasks) once
      // instead of re-running inside the narrow final job (r10 verdict:
      // the tail stages were 2-task AQE-coalesced, 30 cores idle)
      .withColumn("__q", TextFunctions.qualityScore(col(textCol)))
      .localCheckpoint()
    val banded = lengthBandFilter(deduped, idCol, textCol,
      precomputedTokens = true)
    val good = banded.filter(col("__q") >= lit(qualityMin)).drop("__q")
    val sampled = stratifiedSample(good, idCol, langCol,
      rates, defaultRate, salt)
    splitAssign(sampled, idCol)
  }

  /** Corpus-wide frequent-line removal (the CCNet-style boilerplate cut):
    * a line whose normalized form appears in more than `maxDocFrac` of all
    * documents is boilerplate (nav bars, cookie banners, footers) and is
    * removed from EVERY document; per-doc kept/removed counts are the
    * audit trail. Shape at 100 TB: the doc-frequency pass shuffles
    * (line-hash, doc) pairs — never the text; the frequent set is bounded
    * by construction (at most avgLinesPerDoc / maxDocFrac lines can clear
    * the bar) → broadcast anti-join; reassembly shuffles only the kept
    * lines once, keyed by doc. Line normalization = casefold + trim, so
    * cosmetic variants of the same boilerplate line count together. */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      maxDocFrac: Double = 0.05): DataFrame = {
    val total = docs.count()
    val cut = math.floor(total * maxDocFrac).toLong // df > cut ⇒ drop
    val lines = docs.select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__k", md5(trim(lower(col("__line")))))
    val frequent = lines.select(col("__k"), col("__doc")).distinct()
      .groupBy("__k").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > cut)
      .select("__k")
    val kept = lines.join(broadcast(frequent), Seq("__k"), "left_anti")
      .groupBy(col("__doc"))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__line"))))
        .as("__ls"))
      .select(col("__doc"),
        array_join(transform(col("__ls"), x => x.getField("__line")), "\n")
          .as("clean_text"),
        size(col("__ls")).cast("long").as("n_kept"))
    // docs whose every line was boilerplate vanish from `kept` — restore
    // them with an empty clean_text via the left join
    docs.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("__n_lines"))
      .join(kept.withColumnRenamed("__doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** PII patterns shared by the Spark operator and its DuckDB oracle —
    * restricted to syntax Java regex and RE2 interpret identically (no
    * lookaround, no backrefs; `\b` is an ASCII word boundary in both). */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""

  /** PII redaction: mask emails, IPv4 addresses, and NANP-style phone
    * numbers with typed placeholder tokens, and report per-document hit
    * counts (the audit trail a compliance pass needs). Pure per-row
    * regex work — full scan speed, zero shuffle; the three passes run in
    * a fixed order (email → ip → phone) on disjoint pattern families so
    * the result is order-stable. Counts are taken on the ORIGINAL text.
    * Analog of a standard training-data scrubbing stage. */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("clean_text"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"))
  }

  /** Max-abs int8 quantization of a float-vector column: 4× smaller
    * shuffle/storage for ANN at a small recall cost. Rounding is the
    * engine-portable floor(x+0.5) form. Returns struct(scale, codes). */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, v => abs(v.cast("double"))))
    val scale = when(maxAbs === 0.0, lit(0.0)).otherwise(lit(127.0) / maxAbs)
    struct(
      scale.as("scale"),
      transform(vec, v =>
        floor(v.cast("double") * scale + 0.5).cast("int")).as("codes"))
  }

  /** Cosine of a quantized vector against a literal query, computed on the
    * dequantized values (code/scale) with [[Similarity]]'s fold order.
    * The quant struct AND the dequantized array are let-bound
    * ([[TextFunctions.bindOnce]]) so callers can reference the result of
    * [[quantizeInt8]] freely without projection collapse re-inlining the
    * max-abs scan per reference. */
  def dequantCosine(quant: Column, query: Seq[Double], scale: Int = 6): Column =
    TextFunctions.bindOnce(quant) { q =>
      val deq0 = transform(q.getField("codes"),
        c => when(q.getField("scale") === 0.0, lit(0.0))
          .otherwise(c.cast("double") / q.getField("scale")))
      TextFunctions.bindOnce(deq0) { deq =>
        // codegen'd ArrayDot, same left-fold order as the HOF chain
        graft.functions.SafeMath.roundHalfUp(
          graft.expressions.ArrayDot.array_dot(deq,
            array(query.map(lit): _*)) /
            (sqrt(graft.expressions.ArrayDot.array_dot(deq, deq)) *
              lit(Similarity.normLit(query))), scale)
      }
    }

  /** The fused production form of `dequantCosine(quantizeInt8(v), q)`:
    * one native codegen'd pass per row
    * ([[graft.expressions.Int8QueryCosine]]), bit-identical to the
    * Column composition (parity-spec'd on real embeddings) — under the
    * NON-ANSI mode the gates run in: on a zero denominator (all-zero
    * vector or zero query norm) the native form returns NULL where the
    * split Column chain's division RAISES under ANSI mode (Spark 4's
    * default), so callers enabling ANSI lose the bit-identity claim on
    * exactly those degenerate rows (divergence detailed in the
    * expression's own doc). The split
    * quantize/dequant Columns stay for pipelines that MATERIALIZE the
    * int8 codes (index build writes codes, probes dequantize); a scan
    * that quantizes and scores in place — the q58 shape — pays four
    * interpreted HOF lambdas per row through the split form, which at
    * dim=64 measured ~0.4 ms/row, three orders over this loop. */
  def int8QueryCosine(vec: Column, query: Seq[Double],
      scale: Int = 6): Column =
    graft.expressions.Int8QueryCosine.int8_query_cosine(vec, query, scale)

  /** Exactly-k-per-group deterministic sample: keep the `k` rows of each
    * group whose salted md5 key sorts lowest — the balanced-subset
    * primitive (k examples per class for an eval set, k docs per domain
    * for inspection). Unlike rate-based [[stratifiedSample]], the output
    * size is exact: min(k, |group|) rows per group, replay-stable under
    * re-partitioning because the order is (hash, id), never physical.
    * Replay stability REQUIRES `idCol` unique within each group (the
    * [[Scd2]] tieBreak contract): duplicate ids produce identical
    * (hash, id) sort keys, and which duplicate row_number keeps is then
    * partitioning-dependent. One shuffle on the group key; for a hot
    * group at extreme scale,
    * pre-filter by hash range (keep md5 % m < m·k·safety/|group|) before
    * the window so the per-group sort touches a sliver, not the group. */
  def exactKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = TextFunctions.md5Key60(
      concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(key.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Zipf-law fit audit over the corpus token-frequency distribution —
    * the classic "is this corpus natural text?" check: natural language
    * follows freq ∝ rank^slope with slope ≈ −1; machine-generated spam,
    * template farms, and truncated crawls bend the curve. One output row:
    * (n_types, slope, intercept, r2) from an ordinary least-squares fit
    * of ln(freq) against ln(rank).
    *
    * Scale shape: the frequency table is a vocab-sized aggregate with
    * map-side combine; the global rank comes from
    * [[GlobalSort.withGlobalRank]] (range-partitioned, never a
    * single-partition window); the fit is ONE scalar aggregate over the
    * vocab. Cross-engine FP: each ln is snapped to integer milli-units
    * (scale 3) so the Σx, Σy, Σxy, Σx², Σy² sums are exact BIGINTs whose
    * double casts are exact (bounds: |Σxy| < 2⁵³ up to ~10⁹ types), and
    * the closed-form slope/intercept/r² arithmetic is then bit-identical
    * IEEE on both engines — the only cross-engine surface is ln itself,
    * handled by the scale-3 snap (the q82 recipe). */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val freq = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val ranked = GlobalSort.withGlobalRank(freq,
      Seq(col("cnt").desc, col("tok").asc), rankCol = "rank")
    val pts = ranked.select(
      floor(log(col("rank").cast("double")) * lit(1000.0) + lit(0.5))
        .cast("long").as("x3"),
      floor(log(col("cnt").cast("double")) * lit(1000.0) + lit(0.5))
        .cast("long").as("y3"))
    val s = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x3")).as("sx"), sum(col("y3")).as("sy"),
      sum(col("x3") * col("y3")).as("sxy"),
      sum(col("x3") * col("x3")).as("sxx"),
      sum(col("y3") * col("y3")).as("syy"))
    // real-unit sums as exact doubles (micro-unit BIGINT / exact power
    // of ten — single correctly-rounded op on both engines)
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double") / lit(1000.0)
    val syd = col("sy").cast("double") / lit(1000.0)
    val sxyd = col("sxy").cast("double") / lit(1000000.0)
    val sxxd = col("sxx").cast("double") / lit(1000000.0)
    val syyd = col("syy").cast("double") / lit(1000000.0)
    val num = (nd * sxyd) - (sxd * syd)
    val denX = (nd * sxxd) - (sxd * sxd)
    val denY = (nd * syyd) - (syd * syd)
    val slope = when(denX === 0.0, lit(0.0)).otherwise(num / denX)
    import graft.functions.SafeMath.roundHalfUp
    s.select(col("n").as("n_types"),
      roundHalfUp(slope, 6).as("slope"),
      roundHalfUp(when(col("n") === 0, lit(0.0))
        .otherwise((syd - (slope * sxd)) / nd), 6).as("intercept"),
      roundHalfUp(when((denX * denY) === 0.0, lit(0.0))
        .otherwise((num * num) / (denX * denY)), 6).as("r2"))
  }

  /** Heaps-law vocabulary-growth audit — the companion of [[zipfFit]]:
    * natural corpora grow vocabulary as V(n) ≈ K·n^β with β ≈ 0.4–0.6;
    * template/boilerplate farms flatten the curve (the vocab saturates),
    * OCR noise and random blobs push β toward 1. The growth curve is
    * measured at `checkpoints` equal slices of the doc-id domain
    * (ingestion order): n_j = |{docs: id ≤ q_j}| and
    * v_j = |{types whose FIRST occurrence has id ≤ q_j}|, then the same
    * micro-unit OLS of ln(v) on ln(n) as zipfFit.
    *
    * Scale shape: ONE token-keyed shuffle (min doc-id per type,
    * map-side combined — the corpus text is read once), two J-row
    * checkpoint censuses whose cumulative windows run over J rows
    * (bounded by construction — the PlanSpec exemption class), one
    * scalar fit. The max doc id is a bounded 1-row collect. Cross-engine
    * FP: the scale-3 ln snap + exact BIGINT sums (the q82/q239 recipe).
    * Output one row: (n_points, n_docs, n_types, beta, intercept, r2).
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
      checkpoints: Int = 8): DataFrame = {
    require(checkpoints >= 2)
    val spark = docs.sparkSession
    val j = checkpoints
    val mxRow = docs.agg(max(col(idCol).cast("long"))).head
    val mx = if (mxRow.isNullAt(0)) 1L else math.max(mxRow.getLong(0), 1L)
    // id ≤ floor(mx·b/J) ⟺ b ≥ ceil(id·J/mx): each row's checkpoint
    // bucket is exact integer arithmetic, no FP
    def bucketOf(idExpr: String): Column =
      greatest(expr(s"(($idExpr) * ${j}L + ${mx - 1}L) div ${mx}L"),
        lit(1L))
    val db = docs
      .select(bucketOf(s"CAST($idCol AS BIGINT)").as("b"))
      .groupBy("b").agg(count(lit(1)).as("dn"))
    val firsts = docs
      .select(col(idCol).cast("long").as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(min(col("__id")).as("fid"))
    val tb = firsts.select(bucketOf("fid").as("b"))
      .groupBy("b").agg(count(lit(1)).as("vn"))
    val spine = spark.range(1, j + 1L).select(col("id").as("b"))
    val wcum = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = spine
      .join(db, Seq("b"), "left").join(tb, Seq("b"), "left")
      .select(col("b"), coalesce(col("dn"), lit(0L)).as("dn"),
        coalesce(col("vn"), lit(0L)).as("vn"))
      .withColumn("n_docs", sum("dn").over(wcum))
      .withColumn("n_types", sum("vn").over(wcum))
      .filter(col("n_docs") > 0L && col("n_types") > 0L)
    val pts = curve.select(col("n_docs"), col("n_types"),
      floor(log(col("n_docs").cast("double")) * lit(1000.0) + lit(0.5))
        .cast("long").as("x3"),
      floor(log(col("n_types").cast("double")) * lit(1000.0) + lit(0.5))
        .cast("long").as("y3"))
    val s = pts.agg(
      count(lit(1)).as("n"),
      coalesce(max(col("n_docs")), lit(0L)).as("total_docs"),
      coalesce(max(col("n_types")), lit(0L)).as("total_types"),
      sum(col("x3")).as("sx"), sum(col("y3")).as("sy"),
      sum(col("x3") * col("y3")).as("sxy"),
      sum(col("x3") * col("x3")).as("sxx"),
      sum(col("y3") * col("y3")).as("syy"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double") / lit(1000.0)
    val syd = col("sy").cast("double") / lit(1000.0)
    val sxyd = col("sxy").cast("double") / lit(1000000.0)
    val sxxd = col("sxx").cast("double") / lit(1000000.0)
    val syyd = col("syy").cast("double") / lit(1000000.0)
    val num = (nd * sxyd) - (sxd * syd)
    val denX = (nd * sxxd) - (sxd * sxd)
    val denY = (nd * syyd) - (syd * syd)
    val beta = when(denX === 0.0, lit(0.0)).otherwise(num / denX)
    import graft.functions.SafeMath.roundHalfUp
    s.select(col("n").as("n_points"),
      col("total_docs").as("n_docs"),
      col("total_types").as("n_types"),
      roundHalfUp(beta, 6).as("beta"),
      roundHalfUp(when(col("n") === 0, lit(0.0))
        .otherwise((syd - (beta * sxd)) / nd), 6).as("intercept"),
      roundHalfUp(when((denX * denY) === 0.0, lit(0.0))
        .otherwise((num * num) / (denX * denY)), 6).as("r2"))
  }

  /** Interpolated Kneser–Ney bigram LM scoring — the CCNet/KenLM-style
    * perplexity filter with the smoothing real LM toolkits use, vs the
    * add-one baseline of [[bigramLogProb]]: P(c|p) = (c(p,c) − D)/c(p·)
    * + (D·N1+(p·)/c(p·)) · N1+(·c)/N1+(··) with absolute discount D.
    * Scoring the training corpus itself means every scored bigram was
    * observed, so the max(·,0) clamp of the general formula is vacuous
    * (c(p,c) ≥ 1 > D) and every prefix has c(p·) ≥ 1 — no zero guards
    * needed. Output per doc: (id, n_bigrams, kn_nll) where kn_nll is the
    * mean per-bigram negative log-likelihood.
    *
    * Scale shape: bigrams come from the codegen'd WordShingles scan
    * (k=2, split on the single inner space — tokens are whitespace-free
    * by construction); ALL model stats (c(p,c), c(p·), N1+(p·), N1+(·c),
    * N1+(··)) derive from the ONE bigram-vocab-sized count table, which
    * is localCheckpoint'd so corpus text is scanned exactly once for
    * counting and once for scoring; the scoring join touches stats
    * tables bounded by vocab, never corpus × corpus. Cross-engine FP:
    * the probability is pure IEEE arithmetic on exact integer counts
    * with mirrored parenthesization, ln is rounded at scale 8 and summed
    * as DECIMAL (the q82/q166 recipe). */
  def knBigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val big = docs
      .select(col(idCol).as("__doc"),
        explode(TextFunctions.shingles(col(textCol), 2)).as("g"))
      .select(col("__doc"),
        substring_index(col("g"), " ", 1).as("p"),
        substring_index(col("g"), " ", -1).as("c"))
    val bc = big.groupBy("p", "c").agg(count(lit(1)).as("bc"))
      .localCheckpoint() // bigram-vocab-sized; feeds 3 aggs + the join
    val pstats = bc.groupBy("p")
      .agg(sum(col("bc")).as("pc"), count(lit(1)).as("n1p"))
    val cstats = bc.groupBy("c").agg(count(lit(1)).as("ncp"))
    val b = bc.count() // N1+(··): total distinct bigrams, driver scalar
    val d = lit(discount)
    val prob =
      ((col("bc").cast("double") - d) / col("pc").cast("double")) +
        (((d * col("n1p").cast("double")) / col("pc").cast("double")) *
          (col("ncp").cast("double") / lit(b.toDouble)))
    val per = big
      .join(bc, Seq("p", "c"))
      .join(pstats, Seq("p"))
      .join(cstats, Seq("c"))
      .select(col("__doc"),
        SafeMath.roundHalfUp(-log(prob), 8)
          .cast(DecimalType(28, 8)).as("nll8"))
    val agg = per.groupBy("__doc")
      .agg(count(lit(1)).as("n_bigrams"),
        SafeMath.roundHalfUp(
          sum(col("nll8")).cast("double") / count(lit(1)), scale)
          .as("kn_nll"))
    docs.select(col(idCol))
      .join(agg.withColumnRenamed("__doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_nll"), lit(0.0)).as("kn_nll"))
  }

  /** In-engine logistic-regression TRAINING by full-batch gradient
    * descent — the fastText-style quality-classifier loop run as Spark
    * aggregates instead of a driver-side ML library: each epoch is ONE
    * map-side-combined scalar aggregate over the corpus (the gradient),
    * and the weight vector (k+1 scalars) is the only driver state. The
    * link is the rational "fast sigmoid" σ(z) = 0.5 + (z/2)/(1+|z|):
    * same shape and gradient sign as the logistic link but built from
    * IEEE add/mul/div/abs only, so both engines compute bit-identical
    * probabilities — no exp(), no libm divergence surface at all.
    *
    * Everything lives in integer micro-units (the q230/q232 discipline):
    * features snap to scale-4 BIGINTs, weights to scale-8, probabilities
    * to scale-4; z = w·x is exact BIGINT arithmetic at scale 12 whose
    * double cast is exact, and the gradient Σ(p−y)·x is an exact BIGINT
    * sum (double-cast-exact up to ~10⁷ rows per the 2⁵³ bound — shard
    * epochs beyond that). The update w ← w − round8(lr·g/n) is the same
    * double expression on driver and oracle. Deterministic end-to-end:
    * same data ⇒ same weights ⇒ same scores, hash-gateable.
    *
    * Output per row: (idCol, y, score8, pred) — final-epoch probability
    * in scale-8 units and the 0.5-threshold prediction. */
  def trainLogistic(df: DataFrame, idCol: String, label: Column,
      features: Seq[Column], epochs: Int = 3, lr: Double = 0.5): DataFrame = {
    require(features.nonEmpty && epochs >= 1)
    val k = features.size
    val fCols = features.zipWithIndex.map { case (f, j) =>
      floor((f * lit(10000.0)) + lit(0.5)).cast("long").as(s"__f$j") }
    val base = df.select(
      Seq(col(idCol).as("__id"), label.cast("long").as("y")) ++ fCols: _*)
      .localCheckpoint() // features computed once, reread per epoch
    val n = base.count()
    val nD = n.toDouble
    require(n > 0, "trainLogistic: empty input")

    def zMicro(w: Array[Long]): Column = // scale-12 BIGINT units
      (1 to k).foldLeft(lit(w(0)) * lit(10000L)) { (acc, j) =>
        acc + (lit(w(j)) * col(s"__f${j - 1}")) }
    def sigOf(z: Column): Column = { // exact-cast z, rational sigmoid
      val zd = z.cast("double") / lit(1.0e12)
      lit(0.5) + ((zd / lit(2.0)) / (lit(1.0) + abs(zd)))
    }

    val w = Array.fill(k + 1)(0L) // scale-8 units; w(0) = bias
    for (_ <- 1 to epochs) {
      val r = floor((sigOf(zMicro(w)) * lit(10000.0)) + lit(0.5))
        .cast("long") - (col("y") * lit(10000L))
      val aggs = sum(r).as("g0") +:
        (1 to k).map(j => sum(r * col(s"__f${j - 1}")).as(s"g$j"))
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      val g0 = row.getLong(0)
      w(0) -= math.floor((lr * (g0.toDouble / nD)) * 10000.0 + 0.5).toLong
      for (j <- 1 to k) {
        val gj = row.getLong(j)
        w(j) -= math.floor(lr * (gj.toDouble / nD) + 0.5).toLong
      }
    }
    val score8 = floor((sigOf(zMicro(w)) * lit(100000000.0)) + lit(0.5))
      .cast("long")
    base.select(col("__id").as(idCol), col("y"), score8.as("score8"),
      (score8 >= lit(50000000L)).as("pred"))
  }

  /** DoReMi-lite domain reweighting: score every domain by its mean
    * per-token unigram NLL against the corpus LM, measure each domain's
    * EXCESS loss over the corpus baseline, and softmax the excesses into
    * training mixture weights — the cheap, deterministic cousin of DoReMi
    * (Xie et al. 2023): domains the corpus model finds hardest get
    * upweighted, at zero proxy-model cost. One vocab aggregate, one
    * token-keyed join, one domain-keyed aggregate; the softmax runs over
    * the #domains-row frame with exp snapped to 10⁻⁸ units so the
    * normalization sum is an exact BIGINT (the q104 exp-rounding
    * discipline). Output: (domainCol, n_tokens, mean_nll, excess,
    * weight). */
  def doremiWeights(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, temperature: Double = 1.0,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val toks = docs.select(col(domainCol).as("__d"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .localCheckpoint()
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the corpus total AND the scoring join
    val totRow = freq.agg(sum(col("cnt"))).head()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    require(total > 0, "doremiWeights: empty corpus")
    val scored = toks.join(freq, "tok")
      .select(col("__d"),
        SafeMath.roundHalfUp(
            -log(col("cnt").cast("double") / lit(total.toDouble)), 8)
          .cast(DecimalType(28, 8)).as("nll8"))
      .localCheckpoint() // feeds the domain aggregate AND the baseline
    freq.unpersist(blocking = false)
    toks.unpersist(blocking = false)
    val dom = scored.groupBy("__d")
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll8")).as("__s8"))
      .select(col("__d"), col("n_tokens"),
        SafeMath.roundHalfUp(
          col("__s8").cast("double") / col("n_tokens"), 8).as("mean_nll"))
    val bRow = scored.agg(sum(col("nll8")), count(lit(1))).head()
    require(!bRow.isNullAt(0) && bRow.getLong(1) > 0,
      "doremiWeights: empty corpus")
    val baseline = SafeMath.roundHalfUpD(
      bRow.getDecimal(0).doubleValue() / bRow.getLong(1), 8)
    val withX = dom
      .withColumn("excess",
        greatest(col("mean_nll") - lit(baseline), lit(0.0)))
      .withColumn("__e8",
        floor(exp(col("excess") / lit(temperature)) * lit(1.0e8) + lit(0.5))
          .cast("long"))
      .localCheckpoint() // domains-sized; feeds the sum and the output
    scored.unpersist(blocking = false)
    val se8 = withX.agg(sum(col("__e8"))).head().getLong(0)
    require(se8 > 0, "doremiWeights: degenerate softmax sum")
    withX.select(col("__d").as(domainCol), col("n_tokens"), col("mean_nll"),
      col("excess"),
      SafeMath.roundHalfUp(
        col("__e8").cast("double") / lit(se8.toDouble), scale).as("weight"))
  }

  /** Template mining via positional token entropy: within each group
    * (source, URL pattern, form id…), measure the Shannon entropy of the
    * token distribution at each of the first `maxPos` token positions —
    * boilerplate/template farms produce near-zero positional entropy
    * (every doc starts "click here to …") while organic text scatters.
    * The standard cheap detector for machine-generated spam clusters
    * that survive near-dup (templates vary their slots, so MinHash
    * misses them).
    *
    * Scale shape: one posexplode capped at `maxPos` positions per doc,
    * two keyed aggregations ((group,pos,tok) → (group,pos) → group) with
    * full map-side combine. FP discipline: p = cnt/tot is a single exact
    * division; each term p·ln(p) uses the scale-8-rounded ln (the q125
    * recipe) and is snapped to scale 12 before the DECIMAL sum, so the
    * per-position entropy is partition-order independent; the per-group
    * mean runs in exact micro-units. Output: (groupCol, n_docs, n_pos,
    * mean_pos_entropy). */
  def templateMining(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, maxPos: Int = 16, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val pos = docs
      .select(col(groupCol).as("__g"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("pos") < maxPos)
    val cnts = pos.groupBy("__g", "pos", "tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the per-position totals AND the terms
    val tots = cnts.groupBy("__g", "pos").agg(sum(col("cnt")).as("tot"))
    val p = col("cnt").cast("double") / col("tot").cast("double")
    val ent = cnts.join(tots, Seq("__g", "pos"))
      .select(col("__g"), col("pos"),
        SafeMath.roundHalfUp(p * SafeMath.roundHalfUp(log(p), 8), 12)
          .cast(DecimalType(28, 12)).as("t12"))
      .groupBy("__g", "pos")
      .agg(SafeMath.roundHalfUp(-sum(col("t12")).cast("double"), 6)
        .as("ent"))
    val nDocs = docs.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n_docs"))
    val out = ent
      .select(col("__g"),
        floor(col("ent") * lit(1000000.0) + lit(0.5)).cast("long").as("e6"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n_pos"),
        SafeMath.roundHalfUp(
          sum(col("e6")).cast("double") / (count(lit(1)) * lit(1000000.0)),
          scale).as("mean_pos_entropy"))
      .join(nDocs, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_docs"), col("n_pos"),
        col("mean_pos_entropy"))
      .localCheckpoint()
    cnts.unpersist(blocking = false)
    out
  }

  /** Phrase-blocklist filter — the NSFW/boilerplate/spam phrase screen
    * every crawl-curation pipeline runs before anything expensive: count
    * occurrences of each category's phrases (case-insensitive substring
    * matches, counted by the length-delta-of-replace identity — exact,
    * non-overlapping, left-to-right on both engines) and keep documents
    * with zero hits. Pure per-row expressions: no shuffle, no UDF, scans
    * at parquet speed with the phrase constants folded into codegen.
    * Output: (idCol, hits_<category>..., total_hits, keep). */
  def blocklistFilter(docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[(String, Seq[String])]): DataFrame = {
    require(blocklist.nonEmpty && blocklist.forall(_._2.nonEmpty))
    // bind lower(text) once in its own projection: each phrase count
    // references it, and projection collapse would otherwise re-inline
    // the lowercasing per phrase
    val low = docs.select(col(idCol), lower(col(textCol)).as("__t"))
    val catCols = blocklist.map { case (cat, phrases) =>
      phrases.map { p =>
        val pl = p.toLowerCase
        ((length(col("__t")) -
          length(replace(col("__t"), lit(pl), lit("")))) / lit(pl.length))
          .cast("long")
      }.reduce(_ + _).as(s"hits_$cat")
    }
    val withHits = low.select(col(idCol) +: catCols.map(c => c): _*)
    val total = blocklist.map { case (cat, _) => col(s"hits_$cat") }
      .reduce(_ + _)
    withHits.select(col(idCol) +:
      blocklist.map { case (cat, _) => col(s"hits_$cat") } :+
      total.as("total_hits") :+
      (total === 0L).as("keep"): _*)
  }

  /** UniMax epoch-capped budget allocation (Chung et al. 2023): split a
    * token budget across domains so every domain gets an equal share,
    * EXCEPT no domain repeats more than `maxEpochs` times — the
    * waterfilling that replaces ad-hoc temperature mixes when equal
    * sharing would over-epoch low-resource domains into memorization.
    *
    * Closed form instead of the paper's sequential greedy: with domains
    * in ascending token-count order the capped set is provably a PREFIX
    * of that order (if i is capped then any smaller j is too, since
    * B − Σ_{t<j}E·c_t = (B − Σ_{t<i}E·c_t) + Σ_{t=j..i-1}E·c_t
    * ≥ E·c_i(n−i+1) + (i−j)·E·c_j ≥ E·c_j(n−j+1)), so one ordered window
    * computes each domain's cap flag (E·c_i·(n−i) + cum_i ≤ B), an
    * unbounded window counts the capped prefix, and the uncapped tail
    * splits the remaining budget by integer division with the leftover
    * tokens assigned to the single largest domain. All-integer
    * arithmetic end to end, so the allocation itself hash-gates.
    *
    * The windows run over the DOMAIN CENSUS — one row per domain, bounded
    * by the domain vocabulary, never corpus rows — which is the
    * PlanSpec bounded-by-construction global-window exemption class.
    *
    * Output: (domainCol, n_tokens, alloc_tokens, capped, epochs_milli).
    */
  def unimaxAllocation(docs: DataFrame, textCol: String, domainCol: String,
      budgetTokens: Long, maxEpochs: Int): DataFrame = {
    require(maxEpochs >= 1 && budgetTokens >= 0L)
    val census = docs.groupBy(col(domainCol))
      .agg(sum(TextFunctions.tokenCount(col(textCol))).cast("long")
        .as("n_tokens"))
    val ord = Window.orderBy(col("n_tokens"), col(domainCol))
    val all = ord.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    census
      .withColumn("ec", col("n_tokens") * lit(maxEpochs.toLong))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("ec")).over(ord))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("capped",
        col("ec") * (col("n") - col("i")) + col("cum") <= lit(budgetTokens))
      .withColumn("k",
        sum(when(col("capped"), 1L).otherwise(0L)).over(all))
      .withColumn("s_k",
        sum(when(col("capped"), col("ec")).otherwise(0L)).over(all))
      .withColumn("share", when(col("k") < col("n"),
        expr(s"(${budgetTokens}L - s_k) div (n - k)")).otherwise(lit(0L)))
      .withColumn("alloc_tokens",
        when(col("capped"), col("ec"))
          .when(col("i") < col("n"), col("share"))
          // last (largest) domain absorbs the integer-division remainder
          .otherwise(col("share") +
            (lit(budgetTokens) - col("s_k") -
              col("share") * (col("n") - col("k")))))
      .withColumn("epochs_milli", when(col("n_tokens") === 0L, 0L)
        .otherwise(expr("(alloc_tokens * 1000) div n_tokens")))
      .select(domainCol, "n_tokens", "alloc_tokens", "capped",
        "epochs_milli")
  }

  /** Gopher-style composite quality rules (Rae et al. 2021, Table A1):
    * the standard cheap pre-filter a crawl-curation pipeline runs before
    * anything expensive. Per document — word count in [minWords,
    * maxWords], mean word length in [3, 10] characters, '#'/'…' symbol-
    * to-word ratio below 10%, ≥ 80% of words containing an alphabetic
    * character, and at least two DISTINCT stopwords (the "natural
    * English" tell). All ratios are integer milli-units (×1000, floor
    * division) so every flag hash-gates bit-exactly cross-engine.
    *
    * One tokenization per row: the token-derived metrics are computed
    * inside a single bindOnce struct routed through `explode(array(...))`
    * — a one-element generator is the projection barrier that stops
    * CollapseProject re-inlining the tokenizer once per metric.
    *
    * Output: (idCol, n_words, mean_len_milli, symbol_milli, alpha_milli,
    * n_stop, ok_words, ok_mean_len, ok_symbol, ok_alpha, ok_stops, pass).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = GopherStopwords,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val tokenMetrics = TextFunctions.bindOnce(TextFunctions.tokens(t)) {
      toks =>
        struct(
          size(toks).cast("long").as("n_words"),
          coalesce(aggregate(toks, lit(0L), (a, x) => a + length(x)),
            lit(0L)).as("sum_len"),
          size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
            .as("n_alpha"),
          size(array_distinct(filter(transform(toks, x => lower(x)),
            x => x.isInCollection(stopwords)))).cast("long").as("n_stop"))
    }
    // symbol counts are plain length-delta-of-replace (exact,
    // non-overlapping left-to-right on both engines — the blocklist rule)
    val nHash = (length(t) - length(replace(t, lit("#"), lit(""))))
      .cast("long")
    val nEll = ((length(t) - length(replace(t, lit("..."), lit("")))) /
      lit(3)).cast("long")
    docs
      .select(col(idCol), explode(array(tokenMetrics)).as("__m"),
        (nHash + nEll).as("__sym"))
      .select(col(idCol), col("__m.n_words").as("n_words"),
        col("__m.sum_len").as("__sum_len"),
        col("__m.n_alpha").as("__n_alpha"),
        col("__m.n_stop").as("n_stop"), col("__sym"))
      .withColumn("mean_len_milli", when(col("n_words") === 0L, 0L)
        .otherwise(expr("(__sum_len * 1000) div n_words")))
      .withColumn("symbol_milli", when(col("n_words") === 0L, 0L)
        .otherwise(expr("(__sym * 1000) div n_words")))
      .withColumn("alpha_milli", when(col("n_words") === 0L, 0L)
        .otherwise(expr("(__n_alpha * 1000) div n_words")))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mean_len",
        col("mean_len_milli") >= 3000L && col("mean_len_milli") <= 10000L)
      .withColumn("ok_symbol", col("symbol_milli") < 100L)
      .withColumn("ok_alpha", col("alpha_milli") >= 800L)
      .withColumn("ok_stops", col("n_stop") >= 2L)
      .withColumn("pass", col("ok_words") && col("ok_mean_len") &&
        col("ok_symbol") && col("ok_alpha") && col("ok_stops"))
      .select(idCol, "n_words", "mean_len_milli", "symbol_milli",
        "alpha_milli", "n_stop", "ok_words", "ok_mean_len", "ok_symbol",
        "ok_alpha", "ok_stops", "pass")
  }

  /** 2-D Pareto frontier (maximize BOTH integer dims) — the curation cut
    * "no other document is at least as long AND strictly more diverse":
    * a row survives iff nothing dominates it (≥ on both dims, > on at
    * least one; exact duplicates both survive — neither dominates). The
    * frontier is the skyline a budgeted selection walks when two quality
    * axes genuinely trade off and no scalar mix is trusted.
    *
    * The textbook sweep sorts globally and keeps a running max — a
    * SinglePartition funnel. This stays distributed with the
    * [[GlobalSort]] trick: one groupBy(x) aggregate (max y per x), the
    * per-x frame range-partitioned on x DESC, the running "best y at
    * strictly greater x" split into (a) a per-PARTITION exclusive window
    * max and (b) per-partition maxima (≤ numParts rows) prefix-combined
    * on the driver and broadcast back. x is kept at per-x granularity so
    * the within-partition `rowsBetween(-1)` frame IS "strictly greater
    * x" (range partitioning never splits one x across partitions). Rows
    * with a NULL dim are excluded (dominance is undefined on them).
    * Inputs must be integer-valued (micro-units upstream) — exact, so
    * the DuckDB oracle (one window over the per-x aggregate) matches
    * bit-for-bit. */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String,
      numParts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = base.groupBy(col(xCol).cast("long").as("__x"))
      .agg(max(col(yCol).cast("long")).as("__ymax"))
    val parted = perX.repartitionByRange(numParts, col("__x").desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // ≤ numParts rows to the driver — the only non-distributed step
    val pmax = parted.groupBy(col("__pid")).agg(max(col("__ymax")).as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix max over ascending pid = descending x ranges
    val pref = pmax.map(_._1)
      .zip(pmax.scanLeft(Option.empty[Long]) { (acc, p) =>
        Some(acc.fold(p._2)(math.max(_, p._2))) }.init)
    val prefDf = pref.toSeq.map { case (p, m) => (p, m) }
      .toDF("__pid", "__pref")
    val wExcl = Window.partitionBy(col("__pid")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls: M is null only for the global max x
    val frontierX = parted
      .withColumn("__local", max(col("__ymax")).over(wExcl))
      .join(broadcast(prefDf), Seq("__pid"))
      .withColumn("__m", greatest(col("__local"), col("__pref")))
      .filter(col("__m").isNull || col("__ymax") > col("__m"))
      .select(col("__x"), col("__ymax"))
    base.join(frontierX,
      base(xCol).cast("long") === col("__x") &&
        base(yCol).cast("long") === col("__ymax"), "left_semi")
  }

  /** Exact depth-1 decision-tree training (a stump) — the second
    * in-engine trainer next to [[trainLogistic]]: over integer features,
    * evaluate EVERY (feature, threshold ≤ v) split and return the one
    * minimizing weighted Gini impurity. Minimizing impurity maximizes
    * S = (posL²+negL²)/nL + (posR²+negR²)/nR; S is scored in integer
    * micro-units with truncating division (`div` / oracle `//`), so the
    * argmax is deterministic and bit-identical cross-engine — no FP in
    * the comparison path. Ties break to (feature, threshold).
    *
    * Scale shape: one unpivoted (feature, value) census shuffle (the
    * only corpus-sized pass, map-side combined); the cumulative windows
    * run over one row per DISTINCT VALUE per feature (value-domain-
    * bounded, partitioned by feature, never corpus rows); the winner is
    * a TakeOrdered(1). Counts must stay under ~3e6 per side or the
    * squared micro-unit products need the DECIMAL variant. */
  def decisionStump(df: DataFrame, labelCol: String,
      features: Seq[String]): DataFrame = {
    require(features.nonEmpty)
    val stackArgs = features
      .map(f => s"'$f', CAST($f AS BIGINT)").mkString(", ")
    val long = df.selectExpr(
      s"CAST(CAST($labelCol AS BOOLEAN) AS BIGINT) AS __y",
      s"stack(${features.size}, $stackArgs) AS (feat, v)")
    val census = long.groupBy(col("feat"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val wCum = Window.partitionBy(col("feat")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("feat"))
    val cum = census
      .withColumn("n_left", sum(col("n")).over(wCum))
      .withColumn("pos_left", sum(col("pos")).over(wCum))
      .withColumn("n_right", sum(col("n")).over(wAll) - col("n_left"))
      .withColumn("pos_right", sum(col("pos")).over(wAll) - col("pos_left"))
      .filter(col("n_left") > 0 && col("n_right") > 0)
      .withColumn("score_micro", expr(
        """(pos_left * pos_left +
             (n_left - pos_left) * (n_left - pos_left)) * 1000000L
             div n_left
           + (pos_right * pos_right +
             (n_right - pos_right) * (n_right - pos_right)) * 1000000L
             div n_right"""))
    cum.orderBy(col("score_micro").desc, col("feat"), col("v")).limit(1)
      .select(col("feat").as("feature"), col("v").as("threshold"),
        col("score_micro"), col("n_left"), col("pos_left"),
        col("n_right"), col("pos_right"),
        (col("pos_left") * 2 >= col("n_left")).as("pred_left"),
        (col("pos_right") * 2 >= col("n_right")).as("pred_right"))
  }

  /** Gini concentration of the domain/source mix — the inequality audit
    * companion of [[zipfFit]]/[[heapsFit]]: 0 = perfectly balanced
    * corpus, →1 = one domain owns everything. Uses the exact discrete
    * formula G = (2·Σᵢ i·cᵢ)/(n·Σc) − (n+1)/n over counts sorted
    * ascending (i = 1-based rank; any stable order of equal counts gives
    * the same Σ — the formula is tie-invariant). ALL-INTEGER until one
    * final division: numerator and denominator are cross-multiplied into
    * DECIMAL(38,0) (oracle: HUGEINT) so corpus sizes cannot wrap.
    *
    * Scale shape: one map-side-combined domain census (the ONLY
    * corpus-sized pass); the rank window runs over one row per domain —
    * bounded by the domain vocabulary, never by corpus rows (PlanSpec
    * exemption class), and the final fold is a scalar aggregate. */
  def giniConcentration(df: DataFrame, domainCol: String,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val wide = DecimalType(38, 0)
    val census = df.groupBy(col(domainCol).as("__d"))
      .agg(count(lit(1)).as("c"))
    val ranked = census.withColumn("i",
      row_number().over(Window.orderBy(col("c"), col("__d"))))
    ranked.agg(
      count(lit(1)).as("n_domains"),
      sum(col("c")).as("n_rows"),
      SafeMath.roundHalfUp(
        when(count(lit(1)) === 1L || sum(col("c")) === 0L, lit(0.0))
          .otherwise(
            ((lit(2L).cast(wide) * sum(col("i").cast(wide) * col("c").cast(wide)) -
              (count(lit(1)) + 1L).cast(wide) * sum(col("c")).cast(wide))
              .cast("double")) /
              (count(lit(1)).cast(wide) * sum(col("c")).cast(wide))
                .cast("double")),
        scale).as("gini"))
  }

  /** Vocabulary coverage curve — "how many distinct tokens cover X% of
    * the corpus token mass": rank the vocabulary census by frequency
    * (ties to the lexicographically smaller token) and report, per
    * requested percentage, the smallest head size whose cumulative mass
    * reaches it. The tokenizer-budget statistic (vocab-size choices,
    * OOV planning) that Zipf fits approximate and this measures
    * exactly. All-integer threshold test (cum·100 ≥ N·pct). One
    * corpus-sized token aggregate; the rank window and threshold scan
    * run on the VOCABULARY census (the q267 bounded-census exemption
    * class). Output per pct: (pct, tokens_needed, vocab_size,
    * total_tokens). */
  def vocabCoverage(docs: DataFrame, textCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val census = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = census.agg(count(lit(1)), sum(col("c"))).collect()(0)
    val v = tot.getLong(0)
    val n = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    val w = Window.orderBy(col("c").desc, col("tok").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = census
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("rank", count(lit(1)).over(w))
    ranked
      .select(col("cum"), col("rank"),
        explode(array(pcts.map(lit): _*)).as("pct"))
      .filter(col("cum") * 100L >= lit(n) * col("pct"))
      .groupBy(col("pct"))
      .agg(min(col("rank")).as("tokens_needed"))
      .select(col("pct"), col("tokens_needed"),
        lit(v).as("vocab_size"), lit(n).as("total_tokens"))
  }

  /** Quantile normalization across groups — map each group's value
    * distribution onto the POOLED distribution, so per-source scores
    * from differently-calibrated scorers become comparable (the classic
    * microarray move, here for mixing quality signals across corpus
    * sources): a row at within-group rank r (of n_g) is assigned the
    * pooled value at global rank `(r·N) div n_g`. All-integer rank
    * arithmetic (exact while n_g·N < 2⁶³ — fine to ~10⁹ rows), total
    * order everywhere ((value, id) ties), so the mapping is
    * deterministic and hash-gateable.
    *
    * Scale shape: the pooled ranking is [[GlobalSort.withGlobalRank]]
    * (range-partitioned, never a single-partition window); the
    * within-group rank is a partitioned window; the value lookup is one
    * shuffle join on the target rank. Output: (idCol, groupCol, valCol,
    * norm) with `norm` the pooled-distribution value at the row's
    * quantile. */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(idCol), col(groupCol),
      col(valCol).cast("long").as("__v"))
    val n = base.count()
    val pooled = GlobalSort.withGlobalRank(
      base.select(col("__v"), col(idCol)),
      Seq(col("__v"), col(idCol)), rankCol = "__gr")
      .select(col("__gr"), col("__v").as("__pv"))
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col("__v"), col(idCol))
    val ranked = base
      .withColumn("__r", row_number().over(wg).cast("long"))
      .withColumn("__ng",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("__tr", expr(s"(__r * ${n}L) div __ng"))
    ranked.join(pooled, col("__tr") === col("__gr"))
      .select(col(idCol), col(groupCol), col("__v").as(valCol),
        col("__pv").as("norm"))
  }

  /** Greedy set cover over document n-gram sets (the classic ln(n)
    * approximation) — pick the k documents that together cover the most
    * vocabulary: each round selects the document covering the most
    * still-uncovered n-grams (ties to the smaller id, prior picks
    * excluded), then removes its n-grams from the universe. The
    * instruction-data selection move: a small panel with maximal
    * lexical coverage. `n` = 1 covers unigrams; use 2+ when the corpus
    * vocabulary is small enough for one document to exhaust it.
    *
    * Scale shape: the (doc, token) posting frame is built once
    * (per-doc-distinct explode, persisted); each round is one
    * semi-joined count aggregate + a global TakeOrdered(1) + one
    * anti-join to shrink the universe (localCheckpoint'd so lineage
    * stays O(1)) — k bounded rounds, no pairwise join anywhere.
    * Output: (round, idCol, covered) where `covered` is the pick's
    * marginal gain — a non-increasing curve that doubles as the
    * coverage diminishing-returns audit. */
  def setCoverSelect(docs: DataFrame, idCol: String, textCol: String,
      k: Int, n: Int = 1): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(k >= 1 && n >= 1, "k and n must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Adaptive.withSmallShuffleCoalesce(spark) {
    val grams =
      if (n == 1) TextFunctions.tokens(col(textCol))
      else TextFunctions.shingles(col(textCol), n)
    val dt = docs.select(col(idCol).cast("long").as("__doc"),
      explode(array_distinct(grams)).as("__tk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one setup job: populate the dt cache and size the pinned loop.
      // The uncovered-gram universe is NEVER materialized as state — a
      // doc's uncovered count equals its grams anti-joined against the
      // union of the ≤ k already-picked docs' grams (doc_tks ∩ u_{r-1}
      // = doc_tks \ ∪picked_tks since u_{r-1} = all_tks \ ∪picked), so
      // the per-round state the old form checkpointed (a corpus-VOCAB-
      // sized frame, shrinking by one doc's grams per round) collapses
      // to a broadcast bounded by k documents' gram sets.
      val m = dt.count()
      val parts = graft.core.Adaptive.partsFor(spark, m)
      val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      // greedy rounds are inherently driver-sequential (each pick
      // depends on the previous); the job-count floor is the cost, so
      // the loop runs AQE-OFF at counted width (the q103/ccRound
      // rationale: AQE adds one driver job per shuffle stage per
      // round). Per round: one broadcast build (picked grams) + one
      // TakeOrdered collect — down from ~5 driver jobs per round.
      graft.core.Adaptive.withNoAqe(spark) {
      graft.core.Adaptive.withShufflePartitions(spark, parts) {
      var round = 1
      var done = false
      while (round <= k && !done) {
        val prior = picks.map(_._2).toSeq
        val cand =
          if (prior.isEmpty) dt
          else dt.filter(!col("__doc").isin(prior: _*))
            .join(broadcast(dt.filter(col("__doc").isin(prior: _*))
              .select("__tk")), Seq("__tk"), "left_anti")
        val best = cand
          .groupBy(col("__doc")).agg(count(lit(1)).as("__c"))
          .orderBy(col("__c").desc, col("__doc").asc).limit(1)
          .collect().headOption
        best match {
          case Some(r) =>
            picks += ((round, r.getLong(0), r.getLong(1)))
            round += 1
          case None => done = true
        }
      }
      }
      }
      picks.toSeq.toDF("round", idCol, "covered")
    } finally dt.unpersist(blocking = false)
    }
  }

  /** Deterministic m-out-of-n bootstrap confidence interval for a
    * per-group mean — error bars on corpus statistics without any RNG:
    * replicate b's j-th draw takes the row at within-group index
    * `md5₆₀(group:b:j) mod n_g`, so every engine (and every replay)
    * draws the identical resamples. Replicate means are exact integer
    * micro-units; the interval is the 2nd-smallest / 2nd-largest of the
    * B=40 replicate means (the percentile-bootstrap 95% CI).
    *
    * Scale shape: draws are `groups × B × m` rows (CONSTANT per group —
    * m-out-of-n keeps resample size bounded no matter the corpus), the
    * value lookup is one shuffle join against the within-group-indexed
    * rows (partitioned window, never global), replicate sums are
    * map-side combined, and the final per-group fold sorts a bounded
    * B-element array. */
  def bootstrapCi(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, b: Int = 40, m: Int = 256): DataFrame = {
    require(b >= 3 && m >= 1)
    // (id, value) ordering: idCol need not be unique — rows tying on
    // BOTH columns are interchangeable (same v at the tied indexes), so
    // the index→value map is engine-deterministic even then
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(idCol), col("__v"))
    val indexed = df
      .select(col(groupCol), col(idCol), col(valCol).cast("long").as("__v"))
      .withColumn("__rn", row_number().over(wg).cast("long") - 1L)
      .localCheckpoint()
    val sizes = indexed.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__ng"), sum(col("__v")).as("__sum"))
      .localCheckpoint()
    val draws = sizes
      .select(col(groupCol), col("__ng"),
        explode(sequence(lit(1), lit(b))).as("__b"))
      .select(col(groupCol), col("__ng"), col("__b"),
        explode(sequence(lit(1), lit(m))).as("__j"))
      .withColumn("__rn", pmod(TextFunctions.md5Key60(
        concat_ws(":", col(groupCol), col("__b"), col("__j"))),
        col("__ng")))
    val reps = draws.join(indexed, Seq(groupCol, "__rn"))
      .groupBy(col(groupCol), col("__b"))
      .agg(expr(s"(sum(__v) * 1000000L) div ${m}L").as("__mean_micro"))
    reps.groupBy(col(groupCol))
      .agg(
        element_at(array_sort(collect_list(col("__mean_micro"))), 2)
          .as("lo_micro"),
        element_at(array_sort(collect_list(col("__mean_micro"))), b - 1)
          .as("hi_micro"))
      .join(sizes, Seq(groupCol))
      .select(col(groupCol), col("__ng").as("n"),
        expr("(__sum * 1000000L) div __ng").as("mean_micro"),
        col("lo_micro"), col("hi_micro"))
  }

  /** Split-conformal threshold per group (Vovk; Angelopoulos & Bates
    * 2021) — the distribution-free (1−α) cutoff for selective
    * classification / filtering: with n calibration scores, the
    * threshold is the `ceil((n+1)·(1−α))`-th smallest score (clamped to
    * n), guaranteeing ≥ 1−α coverage on exchangeable data. All-integer
    * rank arithmetic (α in percent), total (score, id) order, one
    * partitioned window — the per-group quantile that needs the EXACT
    * order statistic, not an approximate sketch. Output:
    * (groupCol, n, target_rank, threshold). */
  def conformalThreshold(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, alphaPct: Int): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 99, "alpha in whole percent")
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col("__s"), col(idCol))
    df.select(col(groupCol), col(idCol), col(scoreCol).cast("long").as("__s"))
      .withColumn("__rn", row_number().over(wg).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("__tgt", least(col("__n"),
        expr(s"((__n + 1L) * ${100 - alphaPct}L + 99L) div 100L")))
      .filter(col("__rn") === col("__tgt"))
      .select(col(groupCol), col("__n").as("n"),
        col("__tgt").as("target_rank"), col("__s").as("threshold"))
  }

  /** Leave-one-source-out ablation of a per-row metric — "what happens
    * to the corpus mean if source s is dropped": one grouped aggregate
    * plus one 3-value driver scalar; the ablated mean is
    * `(S − s_i)·10⁶ div (N − n_i)`, exact integers throughout. The
    * cheapest source-attribution signal there is (the full-retrain
    * Shapley ladder starts here), and the table a mix-rebalancing
    * decision reads first. Sources covering the WHOLE corpus ablate to
    * NULL. Output: (sourceCol, n_rows, mean_micro, ablated_mean_micro,
    * delta_micro). */
  def sourceAblation(df: DataFrame, sourceCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(sourceCol), col(valCol).cast("long").as("__v"))
    val tot = base.agg(count(lit(1)), sum(col("__v"))).collect()(0)
    val bigN = tot.getLong(0)
    val bigS = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    base.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("__si"))
      .withColumn("mean_micro", expr(s"(${bigS}L * 1000000L) div ${bigN}L"))
      .withColumn("ablated_mean_micro",
        when(col("n_rows") === bigN, lit(null).cast("long"))
          .otherwise(expr(
            s"((${bigS}L - __si) * 1000000L) div (${bigN}L - n_rows)")))
      .select(col(sourceCol), col("n_rows"), col("mean_micro"),
        col("ablated_mean_micro"),
        (col("ablated_mean_micro") - col("mean_micro")).as("delta_micro"))
  }

  /** Inverse-propensity-weighted totals audit — "can the sampled corpus
    * still answer aggregate questions": reruns [[stratifiedSample]]'s
    * exact hash decision, Horvitz–Thompson-weights every kept row by
    * `(v·10⁴) div rate_permyriad`, and reports the estimate against the
    * true per-stratum total from the same scan pair. All-integer credit
    * arithmetic; the per-row weighting is a projection, the rollups are
    * map-side combined, and nothing corpus-sized shuffles beyond the
    * two keyed aggregates. Output: (strataCol, n_all, n_sampled,
    * true_sum, est_sum, err = est − true). */
  def ipwTotals(df: DataFrame, keyCol: String, strataCol: String,
      valCol: String, rates: Map[String, Double], defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val base = df.select(col(strataCol), col(keyCol),
      col(valCol).cast("long").as("__v"))
    // integer `div`, never FP divide-then-cast: a correctly-rounded FP
    // quotient lands half-ulp ABOVE an integer often enough to flip the
    // truncation against the oracle's `//`
    val rateSql = "CASE " + rates.map { case (stratum, rate) =>
      s"WHEN $strataCol = '$stratum' " +
        s"THEN ${math.round(rate * 10000).min(10000L)}L"
    }.mkString(" ") +
      s" ELSE ${math.round(defaultRate * 10000).min(10000L)}L END"
    val truth = base.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_all"), sum(col("__v")).as("true_sum"))
    val est = stratifiedSample(base, keyCol, strataCol, rates,
        defaultRate, salt)
      .withColumn("__w", expr(s"(__v * 10000L) div ($rateSql)"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_sampled"), sum(col("__w")).as("est_sum"))
    truth.join(est, Seq(strataCol), "left")
      .select(col(strataCol), col("n_all"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        col("true_sum"),
        coalesce(col("est_sum"), lit(0L)).as("est_sum"),
        (coalesce(col("est_sum"), lit(0L)) - col("true_sum")).as("err"))
  }

  /** Isotonic (monotone non-decreasing) fit of a binned rate curve via
    * the minimax formula — iso(i) = max_{j≤i} min_{k≥i} mean(j..k) —
    * the calibration step that turns a noisy per-bin positive-rate
    * curve into the monotone one a threshold can be read off
    * (PAV's closed form; block means compared in integer micro-units,
    * so both engines land the identical fit). Everything downstream of
    * the one corpus-sized bin aggregate runs on the ≤`maxBins` bin
    * frame: prefix sums, the j≤k block-mean join (≤ bins² rows), and
    * the max-of-min fold — all bounded by construction (the PlanSpec
    * bounded-frame exemption class). Output per bin:
    * (binCol, n, pos, rate_micro, iso_micro). */
  def isotonicFitMicro(bins: DataFrame, binCol: String, posCol: String,
      nCol: String, maxBins: Int = 64): DataFrame = {
    val b = bins.select(col(binCol).cast("long").as("__b"),
      col(posCol).cast("long").as("__p"), col(nCol).cast("long").as("__n"))
      .localCheckpoint()
    val nb = b.count()
    require(nb <= maxBins, s"$nb bins exceed maxBins=$maxBins — " +
      "isotonicFitMicro is for bounded calibration curves")
    val j = b.select(col("__b").as("jb"))
    val k = b.select(col("__b").as("kb"))
    // block means over every j ≤ k span: join the bin rows BETWEEN
    val spans = j.crossJoin(k).filter(col("jb") <= col("kb"))
      .join(b, col("__b") >= col("jb") && col("__b") <= col("kb"))
      .groupBy(col("jb"), col("kb"))
      .agg(expr("(sum(__p) * 1000000L) div sum(__n)").as("__m"))
    // iso(i) = max over j≤i of (min over k≥i of m(j,k))
    val iso = b.select(col("__b").as("ib"))
      .join(spans, col("jb") <= col("ib") && col("kb") >= col("ib"))
      .groupBy(col("ib"), col("jb")).agg(min(col("__m")).as("__mn"))
      .groupBy(col("ib")).agg(max(col("__mn")).as("iso_micro"))
    b.join(iso, col("__b") === col("ib"))
      .select(col("__b").as(binCol), col("__n").as("n"),
        col("__p").as("pos"),
        expr("(__p * 1000000L) div __n").as("rate_micro"),
        col("iso_micro"))
  }

  /** N-gram diversity audit — the synthetic-data mode-collapse check
    * (self-BLEU's scalable cousin): per document, how many of its
    * DISTINCT word k-grams also occur in at least one OTHER document.
    * A generated corpus whose docs re-tread the same phrasings shows
    * self_sim drifting toward 1.0 long before exact/near-dup finds
    * whole-document copies — this is the standard pre-training screen
    * for distilled or model-generated data (distinct-n family).
    *
    * Scale shape: never pairwise. One distinct over (doc, gram-md5),
    * a gram-keyed window count (df), then a doc-keyed aggregate —
    * shuffles carry (doc, 32-char md5) only, text never leaves the
    * scan; the gram hash partitions uniformly at any corpus size.
    * Docs shorter than k tokens have no k-grams and no output row on
    * either engine.
    *
    * Output per doc: (doc_id, n_distinct, n_shared,
    * self_sim = roundHalfUp(n_shared / n_distinct, scale)). */
  def ngramDiversity(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, scale: Int = 6): DataFrame = {
    val grams = Similarity.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.shingles(col(textCol), k)).as("__sh"))
      .select(col("doc_id"), md5(col("__sh")).as("__h"))
      .distinct()
    val w = Window.partitionBy(col("__h"))
    grams
      .withColumn("__df", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("self_sim", graft.functions.SafeMath.roundHalfUp(
        col("n_shared").cast("double") / col("n_distinct").cast("double"),
        scale))
  }

  /** Weak-supervision label-model diagnostics (the Snorkel LFAnalysis
    * card): given K labeling functions — each a Column voting 1L
    * (keep), -1L (drop), or NULL (abstain) per row — report, per LF,
    * its vote counts and the three standard health ratios: coverage
    * (non-abstain fraction), overlaps (votes alongside ≥1 other LF),
    * conflicts (votes against ≥1 other LF). A synthetic `__majority` row
    * carries the resolved label: sign of (pos − neg) votes, abstaining
    * on ties — so the same frame answers both "are my LFs healthy" and
    * "what does the vote produce". This is the labeling leg of a
    * curation pipeline: rules in, one audited weak label out.
    *
    * Scale shape: one projection evaluates every LF once per row
    * (row-local Columns — no joins inside LFs), one `stack` to
    * (lf, vote) rows carrying the row-level tallies, one K·(K+1)-group
    * aggregate. No driver-side step at all. Ratios are
    * roundHalfUp(x, scale) over exact counts. */
  def labelModel(df: DataFrame, lfs: Seq[(String, Column)],
      scale: Int = 6): DataFrame = {
    require(lfs.size >= 2, "label model needs >= 2 labeling functions")
    // Names are spliced into a stack() SQL expression: restrict to
    // identifier characters (a quote/backtick would break parsing) and
    // reserve the synthetic majority row's name (advice r11).
    lfs.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+") && name != "__majority",
        s"LF name must be [A-Za-z0-9_]+ and not '__majority': '$name'")
    }
    import graft.functions.SafeMath
    val voteCols = lfs.zipWithIndex.map { case ((_, c), j) =>
      c.cast("long").as(s"__v$j") }
    val vs = lfs.indices.map(j => col(s"__v$j"))
    val base = df.select(voteCols: _*)
      .withColumn("__npos",
        vs.map(v => when(v === 1L, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("__nneg",
        vs.map(v => when(v === -1L, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("__nvot", col("__npos") + col("__nneg"))
      .withColumn("__majority",
        when(col("__npos") > col("__nneg"), 1L)
          .when(col("__nneg") > col("__npos"), -1L))
    val stackArgs = (lfs.zipWithIndex.map { case ((name, _), j) =>
      s"'$name', __v$j" } :+ s"'__majority', __majority").mkString(", ")
    val stacked = base.select(
      expr(s"stack(${lfs.size + 1}, $stackArgs) AS (lf, vote)"),
      col("__npos"), col("__nneg"))
    def ratio(c: Column): Column =
      SafeMath.roundHalfUp(
        c.cast("double") / count(lit(1)).cast("double"), scale)
    stacked.groupBy("lf").agg(
      sum(when(col("vote") === 1L, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("vote") === -1L, 1L).otherwise(0L)).as("n_neg"),
      ratio(sum(when(col("vote").isNotNull, 1L).otherwise(0L)))
        .as("coverage"),
      // this LF voted AND at least one OTHER vote exists on the row
      ratio(sum(when(col("vote").isNotNull &&
          (col("__npos") + col("__nneg")
            - when(col("lf") =!= "__majority", 1L).otherwise(0L)) >= 1L,
        1L).otherwise(0L))).as("overlaps"),
      // this LF voted AND at least one (other) vote disagrees; for the
      // majority pseudo-LF: the vote resolved against a dissenting LF
      ratio(sum(when(
        (col("vote") === 1L && col("__nneg") >= 1L) ||
          (col("vote") === -1L && col("__npos") >= 1L),
        1L).otherwise(0L))).as("conflicts"))
  }

  /** K-CLASS weak-supervision label model — [[labelModel]] generalized
    * from binary ±1 to arbitrary class ids (Snorkel's LFAnalysis is
    * k-class; real curation taxonomies are quality tiers / language
    * families, not keep-drop). Each LF votes a CLASS ID (any long;
    * NULL = abstain). Per LF: vote count, distinct classes voted, and
    * the three health ratios — coverage (non-abstain fraction),
    * overlaps (voted alongside ≥1 other LF), conflicts (voted and ≥1
    * other LF voted a DIFFERENT class). The `__majority` pseudo-LF
    * carries the resolved label: the row's PLURALITY class, abstaining
    * on ties (no class-order bias); its conflicts ratio = resolved
    * against ≥1 dissenting LF.
    *
    * Row-local arithmetic (K is a handful of rules, so the k² vote
    * comparisons are a few dozen codegen'd terms over projected
    * attributes): matches_j = #votes equal to LF j's vote (self
    * included); maxc = the plurality count; tie ⟺ two DIFFERENT
    * classes both reach maxc; majority = the unique class at maxc.
    * Dissent against a vote with m matches is exactly nv − m ≥ 1 — the
    * SAME formula resolves per-LF conflicts AND majority conflicts (for
    * the majority row m = maxc), which is what the binary form's
    * npos/nneg test reduces to at k = 2. Scale shape identical to
    * [[labelModel]]: one staged projection, one `stack` to (lf, vote,
    * m) rows carrying the row tallies, one (K+1)-group aggregate — no
    * joins, no extra shuffle, no driver step. */
  def labelModelK(df: DataFrame, lfs: Seq[(String, Column)],
      scale: Int = 6): DataFrame = {
    require(lfs.size >= 2, "label model needs >= 2 labeling functions")
    lfs.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+") && name != "__majority",
        s"LF name must be [A-Za-z0-9_]+ and not '__majority': '$name'")
    }
    import graft.functions.SafeMath
    val vs = lfs.indices.map(j => col(s"__v$j"))
    val voteCols = lfs.zipWithIndex.map { case ((_, c), j) =>
      c.cast("long").as(s"__v$j") }
    // staged selects: each stage references only ATTRIBUTES of the one
    // below, so no subtree is duplicated through the when-chains
    val base = df.select(voteCols: _*)
    val withM = base.select(vs ++ lfs.indices.map { j =>
      when(col(s"__v$j").isNotNull,
        vs.map(v => when(v === col(s"__v$j"), 1L).otherwise(0L))
          .reduce(_ + _)).as(s"__m$j")
    } :+ lfs.indices.map(j =>
      when(col(s"__v$j").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _).as("__nv"): _*)
    val ms = lfs.indices.map(j => col(s"__m$j"))
    val withMax = withM.withColumn("__maxc",
      greatest(ms.map(coalesce(_, lit(0L))): _*))
    val tiePairs = for {
      j <- lfs.indices; i <- lfs.indices if i > j
    } yield (col(s"__v$j").isNotNull && col(s"__v$i").isNotNull &&
      col(s"__v$j") =!= col(s"__v$i") &&
      col(s"__m$j") === col("__maxc") && col(s"__m$i") === col("__maxc"))
    val withMaj = withMax
      .withColumn("__tie", tiePairs.reduce(_ || _))
      .withColumn("__maj",
        when(col("__maxc") >= 1L && !col("__tie"),
          coalesce(lfs.indices.map(j =>
            when(col(s"__m$j") === col("__maxc"), col(s"__v$j"))): _*)))
    val stackArgs = (lfs.zipWithIndex.map { case ((name, _), j) =>
      s"'$name', __v$j, __m$j" } :+
      s"'__majority', __maj, IF(__maj IS NOT NULL, __maxc, NULL)")
      .mkString(", ")
    val stacked = withMaj.select(
      expr(s"stack(${lfs.size + 1}, $stackArgs) AS (lf, vote, m)"),
      col("__nv"))
    def ratio(c: Column): Column =
      SafeMath.roundHalfUp(
        c.cast("double") / count(lit(1)).cast("double"), scale)
    stacked.groupBy("lf").agg(
      sum(when(col("vote").isNotNull, 1L).otherwise(0L)).as("n_votes"),
      countDistinct(col("vote")).as("n_classes"),
      ratio(sum(when(col("vote").isNotNull, 1L).otherwise(0L)))
        .as("coverage"),
      ratio(sum(when(col("vote").isNotNull &&
          (col("__nv") -
            when(col("lf") =!= "__majority", 1L).otherwise(0L)) >= 1L,
        1L).otherwise(0L))).as("overlaps"),
      ratio(sum(when(col("vote").isNotNull &&
          col("__nv") - col("m") >= 1L,
        1L).otherwise(0L))).as("conflicts"))
  }

  /** Leakage-free train/val/test split: assign every document's
    * near-duplicate GROUP — not the document — to a split, so two
    * near-copies can never land on opposite sides of the eval boundary
    * (the classic benchmark-inflation bug near-dup detection exists to
    * prevent). `clusters` is a (node → cluster) frame, e.g.
    * [[Dedup.clusterAssignments]] over near-dup pairs; docs absent from
    * it form singleton groups of themselves. The group key is hashed
    * (md5-60bit, salted — deterministic, engine-portable, replay-safe)
    * into 100 buckets: [0, trainPct) → train, [trainPct,
    * trainPct+valPct) → val, rest → test. Same group ⇒ same bucket ⇒
    * same split, structurally — no post-hoc leakage check needed.
    *
    * Output is the split census (split, n_docs, n_groups,
    * n_clustered_docs): 3 rows. For the per-doc assignment apply
    * [[splitBucket]] to the same (salt, group) directly in a pipeline.
    * Scale shape: one broadcast-or-shuffle left join (clusters is the
    * near-dup minority), one hash projection, one 3-group aggregate. */
  def groupSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
      trainPct: Int = 80, valPct: Int = 10,
      salt: String = "graft"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val cl = clusters.select(col("node").as(idCol),
      col("cluster").as("__cl"))
    docs.select(col(idCol)).join(cl, Seq(idCol), "left")
      .select(col(idCol), col("__cl"),
        coalesce(col("__cl"), col(idCol)).cast("string").as("__g"))
      .select(col(idCol), col("__cl"),
        col("__g"), splitBucket(col("__g"), trainPct, valPct, salt)
          .as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__g")).as("n_groups"),
        sum(when(col("__cl").isNotNull, 1L).otherwise(0L))
          .as("n_clustered_docs"))
  }

  /** The split decision itself: md5-60bit(salt || group) mod 100 →
    * 'train' / 'val' / 'test'. Exposed so pipelines can stamp the
    * assignment on rows with the exact arithmetic [[groupSplit]]
    * censuses. */
  def splitBucket(group: Column, trainPct: Int, valPct: Int,
      salt: String): Column = {
    val b = TextFunctions.md5Key60(concat(lit(salt), group)) % 100L
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * document with the in-engine LM ([[knBigramLogProb]]), rank within
    * its language, and cut each language into `buckets` equal-size
    * tiers — bucket 1 = head (most fluent), last = tail. The canonical
    * "keep head+middle, drop tail per language" curation move; output
    * is the per-(lang, bucket) census with the NLL band each tier spans.
    *
    * The tier rule is explicit integer arithmetic shared with the
    * oracle: bucket = ((rank−1)·buckets) div n_lang + 1 over the
    * (kn_nll, id)-ordered per-language GLOBAL rank — not an engine
    * NTILE (remainder placement differs between engines; this formula
    * is engine-free). Ranking rides [[GlobalSort.withGroupedRank]]: all
    * languages rank in ONE range-sample/checkpoint/census pass, never a
    * per-language single-partition window (a language IS a near-global
    * partition at corpus scale). The language list is a bounded driver
    * collect (languages are an enum, not data-sized).
    *
    * Output: (lang, bucket, n_docs, min_nll, max_nll, mean_nll);
    * mean is a DECIMAL(28,6) sum of the already-scale-6 NLLs (exact,
    * order-free) divided at the end. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, buckets: Int = 3, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    require(buckets >= 2, "need >= 2 perplexity tiers")
    // A NULL language would map to a NULL group tag below and silently
    // drop/mis-rank those docs (the oracle's PARTITION BY lang keeps a
    // NULL partition) — fail loudly instead (advice r11), INSIDE the
    // scans the operator already pays (a separate up-front guard scan
    // would double the input reads per call; review r12).
    val langG = when(col(langCol).isNull, raise_error(lit(
        s"perplexityBuckets: NULL $langCol — coalesce to a sentinel " +
          "language first")))
      .otherwise(col(langCol).cast("string"))
    val nll = knBigramLogProb(docs, idCol, textCol)
    val withLang = nll.join(
      docs.select(col(idCol), langG.as("lang")), Seq(idCol))
    val langs = docs.select(langG.as("l"))
      .distinct().collect().map(_.getString(0)).sorted // bounded: enum
    val tagged = withLang.withColumn("__g",
      array_position(typedLit(langs.toSeq), col("lang")).cast("int"))
    val ranked = GlobalSort.withGroupedRank(tagged, "__g",
      Seq(col("kn_nll").asc, col(idCol).asc), rankCol = "__r")
    val ng = ranked.groupBy(col("lang")).agg(count(lit(1)).as("__ng"))
    ranked.join(broadcast(ng), Seq("lang"))
      .withColumn("bucket",
        expr(s"((__r - 1) * $buckets) div __ng") + lit(1L))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("kn_nll")).as("min_nll"),
        max(col("kn_nll")).as("max_nll"),
        SafeMath.roundHalfUp(
          sum(col("kn_nll").cast(DecimalType(28, 6))).cast("double") /
            count(lit(1)).cast("double"), scale).as("mean_nll"))
  }

  /** χ² keyword selection against a binary target (Pearson chi-square
    * with document-level presence counts) — the classic supervised
    * feature-selection screen: which tokens are most associated with the
    * target slice (a language, a quality label, a source)? Complements
    * [[dsirScore]] (which WEIGHTS docs by such features) by naming the
    * features themselves — the audit artifact for "what is my classifier
    * keying on".
    *
    * Per token over distinct (doc, token): a = target docs containing
    * it, b = rest docs containing it, c/d their complements;
    * χ² = n·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)), computed in DOUBLE with
    * this exact parenthesization (counts are 2^53-exact in double, and
    * IEEE mul/div are correctly rounded, so both engines produce the
    * same bits; margins of zero score 0). Tokens seen in < minDf docs
    * are dropped (rare-token χ² is noise). Top-`topK` by (χ², token).
    *
    * Scale shape: one distinct over (doc, token, flag) — shuffles carry
    * tokens, text stays in the scan; one token-keyed aggregate; the two
    * doc totals are a 1-row aggregate collected to the driver (bounded)
    * and spliced as literals; TakeOrdered for the top-k. */
  def chi2Keywords(docs: DataFrame, idCol: String, textCol: String,
      target: Column, topK: Int = 50, minDf: Long = 5,
      scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath
    val base = docs.select(col(idCol).as("__doc"),
      target.cast("boolean").as("__t"), col(textCol).as("__text"))
    val totRow = base.agg(
      sum(when(col("__t"), 1L).otherwise(0L)),
      count(lit(1))).collect()(0) // 1 row — bounded
    val nT = totRow.getLong(0)
    val nAll = totRow.getLong(1)
    val nF = nAll - nT
    val pres = Similarity.spread(base)
      .select(col("__doc"), col("__t"),
        explode(TextFunctions.tokens(col("__text"))).as("token"))
      .distinct()
    val a = col("__a").cast("double")
    val b = col("__b").cast("double")
    val c = (lit(nT) - col("__a")).cast("double")
    val d = (lit(nF) - col("__b")).cast("double")
    val num = (a * d) - (b * c)
    val denom = ((a + b) * (c + d)) * ((a + c) * (b + d))
    pres.groupBy("token")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__a"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__b"))
      .filter(col("__a") + col("__b") >= minDf)
      .select(col("token"), col("__a").as("df_target"),
        col("__b").as("df_rest"),
        SafeMath.roundHalfUp(
          when(denom === 0.0, 0.0)
            .otherwise((lit(nAll.toDouble) * (num * num)) / denom),
          scale).as("chi2"))
      .orderBy(col("chi2").desc, col("token").asc)
      .limit(topK)
  }
}
