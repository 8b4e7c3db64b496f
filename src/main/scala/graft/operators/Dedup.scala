package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** WITHIN-document repeated-span removal — the intra-doc counterpart of
    * the cross-doc dedup family (boilerplate headers, templated
    * paragraphs, copy-pasted runs repeated inside ONE document inflate
    * token counts and teach models to loop). A token is dropped when it
    * is covered by any n-gram occurrence that is NOT the first occurrence
    * of that n-gram within its document; the first occurrence always
    * survives (a span starting at position 0 can never be a repeat, so no
    * document empties out).
    *
    * Scale shape: per-position n-grams explode to (doc, pos, gram) rows
    * and the duplicate test is a min-window over (doc, gram) — O(tokens)
    * rows shuffled, never the O(len²) per-document array scan a naive
    * in-row formulation pays on long documents. The tokenized base is
    * localCheckpoint'd so the text is tokenized once for the gram pass,
    * the token pass, and the rebuild. Output: (doc, n_tokens, n_kept,
    * cleaned) — cleaned text reassembled from surviving tokens in
    * position order. */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(col(idCol).as("doc"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("nt", size(col("toks")))
      .localCheckpoint()
    // gram list bound in its OWN select below the explode (the
    // ExtractGenerator discipline: never an expensive expr beside a
    // generator)
    val grams = base
      .withColumn("g", when(col("nt") < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), col("nt") - n),
          i => concat_ws("\u0001", slice(col("toks"), i + 1, lit(n))))))
      .select(col("doc"), posexplode(col("g")).as(Seq("i", "gram")))
    val dup = grams
      .withColumn("mi",
        min(col("i")).over(Window.partitionBy(col("doc"), col("gram"))))
      .filter(col("i") > col("mi"))
    val covered = dup.select(col("doc"),
      explode(sequence(col("i"), col("i") + n - 1)).as("t")).distinct()
    val kept = base
      .select(col("doc"), col("nt").cast("long").as("nt"),
        posexplode(col("toks")).as(Seq("t", "tok")))
      .join(covered, Seq("doc", "t"), "left_anti")
    kept.groupBy(col("doc"))
      .agg(max(col("nt")).as("n_tokens"), count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("t"), col("tok")))),
          p => p.getField("tok"))).as("cleaned"))
      .withColumnRenamed("doc", idCol)
  }

  /** Cross-document duplicated-SPAN statistics — the per-document signal
    * behind exact-substring dedup (the "ExactSubstr" pass of Lee et al.
    * 2022, realized as a distributed window-fingerprint sweep instead of
    * a monolithic suffix array): a run of `n` consecutive tokens whose
    * n-gram occurs in at least `minDocs` DISTINCT documents is
    * "duplicated", and a document's duplicated fraction is the share of
    * its token positions covered by at least one duplicated run. The
    * cross-doc complement of [[removeRepeatedSpans]] (intra-doc) and the
    * positional refinement of [[duplicatePassages]] (which reports pairs,
    * not per-doc coverage).
    *
    * Scale shape: per-position n-grams come from the codegen'd
    * WordShingles byte scan and are hashed to 60-bit keys IN-ROW
    * (md5Key60) so the shuffle ships (doc, pos, key), never gram text;
    * the duplicated-key set is one partial-aggregated distinct-count per
    * key, and membership flows back as a semi-join on the key over the
    * persisted gram frame (shingle + hash runs once). Coverage is
    * merged per document with a gaps-and-islands window — partitioned by
    * doc, bounded by document length — instead of exploding every
    * duplicated window into its n positions and distinct-ing: shuffled
    * rows stay O(dup windows), not O(n · dup windows). Runs merge on
    * overlap AND on touch (a window starting exactly where prior
    * coverage ends extends the same island), so dup_spans is the count
    * of maximal contiguous covered runs. Output per doc:
    * (n_tokens, dup_windows, dup_spans, dup_tokens) where dup_tokens is
    * the runs' total token coverage. */
  def crossDocSpanStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame =
    crossDocSpanStatsPlan(docs, idCol, textCol, n, minDocs).localCheckpoint()

  /** Lazy [[crossDocSpanStats]] plan (pre-checkpoint) — the plan-book
    * seam. */
  private[graft] def crossDocSpanStatsPlan(docs: DataFrame, idCol: String,
      textCol: String, n: Int, minDocs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spread: the source parquet often has very few splits, and the
    // tokenize/shingle/md5 work below is CPU-dense — without the widen
    // it serializes onto those splits (q229's profile: 2 tasks at ~1
    // cpu-second each while 30 cores idled)
    val src = Similarity.spread(
      docs.select(col(idCol).as("doc"), col(textCol).as("text")))
    val base = src
      .select(col("doc"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("nt", size(col("toks")))
    // EAGER checkpoint: the gram frame feeds two consumers (the
    // duplicated-key aggregate and the membership join). The previous
    // lazy MEMORY_AND_DISK persist did NOT dodge the double compute —
    // AQE materializes independent shuffle stages CONCURRENTLY, so both
    // consumer map stages cache-missed and re-ran the CPU-dense
    // tokenize+shingle+md5 pass in parallel (r13 profile: two ~7
    // cpu-second stages each reading the 3.5 MB base). A shared
    // repartition(gk) exchange was tried and REJECTED: Catalyst pushes
    // the semi-join below RepartitionByExpression on one leg and melts
    // the other into the aggregate's own exchange, so the subtrees stop
    // being canonically identical and the gram pass still ran twice,
    // plus a pointless extra shuffle. localCheckpoint materializes the
    // pass ONCE, serially, before either consumer plans.
    val grams = hashedGrams(src, n).localCheckpoint()
    val dupKeys = grams.groupBy("gk")
      .agg(countDistinct(col("doc")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("gk")
    val w = Window.partitionBy(col("doc")).orderBy(col("i"))
    val islands = grams.join(dupKeys, Seq("gk"), "left_semi")
      .withColumn("pmax", max(col("i") + n)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ns",
        when(col("pmax").isNull || col("i") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("ns")).over(w))
    val perDoc = islands
      .groupBy(col("doc"), col("isl"))
      .agg(count(lit(1)).as("nw"),
        (max(col("i")) + n - min(col("i"))).cast("long").as("cov"))
      .groupBy(col("doc"))
      .agg(sum(col("nw")).as("dup_windows"), count(lit(1)).as("dup_spans"),
        sum(col("cov")).as("dup_tokens"))
    base
      .select(col("doc"), col("nt").cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** Hashed per-position n-gram frame (doc, i, gk) over a (doc, text)
    * source. Grams come from the codegen'd [[graft.expressions.WordShingles]]
    * byte scan (bit-identical to the interpreted `transform` + `slice` +
    * `concat_ws` chain it replaced — the chain walked an interpreted
    * closure per position and dominated the q228 bench at ~9.5 s; the
    * native scan runs inside whole-stage codegen), hashed before
    * anything shuffles. Space-joined: tokens are whitespace-free by
    * construction, so the join is unambiguous and the oracle hashes the
    * identical string. */
  private def hashedGrams(src: DataFrame, n: Int): DataFrame =
    src
      .select(col("doc"),
        posexplode(TextFunctions.shingles(col("text"), n))
          .as(Seq("i", "gram")))
      .select(col("doc"), col("i"),
        TextFunctions.md5Key60(col("gram")).as("gk"))

  /** Cross-document span REMOVAL — the apply side of
    * [[crossDocSpanStats]], with Lee et al. 2022 keep-one semantics: for
    * each n-gram duplicated across >= `minDocs` distinct documents the
    * globally FIRST occurrence survives (min (doc, pos), compared as the
    * single integer doc·2²⁰+pos, so election is one aggregate — callers
    * need doc ids in [0, 2⁴³) and positions < 2²⁰, ENFORCED by a cheap
    * bounds aggregate over the checkpointed base that fails loudly
    * instead of silently mis-electing); every other occurrence
    * marks its n token positions for removal, and documents are rebuilt
    * from surviving tokens in position order. A verbatim copy shrinks
    * toward empty while its canonical keeps the text; intra-doc repeats
    * of a cross-doc-duplicated gram collapse too. Boundary caveat
    * (inherent to positional span removal, not a bug): when two
    * different duplicated grams overlap, a token inside a FIRST
    * occurrence of one gram can still drop because a NON-first
    * occurrence of the other gram covers the same position — so "keep
    * one copy" holds per removed occurrence, not as a global guarantee
    * that every duplicated span survives verbatim somewhere.
    *
    * Scale shape: the same hashed (doc, pos, key) gram frame as the
    * stats pass (persisted — tokenize + hash once); first-occurrence
    * election is one partial-aggregated min per key; only DUP
    * occurrences explode to their n covered positions before the
    * anti-join against the positional token frame, so the wide explode
    * is O(n · dup windows), never O(n · all windows). Output per doc:
    * (n_tokens, n_kept, cleaned) — empty-out documents kept with
    * n_kept = 0. */
  def removeCrossDocSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame =
    removeCrossDocSpansPlan(docs, idCol, textCol, n, minDocs)
      .localCheckpoint()

  /** Lazy [[removeCrossDocSpans]] plan (pre-checkpoint) — the plan-book
    * seam. The tokenized base is still materialized eagerly (it feeds
    * the packing-bounds guard). */
  private[graft] def removeCrossDocSpansPlan(docs: DataFrame, idCol: String,
      textCol: String, n: Int, minDocs: Int): DataFrame = {
    // spread before the CPU-dense tokenize/shingle passes (see
    // crossDocSpanStatsPlan)
    val src = Similarity.spread(
      docs.select(col(idCol).as("doc"), col(textCol).as("text")))
    val base = src
      .select(col("doc"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("nt", size(col("toks")))
      .localCheckpoint()
    // the (doc, pos) election below packs into doc·2²⁰ + pos — a doc
    // longer than ~1M tokens or an out-of-range id would CORRUPT the
    // min silently (wrong spans removed, hash gates can't see it at
    // small SF). One scalar aggregate over the checkpointed base makes
    // that a loud failure instead.
    val bounds = base.agg(
      coalesce(max(col("nt")), lit(0)).as("maxNt"),
      coalesce(min(col("doc").cast("long")), lit(0L)).as("minDoc"),
      coalesce(max(col("doc").cast("long")), lit(0L)).as("maxDoc")).head()
    require(bounds.getInt(0).toLong - n < (1L << 20),
      s"removeCrossDocSpans: longest document has ${bounds.getInt(0)} " +
        s"tokens; positions must stay < 2^20 for the (doc, pos) packing " +
        s"(chunk documents first, e.g. Curation doc chunking)")
    require(bounds.getLong(1) >= 0L && bounds.getLong(2) < (1L << 43),
      s"removeCrossDocSpans: doc ids must be in [0, 2^43), got " +
        s"[${bounds.getLong(1)}, ${bounds.getLong(2)}]")
    // eager checkpoint: one gram pass feeds the first-occurrence
    // aggregate AND the dup-occurrence join — see crossDocSpanStatsPlan
    // for the measured rationale (AQE materializes both consumers of a
    // lazily-persisted frame concurrently, so the gram pass ran twice)
    val grams = hashedGrams(src, n).localCheckpoint()
    val firsts = grams.groupBy("gk")
      .agg(countDistinct(col("doc")).as("nd"),
        min(col("doc") * lit(1048576L) + col("i")).as("fk"))
      .filter(col("nd") >= minDocs)
      .select(col("gk"), col("fk"))
    val dupOcc = grams.join(firsts, Seq("gk"))
      .filter(col("doc") * lit(1048576L) + col("i") =!= col("fk"))
    val covered = dupOcc.select(col("doc"),
      explode(sequence(col("i"), col("i") + n - 1)).as("t")).distinct()
    val kept = base
      .select(col("doc"), posexplode(col("toks")).as(Seq("t", "tok")))
      .join(covered, Seq("doc", "t"), "left_anti")
    val agg = kept.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("t"), col("tok")))),
          p => p.getField("tok"))).as("cleaned"))
    base
      .select(col("doc"), col("nt").cast("long").as("n_tokens"))
      .join(agg, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Exact duplicate groups: canonical id = min doc id per fingerprint.
    * Input needs (idCol, textCol); output one row per duplicated content. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Incremental corpus-ingestion dedup — the standing-pipeline shape of
    * exact dedup: drop incoming rows whose content fingerprint already
    * exists in the corpus, and collapse in-batch duplicates to the
    * min-id row. The existing side ships ONLY distinct fingerprints
    * (16 bytes/doc, not text) into an anti-join; in production keep that
    * index persisted bucketed by fingerprint so each day's batch
    * anti-joins without reshuffling the accumulated corpus. The in-batch
    * cut is a row_number window (never a wide dropDuplicates). */
  def incrementalIngest(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fpOld = existing
      .select(TextFunctions.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    val inCols = incoming.columns.toSeq
    incoming
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(fpOld, Seq("__fp"), "left_anti")
      .select(inCols.map(col): _*)
  }

  /** Edit-distance-1 pairs via DELETION-NEIGHBORHOOD blocking (the
    * SymSpell trick): two strings within one edit share at least one
    * single-character-deletion variant, so indexing each string under
    * itself + its |s| deletions turns the fuzzy match into an equi-join
    * — O(n·len) index rows instead of an O(n²) cross product, with
    * block fan-out bounded by alphabet × positions. Candidates are then
    * verified with exact `levenshtein` (integer DP — engine-identical,
    * so the gate hashes). The entity-resolution workhorse. */
  def editOnePairs(df: DataFrame, strCol: String): DataFrame = {
    val variants = TextFunctions.bindOnce(col("name")) { s =>
      concat(array(s),
        when(length(s) === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(s)), i =>
            concat(s.substr(lit(1), i - 1),
              s.substr(i + 1, length(s) - i)))))
    }
    val names = df.select(col(strCol).as("name")).distinct()
    val idx = names.select(col("name"), explode(variants).as("v"))
      .localCheckpoint()
    idx.as("a").join(idx.as("b"),
        col("a.v") === col("b.v") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
  }

  /** Per-source dedup report card — the summary a curation run publishes:
    * row count, distinct contents, duplicated rows (rows beyond each
    * fingerprint's first), and the dup rate. One fingerprint-keyed
    * aggregation per source (map-side combined); no pair generation at
    * all — this is the cheap "how redundant is each feed" monitor that
    * decides where the expensive near-dup passes get pointed. */
  def dedupReport(docs: DataFrame, sourceCol: String, textCol: String,
      scale: Int = 4): DataFrame = {
    import graft.functions.SafeMath
    val fp = docs.select(col(sourceCol).as("source"),
        TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy("source", "fp").agg(count(lit(1)).as("n"))
    fp.groupBy("source").agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(col("n") - 1).as("n_dup_rows"))
      .select(col("source"), col("n_rows"), col("n_distinct"),
        col("n_dup_rows"),
        SafeMath.roundHalfUp(
          col("n_dup_rows").cast("double") / col("n_rows").cast("double"),
          scale).as("dup_rate"))
  }

  /** Source-pair shingle-overlap matrix — corpus-composition analysis:
    * how much does each pair of sources share, as Jaccard over their
    * DISTINCT shingle sets. The per-source shingle sets are one
    * distinct-aggregation (vocab-bounded); the pair join's fan-out is
    * bounded by #sources² per shingle key — NOT document-pair fan-out —
    * so the shape survives any corpus size with a fixed source list.
    * Shingles join on the md5-derived 60-bit key so the oracle
    * reproduces the exact same sets. */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val idx = docs.select(col(sourceCol).as("source"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), k)))
          .as("sh"))
      .select(col("source"), TextFunctions.md5Key60(col("sh")).as("shk"))
      .distinct()
      .localCheckpoint()
    val sizes = idx.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val co = idx.as("x").join(idx.as("y"),
        col("x.shk") === col("y.shk") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sizes.select(col("source").as("src_a"), col("n_sh").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n_sh").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("inter"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
  }

  /** TF-IDF-weighted cosine near-dup pairs — the WEIGHTED complement of
    * [[jaccardPairs]]: rare shared terms count for more, boilerplate for
    * less. Same scale skeleton (df-capped posting lists, x.doc < y.doc
    * pair aggregation — never all-pairs), but the intersection
    * accumulates w_a·w_b products instead of 1s. Cross-engine: weights
    * are ln-based, so each is roundHalfUp'd at scale 4 and carried as
    * DECIMAL(18,4) (squares must stay under DuckDB's 10^18
    * unscaled-product bound at any corpus size); dots and norms are
    * exact decimal sums; the final
    * cosine divides by sqrt (exactly rounded per IEEE 754, unlike ln),
    * so the whole pipeline hash-gates. Terms are word `k`-shingles
    * (k=1 → unigrams); terms with df=1 can't pair and are dropped with
    * the > dfCap cut. */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 1, threshold: Double = 0.3, dfCap: Int = 50,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    // ONE corpus scan: tf is eagerly checkpointed (tokenizing is cheap
    // since WordShingles went codegen, so one materializing pass beats
    // the persist-and-populate dance it replaces), and the nDocs action
    // (the IDF numerator), the df frame, and the weighted join all read
    // the checkpoint. Terms are keyed by xxhash64, not string — the
    // shuffles and the dots self-join below then compare 8-byte longs
    // (the shingleIndex collision contract: a collision only merges two
    // terms' df, ~n²/2^65). A separate docs.count() would re-scan the
    // text for a single long; N = #docs with at least one term — docs
    // too short to shingle can't pair anyway, and this keeps N
    // derivable from tf on any engine. spread() first: the
    // tokenize+explode map side is the CPU-dense step and a small
    // corpus arrives as 1-2 parquet splits (no-op on a multi-split
    // cluster read).
    val tf = Similarity.spread(
        docs.select(col(idCol).as("doc"), col(textCol).as("__text")))
      .select(col("doc"),
        explode(TextFunctions.shingles(col("__text"), k)).as("tok_str"))
      .select(col("doc"), xxhash64(col("tok_str")).as("tok"))
      .groupBy("doc", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val nDocs =
      tf.agg(countDistinct(col("doc")).as("n")).collect()(0).getLong(0)
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
    val weighted = tf.join(df, "tok")
      .select(col("doc"), col("tok"),
        SafeMath.roundHalfUp(
            col("tf").cast("double") *
              log(lit(nDocs.toDouble) / col("df").cast("double")), 4)
          .cast(DecimalType(18, 4)).as("w"))
      .localCheckpoint()
    tf.unpersist(blocking = false)
    // materialized ONCE: the two legs need different distributions (a
    // broadcast and a shuffle partner), so alias-identical subplans
    // still computed norms twice (the q30 pairStats finding — measured
    // in the plan book, not hypothesized)
    val norms = weighted.groupBy("doc")
      .agg(sum(col("w") * col("w")).as("n2"))
      .localCheckpoint()
    val dots = weighted.as("x").join(weighted.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .agg(sum(col("x.w") * col("y.w")).as("dot"))
    dots
      .join(norms.as("__na"), col("doc_a") === col("__na.doc"))
      .join(norms.as("__nb"), col("doc_b") === col("__nb.doc"))
      .select(col("doc_a"), col("doc_b"),
        SafeMath.roundHalfUp(
          col("dot").cast("double") /
            sqrt(col("__na.n2").cast("double") * col("__nb.n2").cast("double")),
          scale).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Distinct (id, shingle-hash) pairs — the inverted-index rows. Shingles
    * are joined by xxhash64, not by string: the shuffle ships 8-byte keys
    * instead of ~40-byte text, and the join is a long-compare. Collision
    * probability over even 10^9 distinct shingles is ~where
    * n²/2^65 ≈ 3% — and a collision only inflates one intersection count
    * by 1; for exact-exact guarantees join the strings.
    *
    * Per-doc set semantics come from `array_distinct` BEFORE the explode
    * — a per-row O(shingles) pass — not from a `.distinct()` of the
    * exploded frame, which was a full shuffle of the largest intermediate
    * in the dedup family (measured ~2 s of the 5 s jaccardPairs at
    * sf0.1; at corpus scale it's a shuffle of Σ|shingles| rows). */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    // spread() before tokenizing: a small corpus arrives as 1-2 parquet
    // splits and shingling is the CPU-dense step — without the widening
    // round-robin (a no-op on any multi-split cluster read) the whole
    // scan runs on as many cores as there are files
    Similarity.spread(docs.select(col(idCol).as("doc"), col(textCol).as("__text")))
      .select(col("doc"),
        explode(array_distinct(TextFunctions.shingles(col("__text"), k)))
          .as("sh_str"))
      .select(col("doc"), xxhash64(col("sh_str")).as("sh"))

  /** Exact n-gram Jaccard similar pairs (a < b, jaccard ≥ threshold) over
    * the df-capped shingle universe: shingles appearing in more than
    * `dfCap` documents are dropped (from the pair generation AND the
    * per-doc set sizes, so the Jaccard stays internally consistent).
    * Without the cap the candidate volume scales with Σ per-shingle df² —
    * one stop-phrase trigram shared by 10^6 docs makes 10^12 candidate
    * rows at corpus scale. With it, the volume is bounded by
    * |shingles| × dfCap².
    *
    * Materialization contract: the grouped posting lists are persisted
    * for the duration of the call (they feed both the sizes and the
    * pairs), the small result is materialized with localCheckpoint, and
    * the intermediate is unpersisted before returning — nothing stays
    * pinned in the block manager afterwards. */
  /** Containment near-dup pairs: `inter / min(|A|,|B|)` instead of
    * Jaccard — catches the small-inside-big cases Jaccard misses by
    * construction (a quoted article inside a long page has tiny Jaccard
    * but containment ≈ 1). Same one-shuffle df-capped posting-list plan
    * as [[jaccardPairs]]; only the final metric differs. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.9, dfCap: Int = 100): DataFrame =
    pairStats(docs, idCol, textCol, k, dfCap) { stats =>
      stats
        .withColumn("containment",
          col("inter").cast("double") / least(col("n_a"), col("n_b")))
        .filter(col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    }

  /** Shared guts of [[jaccardPairs]] / [[containmentPairs]]: candidate
    * pairs with (inter, n_a, n_b) set statistics, passed through `finish`
    * (metric + threshold filter) BEFORE the materializing checkpoint — so
    * only the small surviving pair set is ever written, not the full
    * candidate frame. ONE shuffle groups the inverted index by shingle;
    * the df-cap is a per-row size() filter on the grouped frame, and
    * candidate pairs are generated IN-ROW from each posting list (O(df²)
    * per shingle, bounded by the cap) — no index self-join, no
    * hot-shingle anti-join. */
  private def pairStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int, dfCap: Int)(finish: DataFrame => DataFrame): DataFrame = {
    val (out, pinned) = pairStatsPlan(docs, idCol, textCol, k, dfCap)(finish)
    try out.localCheckpoint()
    finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** Lazy plan behind [[pairStats]] (pre-checkpoint), with the persisted
    * posting-list frame for the caller to unpersist — the plan-book seam
    * (graft.Explain) and the shape the docs above describe. */
  private[graft] def pairStatsPlan(docs: DataFrame, idCol: String,
      textCol: String, k: Int, dfCap: Int)(
      finish: DataFrame => DataFrame): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.storage.StorageLevel
    val byShingle = shingleIndex(docs, idCol, textCol, k)
      .groupBy("sh").agg(collect_list("doc").as("docs"))
      .filter(size(col("docs")) <= dfCap)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // materialized ONCE: the two stats joins need DIFFERENT
      // distributions of this frame (a shuffle partner for doc_a, a
      // broadcast for doc_b), so ReuseExchange can never kick in and
      // the explode+count over the posting cache ran twice (q30 plan)
      val sizes = byShingle.select(explode(col("docs")).as("doc"))
        .groupBy("doc").agg(count(lit(1)).as("n_sh"))
        .localCheckpoint()
      // in-row pair generation via two stacked generators (posexplode,
      // then explode of the positional tail slice) + least/greatest for
      // the canonical (doc_a < doc_b) order — every expression here is
      // codegen'd. The previous transform/filter/struct HOF chain built
      // the same pairs interpreted at ~10µs/pair (HOF lambdas run
      // outside codegen). Positional pairing emits each unordered
      // in-list pair exactly once, same as the value-ordered form
      // (posting lists are distinct by construction).
      val co = byShingle.filter(size(col("docs")) >= 2)
        .select(col("docs"), posexplode(col("docs")).as(Seq("__i", "__a")))
        .select(col("__a"),
          explode(slice(col("docs"), col("__i") + lit(2),
            size(col("docs")) - col("__i") - lit(1))).as("__b"))
        .groupBy(least(col("__a"), col("__b")).as("doc_a"),
          greatest(col("__a"), col("__b")).as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      // both legs reference the IDENTICAL `sizes` subplan (aliased, not
      // column-renamed): per-leg renames made the subplans distinct and
      // defeated ReuseExchange, computing sizes twice — with plain
      // aliases the planner builds ONE exchange and reuses it
      val stats = co
        .join(sizes.as("__sa"), col("doc_a") === col("__sa.doc"))
        .join(sizes.as("__sb"), col("doc_b") === col("__sb.doc"))
        .select(col("doc_a"), col("doc_b"), col("inter"),
          col("__sa.n_sh").as("n_a"), col("__sb.n_sh").as("n_b"))
      (finish(stats), Seq(byShingle, sizes))
    } catch { case e: Throwable => byShingle.unpersist(); throw e }
  }

  private def jaccardFinish(threshold: Double)(stats: DataFrame): DataFrame =
    stats
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8, dfCap: Int = 100): DataFrame =
    pairStats(docs, idCol, textCol, k, dfCap)(jaccardFinish(threshold))

  /** Lazy [[jaccardPairs]] plan (pre-checkpoint) + its posting-list cache —
    * the plan-book seam. */
  private[graft] def jaccardPairsPlan(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 3, threshold: Double = 0.8,
      dfCap: Int = 100): (DataFrame, Seq[DataFrame]) =
    pairStatsPlan(docs, idCol, textCol, k, dfCap)(jaccardFinish(threshold))

  /** Duplicate-passage pairs (the exact-substring dedup family): document
    * pairs sharing at least `minRun` CONSECUTIVE word k-shingles — a
    * common word substring of length ≥ k + minRun − 1 — with the length
    * of the longest shared run. Catches partial-copy contamination
    * (quotes, mirrored paragraphs, licence blocks) that whole-document
    * Jaccard dilutes away on long documents.
    *
    * Plan shape at 100 TB: one shuffle groups the POSITIONAL shingle
    * index by shingle hash; posting lists above `dfCap` occurrences are
    * dropped (boilerplate shingles would otherwise generate df² pairs),
    * so match volume is bounded by |shingles| × dfCap²; occurrence pairs
    * are generated in-row from each list. Run detection is the island
    * trick — within (a, b, offset-difference), consecutive positions
    * share one island id — a window keyed by the document pair, so it
    * parallelizes across pairs. */
  def duplicatePassages(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minRun: Int = 3, dfCap: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = docs.select(col(idCol).as("doc"),
        posexplode(TextFunctions.shingles(col(textCol), k))
          .as(Seq("pos", "sh_str")))
      .select(col("doc"), col("pos"),
        TextFunctions.md5Key60(col("sh_str")).as("shk"))
    val byShingle = idx.groupBy("shk")
      .agg(collect_list(struct(col("doc"), col("pos"))).as("posts"))
      .filter(size(col("posts")).between(2, dfCap))
    val matches = byShingle.select(
        explode(flatten(transform(col("posts"), a =>
          transform(
            filter(col("posts"), b => b.getField("doc") > a.getField("doc")),
            b => struct(
              a.getField("doc").as("doc_a"), a.getField("pos").as("pos_a"),
              b.getField("doc").as("doc_b"), b.getField("pos").as("pos_b"))))))
          .as("m"))
      .select(col("m.doc_a").as("doc_a"), col("m.pos_a").as("pos_a"),
        col("m.doc_b").as("doc_b"),
        (col("m.pos_b") - col("m.pos_a")).as("diff"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diff"))
      .orderBy(col("pos_a"))
    matches
      .withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diff", "__isl")
      .agg(count(lit(1)).as("run"))
      .groupBy("doc_a", "doc_b")
      .agg(max(col("run")).as("max_run"))
      .filter(col("max_run") >= minRun)
      .select(col("doc_a"), col("doc_b"), col("max_run"),
        (col("max_run") + (k - 1)).as("shared_words"))
  }

  /** Prime modulus and per-seed affine coefficients for the MinHash
    * family h_i(x) = (a_i * x + b_i) mod P over 31-bit keys. All values
    * stay below 2^62 so the arithmetic is overflow-free in any engine's
    * BIGINT — the whole family is therefore exactly reproducible in the
    * DuckDB oracle (unlike xxhash64, which only Spark computes). */
  private[graft] val MinhashP = 2147483647L // 2^31 - 1
  private[graft] def mhA(i: Int): Long =
    (scala.util.hashing.MurmurHash3.productHash(("mh-a", i)).toLong
      & 0x7fffffffL) % (MinhashP - 1) + 1
  private[graft] def mhB(i: Int): Long =
    (scala.util.hashing.MurmurHash3.productHash(("mh-b", i)).toLong
      & 0x7fffffffL) % MinhashP
  private[graft] val BandM = 1000003L // band-fold multiplier

  /** MinHash signature: sig[i] = min over shingles of
    * (a_i * key(shingle) + b_i) mod P, key = md5-derived 31-bit integer.
    * Returns array<long> of length numHashes.
    *
    * Computed as ONE fold over the shingle array producing all minima at
    * once — the naive `array(array_min(transform(sh, ...)), ...)` form
    * embeds the shingle computation once per hash index, and Catalyst's
    * projection collapse then re-inlines that whole tree at every
    * downstream reference (16 hashes × 3 references = 48 tokenizations
    * per row — measured 350+ s at sf0.1 vs <2 s for this form). */
  def minhashSignature(text: Column, numHashes: Int, k: Int = 3): Column = {
    // emptiness is gated on the cheap token count — guarding on
    // size(shingles) or size(keys) would force the expensive subtree to
    // evaluate twice per row (the projection-collapse trap). The min
    // fold itself is the codegen'd MinhashSig expression (the HOF form
    // interpretedly zipped a numHashes-element array per shingle).
    when(size(TextFunctions.tokens(text)) < k, array().cast("array<bigint>"))
      .otherwise(graft.expressions.MinhashSig.minhash_sig(
        transform(TextFunctions.shingles(text, k),
          s => TextFunctions.md5Key60(s) % MinhashP),
        numHashes))
  }

  /** LSH candidate pairs + exact-Jaccard verification.
    * bands × rowsPerBand = numHashes; docs sharing any band-hash become
    * candidates. The band join shuffles (bandId, bandHash) keys only.
    *
    * SINGLE corpus scan: one projection tokenizes each document once and
    * emits BOTH per-shingle key arrays — xxhash64 (8-byte inverted-index
    * keys for the verification joins) and the md5-derived 31-bit minhash
    * keys — into a persisted frame; signatures, the shingle index, and
    * the per-doc set sizes are all cheap derivations of that cache, so
    * the document text is read and shingled exactly once (the previous
    * form re-scanned and re-tokenized the corpus for verification — two
    * full passes over 100 TB of text). The doc-size frame is now a
    * per-row `size(keys)` projection instead of a count-by-doc shuffle.
    *
    * The band self-join is CAPPED: a boilerplate document duplicated 10⁶
    * times puts 10⁶ rows in one (band, bh) bucket and the uncapped join
    * would emit ~10¹² candidates there. Buckets over `maxBandBucket` are
    * sub-split by a secondary id hash ([[embeddingNearDupsLshPlan]]'s
    * census + sub-split, on the band side), bounding candidates at
    * O(maxBandBucket · n). Recall cost is nil for exact duplicates — one
    * band bucket holding thousands of docs means identical signatures,
    * and identical TEXT is caught by the cheaper [[exactGroups]] pass
    * that always runs first; genuinely distinct near-dups in a hot
    * bucket survive cross-cell loss with probability 1/cells, and a hot
    * bucket is a dense region where [[Similarity.semDedup]]-style
    * clustering is the documented path. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, k: Int = 3,
      threshold: Double = 0.8, maxBandBucket: Int = 2000): DataFrame = {
    val parts = minhashLshParts(docs, idCol, textCol, numHashes, bands, k,
      threshold, maxBandBucket)
    try parts.out.localCheckpoint()
    finally parts.caches.foreach(_.unpersist(blocking = false))
  }

  /** Lazy pieces of [[minhashLsh]], pre-checkpoint: the verified-pair
    * plan, the candidate-pair plan (for bounded-volume assertions), and
    * the persisted caches the caller must unpersist. */
  private[graft] case class LshParts(out: DataFrame, candidates: DataFrame,
    caches: Seq[DataFrame])

  /** One side's minhash projections — the single corpus scan shared by
    * the self-join ([[minhashLshParts]]) and the incremental ingest
    * ([[minhashLshIngest]]): `raw` (the persisted scan; unpersist it),
    * `base` (doc, shs, keys) and `banded` (doc, band, bh; persisted). */
  private[graft] case class LshSide(raw: DataFrame, base: DataFrame,
    banded: DataFrame) {
    def caches: Seq[DataFrame] = Seq(raw, banded)
  }

  /** Single-scan projection: per doc, BOTH per-shingle key arrays —
    * xxhash64 (8-byte inverted-index keys for the verification joins)
    * and the md5-derived 31-bit minhash keys — under ONE bindOnce so the
    * shingle subtree exists once; the struct is materialized by the
    * persist, and the field extractions read the cache (no
    * projection-collapse re-inline across the cache boundary). Band key:
    * overflow-free arithmetic fold of the band's signature slice (init
    * b+1 so identical slices in different bands collide only by chance)
    * — 8-byte join keys the oracle reproduces exactly. posexplode AFTER
    * a projection of sig: projection collapse would otherwise inline the
    * signature computation into BOTH join sides. */
  private def lshSide(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, k: Int): LshSide = {
    import org.apache.spark.storage.StorageLevel
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val raw = docs.select(col(idCol).as("doc"),
        TextFunctions.bindOnce(
          array_distinct(TextFunctions.shingles(col(textCol), k))) { ss =>
          struct(
            transform(ss, s => xxhash64(s)).as("shs"),
            transform(ss, s => TextFunctions.md5Key60(s) % MinhashP).as("keys"))
        }.as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = raw.select(col("doc"), col("b.shs").as("shs"),
      col("b.keys").as("keys"))
    val sig = base.filter(size(col("keys")) > 0)
      .select(col("doc"),
        graft.expressions.MinhashSig.minhash_sig(col("keys"), numHashes)
          .as("sig"))
    val banded = sig.select(col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          aggregate(slice(col("sig"), b * rows + 1, lit(rows)),
            (b + 1).cast("long"),
            (acc, x) => (acc * lit(BandM) + x) % lit(MinhashP)).as("bh")))))
      .select(col("doc"), col("col.band").as("band"), col("col.bh").as("bh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    LshSide(raw, base, banded)
  }

  /** Hot band-bucket census over one or more banded frames: (band, bh)
    * buckets holding more than `maxBandBucket` rows, mapped to their
    * sub-cell count. Reads already-persisted frames (map-side-combined
    * counts); only over-cap buckets reach the driver — at most
    * bands·n/maxBandBucket rows by construction. bh < P, so band·P + bh
    * is a collision-free 38-bit map key. */
  private def hotBandBuckets(bandedFrames: Seq[DataFrame],
      maxBandBucket: Int): Map[Long, Int] =
    bandedFrames.map(_.select(col("band"), col("bh"))).reduce(_.unionAll(_))
      .groupBy("band", "bh")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBandBucket)
      .collect() // over-full buckets only: ≤ bands·n/maxBandBucket rows
      .map(r => (r.getInt(0).toLong * MinhashP + r.getLong(1)) ->
        ((r.getLong(2) + maxBandBucket - 1) / maxBandBucket).toInt)
      .toMap

  /** Size of the LARGEST (band, bh) bucket a corpus produces — the
    * oracle-divergence guard's observable: the hot-bucket cap
    * (`maxBandBucket`) is NOT modeled in the q31/q215/q218 oracle SQL,
    * so a gate corpus whose largest bucket ever exceeds the cap would
    * silently drop cross-cell candidate pairs the uncapped oracle
    * keeps. Specs assert this stays under the cap at every gate SF so
    * a future data/SF change fails LOUDLY instead of as an opaque hash
    * mismatch. One banded scan, one map-side-combined max. */
  private[graft] def maxBandBucketSize(docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int, bands: Int, k: Int): Long = {
    val side = lshSide(docs, idCol, textCol, numHashes, bands, k)
    try {
      val r = side.banded.groupBy("band", "bh")
        .agg(count(lit(1)).as("__n"))
        .agg(coalesce(max(col("__n")), lit(0L)).as("mx")).head()
      r.getLong(0)
    } finally side.caches.foreach(_.unpersist(blocking = false))
  }

  /** Attach the sub-cell id for over-cap buckets (1 cell → constant 0
    * for the rest); no-op plan when the census is empty. */
  private def subSplit(banded: DataFrame, hot: Map[Long, Int]): DataFrame =
    if (hot.isEmpty) banded
    else banded.withColumn("__sub",
      pmod(xxhash64(col("doc")),
        coalesce(element_at(typedLit(hot),
          col("band").cast("long") * MinhashP + col("bh")), lit(1))))

  /** Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    * against the cached shingle-key indexes — no second corpus scan. The
    * candidate side of each join is small → AQE broadcasts it into the
    * cached index. Intersection via composite-key join (doc_b, sh): the
    * second join matches shingles IN the join instead of exploding
    * |A|×|B| rows per candidate pair and filtering afterwards. Both size
    * legs of a same-side verification reference the IDENTICAL aliased
    * subplan so the planner builds ONE exchange and reuses it (the
    * pairStats rule). */
  private def verifyJaccard(candidates: DataFrame, aSide: DataFrame,
      bSide: DataFrame, threshold: Double): DataFrame = {
    val idxA = aSide.select(col("doc").as("doc_a"), explode(col("shs")).as("sh"))
    val idxB = bSide.select(col("doc").as("doc_b"), explode(col("shs")).as("sh"))
    val sizesA = aSide.select(col("doc"), size(col("shs")).as("n_sh"))
    val sizesB = bSide.select(col("doc"), size(col("shs")).as("n_sh"))
    val inter = candidates
      .join(idxA, "doc_a")
      .join(idxB, Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizesA.as("__sa"), col("doc_a") === col("__sa.doc"))
      .join(sizesB.as("__sb"), col("doc_b") === col("__sb.doc"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("__sa.n_sh") + col("__sb.n_sh") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  private[graft] def minhashLshParts(docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int, bands: Int, k: Int,
      threshold: Double, maxBandBucket: Int): LshParts = {
    val side = lshSide(docs, idCol, textCol, numHashes, bands, k)
    // when no bucket is hot (the common case at sane band widths) the
    // plan is bit-identical to the uncapped one: no sub column, no extra
    // join key, same two cache scans
    val hot = hotBandBuckets(Seq(side.banded), maxBandBucket)
    val sided = subSplit(side.banded, hot)
    val joinCond =
      if (hot.isEmpty)
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc") < col("y.doc")
      else col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.__sub") === col("y.__sub") && col("x.doc") < col("y.doc")
    val candidates = sided.as("x").join(sided.as("y"), joinCond)
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    val out = verifyJaccard(candidates, side.base, side.base, threshold)
    LshParts(out, candidates, side.caches)
  }

  /** Day-2 near-dup ingest — the incremental complement of
    * [[minhashLsh]]'s self-join: candidate pairs BETWEEN a new batch and
    * the standing corpus, so a day's ingest never re-pairs the corpus
    * against itself. Each side is one scan producing its banded keys and
    * shingle index; candidates are an equi-join of the two banded frames
    * on (band, bh) — in production keep the corpus side's band index and
    * shingle keys persisted bucketed by (band, bh) / doc, so the probe
    * reads only the buckets the new batch's keys hash into, and appends
    * the new side's projections to the same index afterwards (the
    * [[AnnIndex]] maintenance pattern at the text level). Hot buckets
    * are censused over BOTH sides together and sub-split by id hash —
    * candidate volume is O(maxBandBucket · (n_new + n_old)); a cross-
    * side pair in a hot bucket survives with probability 1/cells, and
    * byte-identical re-sends are [[incrementalIngest]]'s job (run it
    * first), so the recall cost mirrors the self-join cap's. Doc ids
    * must be distinct across the two sides (they are distinct corpora).
    * Output: (doc_new, doc_old, jaccard ≥ threshold). */
  def minhashLshIngest(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 16, bands: Int = 4,
      k: Int = 3, threshold: Double = 0.8,
      maxBandBucket: Int = 2000): DataFrame = {
    val (out, caches) = minhashLshIngestPlan(existing, incoming, idCol,
      textCol, numHashes, bands, k, threshold, maxBandBucket)
    try out.localCheckpoint()
    finally caches.foreach(_.unpersist(blocking = false))
  }

  /** Lazy [[minhashLshIngest]] plan (pre-checkpoint) + its persisted
    * caches — the plan-book seam. */
  private[graft] def minhashLshIngestPlan(existing: DataFrame,
      incoming: DataFrame, idCol: String, textCol: String, numHashes: Int,
      bands: Int, k: Int, threshold: Double,
      maxBandBucket: Int): (DataFrame, Seq[DataFrame]) = {
    val oldSide = lshSide(existing, idCol, textCol, numHashes, bands, k)
    val newSide = lshSide(incoming, idCol, textCol, numHashes, bands, k)
    try {
      val hot = hotBandBuckets(Seq(newSide.banded, oldSide.banded),
        maxBandBucket)
      val joinCond =
        if (hot.isEmpty)
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
        else col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.__sub") === col("y.__sub")
      val candidates = subSplit(newSide.banded, hot).as("x")
        .join(subSplit(oldSide.banded, hot).as("y"), joinCond)
        .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
        .distinct()
      val out = verifyJaccard(candidates, newSide.base, oldSide.base,
          threshold)
        .select(col("doc_a").as("doc_new"), col("doc_b").as("doc_old"),
          col("jaccard"))
      (out, oldSide.caches ++ newSide.caches)
    } catch { case e: Throwable =>
      (oldSide.caches ++ newSide.caches)
        .foreach(_.unpersist(blocking = false))
      throw e
    }
  }

  /** Embedding-cosine near-duplicate pairs, brute force: every (a < b)
    * pair scored. Quadratic — the correctness baseline and the verifier
    * for [[embeddingNearDupsLsh]]; never run this on the full corpus at
    * scale. */
  def embeddingNearDups(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // the non-equi join plans as a broadcast nested loop whose task count
    // is the STREAMED side's partition count — and Spark picks the
    // broadcast side from stats, so spread BOTH sides: whichever one ends
    // up streamed is then wide. A single-split corpus otherwise runs the
    // whole O(n²) loop on one core.
    val a = Similarity.spread(
      vecs.select(col(idCol).as("id_a"), col(vecCol).as("v_a")))
    val b = Similarity.spread(
      vecs.select(col(idCol).as("id_b"), col(vecCol).as("v_b")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosineCols(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Embedding near-dups at scale: random-hyperplane LSH bucket blocking —
    * pairs form only inside a bucket (one shuffle on the bucket id), then
    * exact cosine verification. Near-identical vectors agree on every
    * sign bit, so true near-dups stay in one bucket.
    *
    * In-bucket pair generation is BOUNDED: real embedding corpora
    * cluster, and a popular sign pattern would otherwise degenerate the
    * bucket self-join toward O(n²). Buckets holding more than
    * `maxBucket` vectors are sub-split by a secondary id hash into
    * ⌈n/maxBucket⌉ cells, so total candidate pairs stay
    * O(maxBucket · n) — linear in corpus size — at the cost of missing
    * cross-cell pairs inside a hot bucket (a pair there survives with
    * probability 1/⌈n/maxBucket⌉). A hot bucket IS a dense region;
    * [[Similarity.semDedup]]-style centroid dedup (q97) is the
    * documented path for corpora where that recall loss matters. The
    * mirror of [[jaccardPairs]]' posting-list df-cap, on the vector
    * side. */
  def embeddingNearDupsLsh(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, bits: Int = 12, seed: Int = 42,
      maxBucket: Int = 2000): DataFrame = {
    val (out, bucketed) = embeddingNearDupsLshPlan(
      vecs, idCol, vecCol, dim, threshold, bits, seed, maxBucket)
    try out.localCheckpoint()
    finally bucketed.unpersist(blocking = false)
  }

  /** The lazy plan behind [[embeddingNearDupsLsh]], exposed (with its
    * persisted projection, for the caller to unpersist) so LlmOpsSpec can
    * assert the single-scan shape before checkpoint materialization. The
    * bucketed projection is persisted BEFORE the self-join: without the
    * cache boundary each join side re-reads the corpus and recomputes the
    * bits×dim hyperplane dot products — two full passes at scale (the
    * same shape minhashLsh's shingle cache eliminates). The join then
    * reads the (id, v, bucket) cache twice, scanning the corpus ONCE.
    *
    * The hot-bucket census reads the already-persisted projection (a
    * map-side-combined count per bucket), and only buckets OVER the cap
    * reach the driver — at most n/maxBucket rows by construction, a
    * bounded read like the k-means centroid collect. When no bucket is
    * hot (the common case at sane `bits`) the returned plan is
    * bit-identical to the uncapped one: no sub column, no extra join
    * key, same two cache scans. */
  private[graft] def embeddingNearDupsLshPlan(vecs: DataFrame, idCol: String,
      vecCol: String, dim: Int, threshold: Double, bits: Int,
      seed: Int, maxBucket: Int = 2000): (DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val bucketed = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.lshBucket(col(vecCol), dim, bits, seed).as("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // census of over-full buckets only: bucket → number of sub-cells
    val hot: Map[Long, Int] = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1) + maxBucket - 1) / maxBucket).toInt)
      .toMap
    val sided =
      if (hot.isEmpty) bucketed
      else bucketed.withColumn("__sub",
        pmod(xxhash64(col("id")),
          coalesce(element_at(typedLit(hot), col("bucket")), lit(1))))
    val joinCond =
      if (hot.isEmpty)
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id")
      else col("x.bucket") === col("y.bucket") &&
        col("x.__sub") === col("y.__sub") && col("x.id") < col("y.id")
    val out = sided.as("x").join(sided.as("y"), joinCond)
      .withColumn("cos", Similarity.cosineCols(col("x.v"), col("y.v")))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cos"))
    (out, bucketed)
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
    import org.apache.spark.sql.types.{DecimalType, NumericType}
    val spark = pairs.sparkSession
    val edgesAll = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().cache()
    // Size the iteration to the COUNTED edge set (Adaptive): a near-dup
    // graph is tiny relative to its corpus, and AQE won't coalesce the
    // per-round stages below defaultParallelism, so without this a
    // few-hundred-edge graph pays ~32 near-empty tasks × ~6 stages ×
    // rounds. When the loop runs narrower than the session width, the
    // edge frame is re-materialized at loop width so every round scans
    // `parts` blocks instead of the ambient-width cache.
    val m = edgesAll.count()
    val parts = graft.core.Adaptive.partsFor(spark, m)
    val ambient = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // AQE off for the pinned pointer-jumping loop (the q103 rationale):
    // inputs are checkpoints at the counted width; AQE would only add a
    // job per shuffle stage per round of pure driver floor. (The setup
    // distinct/count above runs OUTSIDE this scope with ambient AQE —
    // a small-coalesce wrapper here would be dead code; review r12.)
    graft.core.Adaptive.withNoAqe(spark) {
    graft.core.Adaptive.withShufflePartitions(spark, parts) {
    val edges =
      if (parts < ambient) {
        val narrow = edgesAll.coalesce(parts).localCheckpoint()
        edgesAll.unpersist(blocking = false)
        narrow
      } else edgesAll
    // init = identity fused with the FIRST propagation hop: min(self,
    // neighbors) costs the same single shuffle the identity-label
    // distinct() did, but starts one round ahead — pair components (the
    // bulk of a near-dup graph) are already converged here.
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("m"))
      .select(col("node"), least(col("node"), col("m")).as("cluster"))
      .localCheckpoint()
    // Convergence probe: labels only ever decrease, so for NUMERIC ids the
    // (exact, overflow-free DECIMAL) sum of all labels strictly decreases
    // until the fixpoint — one scan of the checkpointed frame per round.
    // Non-numeric ids (string doc keys) would cast to NULL and the sum
    // probe would NPE, so those fall back to a changed-row probe: a join
    // of the two checkpointed label frames that short-circuits at the
    // first differing row (isEmpty = limit-1 collect, not a full count).
    val numericIds = labels.schema("cluster").dataType.isInstanceOf[NumericType]
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast(DecimalType(38, 0)))).collect()(0)
        .getDecimal(0)
    def unchanged(prev: DataFrame, next: DataFrame): Boolean =
      next.as("n")
        .join(prev.select(col("node"), col("cluster").as("__prev")).as("p"),
          Seq("node"))
        .filter(col("cluster") =!= col("__prev"))
        .isEmpty
    var prevSum = if (numericIds) labelSum(labels) else null
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // truncate lineage every round: without this the plan re-derives
      // the whole iteration history on any executor loss, and the
      // optimizer walks an ever-growing tree
      // LAZY checkpoint: the convergence probe (labelSum / unchanged)
      // is the round's single action, materializing the checkpoint in
      // the same job — one driver round-trip per round, not two
      val next = ccRound(edges, labels).localCheckpoint(eager = false)
      if (numericIds) {
        // no pairs at all → labels is empty and both sums are NULL;
        // that's the (trivially converged) fixpoint, not an NPE
        val nextSum = labelSum(next)
        converged =
          if (nextSum == null || prevSum == null) nextSum == prevSum
          else nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
      } else converged = unchanged(labels, next)
      labels.unpersist()
      labels = next
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"clusterAssignments did not converge in $maxIter rounds — " +
          "raise maxIter (pointer jumping needs ~log2(component diameter))")
    labels
    }
    }
  }

  /** One [[clusterAssignments]] propagation round as a lazy plan — the
    * loop body, exposed so each round's join tree is one reviewable unit
    * (the plan-book seam): (1) min label over neighbors (one hop), then
    * (2) pointer jump — adopt the label of one's label. Labels are
    * always node ids, so the lookup hits; chains halve each round →
    * O(log d) rounds on component diameter d instead of O(d). */
  private[graft] def ccRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val viaNeighbors = edges
      .join(labels.withColumnRenamed("node", "dst"), "dst")
      .groupBy(col("src").as("node"))
      .agg(min(col("cluster")).as("n_cluster"))
    val stepped = labels.join(viaNeighbors, Seq("node"), "left")
      .select(col("node"),
        least(col("cluster"), coalesce(col("n_cluster"), col("cluster")))
          .as("cluster"))
    stepped.as("s")
      .join(stepped.select(col("node").as("cluster"),
        col("cluster").as("p_cluster")).as("p"), Seq("cluster"), "left")
      .select(col("node"),
        least(col("cluster"), coalesce(col("p_cluster"), col("cluster")))
          .as("cluster"))
  }

  /** Apply cluster assignments to a corpus: keep each component's
    * canonical survivor (its min-id member, per [[clusterAssignments]])
    * plus every unclustered document — the write side of the dedup
    * pipeline (cluster → drop the rest). One left-anti join against the
    * non-canonical set; the drop side is a projection of the (small)
    * cluster table, so AQE broadcasts it. */
  def applyClusters(docs: DataFrame, idCol: String, clusters: DataFrame,
      nodeCol: String = "node", clusterCol: String = "cluster"): DataFrame = {
    val drop = clusters.filter(col(nodeCol) =!= col(clusterCol))
      .select(col(nodeCol).as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** SimHash bit width: 60 usable bits from the md5-derived token key. */
  val SimhashBits = 60

  /** 60-bit SimHash over md5-derived token keys: bit j of the fingerprint
    * is the sign of Σ±1 over tokens' bit j.
    *
    * ONE fold over the token-key array accumulates all 60 vote counters
    * at once — the previous per-bit form re-referenced the tokenization
    * from 64 separate aggregates, and projection collapse re-inlined it
    * per bit (the same trap minhashSignature documents). The md5 keying
    * makes the fingerprint engine-portable, so q32 gets a full oracle. */
  def simhash(text: Column): Column = {
    val keys = transform(TextFunctions.tokens(text),
      t => TextFunctions.md5Key60(t))
    // bit-vote fold as a codegen'd expression — the HOF formulation
    // allocated and interpretedly zipped a 60-element array per token
    // (the dominant CPU of the simhash corpus scan); SimhashVotes is
    // bit-identical including the null-key quirk
    graft.expressions.SimhashVotes.simhash_votes(keys, SimhashBits)
  }

  /** Winnowing fingerprint census (Schleimer et al. 2003, the MOSS local
    * fingerprinting scheme): hash every k-gram, slide a window of `w`
    * consecutive gram hashes, and select each window's minimum — the
    * classic guarantee that any shared run of w+k−1 tokens yields at
    * least one shared fingerprint, at a ~2/(w+1) sampling rate. Output
    * per doc: (n_grams, n_fps, n_shared_fps) where n_shared_fps counts
    * this doc's fingerprints whose HASH is also a fingerprint hash of
    * some other document — the plagiarism/local-copy signal.
    *
    * Determinism: min ties inside a window break to the LEFTMOST
    * position by packing (hash, pos) into `hash40·2²⁰ + pos` (hash
    * reduced to 40 bits so the packing fits a BIGINT; positions are
    * bounded < 2²⁰ by an enforced aggregate — the removeCrossDocSpans
    * guard discipline). Scale shape: per-doc windows only (bounded
    * frames, never a global window); the shared-hash table is
    * fingerprint-universe-sized with full map-side combine. */
  def winnowingFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1)
    import org.apache.spark.sql.expressions.Window
    val src = docs.select(col(idCol).as("doc"), col(textCol).as("text"))
    val base = src
      .select(col("doc"),
        greatest(size(TextFunctions.tokens(col("text"))) - (k - 1), lit(0))
          .as("nsh"))
      .localCheckpoint()
    val mx = base.agg(coalesce(max(col("nsh")), lit(0))).head().getInt(0)
    require(mx < (1 << 20),
      s"winnowingFingerprints: longest document has $mx grams; positions " +
        "must stay < 2^20 for the (hash, pos) packing — chunk documents first")
    val grams = src
      .select(col("doc"),
        posexplode(TextFunctions.shingles(col("text"), k)).as(Seq("i", "g")))
      .select(col("doc"), col("i"),
        (pmod(TextFunctions.md5Key60(col("g")), lit(1L << 40)) *
          lit(1048576L) + col("i")).as("pk"))
    val win = Window.partitionBy(col("doc")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, w - 1)
    val fps = grams
      .withColumn("wmin", min(col("pk")).over(win))
      .withColumn("wcnt", count(lit(1)).over(win))
      .filter(col("wcnt") === w)
      .select(col("doc"), col("wmin").as("fp"))
      .distinct()
      .withColumn("h", shiftright(col("fp"), 20))
      .localCheckpoint() // feeds the shared-hash census AND the per-doc agg
    val shared = fps.groupBy("h")
      .agg(countDistinct(col("doc")).as("nd"))
      .filter(col("nd") >= 2)
      .select("h")
    val per = fps
      .join(shared.withColumn("__sh", lit(1L)), Seq("h"), "left")
      .groupBy("doc")
      .agg(count(lit(1)).as("n_fps"),
        sum(coalesce(col("__sh"), lit(0L))).as("n_shared_fps"))
    val out = base
      .join(per, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("nsh").cast("long").as("n_grams"),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        coalesce(col("n_shared_fps"), lit(0L)).as("n_shared_fps"))
      .localCheckpoint()
    fps.unpersist(blocking = false)
    out
  }

  /** MinHash-LSH quality audit: precision/recall of [[minhashLsh]]'s
    * banded candidate generation against the exact df-capped Jaccard
    * pair set ([[jaccardPairs]] — the same truth q30 gates). The
    * operating-point artifact a dedup rollout picks (numHashes, bands)
    * with: banding trades recall for candidate volume, and this measures
    * the trade on the real corpus instead of the textbook S-curve.
    * Precision can dip below 1 against the CAPPED truth when banding
    * surfaces a pair whose shingles were all df-capped away — that
    * asymmetry is part of what the audit reports. Both pair frames are
    * checkpointed by their operators; the audit adds two counts and one
    * semi-join count, all driver-bounded scalars.
    * Output: (n_truth, n_found, n_common, precision, recall). */
  def minhashRecallAudit(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, k: Int = 3,
      threshold: Double = 0.8, scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath.roundHalfUpD
    val spark = docs.sparkSession
    val truth = jaccardPairs(docs, idCol, textCol, k, threshold)
      .select("doc_a", "doc_b")
    val found = minhashLsh(docs, idCol, textCol, numHashes, bands, k,
      threshold).select("doc_a", "doc_b")
    val nT = truth.count()
    val nF = found.count()
    val nC = truth.join(found, Seq("doc_a", "doc_b"), "left_semi").count()
    val prec = if (nF == 0) 0.0 else roundHalfUpD(nC.toDouble / nF, scale)
    val rec = if (nT == 0) 0.0 else roundHalfUpD(nC.toDouble / nT, scale)
    spark.createDataFrame(Seq((nT, nF, nC, prec, rec)))
      .toDF("n_truth", "n_found", "n_common", "pair_precision",
        "pair_recall")
  }

  /** SoftDeDup-style duplication weights: instead of DROPPING near-dup
    * cluster members, every document keeps a training weight 1/|cluster|
    * (singletons weigh 1.0) — the soft-dedup recipe that preserves corpus
    * coverage while removing duplication's gradient over-count. Composes
    * [[clusterAssignments]] over any near-dup pair frame; one
    * cluster-sized aggregate + two left joins on the corpus id.
    * Output: (idCol, cluster, cluster_size, weight). */
  def softDedupWeights(docs: DataFrame, idCol: String,
      pairs: DataFrame, scale: Int = 6): DataFrame = {
    val cl = clusterAssignments(pairs)
    val sizes = cl.groupBy("cluster").agg(count(lit(1)).as("__n"))
    docs.select(col(idCol))
      .join(cl.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .join(sizes, Seq("cluster"), "left")
      .select(col(idCol),
        coalesce(col("cluster"), col(idCol)).as("cluster"),
        coalesce(col("__n"), lit(1L)).as("cluster_size"),
        graft.functions.SafeMath.roundHalfUp(
          lit(1.0) / coalesce(col("__n"), lit(1L)).cast("double"), scale)
          .as("weight"))
  }

  /** Global line-level exact dedup — the C4/RefinedWeb step BETWEEN
    * document dedup and span dedup: a line (boilerplate header, cookie
    * banner, nav footer) that recurs across the corpus keeps only its
    * FIRST occurrence in (doc, position) order; every later copy is
    * dropped and the surviving lines are reassembled in document order.
    * Exact-match, line-granular — [[crossDocSpans]] handles sub-line
    * n-gram overlap, this kills the verbatim template tax.
    *
    * Scale shape: one posexplode (line position preserved), one
    * md5-keyed window (row_number over the 128-bit line hash — uniform
    * partitions at any corpus size, the shuffle carries (doc, pos,
    * hash, line)), one doc-keyed regroup where `array_sort` on the
    * (pos, line) struct restores document order. Kept and total line
    * counts fold into that SAME aggregate (collect_list skips the
    * nulls a non-kept line's `when` produces), so the exploded corpus
    * is read once — no checkpoint, nothing left pinned (advice r11).
    * Docs whose every line was claimed elsewhere survive with
    * clean_text = ''. Output: (idCol, clean_text, n_kept, n_dropped). */
  def lineDedup(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = Similarity.spread(docs)
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .select(col("__doc"), col("__pos"), col("__line"),
        md5(col("__line")).as("__h"))
    val w = Window.partitionBy(col("__h"))
      .orderBy(col("__doc").asc, col("__pos").asc)
    lines
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("__doc"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__rn") === 1,
              struct(col("__pos"), col("__line"))))),
            x => x.getField("__line")),
          "\n").as("clean_text"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        count(lit(1)).as("__total"))
      .select(col("__doc").as(idCol),
        col("clean_text"), col("n_kept"),
        (col("__total") - col("n_kept")).as("n_dropped"))
  }
}
