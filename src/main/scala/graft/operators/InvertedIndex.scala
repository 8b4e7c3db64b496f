package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Positional inverted index + exact phrase search — the retrieval
  * primitive behind contamination checks and "find training docs
  * containing this exact string" audits, where the n-gram containment
  * operators ([[Dedup.containmentPairs]]) answer the fuzzier overlap
  * question.
  *
  * The index is the classic (term, doc, position) posting relation: at
  * 100 TB it partitions by term (each query term touches only its
  * posting list), and a phrase query joins the lists of its k terms on
  * (doc, aligned position) — selectivity comes from the term filter
  * reaching the scan, never from an all-pairs shape.
  */
object InvertedIndex {

  /** One (doc_id, pos, term) row per token occurrence. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "term")))

  /** Docs containing the exact consecutive phrase, with match counts.
    * One tokenize pass: the postings are filtered to the phrase's terms
    * and materialized once (localCheckpoint), then each further term
    * joins on (doc, start-aligned position) — k−1 equi-joins whose
    * inputs are single posting lists, so cost is bounded by the rarest
    * term's list however large the corpus. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val p = postings(docs, idCol, textCol)
      .filter(col("term").isin(phrase.distinct: _*))
      .localCheckpoint()
    val first = p.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      acc.join(p.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
        Seq("doc_id", "pos"))
    }.groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }

  /** Reciprocal-rank fusion (Cormack et al.): combine N rankings of the
    * same id universe into one — rrf(d) = Σᵣ 1/(k + rankᵣ(d)), the
    * standard way to fuse BM25 with embedding similarity (or any other
    * ranker pair) without score calibration. Each input needs (id,
    * score); ranks are total-order row numbers with (score desc, id)
    * ties so the fusion is deterministic, computed with
    * [[GlobalSort.withGlobalRank]] (range repartition + local row_number
    * + driver prefix-sum of partition counts) — NEVER a single-partition
    * global window, so fusing full-corpus rankings stays parallel (at
    * scale you'd still usually fuse top-k candidate lists). The fused
    * score is a fixed-arity left-fold of 1/(k+r) terms —
    * engine-identical evaluation order, so it hash-gates. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
      kConst: Int = 60, scale: Int = 8): DataFrame = {
    require(rankings.nonEmpty, "no rankings")
    // ONE grouped-rank machinery pass for ALL legs (advice r10: per-leg
    // GlobalSort paid sample + checkpoint + census jobs × legs). Scores
    // ride the union as doubles: the cast is monotone and injective at
    // gated magnitudes (longs < 2^53; DECIMAL(28,8) BM25 sums < ~9e7
    // round-trip a double exactly), so (score desc, id) is the same
    // total order each leg ranked by on its own.
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col(scoreCol).cast("double").as("__s"),
        lit(i + 1).as("__leg"))
    }.reduce(_.unionByName(_))
    val ranked = GlobalSort.withGroupedRank(tagged, "__leg",
      Seq(col("__s").desc, col(idCol)), rankCol = "__r")
    // ids are unique within a leg, so the former inner join across legs
    // = one groupBy keeping ids present in ALL legs
    val legCols = (1 to rankings.size).map(i =>
      max(when(col("__leg") === i, col("__r"))).cast("int").as(s"r$i"))
    val joined = ranked.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), legCols: _*)
      .filter(col("__n") === rankings.size)
      .drop("__n")
    val rrf = (1 to rankings.size)
      .map(i => lit(1.0) / (lit(kConst) + col(s"r$i")).cast("double"))
      .reduce(_ + _)
    joined.withColumn("rrf",
      graft.functions.SafeMath.roundHalfUp(rrf, scale))
  }

  /** Trigram-index substring search (the pg_trgm move): find every
    * document containing an ARBITRARY substring — not token-aligned, so
    * token postings can't answer it — by intersecting character-n-gram
    * posting lists and exact-verifying only the candidates. A document
    * can match only if it contains EVERY n-gram of the needle, so the
    * scan emits just the needle's own gram keys per doc (an `isin`
    * filter pushed below the shuffle; ≤ |needle| rows per doc survive),
    * the intersection is one map-side-combined count, and the
    * `contains` check — the only operation that must read full text —
    * touches candidate docs alone, never the corpus. Gram keys are
    * packed byte windows ([[graft.expressions.CharGramKeys]],
    * collision-free, codegen'd). Returns the matched ids. */
  def trigramSearch(docs: DataFrame, idCol: String, textCol: String,
      needle: String, n: Int = 3): DataFrame = {
    val keys = graft.expressions.CharGramKeys.keysOf(needle, n).distinct
    require(keys.nonEmpty,
      s"needle '$needle' is shorter than the gram width $n")
    val candidates = docs
      .select(col(idCol),
        explode(array_distinct(graft.expressions.CharGramKeys
          .char_gram_keys(col(textCol), n))).as("__gk"))
      .filter(col("__gk").isin(keys: _*))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === keys.size)
      .select(col(idCol))
    docs.join(candidates, Seq(idCol), "left_semi")
      .filter(col(textCol).contains(needle))
      .select(col(idCol))
  }

  /** Okapi BM25 scores for a fixed query-term set over the corpus — the
    * lexical ranker that pairs with dense cosine under [[rrfFuse]]
    * (hybrid retrieval), and the classic relevance prior for
    * "which training docs actually discuss X" audits.
    *
    * Spark-first shape: NO postings join and NO explode — `dl` and each
    * term's `tf` are per-row codegen'd array expressions over ONE bound
    * tokenization ([[TextFunctions.bindOnce]]; a naive per-term filter
    * would re-tokenize the doc per query term), so the heavy pass is a
    * zero-shuffle projection at scan speed. Corpus stats (N, Σdl, per-
    * term df) are ONE scalar aggregate collected as a single row; the
    * final score is a second zero-shuffle projection with the stats as
    * literals. At 100 TB: two scans, no shuffle at all.
    *
    * Cross-engine FP discipline: idf = ln(1 + (N − df + 0.5)/(df + 0.5))
    * rounded to scale 8 (the q82 ln-parity precedent), per-term scores
    * rounded to scale 8 and summed as DECIMAL(28,8) (order-free), the
    * sum rounded to `scale`. k1/b-derived constants are driver doubles
    * embedded as literals on both sides. Output: (doc_id, n_terms,
    * bm25) for every document, 0.0 where nothing matches. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      scale: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(queryTerms.distinct.size == queryTerms.size, "duplicate terms")
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.SafeMath
    val perDoc = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.bindOnce(TextFunctions.tokens(col(textCol))) { ts =>
        struct(
          size(ts).cast("long").as("dl") +:
          queryTerms.zipWithIndex.map { case (t, i) =>
            size(filter(ts, x => x === t)).cast("long").as(s"tf$i")
          }: _*)
      }.as("m"))
      .select(col("doc_id") +: (col("m.dl").as("dl") +:
        queryTerms.indices.map(i => col(s"m.tf$i").as(s"tf$i"))): _*)
      .localCheckpoint() // doc-count-sized (few longs/row), read twice
    val statCols = Seq(count(lit(1)).as("n"), sum(col("dl")).as("tot")) ++
      queryTerms.indices.map(i =>
        count(when(col(s"tf$i") > 0, lit(1))).as(s"df$i"))
    val statRow = perDoc.agg(statCols.head, statCols.tail: _*).collect()(0)
    val n = statRow.getLong(0)
    require(n > 0, "empty corpus")
    val tot = statRow.getLong(1)
    val avgdl = tot.toDouble / n.toDouble
    val termScores = queryTerms.indices.map { i =>
      val df = statRow.getLong(2 + i)
      val idf8 = SafeMath.roundHalfUp(
        log(lit(1.0) +
          (lit(n.toDouble) - lit(df.toDouble) + lit(0.5)) /
            (lit(df.toDouble) + lit(0.5))), 8)
      val tf = col(s"tf$i").cast("double")
      val tfNorm = (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) *
          (col("dl").cast("double") / lit(avgdl))))
      when(col(s"tf$i") > 0,
          SafeMath.roundHalfUp(idf8 * tfNorm, 8))
        .otherwise(lit(0.0))
        .cast(DecimalType(28, 8))
    }
    perDoc.select(
      col("doc_id"),
      queryTerms.indices
        .map(i => when(col(s"tf$i") > 0, 1L).otherwise(0L))
        .reduce(_ + _).cast("long").as("n_terms"),
      SafeMath.roundHalfUp(
        termScores.reduce(_ + _).cast("double"), scale).as("bm25"))
  }
}
