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
    val ranked = rankings.zipWithIndex.map { case (r, i) =>
      GlobalSort.withGlobalRank(r.select(col(idCol), col(scoreCol)),
          Seq(col(scoreCol).desc, col(idCol)), rankCol = s"r${i + 1}")
        .select(col(idCol), col(s"r${i + 1}").cast("int").as(s"r${i + 1}"))
    }
    val joined = ranked.reduce(_.join(_, Seq(idCol)))
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
}
