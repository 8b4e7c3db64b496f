package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Tokenizer TRAINING on the cluster — the byte-pair-encoding merge loop
  * (Sennrich et al. 2016) that turns a raw corpus into a subword vocab.
  * Real tokenizer training at 100 TB is exactly this shape: the corpus
  * collapses to a WORD VOCABULARY (word, freq) in one pass — everything
  * after is bounded by vocab size, not corpus size — then each merge
  * round is one map-side-combined pair-count aggregation, a 1-row argmax
  * to the driver, and a per-row fold that applies the merge.
  */
object Tokenizer {

  /** `rounds` BPE merge iterations over the whitespace-token vocabulary.
    *
    * Per round: count adjacent symbol pairs (OVERLAPPING occurrences,
    * weighted by word frequency — the standard BPE count), pick the most
    * frequent pair with ties to the lexicographically smaller (l, r) so
    * the choice is deterministic, then merge occurrences in every word
    * LEFT-TO-RIGHT NON-OVERLAPPING via a struct-accumulator fold (a
    * merged symbol can only pair again in the NEXT round — standard BPE
    * semantics). The vocab is localCheckpoint'd per round, so lineage
    * stays O(1) however many merges run.
    *
    * Returns one row per round: the learned rule (lhs, rhs), its pair
    * count, and the corpus symbol total after applying it — the
    * compression curve a tokenizer trainer watches.
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def chars(w: Column): Column =
      when(length(w) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(w)),
          i => w.substr(i, lit(1))))

    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), chars(col("w")).as("syms"))
      .localCheckpoint()

    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, Long)]()
    var exhausted = false
    (1 to rounds).foreach { round => if (!exhausted) {
      val pairCol =
        when(size(col("syms")) < 2, array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r"))))
      val bestRows = vocab.select(col("freq"), explode(pairCol).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      // empty corpus, or every word already a single symbol: no pairs
      // remain — training simply stops early
      if (bestRows.isEmpty) exhausted = true
      else {
      val best = bestRows(0)
      val (l, r, cnt) = (best.getString(0), best.getString(1), best.getLong(2))

      val zero = struct(array().cast("array<string>").as("out"),
        lit("").as("prev"))
      val foldMerge = aggregate(col("syms"), zero,
        (acc, s) =>
          when(acc("prev") === lit(l) && s === lit(r),
            struct(concat(acc("out"), array(lit(l + r))).as("out"),
              lit("").as("prev")))
            .when(acc("prev") === lit(""),
              struct(acc("out").as("out"), s.as("prev")))
            .otherwise(
              struct(concat(acc("out"), array(acc("prev"))).as("out"),
                s.as("prev"))),
        acc => when(acc("prev") === lit(""), acc("out"))
          .otherwise(concat(acc("out"), array(acc("prev")))))
      vocab = vocab.select(col("freq"), foldMerge.as("syms")).localCheckpoint()

      val nSym = vocab
        .agg(sum(size(col("syms")).cast("long") * col("freq")))
        .collect()(0).getLong(0)
      out += ((round, l, r, cnt, nSym))
      }
    }}
    out.toSeq.toDF("merge_round", "lhs", "rhs", "pair_count", "corpus_symbols")
  }

  /** Tokenizer ENCODE — apply a trained merge list ([[bpeMerges]] output,
    * or any fixed vocabulary) to every document, as a PURE PROJECTION:
    * zero shuffle, zero explode, one pass over the corpus however many
    * merge rules there are. The per-document symbol stream is carried as
    * a string of 0x1F-WRAPPED symbols (`\u001ft\u001f\u001fh\u001f...` — symbols never
    * contain 0x1F: input is casefolded to `[a-z ]`); each merge rule
    * (l, r) is one `replace(s, SEP+l+SEP+SEP+r+SEP, SEP+lr+SEP)` —
    * left-to-right non-overlapping, applied in rank order, which is the
    * standard single-pass-per-rule BPE apply. Wrapping BOTH sides of
    * every symbol makes matches boundary-exact: a rule (e, r) can never
    * fire on the trailing 'e' of an already-merged "the" (the
    * single-separator encoding had exactly that defect — caught by
    * LlmOpsSpec's hand-traced "there"). Word boundaries need no special
    * casing either: the space character is itself a symbol, and
    * letter-only rules can never match across one.
    *
    * Returns (idCol, n_words, n_tokens, n_chars): alphabetic word count,
    * post-merge token count, alphabetic char count — n_chars/n_tokens is
    * the compression ratio a tokenizer is judged by. Counts derive from
    * three string lengths (no symbol array ever materializes): each
    * symbol costs its chars + 2 wrappers, so
    * symbols = (len(enc) − len(clean)) / 2 and
    * tokens = symbols − spaces. Deterministic and mirrored by a DuckDB
    * twin (q203), since `replace` has identical left-to-right semantics
    * on both engines.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], carry: Seq[String] = Nil): DataFrame = {
    val sep = "\u001f"
    val clean = trim(regexp_replace(lower(col(textCol)), "[^a-z]+", " "))
    docs.select(col(idCol) +: carry.map(col) :+
        TextFunctions.bindOnce(clean) { cl =>
          val s0 = regexp_replace(cl, "(.)", sep + "$1" + sep)
          val enc = merges.foldLeft(s0) { case (c, (l, r)) =>
            replace(c, lit(sep + l + sep + sep + r + sep),
              lit(sep + l + r + sep))
          }
          val lenC = length(cl).cast("long")
          val nChars = length(replace(cl, lit(" "))).cast("long")
          val nSyms = ((length(enc).cast("long") - lenC) / 2L).cast("long")
          struct(
            when(lenC === 0L, 0L)
              .otherwise((lenC - nChars) + 1L).as("n_words"),
            when(lenC === 0L, 0L)
              .otherwise(nSyms - (lenC - nChars)).as("n_tokens"),
            nChars.as("n_chars"))
        }.as("m"): _*)
      .select(col(idCol) +: carry.map(col) :+
        col("m.n_words").as("n_words") :+
        col("m.n_tokens").as("n_tokens") :+
        col("m.n_chars").as("n_chars"): _*)
  }

  /** Tokenizer fertility audit by group (typically language): encode the
    * corpus with a frozen merge list and report, per group, document
    * count, exact word/token/char totals, and the two ratios a tokenizer
    * is judged by -- fertility (tokens per word; a tokenizer trained on
    * the group's language scores lower) and chars per token
    * (compression). The encode is [[bpeEncode]]'s zero-shuffle replace
    * chain; the audit adds ONE map-side-combined aggregate keyed by the
    * group column. Ratios are single IEEE divisions of exact integer
    * totals, rounded half-up -- engine-portable by construction. */
  def fertilityByGroup(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, merges: Seq[(String, String)],
      scale: Int = 6): DataFrame = {
    import graft.functions.SafeMath
    bpeEncode(docs, idCol, textCol, merges, carry = Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("n_tokens")).as("tokens"),
        sum(col("n_chars")).as("chars"))
      .select(col(groupCol), col("n_docs"), col("words"), col("tokens"),
        col("chars"),
        when(col("words") === 0L, lit(0.0))
          .otherwise(SafeMath.roundHalfUp(
            col("tokens").cast("double") / col("words").cast("double"),
            scale)).as("fertility"),
        when(col("tokens") === 0L, lit(0.0))
          .otherwise(SafeMath.roundHalfUp(
            col("chars").cast("double") / col("tokens").cast("double"),
            scale)).as("chars_per_token"))
  }

  /** The exact DuckDB twin of [[bpeEncode]] over a relation exposing the
    * id and text columns — kept beside the operator so the two evolve in
    * lockstep. */
  def bpeEncodeSql(rel: String, idCol: String, textCol: String,
      merges: Seq[(String, String)]): String = {
    val sepSql = "chr(31)"
    val seedSql =
      s"""regexp_replace(cl, '(.)', $sepSql || '\\1' || $sepSql, 'g')"""
    val encSql = merges.foldLeft(seedSql) { case (c, (l, r)) =>
      s"""replace($c, $sepSql || '$l' || $sepSql || $sepSql || '$r' || $sepSql,
          $sepSql || '$l$r' || $sepSql)"""
    }
    s"""WITH c AS (
        SELECT $idCol, trim(regexp_replace(lower($textCol), '[^a-z]+', ' ', 'g')) AS cl
        FROM $rel),
      m AS (SELECT $idCol, length(cl) AS len_c,
          length(replace(cl, ' ', '')) AS n_chars,
          length($encSql) AS len_e
        FROM c)
      SELECT $idCol,
        CASE WHEN len_c = 0 THEN 0 ELSE (len_c - n_chars) + 1 END AS n_words,
        CASE WHEN len_c = 0 THEN 0
          ELSE ((len_e - len_c) // 2) - (len_c - n_chars) END AS n_tokens,
        n_chars
      FROM m"""
  }
}
