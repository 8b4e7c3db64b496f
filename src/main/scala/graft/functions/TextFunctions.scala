package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, and
  * document fingerprinting. All pure Catalyst expressions (codegen'd,
  * per-row, zero shuffle) so they run at full scan speed over 100 TB —
  * the difference between these and a UDF is the whole ballgame at scale.
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: alphabetic runs count ~1 token per 4
    * chars (ceil), digits and other non-space symbols 1 each — a cheap,
    * deterministic stand-in for a real tokenizer's token count. */
  def bpeTokenEstimate(text: Column): Column = {
    val pieces = regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]"), lit(0))
    aggregate(pieces, lit(0L), (acc, p) =>
      acc + when(p.rlike("^[A-Za-z]+$"), ceil(length(p) / lit(4.0)).cast("long"))
        .otherwise(lit(1L)))
  }

  /** Default English-ish stopword set used by the quality heuristic. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "for", "on", "with", "as", "at", "by", "it")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = Stopwords): Column =
    bindOnce(tokens(text)) { t =>
      val hits = size(filter(t, x => x.isInCollection(stopwords)))
      when(size(t) === 0, lit(0.0))
        .otherwise(hits.cast("double") / size(t))
    }

  /** Punctuation density (punct chars / total chars). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
          .cast("double") / length(text))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column =
    bindOnce(tokens(text)) { t =>
      when(size(t) === 0, lit(0.0))
        .otherwise(aggregate(t, lit(0L), (acc, x) => acc + length(x))
          .cast("double") / size(t))
    }

  /** Composite document-quality score in [0,1]: rewards mid-length docs
    * with natural stopword density, penalizes punctuation soup. The exact
    * weighting is a heuristic; the point is the shape — cheap per-row
    * signals composed into one filterable column. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lengthTerm = least(n / lit(100.0), lit(1.0)) // saturates at 100 tokens
    val stopTerm = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctTerm = greatest(lit(1.0) - punctRatio(text) * lit(5.0), lit(0.0))
    // explicit null-in → null-out: least/greatest SKIP nulls, so without
    // the guard a NULL document scored a nonsense 0.7 (lengthTerm and
    // stopTerm silently collapse to their clamps — r13 degenerate-input
    // audit). Non-null rows take the identical expression as before.
    when(text.isNull, lit(null).cast("double")).otherwise(
      SafeMath.roundHalfUp(
        lengthTerm * lit(0.4) + stopTerm * lit(0.3) + punctTerm * lit(0.3), 4))
  }

  /** N-gram-heuristic language ID over a handful of scripts/languages:
    * script detection by Unicode range, then stopword voting for Latin
    * scripts. Returns en/es/de/fr/zh/ja/ko/ru/und. */
  def langId(text: Column): Column = {
    def ratio(pattern: String): Column =
      size(regexp_extract_all(text, lit(pattern), lit(0))).cast("double") /
        greatest(length(text).cast("double"), lit(1.0))
    // one tokenization shared by all four stopword-vote counters
    bindOnce(tokens(lower(text))) { toks =>
      def votes(words: Seq[String]): Column =
        size(filter(toks, x => x.isInCollection(words)))
      val es = votes(Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es"))
      val de = votes(Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit"))
      val fr = votes(Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"))
      val en = votes(Stopwords)
      when(ratio("[\\x{4E00}-\\x{9FFF}]") > 0.05, lit("zh"))
        .when(ratio("[\\x{3040}-\\x{30FF}]") > 0.05, lit("ja"))
        .when(ratio("[\\x{AC00}-\\x{D7AF}]") > 0.05, lit("ko"))
        .when(ratio("[\\x{0400}-\\x{04FF}]") > 0.05, lit("ru"))
        .when(en >= es && en >= de && en >= fr && en > 0, lit("en"))
        .when(es >= de && es >= fr && es > 0, lit("es"))
        .when(de >= fr && de > 0, lit("de"))
        .when(fr > 0, lit("fr"))
        .otherwise(lit("und"))
    }
  }

  /** 60-bit integer key from the first 15 hex chars of md5 — an
    * engine-portable hash: DuckDB folds the same 15 chars to the identical
    * BIGINT, so operators keyed on this (MinHash, SimHash) are fully
    * oracle-checkable, unlike xxhash64/murmur which exist only in Spark. */
  def md5Key60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Canonical-content fingerprint: md5 of casefolded, punctuation-stripped,
    * whitespace-collapsed text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Vowel-run syllable estimate — the standard cheap proxy (each
    * maximal [aeiouy]+ run ≈ one syllable). */
  def syllableEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long")

  /** Sentence count: maximal [.!?]+ runs, floored at 1 so ratio math
    * survives unpunctuated text. */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")

  /** Flesch reading-ease score (206.835 − 1.015·W/S − 84.6·Syl/W) with
    * vowel-run syllables — the curation-grade complexity signal (filter
    * the unreadable tail, bin by difficulty for curricula). Pure
    * per-row expressions; parenthesization and E0 constants mirrored in
    * the oracle; roundHalfUp'd at `scale`. Empty text → 0. */
  def fleschScore(text: Column, scale: Int = 6): Column = {
    val w = tokenCount(text).cast("double")
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      graft.functions.SafeMath.roundHalfUp(
        lit(206.835) - lit(1.015) * (w / sentenceCount(text).cast("double"))
          - lit(84.6) * (syllableEstimate(text).cast("double") / w),
        scale))
  }

  /** Let-binding for Column expressions: evaluates `c` exactly ONCE and
    * makes it available as a lambda variable inside `f`. Encoded as a
    * single-element `transform` — higher-order-function lambdas don't
    * participate in common subexpression elimination, so an expensive
    * subtree referenced N times inside a lambda otherwise re-evaluates N
    * times per row. */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Per-document Shannon character entropy in nats — the cheap gibberish
    * / boilerplate / encoded-blob detector (random base64 scores high,
    * repeated padding scores low). Pure per-row work, zero shuffle —
    * a codegen'd expression ([[graft.expressions.CharEntropy]]): one
    * code-point scan per row, replacing the O(distinct-chars × len)
    * interpreted HOF chain bit-for-bit. Cross-engine: distinct chars
    * fold in sorted (code-point) order, each ln() is roundHalfUp'd at
    * scale 8, the final value at `scale`. */
  def charEntropy(text: Column, scale: Int = 6): Column =
    graft.expressions.CharEntropy.char_entropy(text, scale)

  /** URL canonicalization — the CommonCrawl-style dedup key: strip the
    * fragment, drop `utm_*` tracking parameters (tidying separators),
    * lowercase the scheme+authority (path/query case is significant, per
    * RFC 3986 §6.2.2.1), and strip a trailing slash. Pure regex
    * projection (zero shuffle); every pattern is in the Java∩RE2 common
    * dialect so a DuckDB oracle can run the IDENTICAL rules. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // The mid-query rule is anchored on a real separator (kept via the
    // capture group) so `?xutm_source=1` is NOT mangled, and it consumes a
    // RUN of consecutive utm params in one match — a single anchored
    // `[?&]utm_...&` would eat the separator of the next utm param and
    // leave it behind. `[A-Za-z0-9_]` covers utm_source_platform-style
    // names. Group-ref replacement and the run group are both in the
    // Java∩RE2 common dialect ("$1" here, "\1" in DuckDB).
    val noUtm = regexp_replace(
      regexp_replace(noFrag, "([?&])(utm_[A-Za-z0-9_]+=[^&]*&)+", "$1"),
      "[?&]utm_[A-Za-z0-9_]+=[^&]*$", "")
    val tidy = regexp_replace(regexp_replace(noUtm, "\\?&", "?"), "\\?$", "")
    val auth = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val lowered = concat(lower(regexp_extract(tidy, auth, 0)),
      regexp_replace(tidy, auth, ""))
    regexp_replace(lowered, "/$", "")
  }

  /** Word k-shingles (default 3) — the unit set for Jaccard similarity.
    *
    * The token array is bound ONCE via [[bindOnce]]: the naive form embeds
    * the tokenization subtree inside the per-position lambda, where it
    * re-evaluates once per shingle position (~50× per row — measured
    * 4.7 s vs 0.2 s for the shingle explode at sf0.1). */
  def shingles(text: Column, k: Int = 3): Column =
    // codegen'd byte-scan expression, bit-identical to the former HOF
    // chain `transform(sequence(0, size(t)-k), i => concat_ws(" ",
    // slice(t, i+1, k)))` — see WordShingles for why (interpreted HOFs
    // dominated the dedup family's corpus-scan CPU)
    graft.expressions.WordShingles.word_shingles(text, k)
}
