package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions

/** Text-analysis operators over the documents table (token counting,
  * quality scoring, language ID, fingerprinting). Every metric is pure
  * per-row Catalyst expression work — full scan speed, no shuffle except
  * the final rollup.
  */
object TextQueries {

  private val BpePat = "[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]"

  /** q203's fixed merge list: ranks 1–8 of a typical English BPE run —
    * rule 2 consumes rule 1's output symbol, so the gate proves ordered
    * chained application, not just independent replaces. */
  private val BpeApplyMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t")
  /** DuckDB-side twins of TextFunctions: same tokenization, same fold. */
  private val ToksSql = """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
  private val TokCountSql = s"len($ToksSql)"
  private val BpeSql =
    s"""COALESCE(list_sum(list_transform(regexp_extract_all(text, '$BpePat'),
        p -> CASE WHEN regexp_full_match(p, '[A-Za-z]+')
          THEN CAST(ceil(length(p) / 4.0E0) AS BIGINT) ELSE 1 END)), 0)"""
  private def votesSql(words: Seq[String]): String =
    s"""len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''),
        x -> list_contains([${words.map(w => s"'$w'").mkString(",")}], x)))"""

  /** The qualityScore SQL twin over any relation exposing `text` — shared
    * with CurationQueries' composed-pipeline gate (q92). */
  private[queries] def qualitySqlTwin: String = {
    val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(",")
    val stopRatio = s"""(CASE WHEN $TokCountSql = 0 THEN 0.0E0 ELSE
      CAST(len(list_filter($ToksSql, x -> list_contains([$stopList], x))) AS DOUBLE) / $TokCountSql END)"""
    val punctRatio = s"""(CASE WHEN length(text) = 0 THEN 0.0E0 ELSE
      CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END)"""
    s"""(FLOOR((least(CAST($TokCountSql AS DOUBLE) / 100.0E0, 1.0E0) * 0.4E0 +
      least($stopRatio * 4.0E0, 1.0E0) * 0.3E0 +
      greatest(1.0E0 - $punctRatio * 5.0E0, 0.0E0) * 0.3E0) * 10000.0E0 + 0.5E0) / 10000.0E0)"""
  }

  /** The langId CASE twin over any relation exposing `text`. */
  private def langIdSqlTwin: String = {
    def ratio(p: String) =
      s"(CAST(len(regexp_extract_all(text, '$p')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0E0))"
    val en = votesSql(TextFunctions.Stopwords)
    val es = votesSql(Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es"))
    val de = votesSql(Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit"))
    val fr = votesSql(Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"))
    s"""CASE WHEN ${ratio("[\\x{4E00}-\\x{9FFF}]")} > 0.05E0 THEN 'zh'
         WHEN ${ratio("[\\x{3040}-\\x{30FF}]")} > 0.05E0 THEN 'ja'
         WHEN ${ratio("[\\x{AC00}-\\x{D7AF}]")} > 0.05E0 THEN 'ko'
         WHEN ${ratio("[\\x{0400}-\\x{04FF}]")} > 0.05E0 THEN 'ru'
         WHEN $en >= $es AND $en >= $de AND $en >= $fr AND $en > 0 THEN 'en'
         WHEN $es >= $de AND $es >= $fr AND $es > 0 THEN 'es'
         WHEN $de >= $fr AND $de > 0 THEN 'de'
         WHEN $fr > 0 THEN 'fr'
         ELSE 'und' END"""
  }

  /** Full BM25 oracle query (doc_id, n_terms, bm25) over `documents` —
    * shared by q307 and the hybrid-retrieval gate (q308 embeds it as a
    * CTE). Replays the whole ranker: per-doc tf/dl from the same
    * tokenization, one-row stats (N, Σdl, per-term df), ln-parity idf
    * rounded at scale 8 (q82 precedent), mirrored tf normalization with
    * locale-safe driver-double constants, per-term scores
    * decimal-summed, final rounding at scale 6. */
  private[queries] def bm25OracleSql(terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): String = {
    import graft.functions.SafeMath.roundHalfUpSql
    def d17(x: Double) = graft.score.ScoreEngine.fmtD(x)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(ts, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n            ")
    val dfCols = terms.indices.map(i =>
      s"CAST(COUNT(*) FILTER (WHERE tf$i > 0) AS BIGINT) AS df$i")
      .mkString(",\n            ")
    val avgdl = "(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))"
    val termSum = terms.indices.map { i =>
      val idf = roundHalfUpSql(
        s"""ln(1.0E0 + ((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE)
          + 0.5E0) / (CAST(df$i AS DOUBLE) + 0.5E0)))""", 8)
      val tfNorm = s"""((CAST(tf$i AS DOUBLE) * ${d17(k1 + 1.0)}) /
        (CAST(tf$i AS DOUBLE) + ${d17(k1)} * (${d17(1.0 - b)} +
          ${d17(b)} * (CAST(dl AS DOUBLE) / $avgdl))))"""
      s"""CAST((CASE WHEN tf$i > 0 THEN
          ${roundHalfUpSql(s"$idf * $tfNorm", 8)}
        ELSE 0.0E0 END) AS DECIMAL(28,8))"""
    }.reduce((a, x) => s"($a + $x)")
    val nTerms = terms.indices
      .map(i => s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)")
      .reduce((a, x) => s"($a + $x)")
    s"""WITH t AS (SELECT doc_id, $ToksSql AS ts FROM documents),
      p AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
        $tfCols
        FROM t),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(dl) AS BIGINT) AS tot,
        $dfCols
        FROM p)
    SELECT doc_id, CAST($nTerms AS BIGINT) AS n_terms,
      ${roundHalfUpSql(s"CAST($termSum AS DOUBLE)", 6)} AS bm25
    FROM p, st"""
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q25_token_stats",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"),
          sum(TextFunctions.bpeTokenEstimate(col("text"))).as("n_bpe"),
          sum(col("n_chars")).as("sum_chars"))
      },
      Some(s"""SELECT source, COUNT(*) AS n_docs,
        CAST(SUM($TokCountSql) AS BIGINT) AS n_tokens,
        CAST(SUM($BpeSql) AS BIGINT) AS n_bpe,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY source"""),
      bench = true),

    GraftQuery(
      "q26_quality_score",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.stopwordRatio(col("text")).as("stop_ratio"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"),
          TextFunctions.meanTokenLen(col("text")).as("mean_token_len"),
          TextFunctions.qualityScore(col("text")).as("quality"))
      },
      Some {
        val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(",")
        val stopRatio = s"""(CASE WHEN $TokCountSql = 0 THEN 0.0E0 ELSE
          CAST(len(list_filter($ToksSql, x -> list_contains([$stopList], x))) AS DOUBLE) / $TokCountSql END)"""
        val punctRatio = s"""(CASE WHEN length(text) = 0 THEN 0.0E0 ELSE
          CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END)"""
        val meanLen = s"""(CASE WHEN $TokCountSql = 0 THEN 0.0E0 ELSE
          CAST(list_sum(list_transform($ToksSql, x -> length(x))) AS DOUBLE) / $TokCountSql END)"""
        val quality = qualitySqlTwin
        s"""SELECT doc_id, $TokCountSql AS n_tokens, $stopRatio AS stop_ratio,
          $punctRatio AS punct_ratio, $meanLen AS mean_token_len,
          $quality AS quality FROM documents"""
      }),

    GraftQuery(
      "q27_lang_id",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(col("doc_id"), col("lang").as("declared_lang"),
          TextFunctions.langId(col("text")).as("detected_lang"))
      },
      Some(s"""SELECT doc_id, lang AS declared_lang,
          $langIdSqlTwin AS detected_lang
          FROM documents""")),

    GraftQuery(
      "q43_rolling_hash",
      (s, dir) => {
        // custom Catalyst Expression with doGenCode (whole-stage codegen);
        // oracle mirrors the exact codepoint fold.
        val d = Tables.load(s, dir, "documents")
        d.select(col("doc_id"),
          graft.expressions.RollingHash.rolling_hash(col("text")).as("rhash"))
      },
      Some(s"""SELECT doc_id, ${graft.expressions.RollingHash.oracleSql("text")} AS rhash
        FROM documents""")),

    GraftQuery(
      "q28_fingerprint",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      },
      Some("""SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents""")),

    GraftQuery(
      "q125_char_entropy",
      (s, dir) => Tables.load(s, dir, "documents").select(col("doc_id"),
        TextFunctions.charEntropy(col("text")).as("entropy")),
      Some {
        val ch = "list_transform(range(1, length(text) + 1), i -> substr(text, i, 1))"
        val p = s"""(CAST(len(list_filter(ch, x -> x = c)) AS DOUBLE)
          / CAST(len(ch) AS DOUBLE))"""
        s"""SELECT doc_id, ${graft.functions.SafeMath.roundHalfUpSql(
            s"""-(list_reduce(list_prepend(0.0E0,
              list_transform(list_sort(list_distinct(ch)), c ->
                $p * ${graft.functions.SafeMath.roundHalfUpSql(
                  s"ln($p)", 8)})),
              (a, b) -> a + b))""", 6)} AS entropy
          FROM (SELECT doc_id, $ch AS ch FROM documents)"""
      }),

    GraftQuery(
      "q104_quality_classifier",
      (s, dir) => graft.operators.Curation.qualityClassifier(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some {
        val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(",")
        val stopRatio = s"""(CASE WHEN $TokCountSql = 0 THEN 0.0E0 ELSE
          CAST(len(list_filter($ToksSql, x -> list_contains([$stopList], x))) AS DOUBLE) / $TokCountSql END)"""
        val punctRatio = s"""(CASE WHEN length(text) = 0 THEN 0.0E0 ELSE
          CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END)"""
        val meanLen = s"""(CASE WHEN $TokCountSql = 0 THEN 0.0E0 ELSE
          CAST(list_sum(list_transform($ToksSql, x -> length(x))) AS DOUBLE) / $TokCountSql END)"""
        // mirror the Spark fold order exactly: ((((b + a1) + a2) - a3) + a4)
        val z = s"""(-2.0E0 + 2.5E0 * least(CAST($TokCountSql AS DOUBLE) / 100.0E0, 1.0E0)
          + 3.0E0 * $stopRatio - 4.0E0 * $punctRatio
          + 1.5E0 * ($meanLen / 10.0E0))"""
        val prob = graft.functions.SafeMath.roundHalfUpSql(
          s"1.0E0 / (1.0E0 + exp(-$z))", 8)
        s"""SELECT doc_id, $prob AS quality_prob,
          $prob >= 0.5E0 AS keep FROM documents"""
      }),

    GraftQuery(
      "q115_sql_surface",
      (s, dir) => {
        // the SQL-callable surface driven END-TO-END under the gate: the
        // graft_* scalar family registered on the session (the same
        // splice-as-expression path the SparkSessionExtensions injector
        // uses — no UDF anywhere) and the whole query written in SQL.
        graft.GraftFunctions.register(s)
        Tables.load(s, dir, "documents").createOrReplaceTempView("docs_v")
        s.sql("""SELECT doc_id,
            graft_token_count(text) AS n_tokens,
            graft_quality(text) AS quality,
            graft_lang_id(text) AS lang_id,
            graft_fingerprint(text) AS fp
          FROM docs_v""")
      },
      Some {
        val langTwin = langIdSqlTwin
        s"""SELECT doc_id, $TokCountSql AS n_tokens,
          $qualitySqlTwin AS quality,
          $langTwin AS lang_id,
          md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents"""
      }),

    GraftQuery(
      "q116_quality_tiers",
      (s, dir) => {
        // per-source quality quartiles via ntile: the "route each
        // domain's best docs to the high-quality mix" cut. Partitioned
        // by source so the sort parallelizes across domains — never a
        // single global sort; deterministic tiebreak on doc_id.
        import org.apache.spark.sql.expressions.Window
        val d = Tables.load(s, dir, "documents")
        val scored = d.select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id").asc)
        scored.withColumn("tier", ntile(4).over(w))
      },
      Some(s"""WITH s AS (SELECT doc_id, source,
            $qualitySqlTwin AS quality FROM documents)
        SELECT doc_id, source, quality,
          CAST(ntile(4) OVER (PARTITION BY source
            ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS tier
        FROM s""")),

    GraftQuery(
      "q117_vocab_oov",
      (s, dir) => graft.operators.Curation.oovRate(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        vocabSize = 200),
      Some(s"""WITH tk AS (SELECT doc_id, unnest($ToksSql) AS tok
            FROM documents),
          v AS (SELECT tok FROM (
            SELECT tok, COUNT(*) AS n FROM tk GROUP BY tok
            ORDER BY n DESC, tok ASC LIMIT 200)),
          st AS (SELECT tk.doc_id, COUNT(*) AS n_tokens,
              SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
            FROM tk LEFT JOIN v ON v.tok = tk.tok
            GROUP BY tk.doc_id)
        SELECT d.doc_id,
          CAST(COALESCE(st.n_tokens, 0) AS BIGINT) AS n_tokens,
          CASE WHEN COALESCE(st.n_tokens, 0) = 0 THEN 0.0E0
            ELSE CAST(st.n_oov AS DOUBLE) / st.n_tokens END AS oov_rate
        FROM documents d LEFT JOIN st ON st.doc_id = d.doc_id""")),

    GraftQuery(
      "q203_bpe_encode",
      // tokenizer APPLY — the other half of q129's BPE training: encode
      // every document with a trained merge list as a pure zero-shuffle
      // projection (the 0x1F-symbol-stream replace chain), reporting
      // per-doc word/token/char counts. The merge list is a fixed
      // 8-rule English vocabulary (incl. the chained th→the rule, so
      // rank-order application is actually exercised); bpeMerges output
      // plugs into the same operator (LlmOpsSpec composes the two).
      (s, dir) => graft.operators.Tokenizer.bpeEncode(
        Tables.load(s, dir, "documents"), "doc_id", "text", BpeApplyMerges),
      Some(graft.operators.Tokenizer.bpeEncodeSql(
        "documents", "doc_id", "text", BpeApplyMerges))),

    GraftQuery(
      "q211_quality_threshold_curve",
      (s, dir) => {
        // the filter-calibration artifact: docs and tokens surviving
        // every candidate quality cutoff (0.0, 0.1, …, 1.0), from ONE
        // corpus scan — an 11-bucket histogram, each bucket exploded to
        // the thresholds it survives (an equi-join rollup over ≤ 11
        // rows, never 11 rescans and no nested-loop threshold join).
        // This curve is how a curation run picks its cutoff before
        // paying for the full filter pass.
        val d = Tables.load(s, dir, "documents")
        val q = TextFunctions.qualityScore(col("text"))
        val hist = d.select(
            least(floor(q * 10).cast("int"), lit(10)).as("bucket"),
            TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("c"), sum("nt").as("tk"))
        val surviving = hist
          .select(explode(sequence(lit(0), col("bucket")))
              .as("threshold_tenths"),
            col("c"), col("tk"))
          .groupBy("threshold_tenths")
          .agg(sum("c").as("docs_kept"), sum("tk").as("tokens_kept"))
        s.range(0, 11)
          .select(col("id").cast("int").as("threshold_tenths"))
          .join(surviving, Seq("threshold_tenths"), "left")
          .select(col("threshold_tenths"),
            coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
            coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      },
      Some(s"""WITH q AS (SELECT ${qualitySqlTwin} AS qs,
            CAST($TokCountSql AS BIGINT) AS nt FROM documents),
          b AS (SELECT LEAST(CAST(floor(qs * 10) AS INTEGER), 10)
              AS bucket, nt FROM q),
          h AS (SELECT bucket, COUNT(*) AS c, SUM(nt) AS tk
            FROM b GROUP BY 1),
          t AS (SELECT CAST(unnest(range(0, 11)) AS INTEGER)
              AS threshold_tenths)
        SELECT t.threshold_tenths,
          CAST(COALESCE(SUM(h.c), 0) AS BIGINT) AS docs_kept,
          CAST(COALESCE(SUM(h.tk), 0) AS BIGINT) AS tokens_kept
        FROM t LEFT JOIN h ON h.bucket >= t.threshold_tenths
        GROUP BY t.threshold_tenths""")),


    GraftQuery(
      "q307_bm25_scores",
      (s, dir) => graft.operators.InvertedIndex.bm25Scores(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("join", "spark", "window")),
      // the oracle replays the whole ranker: per-doc tf/dl from the same
      // tokenization, the one-row stats (N, Σdl, df per term), ln-parity
      // idf rounded at scale 8 (q82 precedent), mirrored tf
      // normalization with driver-double constants spliced E0-exact,
      // per-term scores decimal-summed, final rounding at scale 6
      Some(bm25OracleSql(Seq("join", "spark", "window"))),
      bench = true),

    GraftQuery(
      "q295_vocab_coverage",
      (s, dir) => graft.operators.Curation.vocabCoverage(
        Tables.load(s, dir, "documents"), "text", Seq(50, 90, 99)),
      // head size whose cumulative mass reaches each pct — the exact
      // statistic the Zipf fit (q239) approximates; all-integer
      // threshold test, rank window over the VOCABULARY census
      Some(s"""WITH c AS (SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest($ToksSql) AS t FROM documents)
            GROUP BY 1),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
              CAST(SUM(c) AS BIGINT) AS n FROM c),
          r AS (SELECT CAST(SUM(c) OVER w AS BIGINT) AS cum,
              CAST(COUNT(*) OVER w AS BIGINT) AS rank
            FROM c
            WINDOW w AS (ORDER BY c DESC, tok ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          p(pct) AS (VALUES (50), (90), (99))
        SELECT p.pct, MIN(r.rank) AS tokens_needed, tot.v AS vocab_size,
          tot.n AS total_tokens
        FROM p, r, tot
        WHERE r.cum * 100 >= tot.n * p.pct
        GROUP BY p.pct, tot.v, tot.n""")),

    GraftQuery(
      "q290_readability",
      (s, dir) => Tables.load(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("words"),
        TextFunctions.sentenceCount(col("text")).as("sentences"),
        TextFunctions.syllableEstimate(col("text")).as("syllables"),
        TextFunctions.fleschScore(col("text")).as("flesch")),
      Some {
        val w = s"CAST($TokCountSql AS BIGINT)"
        val sn = s"""greatest(CAST(len(regexp_extract_all(text,
            '[.!?]+')) AS BIGINT), 1)"""
        val sy = s"""CAST(len(regexp_extract_all(lower(text),
            '[aeiouy]+')) AS BIGINT)"""
        s"""SELECT doc_id, $w AS words, $sn AS sentences,
          $sy AS syllables,
          CASE WHEN $w = 0 THEN 0.0E0 ELSE ${
            graft.functions.SafeMath.roundHalfUpSql(
              s"""206.835E0 - 1.015E0 * (CAST($w AS DOUBLE) /
                CAST($sn AS DOUBLE)) - 84.6E0 * (CAST($sy AS DOUBLE) /
                CAST($w AS DOUBLE))""", 6)} END AS flesch
        FROM documents"""
      }),

    GraftQuery(
      "q285_trigram_search",
      (s, dir) => graft.operators.InvertedIndex.trigramSearch(
        Tables.load(s, dir, "documents"), "doc_id", "text", "spark a"),
      // the oracle is the SEMANTICS, not the index: trigram posting
      // intersection + candidate-only verify must return exactly the
      // plain substring scan's ids — any index false-negative flips
      // the hash
      Some("""SELECT doc_id FROM documents
        WHERE contains(text, 'spark a')"""),
      bench = true),

    GraftQuery(
      "q284_isotonic_fit",
      (s, dir) => {
        // isotonic calibration of the per-quality-decile English rate
        // ([[graft.operators.Curation.isotonicFitMicro]]): the PAV
        // closed form iso(i) = max_{j≤i} min_{k≥i} mean(j..k), block
        // means in integer micro-units — the monotone curve a quality
        // threshold is read off. One corpus-sized bin aggregate; every
        // downstream join/window runs on the ≤11-row bin frame.
        val d = Tables.load(s, dir, "documents")
        val q = TextFunctions.qualityScore(col("text"))
        val bins = d.select(
            least(floor(q * 10).cast("int"), lit(10)).as("bucket"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
          .groupBy("bucket")
          .agg(sum(col("y")).as("pos"), count(lit(1)).as("n"))
        graft.operators.Curation.isotonicFitMicro(bins, "bucket", "pos", "n")
      },
      Some(s"""WITH q AS (SELECT LEAST(CAST(floor($qualitySqlTwin * 10)
              AS INTEGER), 10) AS bucket,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        b AS (SELECT CAST(bucket AS BIGINT) AS bucket,
            CAST(SUM(y) AS BIGINT) AS p, CAST(COUNT(*) AS BIGINT) AS n
          FROM q GROUP BY 1),
        spans AS (SELECT j.bucket AS jb, k.bucket AS kb,
            (SUM(x.p) * 1000000) // SUM(x.n) AS m
          FROM b j, b k, b x
          WHERE j.bucket <= k.bucket
            AND x.bucket BETWEEN j.bucket AND k.bucket
          GROUP BY 1, 2),
        mn AS (SELECT i.bucket AS ib, s.jb, MIN(s.m) AS mn
          FROM b i JOIN spans s ON s.jb <= i.bucket AND s.kb >= i.bucket
          GROUP BY 1, 2),
        iso AS (SELECT ib, CAST(MAX(mn) AS BIGINT) AS iso_micro
          FROM mn GROUP BY ib)
      SELECT b.bucket, b.n, b.p AS pos,
        (b.p * 1000000) // b.n AS rate_micro, iso.iso_micro
      FROM b JOIN iso ON iso.ib = b.bucket""")),

    GraftQuery(
      "q245_tokenizer_fertility",
      (s, dir) => graft.operators.Tokenizer.fertilityByGroup(
        Tables.load(s, dir, "documents"), "doc_id", "text", "lang",
        BpeApplyMerges),
      // per-language fertility/compression audit of a frozen English
      // merge list: the encode CTE is the exact q203 twin; the ratios
      // are single divisions of exact integer totals
      Some {
        val enc = graft.operators.Tokenizer.bpeEncodeSql(
          "documents", "doc_id", "text", BpeApplyMerges)
        s"""WITH enc AS ($enc),
          a AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(e.n_words) AS BIGINT) AS words,
              CAST(SUM(e.n_tokens) AS BIGINT) AS tokens,
              CAST(SUM(e.n_chars) AS BIGINT) AS chars
            FROM enc e JOIN documents d ON d.doc_id = e.doc_id
            GROUP BY d.lang)
        SELECT lang, n_docs, words, tokens, chars,
          CASE WHEN words = 0 THEN 0.0E0 ELSE ${
            graft.functions.SafeMath.roundHalfUpSql(
              "CAST(tokens AS DOUBLE) / CAST(words AS DOUBLE)", 6)} END
            AS fertility,
          CASE WHEN tokens = 0 THEN 0.0E0 ELSE ${
            graft.functions.SafeMath.roundHalfUpSql(
              "CAST(chars AS DOUBLE) / CAST(tokens AS DOUBLE)", 6)} END
            AS chars_per_token
        FROM a"""
      }),

    GraftQuery(
      "q258_gopher_rules",
      (s, dir) => {
        // Gopher composite quality rules over a deliberately degraded
        // corpus: doc_id%10==3 gets a '#'-symbol tail (fails the symbol
        // ratio), %10==7 is truncated to 30 chars (fails min words),
        // %10==5 gets a numeric-token tail (fails the 80%-alphabetic
        // rule) — so every rule's reject path is exercised, not just
        // asserted. The stopword set is the Gopher list plus 'a' (the
        // synthetic corpus's second function word) so the ≥2-distinct-
        // stopwords pass path fires too.
        val base = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val mutated = base.withColumn("text",
          when(col("doc_id") % 10 === 3,
            concat(col("text"), lit(" # # # # # # # #")))
            .when(col("doc_id") % 10 === 7, substring(col("text"), 1, 30))
            .when(col("doc_id") % 10 === 5, concat(col("text"),
              lit(" 11 22 33 44 55 66 77 88 99 00 11 22 33 44 55")))
            .otherwise(col("text")))
        graft.operators.Curation.gopherRules(mutated, "doc_id", "text",
          stopwords = "a" +: graft.operators.Curation.GopherStopwords)
      },
      // oracle replays the degradation and every rule in the same
      // integer milli-units: list ops mirror the tokenizer, symbol
      // counts use the length-delta-of-replace identity, // floors
      Some {
        val stopList = ("a" +: graft.operators.Curation.GopherStopwords)
          .map(w => s"'$w'").mkString(",")
        s"""WITH m AS (SELECT doc_id,
            CASE WHEN doc_id % 10 = 3 THEN text || ' # # # # # # # #'
                 WHEN doc_id % 10 = 7 THEN substr(text, 1, 30)
                 WHEN doc_id % 10 = 5 THEN text ||
                   ' 11 22 33 44 55 66 77 88 99 00 11 22 33 44 55'
                 ELSE text END AS text
            FROM documents),
          base AS (SELECT doc_id, $ToksSql AS toks,
              CAST(length(text) - length(replace(text, '#', ''))
                AS BIGINT) +
              CAST((length(text) - length(replace(text, '...', ''))) // 3
                AS BIGINT) AS sym
            FROM m),
          met AS (SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_words,
              CAST(COALESCE(list_sum(list_transform(toks,
                x -> length(x))), 0) AS BIGINT) AS sum_len,
              CAST(len(list_filter(toks,
                x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
              CAST(len(list_distinct(list_filter(
                list_transform(toks, x -> lower(x)),
                x -> list_contains([$stopList], x)))) AS BIGINT) AS n_stop,
              sym
            FROM base),
          r AS (SELECT doc_id, n_words, n_stop,
              CAST(CASE WHEN n_words = 0 THEN 0
                ELSE (sum_len * 1000) // n_words END AS BIGINT)
                AS mean_len_milli,
              CAST(CASE WHEN n_words = 0 THEN 0
                ELSE (sym * 1000) // n_words END AS BIGINT)
                AS symbol_milli,
              CAST(CASE WHEN n_words = 0 THEN 0
                ELSE (n_alpha * 1000) // n_words END AS BIGINT)
                AS alpha_milli
            FROM met),
          fl AS (SELECT r.*,
              (n_words >= 50 AND n_words <= 100000) AS ok_words,
              (mean_len_milli >= 3000 AND mean_len_milli <= 10000)
                AS ok_mean_len,
              (symbol_milli < 100) AS ok_symbol,
              (alpha_milli >= 800) AS ok_alpha,
              (n_stop >= 2) AS ok_stops
            FROM r)
        SELECT doc_id, n_words, mean_len_milli, symbol_milli, alpha_milli,
          n_stop, ok_words, ok_mean_len, ok_symbol, ok_alpha, ok_stops,
          (ok_words AND ok_mean_len AND ok_symbol AND ok_alpha
            AND ok_stops) AS pass
        FROM fl"""
      })
  )
}
