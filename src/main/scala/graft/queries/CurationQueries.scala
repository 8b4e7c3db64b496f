package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Curation

/** Training-data curation gates: deterministic stratified sampling,
  * sequence packing, benchmark decontamination, and int8-quantized
  * similarity — the operations between "raw crawl" and "training batches"
  * at 100 TB, each hash-gated against a DuckDB twin.
  */
object CurationQueries {

  private val Dim = 64

  /** DuckDB twin of TextFunctions.md5Key60: left fold acc*16+digit over
    * the first 15 md5 hex chars of `e`. */
  private[queries] def md5Key60Sql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, 16),
          j -> CAST(strpos('0123456789abcdef', substr(md5($e), j, 1)) - 1 AS BIGINT))),
        (a, v) -> a * 16 + v)"""

  private val Toks5Sql =
    """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
  private val Shingles5Sql =
    s"""list_transform(
         range(0, greatest(len($Toks5Sql) - 4, 0)),
         i -> array_to_string(list_slice($Toks5Sql, i + 1, i + 5), ' '))"""

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${Dim + 1}),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""

  /** DuckDB twin of TextFunctions.shingles with k=2 (word bigrams). */
  private val Bigrams = s"""list_transform(
        range(0, greatest(len($Toks5Sql) - 1, 0)),
        i -> array_to_string(list_slice($Toks5Sql, i + 1, i + 2), ' '))"""

  /** DuckDB twin of TextFunctions.shingles with k=3 (word trigrams). */
  private val Trigrams = s"""list_transform(
        range(0, greatest(len($Toks5Sql) - 2, 0)),
        i -> array_to_string(list_slice($Toks5Sql, i + 1, i + 3), ' '))"""

  /** Shared Kneser–Ney NLL CTE chain (the q237 oracle's WITH body):
    * ends at `agg(doc, n_bigrams, kn_nll)`. Declared ABOVE the registry
    * Seq — object vals initialize in declaration order. */
  private val KnNllCteSql =
    s"""d AS (SELECT doc_id AS doc, $Toks5Sql AS toks
            FROM documents),
          big AS (SELECT doc,
              unnest(list_slice(toks, 1, len(toks) - 1)) AS p,
              unnest(list_slice(toks, 2, len(toks))) AS c
            FROM d WHERE len(toks) >= 2),
          bc AS (SELECT p, c, CAST(COUNT(*) AS BIGINT) AS bc FROM big
            GROUP BY 1, 2),
          ps AS (SELECT p, CAST(SUM(bc) AS BIGINT) AS pc,
              CAST(COUNT(*) AS BIGINT) AS n1p FROM bc GROUP BY p),
          cs AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS ncp FROM bc
            GROUP BY c),
          tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM bc),
          per AS (SELECT big.doc, ${graft.functions.SafeMath.roundHalfUpSql(
            "-ln(((CAST(bc.bc AS DOUBLE) - 0.75E0) / CAST(ps.pc AS DOUBLE)) + " +
              "(((0.75E0 * CAST(ps.n1p AS DOUBLE)) / CAST(ps.pc AS DOUBLE)) * " +
              "(CAST(cs.ncp AS DOUBLE) / CAST(tb.b AS DOUBLE))))", 8)} AS nll8
            FROM big JOIN bc ON bc.p = big.p AND bc.c = big.c
            JOIN ps ON ps.p = big.p JOIN cs ON cs.c = big.c, tb),
          agg AS (SELECT doc, COUNT(*) AS n_bigrams,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "CAST(SUM(CAST(nll8 AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)",
              6)} AS kn_nll
            FROM per GROUP BY doc)"""

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q313_label_model",
      // weak-supervision labeling card (Snorkel LFAnalysis): four
      // deterministic labeling functions over documents → per-LF vote
      // counts + coverage/overlaps/conflicts, plus the resolved
      // __majority pseudo-LF — the labeling leg of a curation pipeline
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        Curation.labelModel(d, Seq(
          "lf_kw" -> when(col("text").contains("slow"), -1L)
            .when(col("text").contains("fast"), 1L),
          "lf_len" -> when(col("n_chars") < 100L, -1L)
            .when(col("n_chars").between(150L, 450L), 1L),
          "lf_lang" -> when(col("lang") === "en", 1L)
            .when(col("lang") === "zh", -1L),
          "lf_src" -> when(col("source").isin("src0", "src1", "src2"), 1L)
            .when(col("source") === "src19", -1L)))
      },
      Some {
        def r6(x: String) = graft.functions.SafeMath.roundHalfUpSql(x, 6)
        s"""WITH base AS (SELECT
              CASE WHEN text LIKE '%slow%' THEN -1
                   WHEN text LIKE '%fast%' THEN 1 END AS v0,
              CASE WHEN n_chars < 100 THEN -1
                   WHEN n_chars BETWEEN 150 AND 450 THEN 1 END AS v1,
              CASE WHEN lang = 'en' THEN 1
                   WHEN lang = 'zh' THEN -1 END AS v2,
              CASE WHEN source IN ('src0', 'src1', 'src2') THEN 1
                   WHEN source = 'src19' THEN -1 END AS v3
            FROM documents),
          tal AS (SELECT v0, v1, v2, v3,
              (CASE WHEN v0 = 1 THEN 1 ELSE 0 END
                + CASE WHEN v1 = 1 THEN 1 ELSE 0 END
                + CASE WHEN v2 = 1 THEN 1 ELSE 0 END
                + CASE WHEN v3 = 1 THEN 1 ELSE 0 END) AS npos,
              (CASE WHEN v0 = -1 THEN 1 ELSE 0 END
                + CASE WHEN v1 = -1 THEN 1 ELSE 0 END
                + CASE WHEN v2 = -1 THEN 1 ELSE 0 END
                + CASE WHEN v3 = -1 THEN 1 ELSE 0 END) AS nneg
            FROM base),
          stk AS (
            SELECT 'lf_kw' AS lf, v0 AS vote, npos, nneg, TRUE AS own FROM tal
            UNION ALL
            SELECT 'lf_len', v1, npos, nneg, TRUE FROM tal
            UNION ALL
            SELECT 'lf_lang', v2, npos, nneg, TRUE FROM tal
            UNION ALL
            SELECT 'lf_src', v3, npos, nneg, TRUE FROM tal
            UNION ALL
            SELECT '__majority',
              CASE WHEN npos > nneg THEN 1
                   WHEN nneg > npos THEN -1 END, npos, nneg, FALSE
            FROM tal)
        SELECT lf,
          CAST(SUM(CASE WHEN vote = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos,
          CAST(SUM(CASE WHEN vote = -1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_neg,
          ${r6("CAST(SUM(CASE WHEN vote IS NOT NULL THEN 1 ELSE 0 END)" +
            " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS coverage,
          ${r6("CAST(SUM(CASE WHEN vote IS NOT NULL AND" +
            " npos + nneg - (CASE WHEN own THEN 1 ELSE 0 END) >= 1" +
            " THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")}
            AS overlaps,
          ${r6("CAST(SUM(CASE WHEN (vote = 1 AND nneg >= 1)" +
            " OR (vote = -1 AND npos >= 1)" +
            " THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")}
            AS conflicts
        FROM stk GROUP BY lf"""
      }),
    GraftQuery(
      "q318_label_model_k",
      // K-CLASS weak supervision (verdict r11 task 5): four LFs voting
      // quality tiers 0/1/2 (abstain = NULL) over documents → per-LF
      // health card + the plurality-resolved __majority pseudo-LF
      // (ties abstain). Same one-projection/stack/aggregate shape as
      // the binary q313; conflicts = dissent via the nv − matches test.
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        Curation.labelModelK(d, Seq(
          "lf_len" -> when(col("n_chars") < 100L, 0L)
            .when(col("n_chars").between(100L, 300L), 1L)
            .when(col("n_chars").between(301L, 450L), 2L),
          "lf_kw" -> when(col("text").contains("slow"), 0L)
            .when(col("text").contains("fast"), 2L)
            .when(col("text").contains("data"), 1L),
          "lf_lang" -> when(col("lang") === "zh", 0L)
            .when(col("lang") === "de", 1L)
            .when(col("lang") === "en", 2L),
          "lf_src" -> when(col("source") === "src19", 0L)
            .when(col("source").isin("src0", "src1", "src2"), 2L)))
      },
      Some {
        def r6(x: String) = graft.functions.SafeMath.roundHalfUpSql(x, 6)
        def m(j: Int) =
          s"""CASE WHEN v$j IS NOT NULL THEN
              (CASE WHEN v0 = v$j THEN 1 ELSE 0 END
               + CASE WHEN v1 = v$j THEN 1 ELSE 0 END
               + CASE WHEN v2 = v$j THEN 1 ELSE 0 END
               + CASE WHEN v3 = v$j THEN 1 ELSE 0 END) END"""
        val tie = (for { j <- 0 to 3; i <- 0 to 3 if i > j } yield
          s"""(v$j IS NOT NULL AND v$i IS NOT NULL AND v$j <> v$i
               AND m$j = maxc AND m$i = maxc)""").mkString(" OR ")
        val majPick = (0 to 3).map(j =>
          s"CASE WHEN m$j = maxc THEN v$j END").mkString(", ")
        s"""WITH base AS (SELECT
              CASE WHEN n_chars < 100 THEN 0
                   WHEN n_chars BETWEEN 100 AND 300 THEN 1
                   WHEN n_chars BETWEEN 301 AND 450 THEN 2 END AS v0,
              CASE WHEN text LIKE '%slow%' THEN 0
                   WHEN text LIKE '%fast%' THEN 2
                   WHEN text LIKE '%data%' THEN 1 END AS v1,
              CASE WHEN lang = 'zh' THEN 0
                   WHEN lang = 'de' THEN 1
                   WHEN lang = 'en' THEN 2 END AS v2,
              CASE WHEN source = 'src19' THEN 0
                   WHEN source IN ('src0', 'src1', 'src2') THEN 2 END AS v3
            FROM documents),
          tal AS (SELECT v0, v1, v2, v3,
              ${m(0)} AS m0, ${m(1)} AS m1, ${m(2)} AS m2, ${m(3)} AS m3,
              (CASE WHEN v0 IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN v2 IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN v3 IS NOT NULL THEN 1 ELSE 0 END) AS nv
            FROM base),
          mx AS (SELECT *, GREATEST(COALESCE(m0, 0), COALESCE(m1, 0),
              COALESCE(m2, 0), COALESCE(m3, 0)) AS maxc FROM tal),
          fin AS MATERIALIZED (SELECT *,
              CASE WHEN maxc >= 1 AND NOT ($tie)
                THEN COALESCE($majPick) END AS maj
            FROM mx),
          stk AS (
            SELECT 'lf_len' AS lf, v0 AS vote, m0 AS m, nv, TRUE AS own
            FROM fin
            UNION ALL SELECT 'lf_kw', v1, m1, nv, TRUE FROM fin
            UNION ALL SELECT 'lf_lang', v2, m2, nv, TRUE FROM fin
            UNION ALL SELECT 'lf_src', v3, m3, nv, TRUE FROM fin
            UNION ALL SELECT '__majority', maj,
              CASE WHEN maj IS NOT NULL THEN maxc END, nv, FALSE FROM fin)
        SELECT lf,
          CAST(SUM(CASE WHEN vote IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_votes,
          CAST(COUNT(DISTINCT vote) AS BIGINT) AS n_classes,
          ${r6("CAST(SUM(CASE WHEN vote IS NOT NULL THEN 1 ELSE 0 END)" +
            " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS coverage,
          ${r6("CAST(SUM(CASE WHEN vote IS NOT NULL AND" +
            " nv - (CASE WHEN own THEN 1 ELSE 0 END) >= 1" +
            " THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")}
            AS overlaps,
          ${r6("CAST(SUM(CASE WHEN vote IS NOT NULL AND nv - m >= 1" +
            " THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")}
            AS conflicts
        FROM stk GROUP BY lf"""
      }),

    GraftQuery(
      "q314_chi2_keywords",
      // supervised feature-selection screen: which tokens are most
      // associated with the lang='en' slice (Pearson chi-square on
      // document-level presence, top-50) — names the features dsirScore
      // (q120) weights by
      (s, dir) => Curation.chi2Keywords(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", topK = 50, minDf = 5L),
      Some(s"""WITH base AS (
            SELECT doc_id, (lang = 'en') AS t, text FROM documents),
          tot AS (SELECT CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END)
                AS BIGINT) AS nt,
              CAST(COUNT(*) AS BIGINT) AS n FROM base),
          pres AS (SELECT DISTINCT doc_id, t,
              unnest($Toks5Sql) AS token FROM base),
          cnt AS (SELECT token,
              CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ca,
              CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS cb
            FROM pres GROUP BY 1),
          x AS (SELECT token, ca, cb,
              CAST(ca AS DOUBLE) AS fa, CAST(cb AS DOUBLE) AS fb,
              CAST(nt - ca AS DOUBLE) AS fc,
              CAST((n - nt) - cb AS DOUBLE) AS fd,
              CAST(n AS DOUBLE) AS fn
            FROM cnt, tot WHERE ca + cb >= 5),
          sc AS (SELECT token, ca AS df_target, cb AS df_rest,
              CASE WHEN ((fa + fb) * (fc + fd)) * ((fa + fc) * (fb + fd))
                     = 0.0E0 THEN 0.0E0
                ELSE ${graft.functions.SafeMath.roundHalfUpSql(
                  "(fn * (((fa * fd) - (fb * fc)) * ((fa * fd) - (fb * fc))))" +
                    " / (((fa + fb) * (fc + fd)) * ((fa + fc) * (fb + fd)))",
                  6)} END AS chi2
            FROM x)
        SELECT token, df_target, df_rest, chi2 FROM sc
        ORDER BY chi2 DESC, token LIMIT 50""")),
    GraftQuery(
      "q316_line_dedup",
      // the C4/RefinedWeb line-level global dedup: a line recurring
      // anywhere in the corpus keeps only its FIRST (doc, pos)
      // occurrence; docs reassemble from surviving lines. Synthesized
      // multi-line docs (q73's idiom): a corpus-wide boilerplate header,
      // a per-doc unique line, mod-50 / mod-7 shared lines, a mod-2
      // conditional line
      (s, dir) => {
        val k = col("c_custkey")
        val text = concat_ws("\n",
          lit("shared boilerplate header."),
          concat(lit("unique line for customer "), k, lit(".")),
          concat(lit("group line "), k % 50, lit(".")),
          when(k % 2 === 0, lit("even cohort notice.")),
          concat(lit("tail line "), k % 7, lit(".")))
        val docs = Tables.load(s, dir, "customer")
          .select(k.as("doc_id"), text.as("text"))
        graft.operators.Dedup.lineDedup(docs, "doc_id", "text")
      },
      Some("""WITH t AS (SELECT c_custkey AS doc_id, concat_ws(chr(10),
            'shared boilerplate header.',
            'unique line for customer ' || c_custkey || '.',
            'group line ' || (c_custkey % 50) || '.',
            CASE WHEN c_custkey % 2 = 0 THEN 'even cohort notice.' END,
            'tail line ' || (c_custkey % 7) || '.') AS text FROM customer),
          l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM t),
          l AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos,
            unnest(ls) AS line FROM l0),
          r AS (SELECT doc_id, pos, line,
            row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)
              AS rn FROM l),
          kept AS (SELECT doc_id,
              string_agg(line, chr(10) ORDER BY pos) AS clean_text,
              CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM r WHERE rn = 1 GROUP BY doc_id),
          tot AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS total FROM l0)
        SELECT tot.doc_id, COALESCE(kept.clean_text, '') AS clean_text,
          COALESCE(kept.n_kept, 0) AS n_kept,
          tot.total - COALESCE(kept.n_kept, 0) AS n_dropped
        FROM tot LEFT JOIN kept USING (doc_id)""")),
    GraftQuery(
      "q317_perplexity_buckets",
      // CCNet head/middle/tail: rank every doc by the q237 KN NLL
      // within its language, cut into 3 equal tiers with explicit
      // integer arithmetic (never an engine NTILE), report the
      // per-(lang, bucket) census and NLL band. All languages rank in
      // ONE GlobalSort.withGroupedRank pass
      (s, dir) => Curation.perplexityBuckets(
        Tables.load(s, dir, "documents"), "doc_id", "text", "lang",
        buckets = 3),
      Some(s"""WITH $KnNllCteSql,
          nl AS (SELECT dd.doc_id, dd.lang,
              COALESCE(a.kn_nll, 0.0E0) AS kn_nll
            FROM documents dd LEFT JOIN agg a ON a.doc = dd.doc_id),
          r AS (SELECT lang, kn_nll,
              CAST(row_number() OVER (
                PARTITION BY lang ORDER BY kn_nll, doc_id) AS BIGINT)
                AS rnk,
              CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS ng
            FROM nl),
          b AS (SELECT lang, ((rnk - 1) * 3) // ng + 1 AS bucket, kn_nll
            FROM r)
        SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
          MIN(kn_nll) AS min_nll, MAX(kn_nll) AS max_nll,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "CAST(SUM(CAST(kn_nll AS DECIMAL(28,6))) AS DOUBLE) / " +
              "CAST(COUNT(*) AS DOUBLE)", 6)} AS mean_nll
        FROM b GROUP BY 1, 2""")),
    GraftQuery(
      "q311_ngram_diversity",
      // synthetic-data mode-collapse screen (distinct-n / self-BLEU's
      // scalable cousin): per doc, distinct word trigrams and how many
      // occur in at least one OTHER doc — never pairwise, shuffles
      // carry (doc, md5) only
      (s, dir) => Curation.ngramDiversity(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 3),
      Some(s"""WITH g AS (SELECT DISTINCT doc_id, md5(sh) AS h FROM (
            SELECT doc_id, unnest($Trigrams) AS sh FROM documents)),
          d AS (SELECT doc_id,
              COUNT(*) OVER (PARTITION BY h) AS df FROM g)
        SELECT doc_id, COUNT(*) AS n_distinct,
          CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_shared,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)" +
              " / CAST(COUNT(*) AS DOUBLE)", 6)} AS self_sim
        FROM d GROUP BY 1""")),
    GraftQuery(
      "q73_line_quality_filter",
      (s, dir) => {
        // C4-style line filtering over synthesized multi-line docs (the
        // documents table has no newlines): per key — one always-good
        // line, one too-short line, a no-punctuation line (k%3), a
        // javascript boilerplate line (k%2), a second good line (k%5).
        // concat_ws skips the NULL conditional lines on both engines.
        val k = col("c_custkey")
        val text = concat_ws("\n",
          concat(lit("this is sentence number "), k, lit(".")),
          lit("ok"),
          when(k % 3 =!= 0, lit("no terminal punctuation here")),
          when(k % 2 === 0, lit("please enable javascript to continue.")),
          when(k % 5 =!= 0, lit("another good line with words!")))
        val docs = Tables.load(s, dir, "customer")
          .select(k.as("doc_id"), text.as("text"))
        Curation.lineQualityFilter(docs, "doc_id", "text")
      },
      Some("""WITH b AS (SELECT c_custkey AS k FROM customer),
          t AS (SELECT k, concat_ws(chr(10),
            'this is sentence number ' || k || '.',
            'ok',
            CASE WHEN k % 3 <> 0 THEN 'no terminal punctuation here' END,
            CASE WHEN k % 2 = 0 THEN 'please enable javascript to continue.' END,
            CASE WHEN k % 5 <> 0 THEN 'another good line with words!' END) AS text
          FROM b),
          f AS (SELECT k, string_split(text, chr(10)) AS lines,
            list_filter(string_split(text, chr(10)), l ->
              len(list_filter(string_split_regex(l, '\s+'), x -> x <> '')) >= 3
              AND regexp_matches(l, '[.!?"]$')
              AND NOT contains(lower(l), 'javascript')
              AND NOT contains(lower(l), 'cookie')
              AND NOT contains(lower(l), 'privacy policy')) AS kept
          FROM t)
        SELECT k AS doc_id, array_to_string(kept, chr(10)) AS clean_text,
          CAST(len(kept) AS BIGINT) AS n_kept,
          CAST(len(lines) - len(kept) AS BIGINT) AS n_dropped
        FROM f""")),

    GraftQuery(
      "q74_top_ngrams",
      (s, dir) => Curation.topNgrams(
        Tables.load(s, dir, "documents"), "text", n = 2, topK = 20),
      Some(s"""SELECT ngram, COUNT(*) AS n
        FROM (SELECT unnest($Bigrams) AS ngram FROM documents)
        GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 20"""),
      bench = true),

    GraftQuery(
      "q75_split_assign",
      (s, dir) => Curation.splitAssign(
          Tables.load(s, dir, "documents"), "doc_id")
        .select("doc_id", "split"),
      Some(s"""SELECT doc_id,
          CASE WHEN ${md5Key60Sql("'graft-split' || CAST(doc_id AS VARCHAR)")} % 100 < 80
                 THEN 'train'
               WHEN ${md5Key60Sql("'graft-split' || CAST(doc_id AS VARCHAR)")} % 100 < 90
                 THEN 'val'
               ELSE 'test' END AS split
        FROM documents""")),

    GraftQuery(
      "q76_bm25",
      (s, dir) => Curation.bm25(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "table", "query")),
      Some {
        def term(i: Int, t: String): String = {
          val tf = s"""CAST(len(list_filter($Toks5Sql, x -> x = '$t')) AS DOUBLE)"""
          s"""ln((n - df$i + 0.5E0) / (df$i + 0.5E0) + 1.0E0) *
              ($tf * (1.2E0 + 1.0E0)) /
              ($tf + 1.2E0 * (1.0E0 - 0.75E0 + 0.75E0 * (dl / avgdl)))"""
        }
        val dfs = Seq("spark", "table", "query").zipWithIndex.map { case (t, i) =>
          s"""CAST(SUM(CASE WHEN len(list_filter($Toks5Sql, x -> x = '$t')) > 0
              THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"""
        }.mkString(", ")
        val score = Seq("spark", "table", "query").zipWithIndex
          .map { case (t, i) => s"(${term(i, t)})" }.mkString(" + ")
        s"""WITH base AS (
              SELECT doc_id, text,
                CAST(len($Toks5Sql) AS DOUBLE) AS dl
              FROM documents),
            stats AS (
              SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, $dfs
              FROM (SELECT text, dl FROM base))
          SELECT doc_id,
            ${graft.functions.SafeMath.roundHalfUpSql(score, 6)} AS bm25
          FROM base, stats"""
      }),
    GraftQuery(
      "q77_pii_redact",
      (s, dir) => {
        // PII scrubbing over synthesized contact cards (the documents
        // table carries no PII): per customer — a conditional email
        // (k%3), NANP phone (k%4), and IPv4 (k%5), with clean filler
        // text around them. concat_ws skips NULL parts on both engines.
        val k = col("c_custkey")
        val email = concat(lit("user"), k, lit("@mail"), k % 7,
          lit(".example.com"))
        val phone = concat(k % 900 + 100, lit("-"), k % 700 + 200,
          lit("-"), k % 9000 + 1000)
        val ip = concat(lit("10."), k % 256, lit("."), k % 200,
          lit("."), k % 250 + 1)
        val text = concat_ws(" ",
          lit("contact"), col("c_name"),
          when(k % 3 =!= 0, email),
          lit("for details."),
          when(k % 4 === 0, concat(lit("call "), phone)),
          when(k % 5 === 0, concat(lit("from "), ip)),
          lit("end"))
        val docs = Tables.load(s, dir, "customer")
          .select(k.as("doc_id"), text.as("text"))
        Curation.redactPii(docs, "doc_id", "text")
      },
      Some {
        val email = Curation.EmailRe
        val ip = Curation.Ipv4Re
        val phone = Curation.PhoneRe
        s"""WITH t AS (SELECT c_custkey AS doc_id, concat_ws(' ',
              'contact', c_name,
              CASE WHEN c_custkey % 3 <> 0 THEN
                'user' || c_custkey || '@mail' || (c_custkey % 7) || '.example.com' END,
              'for details.',
              CASE WHEN c_custkey % 4 = 0 THEN 'call ' ||
                ((c_custkey % 900) + 100) || '-' || ((c_custkey % 700) + 200) ||
                '-' || ((c_custkey % 9000) + 1000) END,
              CASE WHEN c_custkey % 5 = 0 THEN 'from 10.' ||
                (c_custkey % 256) || '.' || (c_custkey % 200) || '.' ||
                ((c_custkey % 250) + 1) END,
              'end') AS text
            FROM customer)
          SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(text,
              '$email', '<EMAIL>', 'g'),
              '$ip', '<IP>', 'g'),
              '$phone', '<PHONE>', 'g') AS clean_text,
            CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
            CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones
          FROM t"""
      }),

    GraftQuery(
      "q79_epoch_shuffle",
      (s, dir) => Curation.shuffleOrder(
          Tables.load(s, dir, "documents"), "doc_id", "graft-epoch0")
        .select("doc_id", "shard", "pos"),
      Some(s"""WITH t AS (SELECT doc_id,
            ${md5Key60Sql("'graft-epoch0' || CAST(doc_id AS VARCHAR)")} AS key
          FROM documents)
        SELECT doc_id, CAST(key % 64 AS INTEGER) AS shard,
          CAST(row_number() OVER (PARTITION BY key % 64 ORDER BY key, doc_id) - 1
            AS BIGINT) AS pos
        FROM t""")),

    GraftQuery(
      "q80_domain_mix",
      (s, dir) => Curation.mixToTarget(
          Tables.load(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 5.0, "zh" -> 3.0, "de" -> 2.0, "fr" -> 1.5),
          defaultWeight = 1.0)
        .select("doc_id", "lang", "source"),
      Some(s"""WITH cnt AS (
            SELECT lang AS d, CAST(COUNT(*) AS DOUBLE) AS n
            FROM documents GROUP BY lang),
          w AS (SELECT d, n,
            CASE d WHEN 'en' THEN 5.0E0 WHEN 'zh' THEN 3.0E0
                   WHEN 'de' THEN 2.0E0 WHEN 'fr' THEN 1.5E0
                   ELSE 1.0E0 END AS wt FROM cnt),
          c AS (SELECT MIN(n / wt) AS c FROM w),
          thr AS (SELECT d,
            CAST(FLOOR(((wt * c.c) / n) * 10000.0E0 + 0.5E0) AS BIGINT) AS t
            FROM w, c)
        SELECT doc_id, lang, source FROM documents, thr
        WHERE thr.d = lang
          AND ${md5Key60Sql("'graft-mix' || CAST(doc_id AS VARCHAR)")} % 10000 < thr.t""")),

    GraftQuery(
      "q82_unigram_nll",
      (s, dir) => Curation.unigramLogProb(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH toks AS (
            SELECT doc_id AS doc, unnest($Toks5Sql) AS tok FROM documents),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks),
          freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
          per AS (SELECT t.doc, ${graft.functions.SafeMath.roundHalfUpSql(
            "-ln(CAST(f.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE))", 8)} AS nll8
            FROM toks t JOIN freq f USING (tok), tot),
          agg AS (SELECT doc, COUNT(*) AS n_tokens,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "CAST(SUM(CAST(nll8 AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)", 6)} AS nll
            FROM per GROUP BY doc)
        SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
          COALESCE(a.nll, 0.0E0) AS nll
        FROM documents d LEFT JOIN agg a ON a.doc = d.doc_id"""),
      bench = true),

    GraftQuery(
      "q166_bigram_nll",
      (s, dir) => Curation.bigramLogProb(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      // q82's context-aware sibling: add-one-smoothed bigram LM, mean
      // per-bigram NLL per doc; same decimal-sum FP discipline
      Some(s"""WITH d AS (SELECT doc_id AS doc, $Toks5Sql AS toks
            FROM documents),
          toks AS (SELECT doc, unnest(toks) AS tok FROM d),
          uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS uc FROM toks
            GROUP BY tok),
          v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM uni),
          big AS (SELECT doc,
              unnest(list_slice(toks, 1, len(toks) - 1)) AS p,
              unnest(list_slice(toks, 2, len(toks))) AS c
            FROM d WHERE len(toks) >= 2),
          bc AS (SELECT p, c, CAST(COUNT(*) AS BIGINT) AS bc FROM big
            GROUP BY 1, 2),
          per AS (SELECT big.doc, ${graft.functions.SafeMath.roundHalfUpSql(
            "-ln(CAST(bc.bc + 1 AS DOUBLE) / CAST(uni.uc + v.vocab AS DOUBLE))",
            8)} AS nll8
            FROM big JOIN bc ON bc.p = big.p AND bc.c = big.c
            JOIN uni ON uni.tok = big.p, v),
          agg AS (SELECT doc, COUNT(*) AS n_bigrams,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "CAST(SUM(CAST(nll8 AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)",
              6)} AS nll
            FROM per GROUP BY doc)
        SELECT d2.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
          COALESCE(a.nll, 0.0E0) AS nll
        FROM documents d2 LEFT JOIN agg a ON a.doc = d2.doc_id""")),

    GraftQuery(
      "q167_rank_fusion",
      (s, dir) => {
        // reciprocal-rank fusion of two term rankings — the calibration-
        // free way to combine heterogeneous rankers (BM25 × embeddings in
        // production; two term-frequency rankers here keep the oracle
        // exact); top-20 by fused score.
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        def tfRank(term: String) = docs.select(col("doc_id"),
          size(filter(col("toks"), x => x === term)).cast("long")
            .as("score"))
        graft.operators.InvertedIndex.rrfFuse(
            Seq(tfRank("table"), tfRank("spark")), "doc_id", "score")
          .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      },
      Some(s"""WITH d AS (SELECT doc_id, $Toks5Sql AS toks FROM documents),
          s1 AS (SELECT doc_id, len(list_filter(toks, x -> x = 'table'))
            AS score FROM d),
          s2 AS (SELECT doc_id, len(list_filter(toks, x -> x = 'spark'))
            AS score FROM d),
          r1 AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC,
            doc_id) AS INTEGER) AS r1 FROM s1),
          r2 AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC,
            doc_id) AS INTEGER) AS r2 FROM s2),
          f AS (SELECT r1.doc_id, r1.r1, r2.r2,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "1.0E0 / CAST(60 + r1 AS DOUBLE) + 1.0E0 / CAST(60 + r2 AS DOUBLE)",
              8)} AS rrf
            FROM r1 JOIN r2 USING (doc_id))
        SELECT doc_id, r1, r2, rrf FROM f
        ORDER BY rrf DESC, doc_id LIMIT 20""")),

    GraftQuery(
      "q216_priority_sample",
      (s, dir) => graft.operators.Curation.prioritySample(
        Tables.load(s, dir, "documents"), "doc_id",
        graft.functions.TextFunctions.tokenCount(col("text")), k = 100),
      // Efraimidis–Spirakis exact-k weighted sample: u from the md5
      // family (both engines draw the identical number), priority
      // −ln(u)/w rounded at scale 8 before the (priority, id) total
      // order — the q82 rounded-ln discipline — and the cut is a
      // TakeOrderedAndProject, never a global sort.
      Some(s"""WITH w AS (SELECT doc_id,
            CAST(len($Toks5Sql) AS DOUBLE) AS weight FROM documents),
          p AS (SELECT doc_id, weight,
              ${graft.functions.SafeMath.roundHalfUpSql(
                s"-ln((CAST(${md5Key60Sql(
                  "'graft-psample' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)" +
                  " + 0.5E0) / 1152921504606846976E0) / weight",
                8)} AS priority
            FROM w WHERE weight > 0)
        SELECT doc_id, weight, priority FROM p
        ORDER BY priority, doc_id LIMIT 100""")),

    GraftQuery(
      "q120_dsir_resample",
      (s, dir) => Curation.dsirScore(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en"),
      Some(s"""WITH toks AS (
            SELECT doc_id AS doc, (lang = 'en') AS tgt,
              unnest($Toks5Sql) AS tok FROM documents),
          freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS raw_cnt,
              CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tgt_cnt
            FROM toks GROUP BY tok),
          tot AS (SELECT CAST(SUM(raw_cnt) AS BIGINT) AS raw_total,
              CAST(SUM(tgt_cnt) AS BIGINT) AS tgt_total,
              CAST(COUNT(*) AS BIGINT) AS v FROM freq),
          llr AS (SELECT tok,
              CAST(${graft.functions.SafeMath.roundHalfUpSql(
                "ln(CAST(tgt_cnt + 1 AS DOUBLE) / CAST(tgt_total + v AS DOUBLE))",
                8)} AS DECIMAL(28,8))
              - CAST(${graft.functions.SafeMath.roundHalfUpSql(
                "ln(CAST(raw_cnt + 1 AS DOUBLE) / CAST(raw_total + v AS DOUBLE))",
                8)} AS DECIMAL(28,8)) AS llr8
            FROM freq, tot),
          agg AS (SELECT t.doc, COUNT(*) AS n_tokens,
              ${graft.functions.SafeMath.roundHalfUpSql(
                "CAST(SUM(CAST(llr8 AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)",
                6)} AS llr
            FROM toks t JOIN llr USING (tok) GROUP BY t.doc)
        SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
          COALESCE(a.llr, 0.0E0) AS llr,
          COALESCE(a.llr, 0.0E0) > 0.0E0 AS keep
        FROM documents d LEFT JOIN agg a ON a.doc = d.doc_id"""),
      bench = true),

    GraftQuery(
      "q137_cdc_chunks",
      (s, dir) => Curation.cdcChunks(
        Tables.load(s, dir, "documents"), "doc_id", "text", divisor = 16),
      Some(s"""WITH t AS (SELECT doc_id, $Toks5Sql AS tk FROM documents),
          e AS (SELECT doc_id, tk, len(tk) AS n,
            list_filter(range(1, len(tk) + 1),
              i -> ${md5Key60Sql("tk[i]")} % 16 = 0) AS bs
            FROM t),
          e2 AS (SELECT doc_id, tk,
            CASE WHEN len(bs) = 0 THEN [n]
                 WHEN bs[-1] = n THEN bs
                 ELSE list_append(bs, n) END AS ends
            FROM e WHERE n > 0),
          c AS (SELECT doc_id, unnest(list_transform(
              range(1, len(ends) + 1),
              j -> {'idx': j - 1,
                'txt': array_to_string(list_slice(tk,
                  CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END,
                  ends[j]), ' '),
                'ntok': ends[j] -
                  (CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END) + 1}))
              AS ch
            FROM e2)
        SELECT doc_id, CAST(ch.idx AS INTEGER) AS chunk_idx,
          md5(ch.txt) AS chunk_hash,
          CAST(ch.ntok AS BIGINT) AS n_chunk_tokens
        FROM c""")),

    GraftQuery(
      "q148_temperature_mix",
      (s, dir) => Curation.temperatureMix(
          Tables.load(s, dir, "documents"), "doc_id", "lang",
          temperature = 2.0)
        .select("doc_id", "lang", "source"),
      Some(s"""WITH cnt AS (SELECT lang AS d, CAST(COUNT(*) AS BIGINT) AS c
            FROM documents GROUP BY lang),
          w AS (SELECT d, ${graft.functions.SafeMath.roundHalfUpSql(
            "pow(CAST(c AS DOUBLE), 0.5E0) / CAST(c AS DOUBLE)", 8)} AS w
            FROM cnt),
          m AS (SELECT MAX(w) AS wmax FROM w),
          ppm AS (SELECT d,
            CAST(FLOOR(w / m.wmax * 1000000.0E0 + 0.5E0) AS BIGINT) AS ppm
            FROM w, m)
        SELECT doc_id, lang, source FROM documents JOIN ppm ON ppm.d = lang
        WHERE ${md5Key60Sql("'graft-temp' || CAST(doc_id AS VARCHAR)")}
          % 1000000 < ppm""")),

    GraftQuery(
      "q142_chi_square_shift",
      (s, dir) => Curation.chiSquareShift(
        Tables.load(s, dir, "documents"), "source", "n_chars",
        binWidth = 100L, bins = 10),
      Some(s"""WITH b AS (SELECT source,
            least(CAST(n_chars AS BIGINT) // 100, 9) AS bin FROM documents),
          sb AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c_sb
            FROM b GROUP BY 1, 2),
          gb AS (SELECT bin, CAST(SUM(c_sb) AS BIGINT) AS c_b
            FROM sb GROUP BY 1),
          ts AS (SELECT source, CAST(SUM(c_sb) AS BIGINT) AS t_s
            FROM sb GROUP BY 1),
          nn AS (SELECT CAST(SUM(c_sb) AS BIGINT) AS n FROM sb),
          grid AS (SELECT source, t_s, unnest(range(0, 10)) AS bin FROM ts),
          pq AS (SELECT g.source,
              CAST(COALESCE(sb.c_sb, 0) AS DOUBLE)
                / CAST(g.t_s AS DOUBLE) AS p,
              CAST(COALESCE(gb.c_b, 0) - COALESCE(sb.c_sb, 0) AS DOUBLE)
                / CAST(nn.n - g.t_s AS DOUBLE) AS q
            FROM grid g
            LEFT JOIN sb ON sb.source = g.source AND sb.bin = g.bin
            LEFT JOIN gb ON gb.bin = g.bin, nn),
          term AS (SELECT source,
              CAST(${graft.functions.SafeMath.roundHalfUpSql(
                "CASE WHEN p + q = 0 THEN 0.0E0 " +
                "ELSE (p - q) * (p - q) / (p + q) END", 8)}
                AS DECIMAL(28,8)) AS t8
            FROM pq)
        SELECT source, ${graft.functions.SafeMath.roundHalfUpSql(
          "CAST(SUM(t8) AS DOUBLE)", 6)} AS chi2
        FROM term GROUP BY source""")),

    GraftQuery(
      "q131_weighted_median",
      (s, dir) => Curation.weightedMedian(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("wt")),
        "source", "doc_id", "q", "wt"),
      Some(s"""WITH t AS (SELECT doc_id, source,
            ${TextQueries.qualitySqlTwin} AS q,
            CAST(len($Toks5Sql) AS BIGINT) AS wt FROM documents),
          w AS (SELECT source, q, wt,
            SUM(wt) OVER (PARTITION BY source ORDER BY q, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            SUM(wt) OVER (PARTITION BY source) AS tot FROM t)
        SELECT source, MIN(q) AS w_median,
          CAST(MAX(tot) AS BIGINT) AS total_weight
        FROM w WHERE cum * 2 >= tot GROUP BY source""")),

    GraftQuery(
      "q129_bpe_merges",
      (s, dir) => graft.operators.Tokenizer.bpeMerges(
        Tables.load(s, dir, "documents"), "text", rounds = 2),
      Some {
        // two unrolled rounds of the identical BPE step: overlapping
        // pair counts → deterministic argmax → left-to-right
        // non-overlapping fold merge (struct accumulator).
        def pairsCte(v: String, p: String) =
          s"""$p AS (SELECT pr.l AS l, pr.r AS r,
              CAST(SUM(freq) AS BIGINT) AS cnt
            FROM (SELECT freq, unnest(list_transform(
                range(0, greatest(len(syms) - 1, 0)),
                i -> {'l': syms[i+1], 'r': syms[i+2]})) AS pr FROM $v)
            GROUP BY 1, 2)"""
        def bestCte(p: String, b: String) =
          s"""$b AS (SELECT l, r, cnt FROM $p
            ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"""
        // string accumulator joined by chr(31) (absent from the corpus):
        // DuckDB 1.0's list_reduce loses list-typed accumulator state
        // across consecutive list_append branches, so the fold carries a
        // flat string and re-splits after.
        def mergeCte(v: String, b: String, vNext: String) =
          s"""$vNext AS (SELECT freq, string_split(
              CASE WHEN f.prev = '' THEN f.out
                   WHEN f.out = '' THEN f.prev
                   ELSE f.out || chr(31) || f.prev END, chr(31)) AS syms
            FROM (SELECT freq, list_reduce(
                list_prepend(
                  {'out': CAST('' AS VARCHAR), 'prev': CAST('' AS VARCHAR)},
                  list_transform(syms, x ->
                    {'out': CAST('' AS VARCHAR), 'prev': x})),
                (acc, s) -> CASE
                  WHEN acc.prev = $b.l AND s.prev = $b.r
                    THEN {'out': CASE WHEN acc.out = '' THEN $b.l || $b.r
                          ELSE acc.out || chr(31) || $b.l || $b.r END,
                          'prev': ''}
                  WHEN acc.prev = ''
                    THEN {'out': acc.out, 'prev': s.prev}
                  ELSE {'out': CASE WHEN acc.out = '' THEN acc.prev
                        ELSE acc.out || chr(31) || acc.prev END,
                        'prev': s.prev} END) AS f
              FROM $v, $b))"""
        s"""WITH vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest($Toks5Sql) AS w FROM documents) GROUP BY w),
          v0 AS (SELECT freq, list_transform(range(1, length(w) + 1),
              i -> substr(w, i, 1)) AS syms FROM vocab),
          ${pairsCte("v0", "p1")}, ${bestCte("p1", "b1")},
          ${mergeCte("v0", "b1", "v1")},
          ${pairsCte("v1", "p2")}, ${bestCte("p2", "b2")},
          ${mergeCte("v1", "b2", "v2")}
        SELECT 1 AS merge_round, b1.l AS lhs, b1.r AS rhs,
          b1.cnt AS pair_count,
          (SELECT CAST(SUM(len(syms) * freq) AS BIGINT) FROM v1)
            AS corpus_symbols
        FROM b1
        UNION ALL
        SELECT 2, b2.l, b2.r, b2.cnt,
          (SELECT CAST(SUM(len(syms) * freq) AS BIGINT) FROM v2)
        FROM b2"""
      },
      bench = true),

    GraftQuery(
      "q127_source_kl",
      (s, dir) => Curation.sourceKl(
        Tables.load(s, dir, "documents"), "source", "text"),
      Some(s"""WITH toks AS (SELECT source, unnest($Toks5Sql) AS tok
            FROM documents),
          st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt_s
            FROM toks GROUP BY 1, 2),
          g AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt_g
            FROM toks GROUP BY 1),
          v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM g),
          ts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t_s
            FROM toks GROUP BY 1),
          n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
          term AS (SELECT st.source,
              CAST(${graft.functions.SafeMath.roundHalfUpSql(
                "(CAST(cnt_s AS DOUBLE) / CAST(t_s AS DOUBLE)) * (" +
                graft.functions.SafeMath.roundHalfUpSql(
                  "ln(CAST(cnt_s AS DOUBLE) / CAST(t_s AS DOUBLE))", 8) +
                " - " +
                graft.functions.SafeMath.roundHalfUpSql(
                  "ln(CAST(cnt_g - cnt_s + 1 AS DOUBLE) / " +
                  "CAST(n - t_s + v AS DOUBLE))", 8) + ")",
                8)} AS DECIMAL(28,8)) AS t8
            FROM st JOIN g USING (tok) JOIN ts ON ts.source = st.source,
              v, n),
          kl AS (SELECT source, ${graft.functions.SafeMath.roundHalfUpSql(
              "CAST(SUM(t8) AS DOUBLE)", 6)} AS kl
            FROM term GROUP BY source)
        SELECT kl.source, ts.t_s AS n_tokens, kl.kl
        FROM kl JOIN ts ON ts.source = kl.source""")),

    GraftQuery(
      "q128_budget_select",
      (s, dir) => Curation.budgetSelect(
        Tables.load(s, dir, "documents"), "doc_id", "source", "text",
        budgetTokens = 600L),
      Some(s"""WITH t AS (SELECT doc_id, source,
            CAST(len($Toks5Sql) AS BIGINT) AS n_tokens,
            ${TextQueries.qualitySqlTwin} AS quality FROM documents),
          w AS (SELECT doc_id, source, n_tokens, quality,
            SUM(n_tokens) OVER (PARTITION BY source
              ORDER BY quality DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t)
        SELECT doc_id, source, n_tokens, quality FROM w
        WHERE cum - n_tokens < 600""")),

    GraftQuery(
      "q123_cooccurrence_pmi",
      (s, dir) => Curation.cooccurrencePmi(
        Tables.load(s, dir, "documents"), "text"),
      Some(s"""WITH tk AS (SELECT $Toks5Sql AS tk FROM documents),
          p1 AS (SELECT unnest(list_transform(
              range(0, greatest(len(tk) - 1, 0)),
              i -> {'w1': least(tk[i+1], tk[i+2]),
                    'w2': greatest(tk[i+1], tk[i+2])})) AS p FROM tk),
          p2 AS (SELECT unnest(list_transform(
              range(0, greatest(len(tk) - 2, 0)),
              i -> {'w1': least(tk[i+1], tk[i+3]),
                    'w2': greatest(tk[i+1], tk[i+3])})) AS p FROM tk),
          pairs AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM p1
            UNION ALL SELECT p.w1, p.w2 FROM p2),
          cxy AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
            FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 3),
          uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest($Toks5Sql) AS tok FROM documents)
            GROUP BY tok),
          n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
          d AS (SELECT CAST(SUM(greatest(len(tk) - 1, 0)
              + greatest(len(tk) - 2, 0)) AS BIGINT) AS d FROM tk)
        SELECT c.w1, c.w2, c.c_xy,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "ln((CAST(c.c_xy AS DOUBLE) / CAST(d.d AS DOUBLE)) / " +
            "((CAST(ux.c AS DOUBLE) / CAST(n.n AS DOUBLE)) * " +
            "(CAST(uy.c AS DOUBLE) / CAST(n.n AS DOUBLE))))", 6)} AS pmi
        FROM cxy c
        JOIN uni ux ON ux.tok = c.w1
        JOIN uni uy ON uy.tok = c.w2, n, d""")),

    GraftQuery(
      "q124_curriculum_bins",
      (s, dir) => Curation.curriculumBins(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH t AS (SELECT doc_id,
            CAST(len($Toks5Sql) AS BIGINT) AS difficulty FROM documents),
          c AS (SELECT
            ${graft.functions.SafeMath.roundHalfUpSql(
              "quantile_cont(difficulty, 0.25E0)", 6)} AS c1,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "quantile_cont(difficulty, 0.5E0)", 6)} AS c2,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "quantile_cont(difficulty, 0.75E0)", 6)} AS c3 FROM t)
        SELECT doc_id, difficulty, CAST(1
          + CASE WHEN difficulty > c1 THEN 1 ELSE 0 END
          + CASE WHEN difficulty > c2 THEN 1 ELSE 0 END
          + CASE WHEN difficulty > c3 THEN 1 ELSE 0 END AS INTEGER) AS stage
        FROM t, c""")),

    GraftQuery(
      "q83_tfidf_keywords",
      (s, dir) => Curation.tfidfKeywords(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH tf AS (SELECT doc, term, COUNT(*) AS tf FROM (
              SELECT doc_id AS doc, unnest($Toks5Sql) AS term FROM documents)
            GROUP BY 1, 2),
          n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
          dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
          scored AS (SELECT doc, tf.term, tf.tf, dfx.df,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "CAST(tf.tf AS DOUBLE) * (ln(CAST(n.n + 1 AS DOUBLE) / " +
              "(CAST(dfx.df AS DOUBLE) + 1.0E0)) + 1.0E0)", 6)} AS score
            FROM tf JOIN dfx USING (term), n)
        SELECT doc AS doc_id, term, tf, df, score, CAST(rn AS INTEGER) AS kw_rank
        FROM (SELECT *, row_number()
            OVER (PARTITION BY doc ORDER BY score DESC, term ASC) AS rn
          FROM scored)
        WHERE rn <= 3""")),

    GraftQuery(
      "q88_domain_cap",
      (s, dir) => Curation.domainCap(
          Tables.load(s, dir, "documents"), "doc_id", "source", cap = 10)
        .select("doc_id", "source"),
      Some(s"""WITH t AS (SELECT doc_id, source,
            ${md5Key60Sql("'graft-cap' || CAST(doc_id AS VARCHAR)")} AS key
          FROM documents)
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
            row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS r
          FROM t)
        WHERE r <= 10""")),

    GraftQuery(
      "q89_count_min",
      (s, dir) => {
        // count-min sketch over the token stream; estimates for three
        // present terms and one absent term — the absent term's min
        // exposes whichever counters it collides into, and the oracle
        // reproduces the identical collisions (md5 family).
        val toks = Tables.load(s, dir, "documents")
          .select(explode(
            graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        val sk = graft.operators.Sketches.cmSketch(toks, "tok")
        graft.operators.Sketches.cmsEstimate(sk,
          Seq("spark", "table", "the", "zebra-unseen"))
      },
      Some(s"""WITH toks AS (
            SELECT unnest($Toks5Sql) AS tok FROM documents),
          h AS (SELECT r.j AS j,
              ${md5Key60Sql("'graft-cms' || CAST(r.j AS VARCHAR) || tok")}
                % 1024 AS bucket
            FROM toks, range(0, 4) r(j)),
          counters AS (SELECT j, bucket, COUNT(*) AS c FROM h GROUP BY 1, 2),
          q AS (SELECT t.term, r.j,
              ${md5Key60Sql("'graft-cms' || CAST(r.j AS VARCHAR) || t.term")}
                % 1024 AS bucket
            FROM (SELECT unnest(['spark', 'table', 'the', 'zebra-unseen'])
              AS term) t, range(0, 4) r(j))
        SELECT term, MIN(COALESCE(c.c, 0)) AS est
        FROM q LEFT JOIN counters c ON c.j = q.j AND c.bucket = q.bucket
        GROUP BY term""")),

    GraftQuery(
      "q162_phrase_search",
      (s, dir) => graft.operators.InvertedIndex.phraseMatches(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("value", "table")),
      // exact-phrase retrieval over the positional inverted index: the
      // oracle zips each doc's token list with its ordinals and replays
      // the same (doc, aligned-position) join
      Some(s"""WITH p AS (SELECT doc_id,
            unnest($Toks5Sql) AS term,
            unnest(range(1, len($Toks5Sql) + 1)) AS pos
          FROM documents),
        m AS (SELECT p0.doc_id FROM p p0
          JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
          WHERE p0.term = 'value' AND p1.term = 'table')
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
      FROM m GROUP BY doc_id""")),

    GraftQuery(
      "q163_cms_heavy_hitters",
      (s, dir) => {
        // sketch-quality harness, the CMS analogue of q138's ANN recall:
        // the top-20 heavy hitters by sketch estimate, rank-aligned
        // against the exact top-20 — the artifact a deployment reads to
        // size width×depth. Each top-20 is orderBy+limit — a
        // TakeOrderedAndProject (per-partition k, driver merge) — and
        // only the 20-row results see a rank window: distinct tokens at
        // corpus scale are 10⁸+, so a global row_number over the vocab
        // would be a single-partition sort.
        import org.apache.spark.sql.expressions.Window
        // tokenize once: sketch build, candidate set, and exact counts
        // all read the checkpointed token stream
        val toks = Tables.load(s, dir, "documents")
          .select(explode(
            graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
          .localCheckpoint()
        val sk = graft.operators.Sketches.cmSketch(toks, "tok")
        val est = graft.operators.Sketches.cmsEstimateFrame(
          sk, toks.distinct(), "tok")
        val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        val re = exact
          .orderBy(col("n").desc, col("tok").asc).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("tok").asc)))
          .select(col("rank"), col("tok").as("tok_exact"),
            col("n").as("n_exact"))
        val rc = est
          .orderBy(col("est").desc, col("term").asc).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("est").desc, col("term").asc)))
          .select(col("rank"), col("term").as("tok_cms"),
            col("est").as("est_cms"))
        re.join(rc, "rank")
      },
      Some(s"""WITH toks AS (SELECT unnest($Toks5Sql) AS tok FROM documents),
          exact AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
          hh AS (SELECT r.j AS j,
              ${md5Key60Sql("'graft-cms' || CAST(r.j AS VARCHAR) || tok")}
                % 1024 AS bucket
            FROM toks, range(0, 4) r(j)),
          counters AS (SELECT j, bucket, COUNT(*) AS c FROM hh GROUP BY 1, 2),
          cand AS (SELECT DISTINCT tok FROM toks),
          estq AS (SELECT t.tok, r.j,
              ${md5Key60Sql("'graft-cms' || CAST(r.j AS VARCHAR) || t.tok")}
                % 1024 AS bucket
            FROM cand t, range(0, 4) r(j)),
          est AS (SELECT q.tok, MIN(COALESCE(c.c, 0)) AS est
            FROM estq q LEFT JOIN counters c
              ON c.j = q.j AND c.bucket = q.bucket
            GROUP BY q.tok),
          re AS (SELECT tok, n, row_number()
              OVER (ORDER BY n DESC, tok ASC) AS rank FROM exact),
          rc AS (SELECT tok, est, row_number()
              OVER (ORDER BY est DESC, tok ASC) AS rank FROM est)
        SELECT CAST(re.rank AS INTEGER) AS rank, re.tok AS tok_exact,
          CAST(re.n AS BIGINT) AS n_exact, rc.tok AS tok_cms,
          CAST(rc.est AS BIGINT) AS est_cms
        FROM re JOIN rc ON rc.rank = re.rank WHERE re.rank <= 20""")),

    GraftQuery(
      "q90_length_band",
      (s, dir) => Curation.lengthBandFilter(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "n_tokens"),
      Some(s"""WITH t AS (SELECT doc_id, lang,
            CAST(len($Toks5Sql) AS BIGINT) AS n_tokens FROM documents),
          b AS (SELECT quantile_cont(n_tokens, 0.05E0) AS lo,
            quantile_cont(n_tokens, 0.95E0) AS hi FROM t)
        SELECT doc_id, lang, n_tokens FROM t, b
        WHERE n_tokens >= lo AND n_tokens <= hi""")),

    GraftQuery(
      "q92_full_curation",
      (s, dir) => {
        // the composed pipeline over a doubled corpus (so exact dedup has
        // real work): dedup → length band → quality ≥ 0.5 → en sampled at
        // 0.8 → split. One gate proves the stages compose.
        // doubled corpus via ONE scan: explode a 2-offset array instead
        // of a self-union (the union planned + scanned documents twice
        // per action)
        val corpus = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"),
            explode(array(lit(0L), lit(100000L))).as("__off"))
          .select((col("doc_id") + col("__off")).as("doc_id"),
            col("text"), col("lang"))
        Curation.curate(corpus, "doc_id", "text", "lang",
            qualityMin = 0.5, rates = Map("en" -> 0.8),
            defaultRate = 1.0, salt = "graft-c92")
          .select("doc_id", "lang", "n_tokens", "split")
      },
      Some(s"""WITH c AS (
            SELECT doc_id, text, lang FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text, lang FROM documents),
          f AS (SELECT *,
            md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM c),
          ded AS (SELECT doc_id, text, lang FROM (
              SELECT doc_id, text, lang,
                row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
              FROM f) WHERE rn = 1),
          tok AS (SELECT doc_id, lang, text,
              CAST(len($Toks5Sql) AS BIGINT) AS n_tokens FROM ded),
          b AS (SELECT quantile_cont(n_tokens, 0.05E0) AS lo,
              quantile_cont(n_tokens, 0.95E0) AS hi FROM tok),
          band AS (SELECT doc_id, lang, text, n_tokens FROM tok, b
            WHERE n_tokens >= lo AND n_tokens <= hi),
          good AS (SELECT doc_id, lang, n_tokens FROM band
            WHERE ${TextQueries.qualitySqlTwin} >= 0.5E0),
          samp AS (SELECT * FROM good
            WHERE ${md5Key60Sql("'graft-c92' || CAST(doc_id AS VARCHAR)")}
                % 10000 <
              CASE WHEN lang = 'en' THEN 8000 ELSE 10000 END)
        SELECT doc_id, lang, n_tokens,
          CASE WHEN ${md5Key60Sql("'graft-split' || CAST(doc_id AS VARCHAR)")} % 100 < 80
                 THEN 'train'
               WHEN ${md5Key60Sql("'graft-split' || CAST(doc_id AS VARCHAR)")} % 100 < 90
                 THEN 'val'
               ELSE 'test' END AS split
        FROM samp"""),
      bench = true),

    GraftQuery(
      "q58_quantized_cosine_topk",
      (s, dir) => {
        // int8 max-abs quantization (4× smaller vectors at scale), then
        // brute-force top-k on the dequantized values. Quantize + score
        // run as ONE native pass (Int8QueryCosine — bit-identical fused
        // form of dequantCosine ∘ quantizeInt8, parity-spec'd); the
        // split Columns remain the API for pipelines that materialize
        // the codes.
        val query = VectorQueries.queryVec(s, dir)
        Tables.load(s, dir, "embeddings")
          .select(col("vec_id"),
            Curation.int8QueryCosine(col("embedding"), query).as("cos"))
          .orderBy(col("cos").desc, col("vec_id").asc)
          .limit(10)
      },
      Some {
        val deq = s"""list_transform(range(1, ${Dim + 1}),
          i -> CASE WHEN scale = 0.0E0 THEN 0.0E0
            ELSE CAST(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * scale + 0.5E0) AS INTEGER) AS DOUBLE) / scale END)"""
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          sc AS (
            SELECT vec_id, embedding,
              CASE WHEN list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) = 0.0E0
                THEN 0.0E0
                ELSE 127.0E0 / list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) END AS scale
            FROM embeddings),
          deq AS (SELECT vec_id, $deq AS dv FROM sc)
          SELECT vec_id, cos FROM (
            SELECT d.vec_id,
              (FLOOR((${dotSql("dv", "qv")} /
                (sqrt(${dotSql("dv", "dv")}) * sqrt(${dotSql("qv", "qv")})))
                * 1000000.0E0 + 0.5E0) / 1000000.0E0) AS cos
            FROM deq d, q)
          ORDER BY cos DESC, vec_id ASC LIMIT 10"""
      },
      bench = true),

    GraftQuery(
      "q59_stratified_sample",
      (s, dir) => {
        // per-language deterministic sampling: hash-mod decision, no RNG,
        // no shuffle — replay-safe curation.
        val d = Tables.load(s, dir, "documents")
        Curation.stratifiedSample(d, "doc_id", "lang",
            Map("en" -> 0.5, "zh" -> 0.9), defaultRate = 0.25,
            salt = "graft-s59")
          .select("doc_id", "lang", "source")
      },
      Some(s"""SELECT doc_id, lang, source FROM documents
        WHERE (${md5Key60Sql("'graft-s59' || doc_id")}) % 10000 <
          CASE WHEN lang = 'en' THEN 5000
               WHEN lang = 'zh' THEN 9000
               ELSE 2500 END""")),

    GraftQuery(
      "q60_pack_bins",
      (s, dir) => {
        // concatenate-and-chunk packing into 2048-token bins per language
        // stream: one window shuffle on the stream key.
        val d = Tables.load(s, dir, "documents")
        Curation.packBins(d, "lang", "doc_id",
            graft.functions.TextFunctions.tokenCount(col("text")).cast("long"),
            binTokens = 2048L)
          .select("doc_id", "lang", "n_tokens", "bin")
      },
      Some(s"""SELECT doc_id, lang,
          CAST(len($Toks5Sql) AS BIGINT) AS n_tokens,
          CAST((SUM(CAST(len($Toks5Sql) AS BIGINT))
              OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            - len($Toks5Sql)) // 2048 AS BIGINT) AS bin
        FROM documents""")),

    GraftQuery(
      "q234_balanced_shards",
      (s, dir) => {
        // snake-draft shard export: 8 fixed shards, whole documents,
        // per-shard token totals within one max-document of equal. The
        // oracle replays the serpentine arithmetic over the same global
        // (tokens desc, id) rank.
        val d = Tables.load(s, dir, "documents")
        Curation.balancedShards(d.select("doc_id", "lang", "text"),
            "doc_id",
            graft.functions.TextFunctions.tokenCount(col("text")).cast("long"),
            nShards = 8)
          .select("doc_id", "lang", "n_tokens", "shard")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang,
            CAST(len($Toks5Sql) AS BIGINT) AS n_tokens FROM documents),
          r AS (SELECT doc_id, lang, n_tokens,
            row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) - 1 AS pos
            FROM t)
        SELECT doc_id, lang, n_tokens,
          CAST(CASE WHEN (pos // 8) % 2 = 0 THEN pos % 8
               ELSE 7 - (pos % 8) END AS BIGINT) AS shard
        FROM r""")),

    GraftQuery(
      "q61_decontaminate",
      (s, dir) => {
        // benchmark decontamination: any shared word 5-gram with the
        // benchmark slice flags the document.
        val d = Tables.load(s, dir, "documents")
        val bench = d.filter(col("doc_id") % 25 === 0)
        Curation.flagContaminated(d, "doc_id", "text", bench, "text", k = 5)
          .select("doc_id", "lang", "is_contaminated")
      },
      Some(s"""WITH docsh AS (
          SELECT DISTINCT doc_id AS doc, sh FROM (
            SELECT doc_id, unnest($Shingles5Sql) AS sh FROM documents)),
        bsh AS (
          SELECT DISTINCT sh FROM (
            SELECT unnest($Shingles5Sql) AS sh FROM documents
            WHERE doc_id % 25 = 0)),
        hits AS (
          SELECT DISTINCT doc FROM docsh WHERE sh IN (SELECT sh FROM bsh))
        SELECT d.doc_id, d.lang, (h.doc IS NOT NULL) AS is_contaminated
        FROM documents d LEFT JOIN hits h ON h.doc = d.doc_id"""),
      bench = true),

    GraftQuery(
      "q95_drop_frequent_lines",
      (s, dir) => {
        // corpus-wide boilerplate-line removal over synthesized multi-line
        // docs (the documents table has no newlines): an everywhere line
        // (df = N) and a half-the-corpus line (df ≈ N/2) must be dropped
        // at the 5% bar; a ~1% line (k%97) and the per-doc unique lines
        // must survive.
        val k = col("doc_id")
        val text = concat_ws("\n",
          concat(lit("doc "), k, lit(" opening line.")),
          lit("All Rights Reserved."),
          when(k % 2 === 0, lit("subscribe to our newsletter.")),
          when(k % 97 === 0, lit("limited time offer!")),
          concat(lit("closing thoughts for doc "), k, lit(".")))
        val docs = Tables.load(s, dir, "documents")
          .select(k.as("doc_id"), text.as("text"))
        Curation.dropFrequentLines(docs, "doc_id", "text", maxDocFrac = 0.05)
      },
      Some("""WITH t AS (SELECT doc_id, concat_ws(chr(10),
            'doc ' || doc_id || ' opening line.',
            'All Rights Reserved.',
            CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter.' END,
            CASE WHEN doc_id % 97 = 0 THEN 'limited time offer!' END,
            'closing thoughts for doc ' || doc_id || '.') AS text
          FROM documents),
        n AS (SELECT CAST(FLOOR(COUNT(*) * 0.05E0) AS BIGINT) AS cut FROM t),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM t),
        ex AS (SELECT doc_id, unnest(lines) AS line,
            unnest(range(0, len(lines))) AS pos FROM ls),
        ek AS (SELECT doc_id, pos, line, md5(trim(lower(line))) AS k FROM ex),
        freq AS (SELECT k FROM (
            SELECT k, COUNT(*) AS df FROM (SELECT DISTINCT k, doc_id FROM ek)
            GROUP BY k), n
          WHERE df > cut),
        kept AS (SELECT doc_id,
            array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
            CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM ek WHERE k NOT IN (SELECT k FROM freq)
          GROUP BY doc_id)
        SELECT t.doc_id, COALESCE(kept.clean_text, '') AS clean_text,
          COALESCE(kept.n_kept, 0) AS n_kept,
          CAST(len(ls.lines) AS BIGINT) - COALESCE(kept.n_kept, 0) AS n_removed
        FROM t JOIN ls USING (doc_id)
        LEFT JOIN kept ON kept.doc_id = t.doc_id""")),

    GraftQuery(
      "q96_bloom_membership",
      (s, dir) => {
        // decontamination by COMPACT membership: a 128-bit Bloom filter
        // over the benchmark docs' content fingerprints (4 BIGINT words
        // → broadcast) probed with every document's fingerprint. mBits is
        // deliberately small so false positives occur — they are
        // deterministic on the md5 family, so the oracle reproduces the
        // exact collision set.
        import graft.functions.TextFunctions
        val d = Tables.load(s, dir, "documents")
        val bench = d.filter(col("doc_id") % 25 === 0)
          .select(TextFunctions.fingerprint(col("text")).as("fp"))
        val bloom = graft.operators.Sketches.bloomBuild(
          bench, "fp", mBits = 128, k = 5, salt = "graft-b96")
        val probes = d.select(col("doc_id"), col("lang"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        val flags = graft.operators.Sketches.bloomMightContain(
          bloom, probes.select("fp").distinct(), "fp",
          mBits = 128, k = 5, salt = "graft-b96")
        probes.join(flags, Seq("fp"), "left")
          .select(col("doc_id"), col("lang"), col("in_bloom"))
      },
      Some(s"""WITH bk AS (
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents WHERE doc_id % 25 = 0),
          pos AS (SELECT
              ${md5Key60Sql("'graft-b96' || CAST(r.j AS VARCHAR) || fp")}
                % 128 AS h
            FROM bk, range(0, 5) r(j)),
          words AS (SELECT CAST(h // 32 AS INTEGER) AS word,
              bit_or(CAST(1 AS BIGINT) << CAST(h % 32 AS INTEGER)) AS bits
            FROM pos GROUP BY 1),
          pk AS (SELECT doc_id, lang,
              md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents),
          pp AS (SELECT fp, CAST(h // 32 AS INTEGER) AS word,
              CAST(h % 32 AS INTEGER) AS bit
            FROM (SELECT fp,
                ${md5Key60Sql("'graft-b96' || CAST(r.j AS VARCHAR) || fp")}
                  % 128 AS h
              FROM (SELECT DISTINCT fp FROM pk), range(0, 5) r(j))),
          hits AS (SELECT fp,
              bool_and(COALESCE((bits >> bit) & 1 = 1, false)) AS in_bloom
            FROM pp LEFT JOIN words USING (word) GROUP BY fp)
        SELECT pk.doc_id, pk.lang, hits.in_bloom
        FROM pk JOIN hits USING (fp)""")),

    GraftQuery(
      "q67_repetition_stats",
      (s, dir) => Curation.repetitionStats(
        Tables.load(s, dir, "documents"), "doc_id", "text", n = 2),
      Some {
        val toks = Toks5Sql
        val bigrams =
          s"""list_transform(
             range(0, greatest(len($toks) - 1, 0)),
             i -> array_to_string(list_slice($toks, i + 1, i + 2), ' '))"""
        s"""WITH base AS (
            SELECT doc_id AS doc,
              CAST(len($toks) AS BIGINT) AS n_tokens,
              CASE WHEN len($toks) = 0 THEN 0.0E0
                ELSE 1.0E0 - CAST(len(list_distinct($toks)) AS DOUBLE)
                  / CAST(len($toks) AS DOUBLE) END AS token_dup_ratio
            FROM documents),
          g AS (SELECT doc_id AS doc, unnest($bigrams) AS g FROM documents),
          gc AS (SELECT doc, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
          topf AS (SELECT doc,
              CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_ngram_frac
            FROM gc GROUP BY doc)
          SELECT b.doc, b.n_tokens, b.token_dup_ratio, t.top_ngram_frac
          FROM base b LEFT JOIN topf t ON t.doc = b.doc"""
      }),

    GraftQuery(
      "q102_doc_chunks",
      (s, dir) => Curation.chunkOverlap(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        width = 64, stride = 48),
      // DuckDB 1.0 range() can't take lateral column args, so the chunk
      // starts come from a fixed 64-slot series filtered per doc — the
      // corpus max is ~100 tokens/doc (3 starts); 64 covers 3072 tokens
      Some(s"""WITH t AS (SELECT doc_id, $Toks5Sql AS toks FROM documents),
          c AS (SELECT doc_id, toks, CAST(g.i AS INTEGER) AS chunk_id,
              CAST(g.i * 48 AS INTEGER) AS start
            FROM t, range(0, 64) g(i)
            WHERE g.i * 48 <= greatest(len(toks) - 1, 0))
        SELECT doc_id, chunk_id,
          array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text,
          CAST(least(len(toks) - start, 64) AS BIGINT) AS n_tokens
        FROM c"""),
      bench = true),

    GraftQuery(
      "q109_weighted_sample",
      (s, dir) => {
        // length-weighted sampling: docs with >= 2000 chars always kept,
        // shorter ones proportionally — the integer ppm weight keeps the
        // keep decision engine-exact and monotone in the weight.
        val d = Tables.load(s, dir, "documents")
        Curation.weightedSample(d, "doc_id",
          col("n_chars") * 500L, salt = "graft-wsample")
          .select("doc_id", "n_chars")
      },
      Some(s"""SELECT doc_id, n_chars FROM documents
        WHERE ${md5Key60Sql("'graft-wsample' || CAST(doc_id AS VARCHAR)")}
          % 1000000 < least(greatest(n_chars * 500, 0), 1000000)""")),

    GraftQuery(
      "q112_top_p_trim",
      (s, dir) => Curation.topPTrim(
        Tables.load(s, dir, "documents")
          .select("doc_id", "source", "n_chars"),
        "source", "doc_id", "n_chars", pNum = 8, pDen = 10),
      Some("""WITH r AS (SELECT doc_id, source, n_chars,
            CAST(SUM(n_chars) OVER (PARTITION BY source
              ORDER BY n_chars DESC, doc_id ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight,
            CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT) AS tot
          FROM documents)
        SELECT doc_id, source, n_chars, cum_weight
        FROM r WHERE cum_weight - n_chars < (tot * 8) // 10""")),

    GraftQuery(
      "q176_exact_k_per_group",
      (s, dir) => {
        // balanced-subset primitive: exactly 50 events per type, chosen
        // by salted-hash order (replay-stable, partitioning-independent)
        // — the "k examples per class" eval-set cut that rate-based
        // sampling (q59) can't promise. One shuffle on the class key.
        val ev = graft.core.Tables.events(s, dir)
          .select(col("event_id"), col("event_type"))
        graft.operators.Curation.exactKPerGroup(
          ev, "event_type", "event_id", k = 50, salt = "graft-k")
      },
      Some(s"""SELECT event_id, event_type FROM (
          SELECT event_id, event_type, row_number() OVER (
              PARTITION BY event_type
              ORDER BY ${md5Key60Sql(
                "'graft-k' || CAST(event_id AS VARCHAR)")} ASC,
                event_id ASC) AS rn
          FROM events) WHERE rn <= 50""")),

    GraftQuery(
      "q177_table_checksum",
      (s, dir) => {
        // cross-replica integrity: per-day (row count, XOR of a portable
        // md5 row hash) — two replicas diff these tiny frames to find
        // the exact bucket that diverged, without comparing rows. XOR
        // is order-independent, so partition layout can't perturb it;
        // the same query on any engine (here: the DuckDB oracle itself)
        // reproduces the checksum bit-for-bit.
        val o = graft.core.Tables.load(s, dir, "orders")
          .withColumn("bucket_d",
            unix_timestamp(date_trunc("day", col("o_orderdate"))))
        graft.operators.Audit.tableChecksum(o, "bucket_d",
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      },
      Some(s"""WITH r AS (SELECT
            CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS bucket,
            ${md5Key60Sql(
              "COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)) || chr(31) || " +
              "COALESCE(CAST(o_custkey AS VARCHAR), chr(0)) || chr(31) || " +
              "COALESCE(o_orderstatus, chr(0)) || chr(31) || " +
              "COALESCE(o_orderpriority, chr(0))")} AS rk
          FROM orders)
        SELECT bucket, COUNT(*) AS n_rows, bit_xor(rk) AS xor_key
        FROM r GROUP BY 1""")),

    GraftQuery(
      "q237_kn_bigram_nll",
      (s, dir) => Curation.knBigramLogProb(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      // interpolated Kneser-Ney (D=0.75) sibling of q166's add-one LM:
      // all stats derive from the distinct-bigram count table; the
      // probability is pure IEEE arithmetic on integer counts with
      // mirrored parenthesization, ln rounded at scale 8 (q82 recipe)
      Some(s"""WITH $KnNllCteSql
        SELECT dd.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
          COALESCE(a.kn_nll, 0.0E0) AS kn_nll
        FROM documents dd LEFT JOIN agg a ON a.doc = dd.doc_id""")),

    GraftQuery(
      "q238_train_logistic",
      (s, dir) => {
        val t = col("text")
        Curation.trainLogistic(Tables.load(s, dir, "documents"), "doc_id",
          when(col("lang") === "en", 1L).otherwise(0L),
          Seq(
            least(graft.functions.TextFunctions.tokenCount(t)
              .cast("double") / lit(100.0), lit(1.0)),
            graft.functions.TextFunctions.stopwordRatio(t),
            graft.functions.TextFunctions.punctRatio(t),
            graft.functions.TextFunctions.meanTokenLen(t) / lit(10.0)),
          epochs = 3, lr = 0.5)
      },
      Some(logisticOracleSql(epochs = 3, lr = 0.5))),

    GraftQuery(
      "q239_zipf_fit",
      (s, dir) => Curation.zipfFit(Tables.load(s, dir, "documents"), "text"),
      Some {
        // micro-unit sums are exact BIGINTs on both engines; the OLS
        // closed form is then bit-identical IEEE (splice the shared
        // num/den fragments so both engines fold identically)
        val nd = "CAST(n AS DOUBLE)"
        val sxd = "(CAST(sx AS DOUBLE) / 1000.0E0)"
        val syd = "(CAST(sy AS DOUBLE) / 1000.0E0)"
        val sxyd = "(CAST(sxy AS DOUBLE) / 1000000.0E0)"
        val sxxd = "(CAST(sxx AS DOUBLE) / 1000000.0E0)"
        val syyd = "(CAST(syy AS DOUBLE) / 1000000.0E0)"
        val num = s"(($nd * $sxyd) - ($sxd * $syd))"
        val denX = s"(($nd * $sxxd) - ($sxd * $sxd))"
        val denY = s"(($nd * $syyd) - ($syd * $syd))"
        val slope = s"(CASE WHEN $denX = 0.0E0 THEN 0.0E0 ELSE $num / $denX END)"
        s"""WITH toks AS (SELECT unnest($Toks5Sql) AS tok FROM documents),
          freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
            GROUP BY tok),
          ranked AS (SELECT cnt,
              ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank
            FROM freq),
          pts AS (SELECT
              CAST(FLOOR((ln(CAST(rank AS DOUBLE)) * 1000.0E0) + 0.5E0)
                AS BIGINT) AS x3,
              CAST(FLOOR((ln(CAST(cnt AS DOUBLE)) * 1000.0E0) + 0.5E0)
                AS BIGINT) AS y3
            FROM ranked),
          s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(x3) AS BIGINT) AS sx, CAST(SUM(y3) AS BIGINT) AS sy,
              CAST(SUM(x3 * y3) AS BIGINT) AS sxy,
              CAST(SUM(x3 * x3) AS BIGINT) AS sxx,
              CAST(SUM(y3 * y3) AS BIGINT) AS syy
            FROM pts)
        SELECT n AS n_types,
          ${graft.functions.SafeMath.roundHalfUpSql(slope, 6)} AS slope,
          ${graft.functions.SafeMath.roundHalfUpSql(
            s"(CASE WHEN n = 0 THEN 0.0E0 ELSE ($syd - ($slope * $sxd)) / $nd END)",
            6)} AS intercept,
          ${graft.functions.SafeMath.roundHalfUpSql(
            s"(CASE WHEN ($denX * $denY) = 0.0E0 THEN 0.0E0 ELSE ($num * $num) / ($denX * $denY) END)",
            6)} AS r2
        FROM s"""
      }),

    GraftQuery(
      "q244_blocklist_filter",
      (s, dir) => Curation.blocklistFilter(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("boilerplate" -> Seq("batch batch", "window window"),
          "spam" -> Seq("slow key", "dup"))),
      // occurrence counts via the length-delta-of-replace identity —
      // exact non-overlapping left-to-right matches on both engines
      Some {
        def hits(phrases: Seq[String]): String = phrases.map { p =>
          s"((length(t) - length(replace(t, '$p', ''))) // ${p.length})"
        }.mkString("(", " + ", ")")
        val b = hits(Seq("batch batch", "window window"))
        val sp = hits(Seq("slow key", "dup"))
        s"""SELECT doc_id, CAST($b AS BIGINT) AS hits_boilerplate,
          CAST($sp AS BIGINT) AS hits_spam,
          CAST($b + $sp AS BIGINT) AS total_hits,
          ($b + $sp) = 0 AS keep
        FROM (SELECT doc_id, lower(text) AS t FROM documents)"""
      }),

    GraftQuery(
      "q248_doremi_weights",
      (s, dir) => Curation.doremiWeights(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source"),
      // DoReMi-lite: per-domain mean unigram NLL → excess over the corpus
      // baseline → softmax in exact 1e-8 units; every division and the
      // exp-snap are mirrored, so the 20-domain weight vector hash-gates
      Some {
        val rh = graft.functions.SafeMath.roundHalfUpSql _
        s"""WITH toks AS (SELECT source AS d, unnest($Toks5Sql) AS tok
              FROM documents),
          freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
            GROUP BY tok),
          tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
          sc AS (SELECT d, ${rh(
            "-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))", 8)} AS nll8
            FROM toks JOIN freq USING (tok), tot),
          dom AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              ${rh("CAST(SUM(CAST(nll8 AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)",
                8)} AS mean_nll
            FROM sc GROUP BY d),
          base AS (SELECT ${rh(
            "CAST(SUM(CAST(nll8 AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)",
            8)} AS b FROM sc),
          x AS (SELECT d, n_tokens, mean_nll,
              GREATEST(mean_nll - b, 0.0E0) AS excess FROM dom, base),
          e AS (SELECT d, n_tokens, mean_nll, excess,
              CAST(FLOOR((exp(excess / 1.0E0) * 100000000.0E0) + 0.5E0)
                AS BIGINT) AS e8 FROM x),
          se AS (SELECT CAST(SUM(e8) AS BIGINT) AS s FROM e)
        SELECT d AS source, n_tokens, mean_nll, excess,
          ${rh("CAST(e8 AS DOUBLE) / CAST(s AS DOUBLE)", 6)} AS weight
        FROM e, se"""
      }),

    GraftQuery(
      "q252_template_mining",
      (s, dir) => Curation.templateMining(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source"),
      // positional-entropy template detector: the oracle replays the
      // capped posexplode, the q125 rounded-ln entropy terms, the
      // DECIMAL(28,12) sums, and the micro-unit positional mean
      Some {
        val rh = graft.functions.SafeMath.roundHalfUpSql _
        val pSql = "(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))"
        s"""WITH pos AS (SELECT g, i.i AS pos, toks[i.i + 1] AS tok
            FROM (SELECT source AS g, $Toks5Sql AS toks FROM documents) t,
              range(0, 16) i(i) WHERE i.i < len(toks)),
          cnts AS (SELECT g, pos, tok, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM pos GROUP BY 1, 2, 3),
          tots AS (SELECT g, pos, CAST(SUM(cnt) AS BIGINT) AS tot
            FROM cnts GROUP BY 1, 2),
          terms AS (SELECT g, pos, ${rh(
            s"$pSql * ${rh(s"ln($pSql)", 8)}", 12)} AS t12
            FROM cnts JOIN tots USING (g, pos)),
          ent AS (SELECT g, pos, ${rh(
            "-(CAST(SUM(CAST(t12 AS DECIMAL(28,12))) AS DOUBLE))", 6)} AS ent
            FROM terms GROUP BY 1, 2),
          e6 AS (SELECT g,
              CAST(FLOOR(ent * 1000000.0E0 + 0.5E0) AS BIGINT) AS e6
            FROM ent),
          per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_pos,
              ${rh("CAST(SUM(e6) AS DOUBLE) / (COUNT(*) * 1000000.0E0)",
                6)} AS mean_pos_entropy
            FROM e6 GROUP BY g),
          nd AS (SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1)
        SELECT per.g AS source, nd.n_docs, per.n_pos, per.mean_pos_entropy
        FROM per JOIN nd USING (g)"""
      }),

    GraftQuery(
      "q257_unimax_alloc",
      (s, dir) => {
        // UniMax waterfilling over a deliberately SKEWED domain census:
        // three sources are replicated 4x so the gate exercises both
        // branches — small domains hit the maxEpochs cap, the oversized
        // ones split the remaining budget equally. The budget is
        // 3 total-epochs-worth of the corpus (one bounded scalar collect
        // — in production the budget is a config knob, not data).
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("source"))
        val extra = d.filter(col("source").isin("src0", "src1", "src2"))
        val corpus = d.unionAll(extra).unionAll(extra).unionAll(extra)
        val total = corpus.agg(
          sum(graft.functions.TextFunctions.tokenCount(col("text")))
            .cast("long")).head.getLong(0)
        Curation.unimaxAllocation(corpus, "text", "source",
          budgetTokens = 3L * total, maxEpochs = 4)
      },
      // the oracle recomputes the same budget (3·Σtokens) and replays the
      // prefix-capped waterfilling with the identical all-integer
      // arithmetic: ROWS-framed cumulative cap test, unbounded-window
      // capped census, // share split, remainder to the largest domain
      Some {
        val cnt = s"len($Toks5Sql)"
        s"""WITH corpus AS (
            SELECT text, source FROM documents
            UNION ALL SELECT text, source FROM documents
              WHERE source IN ('src0', 'src1', 'src2')
            UNION ALL SELECT text, source FROM documents
              WHERE source IN ('src0', 'src1', 'src2')
            UNION ALL SELECT text, source FROM documents
              WHERE source IN ('src0', 'src1', 'src2')),
          cen AS (SELECT source, CAST(SUM($cnt) AS BIGINT) AS n_tokens
            FROM corpus GROUP BY source),
          bb AS (SELECT CAST(3 * SUM(n_tokens) AS BIGINT) AS b FROM cen),
          r AS (SELECT source, n_tokens, n_tokens * 4 AS ec,
              CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, source)
                AS BIGINT) AS i,
              CAST(COUNT(*) OVER () AS BIGINT) AS n,
              CAST(SUM(n_tokens * 4) OVER (ORDER BY n_tokens, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM cen),
          f AS (SELECT r.*, bb.b,
              (ec * (n - i) + cum <= bb.b) AS capped FROM r, bb),
          g AS (SELECT f.*,
              CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()
                AS BIGINT) AS k,
              CAST(SUM(CASE WHEN capped THEN ec ELSE 0 END) OVER ()
                AS BIGINT) AS s_k
            FROM f),
          h AS (SELECT *, CASE WHEN k < n THEN (b - s_k) // (n - k)
              ELSE CAST(0 AS BIGINT) END AS share FROM g),
          a AS (SELECT source, n_tokens, capped,
              CASE WHEN capped THEN ec WHEN i < n THEN share
                ELSE share + (b - s_k) - share * (n - k)
              END AS alloc_tokens
            FROM h)
        SELECT source, n_tokens,
          CAST(alloc_tokens AS BIGINT) AS alloc_tokens, capped,
          CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (alloc_tokens * 1000) // n_tokens END AS BIGINT)
            AS epochs_milli
        FROM a"""
      }),

    GraftQuery(
      "q259_heaps_fit",
      (s, dir) => Curation.heapsFit(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        checkpoints = 8),
      // the oracle recomputes the checkpoint buckets with the identical
      // integer ceiling arithmetic, the J-row cumulative curves, the
      // scale-3 ln snap, and the spliced OLS closed form (q239's recipe)
      Some {
        val nd = "CAST(n AS DOUBLE)"
        val sxd = "(CAST(sx AS DOUBLE) / 1000.0E0)"
        val syd = "(CAST(sy AS DOUBLE) / 1000.0E0)"
        val sxyd = "(CAST(sxy AS DOUBLE) / 1000000.0E0)"
        val sxxd = "(CAST(sxx AS DOUBLE) / 1000000.0E0)"
        val syyd = "(CAST(syy AS DOUBLE) / 1000000.0E0)"
        val num = s"(($nd * $sxyd) - ($sxd * $syd))"
        val denX = s"(($nd * $sxxd) - ($sxd * $sxd))"
        val denY = s"(($nd * $syyd) - ($syd * $syd))"
        val beta = s"(CASE WHEN $denX = 0.0E0 THEN 0.0E0 ELSE $num / $denX END)"
        s"""WITH mxx AS (SELECT greatest(CAST(MAX(doc_id) AS BIGINT),
              CAST(1 AS BIGINT)) AS mx FROM documents),
          db AS (SELECT greatest(
                (CAST(doc_id AS BIGINT) * 8 + mx - 1) // mx,
                CAST(1 AS BIGINT)) AS b,
              CAST(COUNT(*) AS BIGINT) AS dn
            FROM documents, mxx GROUP BY 1),
          tk AS (SELECT doc_id, unnest($Toks5Sql) AS tok FROM documents),
          fid AS (SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS fid FROM tk
            GROUP BY tok),
          tb AS (SELECT greatest((fid * 8 + mx - 1) // mx,
                CAST(1 AS BIGINT)) AS b,
              CAST(COUNT(*) AS BIGINT) AS vn
            FROM fid, mxx GROUP BY 1),
          spine AS (SELECT CAST(unnest(range(1, 9)) AS BIGINT) AS b),
          curve AS (SELECT s.b,
              CAST(SUM(COALESCE(dn, 0)) OVER (ORDER BY s.b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_docs,
              CAST(SUM(COALESCE(vn, 0)) OVER (ORDER BY s.b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_types
            FROM spine s LEFT JOIN db USING (b) LEFT JOIN tb USING (b)),
          pts AS (SELECT n_docs, n_types,
              CAST(FLOOR((ln(CAST(n_docs AS DOUBLE)) * 1000.0E0) + 0.5E0)
                AS BIGINT) AS x3,
              CAST(FLOOR((ln(CAST(n_types AS DOUBLE)) * 1000.0E0) + 0.5E0)
                AS BIGINT) AS y3
            FROM curve WHERE n_docs > 0 AND n_types > 0),
          s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(COALESCE(MAX(n_docs), 0) AS BIGINT) AS total_docs,
              CAST(COALESCE(MAX(n_types), 0) AS BIGINT) AS total_types,
              CAST(SUM(x3) AS BIGINT) AS sx, CAST(SUM(y3) AS BIGINT) AS sy,
              CAST(SUM(x3 * y3) AS BIGINT) AS sxy,
              CAST(SUM(x3 * x3) AS BIGINT) AS sxx,
              CAST(SUM(y3 * y3) AS BIGINT) AS syy
            FROM pts)
        SELECT n AS n_points, total_docs AS n_docs, total_types AS n_types,
          ${graft.functions.SafeMath.roundHalfUpSql(beta, 6)} AS beta,
          ${graft.functions.SafeMath.roundHalfUpSql(
            s"(CASE WHEN n = 0 THEN 0.0E0 ELSE ($syd - ($beta * $sxd)) / $nd END)",
            6)} AS intercept,
          ${graft.functions.SafeMath.roundHalfUpSql(
            s"(CASE WHEN ($denX * $denY) = 0.0E0 THEN 0.0E0 ELSE ($num * $num) / ($denX * $denY) END)",
            6)} AS r2
        FROM s"""
      }),

    GraftQuery(
      "q263_ks_shift",
      (s, dir) => {
        // per-source two-sample KS over doc-length distributions, with
        // src0 deliberately TRUNCATED so its CDF visibly left-shifts —
        // the drift the meter exists to catch fires under the gate, and
        // every untouched source's D stays near the sampling floor
        val d = Tables.load(s, dir, "documents")
          .select(col("text"), col("source"))
        val mutated = d.withColumn("text",
          when(col("source") === "src0", substring(col("text"), 1, 80))
            .otherwise(col("text")))
        val lens = mutated.select(col("source"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("len"))
        Curation.ksShift(lens, "source", "len", binWidth = 8L, bins = 128)
      },
      // exact-integer CDF gaps in HUGEINT (Spark: DECIMAL(38,0)), one
      // division per source, scale-6 snap
      Some {
        val cnt = s"len($Toks5Sql)"
        s"""WITH m AS (SELECT source,
              CASE WHEN source = 'src0' THEN substr(text, 1, 80)
                ELSE text END AS text
            FROM documents),
          v AS (SELECT source,
              CAST(greatest(least($cnt // 8, 127), 0) AS BIGINT) AS bin FROM m),
          sb AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c_sb
            FROM v GROUP BY 1, 2),
          gb AS (SELECT bin, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM sb
            GROUP BY 1),
          t AS (SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_s FROM sb
            GROUP BY 1),
          nn AS (SELECT CAST(SUM(c_sb) AS BIGINT) AS n FROM sb),
          grid AS (SELECT t.source, t.n_s, CAST(r.b AS BIGINT) AS bin
            FROM t, range(0, 128) r(b)),
          cum AS (SELECT g.source, g.n_s, g.bin,
              SUM(COALESCE(sb.c_sb, 0)) OVER (PARTITION BY g.source
                ORDER BY g.bin ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS scum,
              SUM(COALESCE(gb.c_b, 0)) OVER (PARTITION BY g.source
                ORDER BY g.bin ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS gcum
            FROM grid g
            LEFT JOIN sb ON sb.source = g.source AND sb.bin = g.bin
            LEFT JOIN gb ON gb.bin = g.bin),
          gap AS (SELECT source, n_s,
              abs(CAST(scum AS HUGEINT) * (n - n_s) -
                CAST(gcum - scum AS HUGEINT) * n_s) AS gap
            FROM cum, nn)
        SELECT source, MAX(n_s) AS n_rows,
          ${graft.functions.SafeMath.roundHalfUpSql(
            """(CASE WHEN (SELECT n FROM nn) = MAX(n_s) THEN 0.0E0
              ELSE CAST(MAX(gap) AS DOUBLE) /
                CAST(CAST(MAX(n_s) AS HUGEINT) *
                  ((SELECT n FROM nn) - MAX(n_s)) AS DOUBLE) END)""", 6)}
            AS ks
        FROM gap GROUP BY source"""
      }),

    GraftQuery(
      "q266_pareto_frontier",
      (s, dir) => {
        // skyline curation cut: documents pareto-optimal on
        // (token count, distinct-type count) — "nothing is at least as
        // long AND strictly more lexically diverse". Both dims integer,
        // so Spark and DuckDB agree bit-for-bit; the operator's
        // distributed prefix-max replaces the single-partition sweep.
        // tokens(text) feeds BOTH dims: bindOnce so the array is built
        // once per row, not once per referencing expression
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.bindOnce(
              graft.functions.TextFunctions.tokens(col("text"))) { t =>
              struct(size(t).cast("long").as("n_tok"),
                size(array_distinct(t)).cast("long").as("n_types"))
            }.as("__dims"))
          .select(col("doc_id"), col("__dims.n_tok").as("n_tok"),
            col("__dims.n_types").as("n_types"))
        Curation.paretoFrontier(d, "n_tok", "n_types")
      },
      Some(s"""WITH d AS (SELECT doc_id,
              CAST(len($Toks5Sql) AS BIGINT) AS n_tok,
              CAST(len(list_distinct($Toks5Sql)) AS BIGINT) AS n_types
            FROM documents),
          m AS (SELECT n_tok, MAX(n_types) AS ymax FROM d GROUP BY 1),
          p AS (SELECT n_tok, ymax,
              MAX(ymax) OVER (ORDER BY n_tok DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
            FROM m)
        SELECT d.doc_id, d.n_tok, d.n_types
        FROM d JOIN p ON d.n_tok = p.n_tok AND d.n_types = p.ymax
        WHERE p.mp IS NULL OR d.n_types > p.mp""")),

    GraftQuery(
      "q267_gini_concentration",
      (s, dir) => {
        // corpus-balance inequality audit at two granularities: the
        // SOURCE mix (near-balanced by construction → gini near 0) and
        // the TOKEN frequency distribution (Zipf-shaped → gini high) —
        // both branches of the meter fire under one gate. The rank
        // window runs over one row per domain/type (vocabulary-bounded,
        // PlanSpec-exempted), never corpus rows.
        val d = Tables.load(s, dir, "documents")
        val bySource = Curation.giniConcentration(d, "source")
          .withColumn("dist", lit("source"))
        val toks = d.select(explode(
          graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        val byToken = Curation.giniConcentration(toks, "tok")
          .withColumn("dist", lit("token"))
        bySource.unionByName(byToken)
          .select(col("dist"), col("n_domains"), col("n_rows"), col("gini"))
      },
      Some {
        def gini(census: String, label: String) =
          s"""SELECT '$label' AS dist, n AS n_domains, tot AS n_rows,
            ${graft.functions.SafeMath.roundHalfUpSql(
              """(CASE WHEN n = 1 OR tot = 0 THEN 0.0E0
                ELSE CAST(2 * s1 - CAST(n + 1 AS HUGEINT) * tot AS DOUBLE) /
                  CAST(CAST(n AS HUGEINT) * tot AS DOUBLE) END)""", 6)}
              AS gini
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(c) AS BIGINT) AS tot,
              SUM(CAST(i AS HUGEINT) * CAST(c AS HUGEINT)) AS s1
            FROM (SELECT c, ROW_NUMBER() OVER (ORDER BY c, d) AS i
              FROM ($census)))"""
        gini("SELECT source AS d, CAST(COUNT(*) AS BIGINT) AS c " +
          "FROM documents GROUP BY 1", "source") + " UNION ALL " +
          gini("SELECT tok AS d, CAST(COUNT(*) AS BIGINT) AS c FROM " +
            s"(SELECT unnest($Toks5Sql) AS tok FROM documents) GROUP BY 1",
            "token")
      }),

    GraftQuery(
      "q271_decision_stump",
      (s, dir) => {
        // the second in-engine trainer: exact depth-1 tree on
        // (token count, char count) → is-English, every threshold
        // evaluated, the winner picked by integer micro-unit Gini — the
        // oracle replays the identical census+window+argmax, so a
        // drifted cumulative, a dropped empty-side guard, or a different
        // tie-break all flip the hash.
        val d = Tables.load(s, dir, "documents").select(
          (col("lang") === "en").as("is_en"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("n_tok"),
          col("n_chars"))
        Curation.decisionStump(d, "is_en", Seq("n_tok", "n_chars"))
      },
      Some(s"""WITH f0 AS (
            SELECT CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS y,
              'n_tok' AS feat, CAST(len($Toks5Sql) AS BIGINT) AS v
            FROM documents
            UNION ALL
            SELECT CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS y,
              'n_chars' AS feat, CAST(n_chars AS BIGINT) AS v
            FROM documents),
          c AS (SELECT feat, v, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(y) AS BIGINT) AS pos
            FROM f0 GROUP BY 1, 2),
          w AS (SELECT feat, v,
              SUM(n) OVER (PARTITION BY feat ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
              SUM(pos) OVER (PARTITION BY feat ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS posl,
              SUM(n) OVER (PARTITION BY feat) AS nt,
              SUM(pos) OVER (PARTITION BY feat) AS post
            FROM c),
          sc AS (SELECT feat, v, nl, posl,
              nt - nl AS nr, post - posl AS posr,
              CAST((posl * posl + (nl - posl) * (nl - posl)) * 1000000
                  // nl
                + ((post - posl) * (post - posl)
                  + ((nt - nl) - (post - posl)) * ((nt - nl) - (post - posl)))
                  * 1000000 // (nt - nl) AS BIGINT) AS score_micro
            FROM w WHERE nl > 0 AND nt - nl > 0)
        SELECT feat AS feature, v AS threshold, score_micro,
          CAST(nl AS BIGINT) AS n_left, CAST(posl AS BIGINT) AS pos_left,
          CAST(nr AS BIGINT) AS n_right, CAST(posr AS BIGINT) AS pos_right,
          (posl * 2 >= nl) AS pred_left, (posr * 2 >= nr) AS pred_right
        FROM sc ORDER BY score_micro DESC, feat, v LIMIT 1""")),

    GraftQuery(
      "q278_quantile_normalize",
      (s, dir) => {
        // per-source token counts mapped onto the POOLED count
        // distribution ([[graft.operators.Curation.quantileNormalize]])
        // — the calibration move that makes differently-scaled
        // per-source quality signals comparable before mixing. Pooled
        // rank via GlobalSort (range-partitioned), within-source rank a
        // partitioned window, lookup one rank-keyed join; all rank
        // arithmetic integer.
        val base = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("n_tokens"))
        graft.operators.Curation.quantileNormalize(
          base, "doc_id", "source", "n_tokens")
          .withColumnRenamed("norm", "norm_tokens")
      },
      Some(s"""WITH b AS (SELECT doc_id, source,
              CAST(len($Toks5Sql) AS BIGINT) AS v
            FROM documents),
          n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
          p AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY v, doc_id)
                AS BIGINT) AS gr, v AS pv
            FROM b),
          r AS (SELECT doc_id, source, v,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY v, doc_id) AS BIGINT) AS rr,
              CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ng
            FROM b)
        SELECT r.doc_id, r.source, r.v AS n_tokens, p.pv AS norm_tokens
        FROM r CROSS JOIN n JOIN p ON (r.rr * n.n) // r.ng = p.gr""")),

    GraftQuery(
      "q279_set_cover",
      // bigrams, not tokens: the synthetic corpus has a 31-word
      // vocabulary and one document exhausts it — the unigram cover
      // converges after round 1 (916 bigrams spread the greedy walk
      // over all 4 rounds)
      (s, dir) => graft.operators.Curation.setCoverSelect(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 4, n = 2),
      // the oracle replays the greedy cover, one CTE pair per round:
      // p_r = the doc covering the most bigrams still in u_{r-1} (ties
      // to the smaller id, prior picks excluded), u_r = u_{r-1} minus
      // p_r's bigrams. A drifted count or tie order flips a pick and
      // every later round with it. Every CTE is MATERIALIZED: DuckDB
      // inlines plain CTEs per reference, and u_r is referenced twice
      // (p_{r+1} and u_{r+1}) — the un-materialized chain re-evaluated
      // the bigram explode ~2^k times and spilled >74 GB at sf1.
      Some {
        val k = 4
        val sb = new StringBuilder(
          s"""WITH dt AS MATERIALIZED (SELECT DISTINCT doc_id, t AS tk
              FROM (SELECT doc_id, unnest($Bigrams) AS t
                FROM documents)),
            u0 AS MATERIALIZED (SELECT DISTINCT tk FROM dt)""")
        for (r <- 1 to k) {
          val notIn =
            if (r == 1) ""
            else "WHERE doc_id NOT IN (" + (1 until r)
              .map(i => s"SELECT doc_id FROM p$i")
              .mkString(" UNION ALL ") + ")"
          sb ++= s""",\np$r AS MATERIALIZED (SELECT doc_id,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM dt JOIN u${r - 1} USING (tk) $notIn
              GROUP BY doc_id ORDER BY c DESC, doc_id LIMIT 1)"""
          if (r < k)
            sb ++= s""",\nu$r AS MATERIALIZED (SELECT tk FROM u${r - 1}
                WHERE tk NOT IN (SELECT tk FROM dt
                  WHERE doc_id IN (SELECT doc_id FROM p$r)))"""
        }
        val unions = (2 to k).map(r =>
          s"UNION ALL SELECT CAST($r AS INT), doc_id, c FROM p$r")
          .mkString("\n")
        s"""$sb
          SELECT CAST(1 AS INT) AS round, doc_id, c AS covered FROM p1
          $unions"""
      },
      bench = true),

    GraftQuery(
      "q281_conformal_threshold",
      (s, dir) => {
        // split-conformal 90% cutoff per event type
        // ([[graft.operators.Curation.conformalThreshold]]): the
        // ceil((n+1)·0.9)-th smallest micro-scaled value — the
        // distribution-free filter threshold with coverage guarantees,
        // needing the EXACT order statistic (one partitioned window),
        // not a sketch quantile.
        val ev = graft.core.Tables.events(s, dir)
          .select(col("event_type"), col("event_id"),
            floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
              .as("score_micro"))
        graft.operators.Curation.conformalThreshold(
          ev, "event_type", "event_id", "score_micro", alphaPct = 10)
      },
      Some("""WITH b AS (SELECT event_type, event_id,
              CAST(FLOOR(value * 1000000.0E0 + 0.5E0) AS BIGINT) AS s
            FROM events),
          r AS (SELECT event_type, s,
              CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY s, event_id) AS BIGINT) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
            FROM b)
        SELECT event_type, n,
          LEAST(n, ((n + 1) * 90 + 99) // 100) AS target_rank,
          s AS threshold
        FROM r WHERE rn = LEAST(n, ((n + 1) * 90 + 99) // 100)""")),

    GraftQuery(
      "q282_source_ablation",
      (s, dir) => graft.operators.Curation.sourceAblation(
        Tables.load(s, dir, "documents")
          .select(col("source"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("nt")),
        "source", "nt"),
      Some(s"""WITH b AS (SELECT source, CAST(len($Toks5Sql) AS BIGINT)
              AS v FROM documents),
          t AS (SELECT CAST(COUNT(*) AS BIGINT) AS bn,
              CAST(SUM(v) AS BIGINT) AS bs FROM b),
          g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(v) AS BIGINT) AS si FROM b GROUP BY source)
        SELECT g.source, g.n_rows,
          (t.bs * 1000000) // t.bn AS mean_micro,
          CASE WHEN g.n_rows = t.bn THEN NULL
            ELSE ((t.bs - g.si) * 1000000) // (t.bn - g.n_rows) END
            AS ablated_mean_micro,
          CASE WHEN g.n_rows = t.bn THEN NULL
            ELSE ((t.bs - g.si) * 1000000) // (t.bn - g.n_rows)
              - (t.bs * 1000000) // t.bn END AS delta_micro
        FROM g CROSS JOIN t""")),

    GraftQuery(
      "q283_exact_kth",
      (s, dir) => {
        // exact corpus median price in cents WITHOUT a global sort
        // ([[graft.operators.GlobalSort.exactMedian]]): iterative
        // 2^16-way range census, ≤4 filtered scans, no SinglePartition
        // exchange and no TakeOrdered materializing n/2 rows — the
        // selection algorithm an exact median needs at 100 TB. k comes
        // from the census's own head aggregate (no separate count job).
        val li = Tables.load(s, dir, "lineitem").select(
          floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long").as("cents"))
        graft.operators.GlobalSort.exactMedian(li, "cents")
      },
      Some("""WITH t AS (SELECT CAST(FLOOR(l_extendedprice * 100.0E0
              + 0.5E0) AS BIGINT) AS v FROM lineitem),
          n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t)
        SELECT n.n, (n.n + 1) // 2 AS k, r.v AS kth
        FROM n, (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM t) r
        WHERE r.rn = (SELECT (n + 1) // 2 FROM n)"""),
      bench = true),

    GraftQuery(
      "q304_weighted_quantile",
      (s, dir) => {
        // token-MASS p50/p90 document length per source ([[Curation
        // .weightedQuantile]]): each doc weighted by its own token
        // count, so the percentile describes the corpus the model
        // actually trains on — on heavy-tailed sources this sits far
        // above the by-count percentile.
        val base = Tables.load(s, dir, "documents").select(
          col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("nt"))
        def q(num: Long, den: Long, name: String) =
          Curation.weightedQuantile(base, "source", "doc_id", "nt", "nt",
            num, den).withColumnRenamed("w_quantile", name)
            .drop("total_weight")
        q(1, 2, "p50_mass").join(q(9, 10, "p90_mass"), "source")
      },
      Some(s"""WITH b AS (SELECT doc_id, source,
              CAST(len($Toks5Sql) AS BIGINT) AS nt
            FROM documents),
          c AS (SELECT source, nt,
              SUM(nt) OVER (PARTITION BY source ORDER BY nt, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(nt) OVER (PARTITION BY source) AS tot
            FROM b)
        SELECT source,
          CAST(MIN(CASE WHEN cum * 2 >= tot THEN nt END) AS BIGINT)
            AS p50_mass,
          CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN nt END) AS BIGINT)
            AS p90_mass
        FROM c GROUP BY source""")),

    GraftQuery(
      "q300_selection_recipe",
      (s, dir) => {
        // composed selection recipe over this round's operators:
        // token counts → POOLED quantile normalization across sources
        // (q278) → per-source split-conformal 25th-percentile floor
        // (q281, α=75) → keep-and-account. The cross-source calibration
        // + distribution-free cutoff pipeline a mixed-corpus curation
        // run ships; every stage exact-integer, end-to-end hash-gated.
        val base = Tables.load(s, dir, "documents").select(
          col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("nt"))
        val norm = Curation.quantileNormalize(base, "doc_id", "source", "nt")
        val cut = Curation.conformalThreshold(norm, "source", "doc_id",
          "norm", alphaPct = 75)
        val kept = norm
          .join(cut.select(col("source"), col("threshold")), "source")
          .filter(col("norm") >= col("threshold"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("nt")).cast("long").as("kept_tokens"))
        base.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .join(cut.select(col("source"), col("threshold")), "source")
          .join(kept, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("threshold"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      },
      Some(s"""WITH b AS (SELECT doc_id, source,
              CAST(len($Toks5Sql) AS BIGINT) AS v
            FROM documents),
          n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
          p AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY v, doc_id)
                AS BIGINT) AS gr, v AS pv
            FROM b),
          r AS (SELECT doc_id, source, v,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY v, doc_id) AS BIGINT) AS rr,
              CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ng
            FROM b),
          norm AS (SELECT r.doc_id, r.source, r.v, p.pv AS norm
            FROM r CROSS JOIN n JOIN p ON (r.rr * n.n) // r.ng = p.gr),
          rk AS (SELECT source, doc_id, norm,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY norm, doc_id) AS BIGINT) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
            FROM norm),
          cut AS (SELECT source, norm AS threshold FROM rk
            WHERE rn = LEAST(ns, ((ns + 1) * 25 + 99) // 100)),
          kept AS (SELECT norm.source,
              CAST(COUNT(*) AS BIGINT) AS n_kept,
              CAST(SUM(norm.v) AS BIGINT) AS kept_tokens
            FROM norm JOIN cut USING (source)
            WHERE norm.norm >= cut.threshold
            GROUP BY norm.source),
          tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM b GROUP BY source)
        SELECT t.source, t.n_docs, c.threshold,
          COALESCE(k.n_kept, 0) AS n_kept,
          COALESCE(k.kept_tokens, 0) AS kept_tokens
        FROM tot t JOIN cut c USING (source)
        LEFT JOIN kept k ON k.source = t.source""")),

    GraftQuery(
      "q297_chunk_roundtrip",
      (s, dir) => {
        // losslessness gate for the overlap chunker: chunk every doc
        // (width 64, stride 48), REASSEMBLE ([[Curation
        // .reassembleChunks]]), and the oracle is the ORIGINAL corpus
        // (whitespace-normalized) — not a replayed chunker, so any
        // duplicated/lost token in either direction flips the hash.
        val chunks = Curation.chunkOverlap(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          width = 64, stride = 48)
        Curation.reassembleChunks(chunks, "doc_id", "chunk_id",
          "chunk_text", width = 64, stride = 48)
      },
      Some(s"""SELECT doc_id,
          array_to_string($Toks5Sql, ' ') AS text_norm
        FROM documents""")),

    GraftQuery(
      "q294_emd_shift",
      (s, dir) => {
        // per-source Wasserstein-1 drift over the SAME mutated corpus as
        // q263's KS gate ([[Curation.emdShift]]): src0's truncation
        // must dominate BOTH meters — KS sees the worst point, EMD the
        // total moved mass (the broad-small-shift detector KS misses).
        val d = Tables.load(s, dir, "documents")
          .select(col("text"), col("source"))
        val mutated = d.withColumn("text",
          when(col("source") === "src0", substring(col("text"), 1, 80))
            .otherwise(col("text")))
        val lens = mutated.select(col("source"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("len"))
        Curation.emdShift(lens, "source", "len", binWidth = 8L, bins = 128)
      },
      Some {
        val cnt = s"len($Toks5Sql)"
        s"""WITH m AS (SELECT source,
              CASE WHEN source = 'src0' THEN substr(text, 1, 80)
                ELSE text END AS text
            FROM documents),
          v AS (SELECT source,
              CAST(greatest(least($cnt // 8, 127), 0) AS BIGINT) AS bin FROM m),
          sb AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c_sb
            FROM v GROUP BY 1, 2),
          gb AS (SELECT bin, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM sb
            GROUP BY 1),
          t AS (SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_s FROM sb
            GROUP BY 1),
          nn AS (SELECT CAST(SUM(c_sb) AS BIGINT) AS n FROM sb),
          grid AS (SELECT t.source, t.n_s, CAST(r.b AS BIGINT) AS bin
            FROM t, range(0, 128) r(b)),
          cum AS (SELECT g.source, g.n_s, g.bin,
              SUM(COALESCE(sb.c_sb, 0)) OVER (PARTITION BY g.source
                ORDER BY g.bin ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS scum,
              SUM(COALESCE(gb.c_b, 0)) OVER (PARTITION BY g.source
                ORDER BY g.bin ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS gcum
            FROM grid g
            LEFT JOIN sb ON sb.source = g.source AND sb.bin = g.bin
            LEFT JOIN gb ON gb.bin = g.bin),
          gap AS (SELECT source, n_s,
              abs(CAST(scum AS HUGEINT) * (n - n_s) -
                CAST(gcum - scum AS HUGEINT) * n_s) AS gap
            FROM cum, nn)
        SELECT source, MAX(n_s) AS n_rows,
          ${graft.functions.SafeMath.roundHalfUpSql(
            """(CASE WHEN (SELECT n FROM nn) = MAX(n_s) THEN 0.0E0
              ELSE CAST(SUM(gap) AS DOUBLE) /
                CAST(CAST(MAX(n_s) AS HUGEINT) *
                  ((SELECT n FROM nn) - MAX(n_s)) AS DOUBLE) END)""", 6)}
            AS emd_bins
        FROM gap GROUP BY source"""
      }),

    GraftQuery(
      "q287_ipw_totals",
      (s, dir) => {
        // Horvitz–Thompson audit of the stratified sample
        // ([[graft.operators.Curation.ipwTotals]]): rerun the exact
        // q59-style hash decision on lineitem, weight kept rows by
        // 10⁴ div rate_permyriad, and reconcile the estimated quantity
        // totals against the true ones — the "is the sample still
        // usable for aggregates" gate a curation pipeline ships with
        // its sample.
        val li = Tables.load(s, dir, "lineitem").select(
          col("l_returnflag"),
          (col("l_orderkey") * 10L + col("l_linenumber")).as("rid"),
          col("l_quantity"))
        graft.operators.Curation.ipwTotals(li, "rid", "l_returnflag",
          "l_quantity", Map("A" -> 0.5, "N" -> 0.25, "R" -> 0.1),
          defaultRate = 0.25, salt = "graft-ipw")
      },
      Some(s"""WITH b AS (SELECT l_returnflag AS g,
              l_orderkey * 10 + l_linenumber AS rid,
              CAST(l_quantity AS BIGINT) AS v
            FROM lineitem),
          t AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_all,
              CAST(SUM(v) AS BIGINT) AS true_sum FROM b GROUP BY g),
          s AS (SELECT g, v,
              CASE WHEN g = 'A' THEN 5000 WHEN g = 'N' THEN 2500
                   WHEN g = 'R' THEN 1000 ELSE 2500 END AS rpm
            FROM b
            WHERE (${md5Key60Sql("'graft-ipw' || rid")}) % 10000 <
              CASE WHEN g = 'A' THEN 5000 WHEN g = 'N' THEN 2500
                   WHEN g = 'R' THEN 1000 ELSE 2500 END),
          e AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_sampled,
              CAST(SUM((v * 10000) // rpm) AS BIGINT) AS est_sum
            FROM s GROUP BY g)
        SELECT t.g AS l_returnflag, t.n_all,
          COALESCE(e.n_sampled, 0) AS n_sampled, t.true_sum,
          COALESCE(e.est_sum, 0) AS est_sum,
          COALESCE(e.est_sum, 0) - t.true_sum AS err
        FROM t LEFT JOIN e USING (g)"""))
  )

  /** Generated oracle for q238: the full-batch GD epoch chain unrolled as
    * CTEs — each epoch is one scored frame (zd, rational sigmoid, residual
    * in scale-4 units), one gradient aggregate, one 1-row weight update,
    * all in the same integer micro-units as [[Curation.trainLogistic]]. */
  private def logisticOracleSql(epochs: Int, lr: Double): String = {
    val cnt = s"len($Toks5Sql)"
    val stopList =
      graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(",")
    val featSql = Seq(
      s"LEAST(CAST($cnt AS DOUBLE) / 100.0E0, 1.0E0)",
      s"""(CASE WHEN $cnt = 0 THEN 0.0E0 ELSE
        CAST(len(list_filter($Toks5Sql, x -> list_contains([$stopList], x))) AS DOUBLE) / $cnt END)""",
      s"""(CASE WHEN length(text) = 0 THEN 0.0E0 ELSE
        CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END)""",
      s"""((CASE WHEN $cnt = 0 THEN 0.0E0 ELSE
        CAST(list_sum(list_transform($Toks5Sql, x -> length(x))) AS DOUBLE) / $cnt END) / 10.0E0)""")
    val k = featSql.size
    val fDefs = featSql.zipWithIndex.map { case (f, j) =>
      s"CAST(FLOOR(($f * 10000.0E0) + 0.5E0) AS BIGINT) AS f$j" }
      .mkString(",\n            ")
    val lrs = s"${lr}E0"
    def zSql(w: String): String =
      (0 until k).foldLeft(s"($w.b * 10000)") { (acc, j) =>
        s"($acc + ($w.w$j * f$j))" }
    def sigSql: String = "(0.5E0 + ((zd / 2.0E0) / (1.0E0 + ABS(zd))))"
    val sb = new StringBuilder
    sb.append(s"""WITH f AS (SELECT doc_id,
            CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS y,
            $fDefs
          FROM documents),
          nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
          w0 AS (SELECT CAST(0 AS BIGINT) AS b, ${(0 until k)
            .map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),\n""")
    for (e <- 1 to epochs) {
      val pw = s"w${e - 1}"
      sb.append(s"""          s$e AS (SELECT doc_id, y, ${(0 until k)
          .map(j => s"f$j").mkString(", ")},
            CAST(FLOOR(($sigSql * 10000.0E0) + 0.5E0) AS BIGINT)
              - (y * 10000) AS r
          FROM (SELECT f.*,
              (CAST(${zSql("w")} AS DOUBLE) / 1.0E12) AS zd
            FROM f, $pw w) f),
          g$e AS (SELECT CAST(SUM(r) AS BIGINT) AS g0, ${(0 until k)
          .map(j => s"CAST(SUM(r * f$j) AS BIGINT) AS g${j + 1}")
          .mkString(", ")} FROM s$e),
          w$e AS (SELECT
            CAST(w.b - CAST(FLOOR((($lrs * (CAST(g.g0 AS DOUBLE) / CAST(nn.n AS DOUBLE))) * 10000.0E0) + 0.5E0) AS BIGINT) AS BIGINT) AS b,
            ${(0 until k).map(j =>
            s"CAST(w.w$j - CAST(FLOOR(($lrs * (CAST(g.g${j + 1} AS DOUBLE) / CAST(nn.n AS DOUBLE))) + 0.5E0) AS BIGINT) AS BIGINT) AS w$j")
          .mkString(",\n            ")}
          FROM w${e - 1} w, g$e g, nn),\n""")
    }
    sb.append(s"""          scored AS (SELECT doc_id, y,
            CAST(FLOOR(($sigSql * 100000000.0E0) + 0.5E0) AS BIGINT) AS score8
          FROM (SELECT f.*,
              (CAST(${zSql("w")} AS DOUBLE) / 1.0E12) AS zd
            FROM f, w$epochs w) f)
        SELECT doc_id, y, score8, (score8 >= 50000000) AS pred FROM scored""")
    sb.toString
  }
}
