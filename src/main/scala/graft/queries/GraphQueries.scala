package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Graph analytics gates: link-structure ranking over a synthetic domain
  * graph derived from the orders table (src = customer bucket, dst =
  * order bucket — dense, deterministic, every node has out-edges at all
  * scale factors). The fixed-point integer formulation makes the rank
  * vector hash-gateable against an unrolled DuckDB CTE twin.
  */
object GraphQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q103_pagerank",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        // rank on INT node ids ('d'||x is a bijection of x over the
        // 0..99 domain — identical edges, degrees and fixed-point
        // ranks) and stringify only the ≤100-row output (the q231
        // discipline: per-round hash/join work on longs, not strings)
        val edges = o.select(
          (col("o_custkey") % 100).as("src"),
          (col("o_orderkey") % 100).as("dst"))
        graft.operators.Graphs.pageRank(edges, "src", "dst", iterations = 3)
          .select(concat(lit("d"), col("node")).as("node"), col("pr"))
      },
      // three unrolled synchronous rounds of the identical fixed-point
      // arithmetic: pr0 = S//N, pr' = (S*15//100)//N + (85*contrib)//100
      Some("""WITH e AS (SELECT DISTINCT 'd' || (o_custkey % 100) AS src,
              'd' || (o_orderkey % 100) AS dst FROM orders),
          nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          outd AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
          nn AS (SELECT COUNT(*) AS n FROM nodes),
          p0 AS (SELECT node, 1000000000000 // nn.n AS pr FROM nodes, nn),
          c1 AS (SELECT e.dst, CAST(SUM(p.pr // o.outdeg) AS BIGINT) AS c
            FROM e JOIN p0 p ON p.node = e.src JOIN outd o ON o.src = e.src
            GROUP BY e.dst),
          p1 AS (SELECT n.node,
              (1000000000000 * 15 // 100) // nn.n +
                (85 * COALESCE(c1.c, 0)) // 100 AS pr
            FROM nodes n LEFT JOIN c1 ON c1.dst = n.node, nn),
          c2 AS (SELECT e.dst, CAST(SUM(p.pr // o.outdeg) AS BIGINT) AS c
            FROM e JOIN p1 p ON p.node = e.src JOIN outd o ON o.src = e.src
            GROUP BY e.dst),
          p2 AS (SELECT n.node,
              (1000000000000 * 15 // 100) // nn.n +
                (85 * COALESCE(c2.c, 0)) // 100 AS pr
            FROM nodes n LEFT JOIN c2 ON c2.dst = n.node, nn),
          c3 AS (SELECT e.dst, CAST(SUM(p.pr // o.outdeg) AS BIGINT) AS c
            FROM e JOIN p2 p ON p.node = e.src JOIN outd o ON o.src = e.src
            GROUP BY e.dst),
          p3 AS (SELECT n.node,
              (1000000000000 * 15 // 100) // nn.n +
                (85 * COALESCE(c3.c, 0)) // 100 AS pr
            FROM nodes n LEFT JOIN c3 ON c3.dst = n.node, nn)
        SELECT node, CAST(pr AS BIGINT) AS pr FROM p3"""),
      bench = true),

    GraftQuery(
      "q315_hits",
      (s, dir) => {
        // hubs & authorities over the q103 link graph
        // ([[graft.operators.Graphs.hits]]): authorities = the pages
        // worth keeping, hubs = the listing pages that find them — the
        // complementary curation prior to PageRank. Exact fixed-point
        // integer arithmetic (scale 10^12, L1-normalized), 2 rounds.
        val o = Tables.load(s, dir, "orders")
        val edges = o.select(
          concat(lit("d"), col("o_custkey") % 100).as("src"),
          concat(lit("d"), col("o_orderkey") % 100).as("dst"))
        graft.operators.Graphs.hits(edges, "src", "dst", iterations = 2)
      },
      // four unrolled half-rounds of the identical integer fixed point:
      // raw = sum of the joined side's scores, then exact L1
      // normalization raw·10^12 // sum(raw) in HUGEINT. Every CTE is
      // MATERIALIZED — each is referenced twice (join + the scalar-sum
      // subquery) and plain CTEs re-evaluate per reference.
      Some {
        def half(prev: String, cur: String, joinEnd: String,
            groupEnd: String): String =
          s"""${cur}r AS MATERIALIZED (
              SELECT e.$groupEnd AS node, SUM(p.s) AS raw
              FROM e JOIN $prev p ON p.node = e.$joinEnd GROUP BY 1),
            $cur AS MATERIALIZED (
              SELECT n.node,
                COALESCE(r.raw * 1000000000000 //
                  (SELECT SUM(raw) FROM ${cur}r), 0) AS s
              FROM nodes n LEFT JOIN ${cur}r r USING (node))"""
        s"""WITH e AS MATERIALIZED (
            SELECT DISTINCT 'd' || (o_custkey % 100) AS src,
              'd' || (o_orderkey % 100) AS dst FROM orders),
          nodes AS MATERIALIZED (
            SELECT src AS node FROM e UNION SELECT dst FROM e),
          h0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS s
            FROM nodes),
          ${half("h0", "a1", "src", "dst")},
          ${half("a1", "h1", "dst", "src")},
          ${half("h1", "a2", "src", "dst")},
          ${half("a2", "h2", "dst", "src")}
        SELECT n.node, CAST(h2.s AS BIGINT) AS hub,
          CAST(a2.s AS BIGINT) AS auth
        FROM nodes n
        JOIN h2 ON h2.node = n.node
        JOIN a2 ON a2.node = n.node"""
      }),

    GraftQuery(
      "q298_trustrank",
      (s, dir) => {
        // seeded quality propagation over the q103 link graph
        // ([[graft.operators.Graphs.trustRank]]): teleport mass confined
        // to 5 trusted seeds, so rank = link-proximity to the whitelist
        // — the web-curation cut a uniform PageRank can't express.
        val o = Tables.load(s, dir, "orders")
        val edges = o.select(
          concat(lit("d"), col("o_custkey") % 100).as("src"),
          concat(lit("d"), col("o_orderkey") % 100).as("dst"))
        graft.operators.Graphs.trustRank(edges, "src", "dst",
          seeds = (0 until 5).map(i => s"d$i"), iterations = 3)
      },
      Some {
        val seedList = (0 until 5).map(i => s"'d$i'").mkString(", ")
        // mirror the operator's renormalization over seeds PRESENT in
        // the node set (r09 advice fix): s == 5 on this graph, but the
        // oracle must replay the semantics, not the gate's coincidence
        val seedCase = s"CASE WHEN n.node IN ($seedList) " +
          "THEN (1000000000000 * 15 // 100) // (SELECT s FROM sc) " +
          "ELSE 0 END"
        val rounds = (1 to 3).map { r =>
          s"""c$r AS (SELECT e.dst, CAST(SUM(p.tr // o.outdeg) AS BIGINT)
              AS c
            FROM e JOIN p${r - 1} p ON p.node = e.src
            JOIN outd o ON o.src = e.src
            GROUP BY e.dst),
          p$r AS (SELECT n.node,
              $seedCase + (85 * COALESCE(c$r.c, 0)) // 100 AS tr
            FROM nodes n LEFT JOIN c$r ON c$r.dst = n.node)"""
        }.mkString(",\n")
        s"""WITH e AS (SELECT DISTINCT 'd' || (o_custkey % 100) AS src,
              'd' || (o_orderkey % 100) AS dst FROM orders),
          nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM nodes
            WHERE node IN ($seedList)),
          outd AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
          p0 AS (SELECT node, CASE WHEN node IN ($seedList)
              THEN 1000000000000 // (SELECT s FROM sc) ELSE 0 END AS tr
            FROM nodes),
          $rounds
        SELECT node, CAST(tr AS BIGINT) AS tr FROM p3"""
      }),

    GraftQuery(
      "q122_triangle_count",
      (s, dir) => {
        // per-node triangle counts over the synthetic domain graph —
        // the local clustering signal used to spot link farms vs
        // organically connected domains in crawl curation.
        val o = Tables.load(s, dir, "orders")
        val edges = o.select(
          concat(lit("n"), col("o_custkey") % 500).as("src"),
          concat(lit("n"), col("o_orderkey") % 500).as("dst"))
        graft.operators.Graphs.triangleCounts(edges, "src", "dst")
      },
      Some("""WITH e0 AS (SELECT DISTINCT
            least('n' || (o_custkey % 500), 'n' || (o_orderkey % 500)) AS a,
            greatest('n' || (o_custkey % 500), 'n' || (o_orderkey % 500)) AS b
          FROM orders),
        e AS (SELECT a, b FROM e0 WHERE a <> b),
        tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
          FROM e e1
          JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM (SELECT unnest([a, b, c]) AS node FROM tri)
        GROUP BY node""")),

    GraftQuery(
      "q153_label_propagation",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val edges = o.select(
          concat(lit("n"), col("o_custkey") % 500).as("src"),
          concat(lit("n"), col("o_orderkey") % 500).as("dst"))
        graft.operators.Graphs.labelPropagation(edges, "src", "dst",
          rounds = 2)
      },
      Some {
        def round(prev: String, c: String, l: String) =
          s"""$c AS (SELECT u.a AS node, l.label, COUNT(*) AS cnt
              FROM und u JOIN $prev l ON l.node = u.b GROUP BY 1, 2),
            $l AS (SELECT node, label FROM (
              SELECT node, label, row_number() OVER (PARTITION BY node
                ORDER BY cnt DESC, label ASC) AS r FROM $c) WHERE r = 1)"""
        s"""WITH e0 AS (SELECT DISTINCT 'n' || (o_custkey % 500) AS a,
              'n' || (o_orderkey % 500) AS b FROM orders),
          e1 AS (SELECT a, b FROM e0 WHERE a <> b),
          und AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
          l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
          ${round("l0", "c1", "l1")},
          ${round("l1", "c2", "l2")}
        SELECT node, label FROM l2"""
      }),

    GraftQuery(
      "q232_link_prediction",
      (s, dir) => {
        // missing-link scoring over a 2000-node domain graph: top-1000
        // non-adjacent pairs by Resource-Allocation score (integer
        // micro-units), with common-neighbor counts and rounded-ln
        // Adamic–Adar. At the gate SF the mean degree (~15) sits under
        // the 64 hub cap so the wedge join is fully populated; at 10×
        // density every node crosses the cap and the score set empties —
        // exactly the documented hub-evidence semantics.
        val o = Tables.load(s, dir, "orders")
        val edges = o.select(
          concat(lit("n"), col("o_custkey") % 2000).as("src"),
          concat(lit("n"), col("o_orderkey") % 2000).as("dst"))
        graft.operators.Graphs.linkPrediction(edges, "src", "dst",
          minCommon = 2, maxViaDegree = 64, topK = 1000)
      },
      Some {
        val lnR = graft.functions.SafeMath.roundHalfUpSql("ln(deg)", 8)
        s"""WITH d0 AS (SELECT DISTINCT 'n' || (o_custkey % 2000) AS a,
              'n' || (o_orderkey % 2000) AS b FROM orders
            WHERE 'n' || (o_custkey % 2000) <> 'n' || (o_orderkey % 2000)),
          und AS (SELECT a, b FROM d0 UNION SELECT b, a FROM d0),
          deg AS (SELECT a AS node, COUNT(*) AS deg FROM und GROUP BY a),
          viaw AS (SELECT node AS via, 1000000 // deg AS ra_w,
              CAST(FLOOR(1000000.0E0 / ($lnR) + 0.5E0) AS BIGINT) AS aa_w
            FROM deg WHERE deg <= 64 AND deg >= 2),
          wedge AS (SELECT l.a AS u, r.a AS v, w.ra_w, w.aa_w
            FROM und l JOIN viaw w ON l.b = w.via
            JOIN und r ON r.b = w.via
            WHERE l.a < r.a),
          agg AS (SELECT u AS a, v AS b, COUNT(*) AS common,
              SUM(ra_w) AS ra_micro, SUM(aa_w) AS aa_micro
            FROM wedge GROUP BY 1, 2 HAVING COUNT(*) >= 2),
          cand AS (SELECT * FROM agg g WHERE NOT EXISTS (
            SELECT 1 FROM und e WHERE e.a = g.a AND e.b = g.b))
        SELECT a, b, CAST(common AS BIGINT) AS common,
          CAST(ra_micro AS BIGINT) AS ra_micro,
          CAST(aa_micro AS BIGINT) AS aa_micro
        FROM cand ORDER BY ra_micro DESC, a ASC, b ASC LIMIT 1000"""
      }),

    GraftQuery(
      "q160_bfs_levels",
      (s, dir) => {
        // hop distance from a seed over the same domain graph — the
        // "within k hops of a trusted seed" reachability filter; three
        // synchronous frontier rounds, each joining only the frontier.
        val o = Tables.load(s, dir, "orders")
        val edges = o.select(
          concat(lit("n"), col("o_custkey") % 500).as("src"),
          concat(lit("n"), col("o_orderkey") % 500).as("dst"))
        graft.operators.Graphs.bfsLevels(edges, "src", "dst",
          source = "n0", maxDepth = 3)
      },
      Some {
        def level(prev: Seq[String], f: String) =
          s"""$f AS (SELECT DISTINCT u.b AS node FROM und u
              JOIN ${prev.last} p ON p.node = u.a
              WHERE u.b NOT IN (${prev.map(p => s"SELECT node FROM $p")
                .mkString(" UNION ALL ")}))"""
        s"""WITH e0 AS (SELECT DISTINCT 'n' || (o_custkey % 500) AS a,
              'n' || (o_orderkey % 500) AS b FROM orders),
          e1 AS (SELECT a, b FROM e0 WHERE a <> b),
          und AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
          l0 AS (SELECT 'n0' AS node),
          ${level(Seq("l0"), "l1")},
          ${level(Seq("l0", "l1"), "l2")},
          ${level(Seq("l0", "l1", "l2"), "l3")}
        SELECT node, CAST(0 AS INTEGER) AS lvl FROM l0
        UNION ALL SELECT node, 1 FROM l1
        UNION ALL SELECT node, 2 FROM l2
        UNION ALL SELECT node, 3 FROM l3"""
      })
  )
}

/** Storage-layout gates. */
object LayoutQueries {

  /** One-time bucketed layout for the q255 family, memoized per
    * (session, sfDir): the write is a LAYOUT build — in production it is
    * amortized across every downstream run, so benching it inside the
    * join gate measured the wrong thing (r08 verdict: 2.30 s of write
    * around a 0.3 s zero-shuffle read). q306 gates the build once;
    * q255's bench passes after the warmup only read. */
  // keyed on the SESSION OBJECT (weak), not identityHashCode: a GC'd
  // session's reused hash (or a collision) must not serve another
  // session's tables (review r09/advice r10)
  private val q255Layouts =
    new graft.core.SessionMemo[String, (String, String)]

  /** Returns the (lineitem, orders) bucketed table names for `dir`.
    * Table names are DIR-KEYED: a fixed name plus per-(session, dir)
    * memoization would let a second dir overwrite the first dir's
    * tables while its memo entry still claimed them built (review r09). */
  private[queries] def ensureBucketedLayout(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
    q255Layouts.getOrElseUpdate(s, dir) {
      val tag = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
      val (liT, ordT) = (s"graft_q255_li_$tag", s"graft_q255_ord_$tag")
      val tmpPath = java.nio.file.Files.createTempDirectory("graft-q255")
      val tmp = tmpPath.toFile.getAbsolutePath
      tmpPath.toFile.deleteOnExit() // best-effort; contents removed below
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val ord = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
      graft.sources.Bucketing.writeBucketed(li, liT,
        s"$tmp/li", 8, Seq("l_orderkey"))
      graft.sources.Bucketing.writeBucketed(ord, ordT,
        s"$tmp/ord", 8, Seq("o_orderkey"))
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(tmpPath.toFile)
      }
      (liT, ordT)
    }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q105_zorder_key",
      (s, dir) => {
        // Morton key over (order, part): the write-side sort key that
        // makes parquet min/max stats prune BOTH join dimensions. The
        // gate hashes every row's key, then sorting/partitioning by it
        // is plain orderBy/repartitionByRange at write time.
        val l = Tables.load(s, dir, "lineitem")
        l.select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.Layout.zorder2(col("l_orderkey"), col("l_partkey"))
            .as("zkey"))
      },
      Some(s"""SELECT l_orderkey, l_linenumber,
          ${graft.functions.Layout.zorder2Sql("l_orderkey", "l_partkey")}
            AS zkey
        FROM lineitem""")),

    GraftQuery(
      "q197_zorder_skipping",
      (s, dir) => {
        // File-skipping effectiveness of the q105 write-side key: bucket
        // rows into 64 "files" under two layouts — linear (sorted by
        // l_orderkey only) and z-order — take each file's min/max footer
        // stats in BOTH dimensions, and count the files a central
        // 10%×10% box predicate cannot prune. Equal-WIDTH buckets
        // (key div width), not ntile: bucket assignment is a per-row
        // projection with no global window, so the layout plan itself
        // is shuffle-free at any scale. All-integer arithmetic, DIV not
        // `/` (long/long→double loses exactness past 2^53).
        val l = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("x"), col("l_partkey").as("y"))
          .withColumn("zkey",
            graft.functions.Layout.zorder2(col("x"), col("y")))
          // materialize once: the 62-term zorder projection feeds both
          // the stats aggregate and the crossJoin leg — without this the
          // scan+zorder runs twice (it was q197's whole sf1 cost)
          .localCheckpoint()
        val m = l.agg(max("x").as("mx"), max("y").as("my"),
          max("zkey").as("mz"))
        l.crossJoin(broadcast(m))
          .selectExpr(
            "stack(2, 'linear', least(63L, x DIV ((mx DIV 64) + 1))," +
              "         'zorder', least(63L, zkey DIV ((mz DIV 64) + 1)))" +
              " AS (layout, bucket)",
            "x", "y", "mx", "my")
          .groupBy("layout", "bucket")
          .agg(min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"),
            count(lit(1)).as("cnt"),
            max("mx").as("mx"), max("my").as("my"))
          .withColumn("hit",
            col("min_x") <= expr("(mx * 55) DIV 100") &&
              col("max_x") >= expr("(mx * 45) DIV 100") &&
              col("min_y") <= expr("(my * 55) DIV 100") &&
              col("max_y") >= expr("(my * 45) DIV 100"))
          .groupBy("layout")
          .agg(count(lit(1)).as("files"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("files_hit"),
            sum(when(col("hit"), col("cnt")).otherwise(0L))
              .as("rows_scanned"))
          .orderBy("layout")
      },
      Some(s"""WITH base AS (
          SELECT l_orderkey AS x, l_partkey AS y,
            ${graft.functions.Layout.zorder2Sql("l_orderkey", "l_partkey")}
              AS zkey
          FROM lineitem),
        m AS (SELECT max(x) AS mx, max(y) AS my, max(zkey) AS mz FROM base),
        assigned AS (
          SELECT x, y,
            least(63, x // ((mx // 64) + 1)) AS b_lin,
            least(63, zkey // ((mz // 64) + 1)) AS b_z, mx, my
          FROM base, m),
        layouts AS (
          SELECT 'linear' AS layout, b_lin AS bucket, x, y, mx, my
          FROM assigned
          UNION ALL
          SELECT 'zorder', b_z, x, y, mx, my FROM assigned),
        stats AS (
          SELECT layout, bucket,
            min(x) AS min_x, max(x) AS max_x,
            min(y) AS min_y, max(y) AS max_y,
            count(*) AS cnt, max(mx) AS mx, max(my) AS my
          FROM layouts GROUP BY 1, 2)
        SELECT layout, count(*) AS files,
          CAST(SUM(CASE WHEN min_x <= (mx * 55) // 100
              AND max_x >= (mx * 45) // 100
              AND min_y <= (my * 55) // 100
              AND max_y >= (my * 45) // 100 THEN 1 ELSE 0 END) AS BIGINT)
            AS files_hit,
          CAST(SUM(CASE WHEN min_x <= (mx * 55) // 100
              AND max_x >= (mx * 45) // 100
              AND min_y <= (my * 55) // 100
              AND max_y >= (my * 45) // 100 THEN cnt ELSE 0 END) AS BIGINT)
            AS rows_scanned
        FROM stats GROUP BY layout ORDER BY layout""")),

    GraftQuery(
      "q231_k_core",
      (s, dir) => {
        // bounded-round k-core over a 1000-node domain graph. k=22 sits
        // just under the gate SF's mean degree, so the peel cascades
        // across all four rounds without converging (1000 -> 923 -> 871
        // -> 805 -> 718 surviving nodes at sf0.01) — each round's
        // removals lower surviving neighbors' degrees, the exact
        // dynamics the bounded-round semantics documents; at larger SFs
        // the graph densifies and the core saturates. The oracle
        // unrolls the identical rounds.
        val o = Tables.load(s, dir, "orders")
        // peel on INT node ids ('n'||x is a bijection of x over the
        // 0..999 domain, so inequality, degrees and the core are
        // identical) and stringify only the ≤1000-row output — every
        // per-round hash/dedup/join then works on longs, not strings
        // (r12: the string setup dominated the bench wall)
        val edges = o.select(
          (col("o_custkey") % 1000).as("src"),
          (col("o_orderkey") % 1000).as("dst"))
        graft.operators.Graphs.kCore(edges, "src", "dst", k = 22, rounds = 4)
          .select(concat(lit("n"), col("node")).as("node"), col("degree"))
      },
      // every e_i is referenced THREE times by round i+1 (degree scan +
      // both join legs) and each k_i twice — plain CTEs inline per
      // reference, so the unrolled chain re-evaluates e0 ~3^rounds times
      // (measured: a >77 GB duckdb spill at sf3). AS MATERIALIZED pins
      // each round to one evaluation (the q279 lesson).
      Some {
        val rounds = (1 to 4).map { i =>
          s"""k$i AS MATERIALIZED (SELECT a FROM (
                SELECT a, COUNT(*) AS deg FROM e${i - 1} GROUP BY a)
              WHERE deg >= 22),
            e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
              JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a)"""
        }.mkString(",\n")
        s"""WITH dd AS MATERIALIZED (
            SELECT 'n' || (o_custkey % 1000) AS a,
              'n' || (o_orderkey % 1000) AS b
            FROM orders WHERE 'n' || (o_custkey % 1000) <> 'n' || (o_orderkey % 1000)),
          e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
            SELECT a, b FROM dd UNION ALL SELECT b AS a, a AS b FROM dd)),
          $rounds
          SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM e4 GROUP BY a"""
      },
      bench = true),

    GraftQuery(
      "q306_bucketed_layout_build",
      (s, dir) => {
        // The one-time bucketed WRITE behind q255, gated on its own (not
        // benched: a layout build is amortized across every downstream
        // read). Hash-gates that the bucketed tables land complete —
        // row counts and distinct join keys per table survive the
        // bucketBy/sortBy write round-trip.
        val (liT, ordT) = ensureBucketedLayout(s, dir)
        s.table(liT)
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("n_keys"))
          .select(lit("li").as("tbl"), col("n_rows"), col("n_keys"))
          .unionByName(
            s.table(ordT)
              .agg(count(lit(1)).as("n_rows"),
                countDistinct(col("o_orderkey")).as("n_keys"))
              .select(lit("ord").as("tbl"), col("n_rows"), col("n_keys")))
      },
      Some("""SELECT 'li' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys
          FROM lineitem
        UNION ALL
        SELECT 'ord' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
          FROM orders""")),

    GraftQuery(
      "q255_bucketed_join",
      (s, dir) => {
        // Co-located storage join: both tables are WRITTEN bucketed on
        // the join key ([[graft.sources.Bucketing]]), so the join AND
        // the downstream rollup on that key run with ZERO shuffle
        // exchanges (asserted mechanically in PlanSpec) — at 100 TB the
        // fact⋈fact shuffle this elides IS the query's cost, and bucket
        // layout is how a production warehouse amortizes it across every
        // downstream run. hint("merge") pins the bucket-aligned
        // SortMergeJoin at gate scale where the smaller side would
        // otherwise broadcast (a broadcast would hide the property the
        // gate exists to prove). The layout build is memoized
        // ([[ensureBucketedLayout]], gated separately by q306) so timed
        // bench passes measure ONLY the read — the number that scales.
        val (liT, ordT) = ensureBucketedLayout(s, dir)
        s.table(liT).hint("merge")
          .join(s.table(ordT),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
              .as("sum_qty"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2)))
              .cast("double").as("revenue"))
      },
      Some("""SELECT l_orderkey, o_orderpriority,
          CAST(COUNT(*) AS BIGINT) AS n_items,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_orderkey, o_orderpriority"""),
      bench = true),

    GraftQuery(
      "q256_dpp_join",
      (s, dir) => {
        // Dynamic partition pruning: the fact table is WRITTEN
        // partitioned by month, the dim side is the month census
        // filtered to hot months (count ≥ the exact integer ceiling-mean
        // — a predicate on a NON-join column, so no static filter can
        // reach the fact scan) and broadcast. Spark's PartitionPruning
        // rule turns the broadcast build side into a runtime partition
        // filter on the scan (asserted in PlanSpec): at 100 TB the fact
        // read shrinks to the dim-selected partitions BEFORE any row is
        // touched — the I/O elision static pruning can't express. The
        // threshold is collected as a bounded 1-row scalar because
        // PartitionPruning's isLikelySelective heuristic only fires on
        // attribute-vs-LITERAL predicates — an attribute-vs-attribute
        // mean test (n·nm ≥ tot) is semantically identical but
        // invisible to the rule.
        val tmp = java.nio.file.Files.createTempDirectory("graft-q256")
          .toFile.getAbsolutePath
        Tables.load(s, dir, "orders")
          .withColumn("od", date_format(col("o_orderdate"), "yyyy-MM"))
          .write.mode("overwrite").partitionBy("od").parquet(s"$tmp/fact")
        val fact = s.read.parquet(s"$tmp/fact")
        val census = fact.groupBy("od").agg(count(lit(1)).as("n"))
        val row = census.agg(sum("n"), count(lit(1))).head
        // ceil(tot/nm): n ≥ ceil(tot/nm) ⟺ n·nm ≥ tot for integer n
        val thresh = (row.getLong(0) + row.getLong(1) - 1L) / row.getLong(1)
        val hot = census.filter(col("n") >= lit(thresh))
          .select(col("od"), col("n").as("n_orders"))
        fact.join(broadcast(hot), "od")
          .groupBy("od")
          .agg(max(col("n_orders")).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast("double").as("revenue"))
      },
      Some("""WITH f AS (SELECT strftime(o_orderdate, '%Y-%m') AS od,
              o_totalprice FROM orders),
          c AS (SELECT od, CAST(COUNT(*) AS BIGINT) AS n FROM f
            GROUP BY od),
          t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
              CAST(COUNT(*) AS BIGINT) AS nm FROM c),
          hot AS (SELECT od, n AS n_orders FROM c, t
            WHERE n * nm >= tot)
        SELECT od, MAX(n_orders) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM f JOIN hot USING (od)
        GROUP BY od""")),

    GraftQuery(
      "q273_consistent_hash",
      (s, dir) => {
        // shard-topology change with consistent hashing
        // ([[graft.sources.Sharding]]): customers assigned to 4 shards ×
        // 32 vnodes, then a 5th shard joins — the (from, to) movement
        // matrix is the gate. The consistent-hash guarantee (only keys
        // whose ring arc the NEW shard split move; old shards never
        // exchange keys) is what separates this from `key % S`, and
        // ShardingSpec asserts it mechanically; the oracle recomputes
        // the identical md5 ring in SQL. Assignment is a pure projection
        // — zero shuffle until the small movement-matrix aggregate.
        val before = graft.sources.Sharding.ring(
          (0 until 4).map(i => s"s$i"), vnodes = 32)
        val after = graft.sources.Sharding.ring(
          (0 until 5).map(i => s"s$i"), vnodes = 32)
        graft.sources.Sharding.rebalanceReport(
          Tables.load(s, dir, "customer"), "c_custkey", before, after)
      },
      Some {
        def shardSql(keyExpr: String, ring: Seq[(Long, String)]): String = {
          val toks = ring.map(t => s"CAST(${t._1} AS BIGINT)")
            .mkString("[", ", ", "]")
          val names = ring.map(t => s"'${t._2}'").mkString("[", ", ", "]")
          val kt = CurationQueries.md5Key60Sql(s"'key-' || ($keyExpr)")
          s"""list_extract($names,
            CASE WHEN len(list_filter($toks, t -> t >= $kt)) = 0 THEN 1
            ELSE ${ring.size} - len(list_filter($toks, t -> t >= $kt)) + 1
            END)"""
        }
        val before = graft.sources.Sharding.ring(
          (0 until 4).map(i => s"s$i"), vnodes = 32)
        val after = graft.sources.Sharding.ring(
          (0 until 5).map(i => s"s$i"), vnodes = 32)
        s"""SELECT ${shardSql("CAST(c_custkey AS VARCHAR)", before)}
              AS from_shard,
            ${shardSql("CAST(c_custkey AS VARCHAR)", after)} AS to_shard,
            COUNT(*) AS n
          FROM customer GROUP BY 1, 2"""
      })
  )
}
