package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Spark-native windowed aggregations (SURVEY.md §2.9, build-plan §7 step 8)
  * — the capability the reference delegates to ClickHouse GROUP BYs over
  * materialized bucket columns. Gated in batch mode (the `window()` /
  * `session_window()` expressions are identical in Structured Streaming;
  * the streaming harness is exercised in StreamingSpec).
  *
  * Scale note: tumbling/sliding windows are plain hash aggregations on
  * (window, dims) — map-side partial agg then one shuffle. Session windows
  * shuffle once on user and sort within partitions.
  */
object WindowQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q22_tumbling_window",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.groupBy(window(col("ts"), "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            // DOUBLE pin on both sides (q01 comment): DECIMAL renderings
            // with trailing zeros flip the driver's hash compare.
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .select(unix_timestamp(col("window.start")).as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
      },
      Some("""SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 AS window_start,
        event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2"""),
      bench = true),

    GraftQuery(
      "q23_sliding_window",
      (s, dir) => {
        // 1h windows sliding every 30m: each event lands in exactly two.
        val ev = Tables.events(s, dir)
        ev.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .select(unix_timestamp(col("window.start")).as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
      },
      Some("""SELECT ws AS window_start, event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM (
          SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 AS ws, event_type, value FROM events
          UNION ALL
          SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800 AS ws, event_type, value FROM events)
        GROUP BY 1, 2""")),

    GraftQuery(
      "q24_session_window",
      (s, dir) => {
        // Per-user sessions with a 30-minute inactivity gap. Timestamps are
        // truncated to whole seconds on BOTH sides so nanosecond precision
        // differences cannot flip a boundary. The gap boundary is
        // INCLUSIVE: an event exactly 1800 s after the previous one joins
        // the session (verified empirically — Spark merges a window whose
        // start equals the current session end), so the oracle starts a
        // new session only when the gap is STRICTLY greater.
        val ev = Tables.events(s, dir)
        ev.withColumn("tss", date_trunc("second", col("ts")))
          .groupBy(session_window(col("tss"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"),
            unix_timestamp(col("session_window.start")).as("session_start"),
            col("n"))
      },
      Some("""WITH e AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
            COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        -- boundaries over DISTINCT (user, sec) only: with duplicate secs
        -- in a partition the LAG pass and the running-SUM pass tie-break
        -- independently (separate sort instances), and the lone new_s=1
        -- row can land mid-prefix, splitting a session nondeterministically
        -- (caught by the sf1 sweep, where every event has 10 copies; same
        -- guard as q71's stream oracle)
        s AS (
          SELECT user_id, sec, cnt,
            CASE WHEN LAG(sec) OVER w IS NULL
                   OR sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
        g AS (
          SELECT user_id, sec, cnt,
            SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sid
          FROM s)
        SELECT user_id, MIN(sec) AS session_start,
          CAST(SUM(cnt) AS BIGINT) AS n
        FROM g GROUP BY user_id, sid"""),
      bench = true),

    GraftQuery(
      "q66_asof_join",
      (s, dir) => {
        // Point-in-time dim lookup: each measurement gets the probe
        // config version in force at its test time (the deterministic
        // replacement for the reference's whatever-was-cached Redis
        // reads). One shuffle on the key — DuckDB's native ASOF JOIN is
        // the oracle.
        val now = 1705708800L
        val sup = Tables.load(s, dir, "supplier")
        val dims = sup.select(
          concat(lit("k-"), col("s_suppkey") % 20).as("probe_key"),
          (lit(now) - col("s_suppkey") * 7).as("version_time"),
          concat(lit("cfg"), col("s_suppkey")).as("config"),
          (col("s_suppkey") % 5).cast("long").as("tier"))
        val facts = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("fact_id"),
          concat(lit("k-"), col("c_custkey") % 20).as("probe_key"),
          (lit(now) - (col("c_custkey") % 90) * 250).as("t"))
        graft.operators.AsOfJoin.lastKnown(facts, dims,
          "probe_key", "t", "version_time", Seq("config", "tier"))
      },
      Some(s"""WITH dims AS (
          SELECT 'k-' || (s_suppkey % 20) AS probe_key,
            CAST(1705708800 - s_suppkey * 7 AS BIGINT) AS version_time,
            'cfg' || s_suppkey AS config,
            CAST(s_suppkey % 5 AS BIGINT) AS tier
          FROM supplier),
        facts AS (
          SELECT c_custkey AS fact_id,
            'k-' || (c_custkey % 20) AS probe_key,
            CAST(1705708800 - (c_custkey % 90) * 250 AS BIGINT) AS t
          FROM customer)
        SELECT f.fact_id, f.probe_key, f.t, d.config, d.tier
        FROM facts f ASOF LEFT JOIN dims d
          ON f.probe_key = d.probe_key AND f.t >= d.version_time""")),

    GraftQuery(
      "q85_windowed_topk",
      (s, dir) => {
        // trending-per-window: top-3 event types per tumbling hour. The
        // rank window partitions by hour, so it parallelizes across
        // windows — composition of the q22 aggregation with a per-window
        // top-k cut, the standard "what's hot each hour" dashboard query.
        import org.apache.spark.sql.expressions.Window
        val agg = Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_timestamp(col("window.start")).as("window_start"),
            col("event_type"), col("n"))
        val w = Window.partitionBy(col("window_start"))
          .orderBy(col("n").desc, col("event_type").asc)
        agg.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
      },
      Some("""WITH a AS (
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                AS window_start,
              event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT window_start, event_type, n, CAST(rn AS INTEGER) AS rnk
        FROM (SELECT *, row_number()
            OVER (PARTITION BY window_start ORDER BY n DESC, event_type ASC)
              AS rn
          FROM a)
        WHERE rn <= 3""")),

    GraftQuery(
      "q86_incremental_agg",
      (s, dir) => {
        // incremental aggregate maintenance: the "stored" aggregate
        // covers ~70% of events, the "new slice" the rest; merging the
        // two agg tables must reproduce the full recompute bit-exactly
        // (counts sum; DECIMAL partial sums add exactly).
        import graft.operators.IncrementalAgg
        val ev = Tables.events(s, dir).select("event_id", "event_type", "value")
        def leaf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("event_type").agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("sv"))
        val prev = leaf(ev.filter(col("event_id") % 10 < 7))
        val delta = leaf(ev.filter(col("event_id") % 10 >= 7))
        IncrementalAgg.merge(prev, delta, Seq("event_type"))
          .select(col("event_type"), col("n"),
            col("sv").cast("double").as("sum_value"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type""")),

    GraftQuery(
      "q172_interval_overlap_join",
      (s, dir) => {
        // batch interval-overlap join: the top-20 highest-value events
        // open 1-hour "incident windows"; count ALL events landing in
        // each window by type. A ts-between-s-and-e join has no
        // equi-key — TimeSeries.intervalJoin buckets both sides into
        // 1-hour cells (the IpGeo recipe on the time axis) so the plan
        // is a shuffled equi-join on the cell id, not a nested loop.
        // Works unchanged when incidents number 20 million, not 20.
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"),
            unix_timestamp(col("ts")).as("sec"))
          .localCheckpoint() // one scan feeds incident pick + join probe
        val inc = ev
          .orderBy(col("value").desc, col("event_id"))
          .limit(20)
          .select(col("event_id").as("incident_id"),
            col("sec").as("s"), (col("sec") + 3600L).as("e"))
        graft.operators.TimeSeries
          .intervalJoin(ev.select(col("event_type"), col("sec")), "sec",
            inc, "s", "e", bucketSec = 3600L)
          .groupBy(col("incident_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH ev AS (SELECT event_id, event_type, value,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
          inc AS (SELECT event_id AS incident_id, sec AS s, sec + 3600 AS e
            FROM ev ORDER BY value DESC, event_id LIMIT 20)
        SELECT i.incident_id, e.event_type, COUNT(*) AS n
        FROM inc i JOIN ev e ON e.sec >= i.s AND e.sec < i.e
        GROUP BY 1, 2"""),
      bench = true),

    GraftQuery(
      "q173_period_over_period",
      (s, dir) => {
        // period-over-period: daily revenue with the prior day's value,
        // absolute delta, and day count — the BI comparison shape. The
        // lag window is a single global ordering, but over one row per
        // DAY (bounded by calendar span, not data volume), so the
        // single-partition sort is safe at any corpus scale; the heavy
        // lifting is the one hash aggregation below it. Doubles come
        // from identical DECIMAL sums on both engines, and the delta is
        // a single IEEE subtraction of those — bit-deterministic.
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "orders")
          .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast("double").as("rev"))
        val w = Window.orderBy(col("day"))
        daily.select(col("day"), col("n_orders"), col("rev"),
          lag(col("rev"), 1).over(w).as("prev_rev"),
          (col("rev") - lag(col("rev"), 1).over(w)).as("delta"))
      },
      Some("""WITH d AS (SELECT date_trunc('day', o_orderdate) AS day,
            COUNT(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders GROUP BY 1)
        SELECT day, n_orders, rev,
          lag(rev) OVER (ORDER BY day) AS prev_rev,
          rev - lag(rev) OVER (ORDER BY day) AS delta
        FROM d""")),

    GraftQuery(
      "q174_capped_sessions",
      (s, dir) => {
        // production sessionizer: 30-min inactivity gap AND a 2-hour
        // hard cap — a session that stays active past the cap is split
        // at fixed offsets from its start (the rule q24's session_window
        // cannot express). All windows partition by user_id, so the
        // whole query is ONE shuffle: the lag/cumsum/min windows and the
        // final (user_id, s_start, sub) aggregation all reuse the same
        // hash partitioning. Tied seconds are safe under the default
        // RANGE frame: tied peers share the cumulative flag sum on both
        // engines, and a lag across a tie sees the same value either
        // way. Integer seconds end-to-end — hash-exact.
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, dir)
          .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        val w = Window.partitionBy("user_id").orderBy("sec")
        val prev = lag(col("sec"), 1).over(w)
        e.withColumn("new_s",
            when(prev.isNull || col("sec") - prev > 1800L, 1L).otherwise(0L))
          .withColumn("gid", sum(col("new_s")).over(w))
          .withColumn("s_start",
            min(col("sec")).over(Window.partitionBy("user_id", "gid")))
          .withColumn("sub", floor((col("sec") - col("s_start")) / 7200L))
          .groupBy(col("user_id"), col("s_start"), col("sub"))
          .agg(count(lit(1)).as("n"),
            min(col("sec")).as("sub_start"), max(col("sec")).as("sub_end"))
      },
      Some("""WITH e AS (SELECT user_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
          f AS (SELECT user_id, sec,
              CASE WHEN LAG(sec) OVER w IS NULL
                     OR sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
          g AS (SELECT user_id, sec,
              SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec) AS gid
            FROM f),
          h AS (SELECT user_id, sec, gid,
              MIN(sec) OVER (PARTITION BY user_id, gid) AS s_start
            FROM g)
        SELECT user_id, s_start,
          CAST(floor((sec - s_start) / 7200) AS BIGINT) AS sub,
          COUNT(*) AS n, MIN(sec) AS sub_start, MAX(sec) AS sub_end
        FROM h GROUP BY 1, 2, 3""")),

    GraftQuery(
      "q179_market_basket",
      (s, dir) => {
        // association rules over (user, day) baskets: pair support,
        // both-direction confidence, and lift. The scale trick is the
        // same as q123's PMI: pairs generate IN-ROW from each basket's
        // sorted distinct items (bounded by basket size², here ≤ 5
        // event types), never via a basket self-join — so the plan is
        // two hash aggregations and a broadcast of the tiny item-count
        // table, linear in baskets at any corpus size. All ratios are
        // single IEEE divisions of exact longs — bit-deterministic.
        val ev = Tables.events(s, dir).select(col("user_id"),
          unix_timestamp(date_trunc("day", col("ts"))).as("day"),
          col("event_type"))
        val baskets = ev.groupBy("user_id", "day")
          .agg(sort_array(collect_set(col("event_type"))).as("items"))
          .localCheckpoint() // one shuffle feeds N, item counts, pairs
        val nB = {
          val r = baskets.agg(count(lit(1))).collect()(0)
          r.getLong(0)
        }
        val itemCounts = baskets
          .select(explode(col("items")).as("item"))
          .groupBy("item").agg(count(lit(1)).as("s"))
        val n = size(col("items"))
        val pairsCol = when(n < 2,
            array().cast("array<struct<item_a:string,item_b:string>>"))
          .otherwise(flatten(transform(sequence(lit(1), n - 1), i =>
            transform(slice(col("items"), i + 1, n),
              x => struct(element_at(col("items"), i).as("item_a"),
                x.as("item_b"))))))
        val pairCounts = baskets.select(explode(pairsCol).as("p"))
          .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
          .agg(count(lit(1)).as("s_ab"))
        pairCounts
          .join(broadcast(itemCounts.select(col("item").as("item_a"),
            col("s").as("s_a"))), "item_a")
          .join(broadcast(itemCounts.select(col("item").as("item_b"),
            col("s").as("s_b"))), "item_b")
          .select(col("item_a"), col("item_b"), col("s_ab"),
            col("s_a"), col("s_b"),
            (col("s_ab").cast("double") / col("s_a")).as("conf_ab"),
            (col("s_ab").cast("double") / col("s_b")).as("conf_ba"),
            ((col("s_ab") * lit(nB)).cast("double") /
              (col("s_a") * col("s_b"))).as("lift"))
      },
      Some("""WITH b AS (SELECT DISTINCT user_id,
            CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day, event_type
          FROM events),
        nb AS (SELECT COUNT(*) AS n
          FROM (SELECT DISTINCT user_id, day FROM b)),
        ic AS (SELECT event_type, COUNT(*) AS s FROM b GROUP BY 1),
        pc AS (SELECT x.event_type AS item_a, y.event_type AS item_b,
            COUNT(*) AS s_ab
          FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day
            AND x.event_type < y.event_type
          GROUP BY 1, 2)
        SELECT pc.item_a, pc.item_b, pc.s_ab, ia.s AS s_a, ib.s AS s_b,
          CAST(pc.s_ab AS DOUBLE) / ia.s AS conf_ab,
          CAST(pc.s_ab AS DOUBLE) / ib.s AS conf_ba,
          CAST(pc.s_ab * (SELECT n FROM nb) AS DOUBLE) / (ia.s * ib.s)
            AS lift
        FROM pc
        JOIN ic ia ON ia.event_type = pc.item_a
        JOIN ic ib ON ib.event_type = pc.item_b""")),

    GraftQuery(
      "q183_dau_wau_mau",
      (s, dir) => {
        // growth metrics: daily / trailing-7-day / trailing-30-day
        // distinct actives and the DAU/MAU stickiness ratio. Trailing
        // DISTINCT counts can't ride a range window (no distinct over
        // frames), so each (user, day) activity row is exploded to the
        // 7 (resp. 30) target days it supports and the count becomes a
        // plain shuffled distinct aggregation — volume is user-days ×37,
        // linear, partitioned by day; the exact standard shape at fleet
        // scale. Integer day keys end-to-end; stickiness is one IEEE
        // division of exact longs.
        val ud = Tables.events(s, dir)
          .select(col("user_id"),
            unix_timestamp(date_trunc("day", col("ts"))).as("day"))
          .distinct()
          .localCheckpoint() // one activity table feeds dau/wau/mau
        def trailing(n: Int, name: String) = ud
          .select(col("user_id"), explode(sequence(lit(0), lit(n - 1)))
            .as("__k"), col("day"))
          .select(col("user_id"), (col("day") + col("__k") * 86400L).as("day"))
          .groupBy("day").agg(countDistinct(col("user_id")).as(name))
        val dau = ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
        dau
          .join(trailing(7, "wau"), Seq("day"))
          .join(trailing(30, "mau"), Seq("day"))
          .select(col("day"), col("dau"), col("wau"), col("mau"),
            (col("dau").cast("double") / col("mau")).as("stickiness"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
            CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day FROM events),
          dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau
            FROM ud GROUP BY 1),
          wau AS (SELECT u.day + s.x * 86400 AS day,
              COUNT(DISTINCT u.user_id) AS wau
            FROM ud u, (SELECT unnest(range(0, 7)) AS x) s GROUP BY 1),
          mau AS (SELECT u.day + s.x * 86400 AS day,
              COUNT(DISTINCT u.user_id) AS mau
            FROM ud u, (SELECT unnest(range(0, 30)) AS x) s GROUP BY 1)
        SELECT d.day, d.dau, w.wau, m.mau,
          CAST(d.dau AS DOUBLE) / m.mau AS stickiness
        FROM dau d
        JOIN wau w ON w.day = d.day
        JOIN mau m ON m.day = d.day""")),

    GraftQuery(
      "q184_hll_growth",
      (s, dir) => {
        // q183's scale path: at fleet scale the exact trailing distinct
        // is the expensive half (user-day rows ×37 through a distinct
        // agg), so production dashboards run it on HLL registers — one
        // tiny (day, idx, mr) register table per day, trailing windows
        // merged by register-max. Here the portable deterministic HLL
        // (q93's machinery) computes DAU and trailing-7 WAU estimates:
        // the sketch state is ≤256 rows per day regardless of corpus
        // size, and merging 7 days is a max over ≤1792 rows — the whole
        // dashboard reads sketches, never the events table.
        import graft.operators.Sketches
        val ud = Tables.events(s, dir)
          .select(col("user_id"),
            unix_timestamp(date_trunc("day", col("ts"))).as("day"))
          .distinct()
          .localCheckpoint()
        val dau = Sketches.hllDistinct(ud, "day", "user_id")
          .select(col("day"), col("est").as("dau_est"))
        val wd = ud.select(
            explode(sequence(lit(0), lit(6))).as("__k"),
            col("day"), col("user_id"))
          .select((col("day") + col("__k") * 86400L).as("day"),
            col("user_id"))
        val wau = Sketches.hllDistinct(wd, "day", "user_id")
          .select(col("day"), col("est").as("wau_est"))
        dau.join(wau, Seq("day"))
      },
      Some {
        val udRel = """(SELECT DISTINCT user_id,
            CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day
          FROM events) ud"""
        val wdRel = """(SELECT u.day + s.x * 86400 AS day, u.user_id
          FROM (SELECT DISTINCT user_id,
              CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day
            FROM events) u,
            (SELECT unnest(range(0, 7)) AS x) s) wd"""
        s"""SELECT d.day, d.est AS dau_est, w.est AS wau_est
          FROM (${graft.operators.Sketches.hllDistinctSql(
            udRel, "day", "user_id")}) d
          JOIN (${graft.operators.Sketches.hllDistinctSql(
            wdRel, "day", "user_id")}) w ON w.day = d.day"""
      }),

    GraftQuery(
      "q193_new_vs_returning",
      (s, dir) => {
        // the adoption curve: per day, how many actives are NEW (first
        // ever seen today) vs returning, plus the cumulative user count.
        // First-seen is one min-aggregate per user; the day-level join
        // and running total operate on day-bounded frames, so the only
        // data-volume work is the two user-keyed aggregations. The
        // cumulative window runs over one row per DAY — bounded by
        // calendar span, safe at any corpus size (q173's argument).
        import org.apache.spark.sql.expressions.Window
        val ud = Tables.events(s, dir)
          .select(col("user_id"),
            unix_timestamp(date_trunc("day", col("ts"))).as("day"))
          .distinct()
          .localCheckpoint()
        val dau = ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
        val firstSeen = ud.groupBy("user_id").agg(min(col("day")).as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dau.join(firstSeen, Seq("day"), "left")
          .select(col("day"), col("dau"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
          .withColumn("n_returning", col("dau") - col("n_new"))
          .withColumn("cum_users", sum(col("n_new")).over(w))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
            CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day FROM events),
          dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau
            FROM ud GROUP BY 1),
          fs AS (SELECT user_id, MIN(day) AS day FROM ud GROUP BY 1),
          nn AS (SELECT day, COUNT(*) AS n_new FROM fs GROUP BY 1)
        SELECT d.day, d.dau, COALESCE(n.n_new, 0) AS n_new,
          d.dau - COALESCE(n.n_new, 0) AS n_returning,
          CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM dau d LEFT JOIN nn n ON n.day = d.day"""))
  )
}

/** SCD2 + time-series window-frame analytics over the events stream. */
object HistoryQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q101_scd2_history",
      (s, dir) => {
        // Type-2 dimension history from the per-user event stream: each
        // user's event_type changes become versioned rows with
        // [valid_from, valid_to) intervals — consecutive same-type events
        // collapse into one version. event_id tie-breaks equal-second
        // updates so the version chain is total-ordered on both engines.
        val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"), col("event_type"))
        graft.operators.Scd2.history(ev, Seq("user_id"), "sec",
          Seq("event_type"), tieBreak = Seq("event_id"))
          .select("user_id", "event_type", "valid_from", "valid_to",
            "is_current")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type FROM events),
          c AS (SELECT *, LAG(event_type) OVER w AS prev
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
          v AS (SELECT user_id, sec, event_id, event_type FROM c
            WHERE prev IS NULL OR prev <> event_type),
          h AS (SELECT user_id, event_type, sec AS valid_from,
            LEAD(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
              AS valid_to
            FROM v)
        SELECT user_id, event_type, valid_from, valid_to,
          valid_to IS NULL AS is_current FROM h""")),

    GraftQuery(
      "q156_scd2_incremental_merge",
      (s, dir) => {
        // day-2 SCD2: merge a NEW per-key snapshot into the EXISTING
        // q101 history — no-op keys keep their open row, changed keys
        // (every user_id%3=0 gets an upper-cased state) close + insert,
        // unseen keys (user_id+1000000 for %10=0) start fresh chains,
        // and keys missing from the snapshot (%5=4) pass through open.
        // The oracle REBUILDS the history from scratch over
        // updates ∪ snapshot, so the gate is merge ≡ rebuild bit-exact.
        val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"), col("event_type"))
        val cutoff = ev.agg(max("sec")).collect()(0).getLong(0) + 1
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("sec").desc, col("event_id").desc)
        val last = ev.withColumn("__r", row_number().over(w))
          .filter(col("__r") === 1).select("user_id", "event_type")
        val snap = last.filter(col("user_id") % 5 =!= 4)
          .select(col("user_id"),
            when(col("user_id") % 3 === 0, upper(col("event_type")))
              .otherwise(col("event_type")).as("event_type"))
          .unionByName(last.filter(col("user_id") % 10 === 0)
            .select((col("user_id") + 1000000L).as("user_id"),
              lit("synthetic-new").as("event_type")))
        val hist = graft.operators.Scd2.history(ev, Seq("user_id"), "sec",
          Seq("event_type"), tieBreak = Seq("event_id"))
        graft.operators.Scd2.merge(hist, snap, Seq("user_id"),
          Seq("event_type"), asOf = cutoff)
      },
      Some("""WITH e AS (SELECT user_id, event_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type FROM events),
          lastst AS (SELECT user_id, event_type FROM (
              SELECT user_id, event_type, row_number() OVER (
                PARTITION BY user_id ORDER BY sec DESC, event_id DESC) AS r
              FROM e) WHERE r = 1),
          snap AS (SELECT user_id,
              CASE WHEN user_id % 3 = 0 THEN upper(event_type)
                   ELSE event_type END AS event_type
            FROM lastst WHERE user_id % 5 <> 4
            UNION ALL
            SELECT user_id + 1000000, 'synthetic-new' FROM lastst
            WHERE user_id % 10 = 0),
          cut AS (SELECT MAX(sec) + 1 AS c FROM e),
          u AS (SELECT user_id, event_id, sec, event_type FROM e
            UNION ALL
            SELECT user_id, 9223372036854775807, c, event_type
            FROM snap, cut),
          ch AS (SELECT *, LAG(event_type) OVER w AS prev
            FROM u WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
          v AS (SELECT user_id, sec, event_id, event_type FROM ch
            WHERE prev IS NULL OR prev <> event_type),
          h AS (SELECT user_id, event_type, sec AS valid_from,
            LEAD(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
              AS valid_to
            FROM v)
        SELECT user_id, event_type, valid_from, valid_to,
          valid_to IS NULL AS is_current FROM h""")),

    GraftQuery(
      "q161_scd2_multiday_fold",
      (s, dir) => {
        // the day-N warehouse loop: three successive snapshots (state at
        // t1 < t2 < t3) folded into the history by repeated Scd2.merge —
        // starting from an EMPTY history — must equal the history
        // rebuilt in one shot from the time-stamped snapshot rows.
        // Proves merge composes: closed rows written on day 2 are never
        // touched on day 3.
        val ev = Tables.events(s, dir).select(col("user_id"),
          col("event_id"), unix_timestamp(col("ts")).as("sec"),
          col("event_type"))
        val mm = ev.agg(min("sec"), max("sec")).collect()(0)
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        val cuts = Seq(mn + (mx - mn) / 3, mn + 2 * ((mx - mn) / 3),
          mx + 1)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("sec").desc, col("event_id").desc)
        def snapAt(t: Long) = ev.filter(col("sec") < t)
          .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
          .select("user_id", "event_type")
        val empty = ev.select(col("user_id"), col("event_type"),
          col("sec").as("valid_from"), col("sec").as("valid_to"),
          lit(true).as("is_current")).limit(0)
        cuts.foldLeft(empty) { (hist, t) =>
          graft.operators.Scd2.merge(hist, snapAt(t), Seq("user_id"),
            Seq("event_type"), asOf = t)
        }
      },
      Some("""WITH e AS (SELECT user_id, event_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type FROM events),
          mmx AS (SELECT MIN(sec) AS mn, MAX(sec) AS mx FROM e),
          cut AS (SELECT mn + (mx - mn) // 3 AS t1,
              mn + 2 * ((mx - mn) // 3) AS t2, mx + 1 AS t3 FROM mmx),
          sn AS (
            SELECT user_id, c.t1 AS sec, event_type FROM (
              SELECT user_id, event_type, row_number() OVER (
                PARTITION BY user_id ORDER BY sec DESC, event_id DESC) AS r
              FROM e, cut c0 WHERE sec < c0.t1) s, cut c WHERE r = 1
            UNION ALL
            SELECT user_id, c.t2, event_type FROM (
              SELECT user_id, event_type, row_number() OVER (
                PARTITION BY user_id ORDER BY sec DESC, event_id DESC) AS r
              FROM e, cut c0 WHERE sec < c0.t2) s, cut c WHERE r = 1
            UNION ALL
            SELECT user_id, c.t3, event_type FROM (
              SELECT user_id, event_type, row_number() OVER (
                PARTITION BY user_id ORDER BY sec DESC, event_id DESC) AS r
              FROM e, cut c0 WHERE sec < c0.t3) s, cut c WHERE r = 1),
          ch AS (SELECT *, LAG(event_type) OVER w AS prev FROM sn
            WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
          v AS (SELECT user_id, sec, event_type FROM ch
            WHERE prev IS NULL OR prev <> event_type),
          h AS (SELECT user_id, event_type, sec AS valid_from,
            LEAD(sec) OVER (PARTITION BY user_id ORDER BY sec) AS valid_to
            FROM v)
        SELECT user_id, event_type, valid_from, valid_to,
          valid_to IS NULL AS is_current FROM h""")),

    GraftQuery(
      "q169_seasonal_anomalies",
      (s, dir) => {
        // robust seasonal baseline: per (event_type, hour-of-day) the
        // median/MAD of a value and how many observations sit > 3 MAD
        // out — the monitoring shape a fleet runs per device-type per
        // hour slot; medians rounded before any threshold comparison.
        val ev = Tables.events(s, dir).select(col("event_type"),
          hour(col("ts")).as("hod"),
          (col("event_id") % 1000).cast("double").as("v"))
        graft.operators.TimeSeries.seasonalAnomalies(
          ev, "event_type", "hod", "v", k = 3)
      },
      Some(s"""WITH e AS (SELECT event_type,
            CAST(hour(ts) AS INTEGER) AS hod,
            CAST(event_id % 1000 AS DOUBLE) AS v FROM events),
          med AS (SELECT event_type, hod,
              ${graft.functions.SafeMath.roundHalfUpSql(
                "quantile_cont(v, 0.5)", 6)} AS med
            FROM e GROUP BY 1, 2),
          dev AS (SELECT e.event_type, e.hod,
              abs(e.v - m.med) AS adev, m.med
            FROM e JOIN med m ON m.event_type = e.event_type
              AND m.hod = e.hod),
          mad AS (SELECT event_type, hod, MIN(med) AS med,
              ${graft.functions.SafeMath.roundHalfUpSql(
                "quantile_cont(adev, 0.5)", 6)} AS mad,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM dev GROUP BY 1, 2)
        SELECT d.event_type, d.hod, MIN(m.med) AS med, MIN(m.mad) AS mad,
          MIN(m.n) AS n,
          CAST(SUM(CASE WHEN d.adev > 3.0E0 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalies
        FROM dev d JOIN mad m ON m.event_type = d.event_type
          AND m.hod = d.hod
        GROUP BY 1, 2""")),

    GraftQuery(
      "q139_gap_fill",
      (s, dir) => {
        // daily per-user-bucket event counts, forward-filled over the
        // corpus' full day range — sparse keys get synthesized rows
        // carrying their last observation (the `filled` flag marks them).
        val ev = Tables.events(s, dir).select(
          (col("user_id") % 20).as("k"),
          expr("unix_timestamp(ts) div 86400").as("d"))
        val obs = ev.groupBy("k", "d").agg(count(lit(1)).as("v"))
        graft.operators.TimeSeries.gapFill(obs, "k", "d", "v")
      },
      Some("""WITH e AS (SELECT user_id % 20 AS k,
            CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d FROM events),
          o AS (SELECT k, d, CAST(COUNT(*) AS BIGINT) AS v
            FROM e GROUP BY 1, 2),
          r AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM o),
          keys AS (SELECT DISTINCT k FROM o),
          grid AS (SELECT k, unnest(range(lo, hi + 1)) AS d FROM keys, r),
          j AS (SELECT g.k, g.d, o.v, o.v IS NULL AS filled
            FROM grid g LEFT JOIN o ON o.k = g.k AND o.d = g.d)
        SELECT k, d,
          last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
          filled
        FROM j""")),

    GraftQuery(
      "q147_incremental_join_view",
      (s, dir) => {
        // incremental JOIN-view maintenance (the Δfacts⋈dim case of
        // IVM): a per-nation revenue view over orders⋈customer is kept
        // current by joining and aggregating ONLY the 10% delta slice
        // and merging the two agg tables — the oracle recomputes the
        // view from scratch, so the gate asserts merge ≡ full
        // recompute bit-exactly. (Dim-side deltas need the old fact
        // rows re-joined — that path stays a rebuild by design.)
        import graft.operators.IncrementalAgg
        val cust = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_nationkey")
        def view(o: org.apache.spark.sql.DataFrame) =
          o.join(cust, col("o_custkey") === col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(count(lit(1)).as("n_orders"),
              sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sv"))
        val orders = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val stored = view(orders.filter(col("o_orderkey") % 10 =!= 0))
        val delta = view(orders.filter(col("o_orderkey") % 10 === 0))
        IncrementalAgg.merge(stored, delta, Seq("c_nationkey"))
          .select(col("c_nationkey"), col("n_orders"),
            col("sv").cast("double").as("revenue"))
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey""")),

    GraftQuery(
      "q141_ols_trend",
      (s, dir) => {
        // per-user-bucket daily activity trend: exact integer sufficient
        // statistics, FP only in the two final divisions.
        val ev = Tables.events(s, dir).select(
          (col("user_id") % 20).as("k"),
          expr("unix_timestamp(ts) div 86400").as("d"))
        val obs = ev.groupBy("k", "d").agg(count(lit(1)).as("y"))
        graft.operators.TimeSeries.olsTrend(obs, "k", "d", "y")
      },
      Some {
        val slope = "CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)"
        s"""WITH e AS (SELECT user_id % 20 AS k,
            CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d FROM events),
          o AS (SELECT k, d, CAST(COUNT(*) AS BIGINT) AS y
            FROM e GROUP BY 1, 2),
          s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(d) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(d*y) AS BIGINT) AS sxy,
            CAST(SUM(d*d) AS BIGINT) AS sxx FROM o GROUP BY k)
        SELECT k, n,
          CASE WHEN n*sxx - sx*sx = 0 THEN NULL
            ELSE ${graft.functions.SafeMath.roundHalfUpSql(slope, 6)} END
            AS slope,
          CASE WHEN n*sxx - sx*sx = 0 THEN NULL
            ELSE ${graft.functions.SafeMath.roundHalfUpSql(
              s"(CAST(sy AS DOUBLE) - ($slope) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)",
              6)} END AS intercept
        FROM s"""
      }),

    GraftQuery(
      "q143_frequent_sequences",
      (s, dir) => graft.operators.Funnel.frequentSequences(
        Tables.events(s, dir)
          .select("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "event_id", n = 3, topK = 20),
      Some("""WITH g AS (SELECT
            event_type || '>' || lead(event_type, 1) OVER w
              || '>' || lead(event_type, 2) OVER w AS seq,
            lead(event_type, 2) OVER w IS NOT NULL AS ok
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT seq, CAST(COUNT(*) AS BIGINT) AS cnt FROM g WHERE ok
        GROUP BY seq ORDER BY cnt DESC, seq ASC LIMIT 20""")),

    GraftQuery(
      "q106_funnel",
      (s, dir) => {
        // view → click → purchase within 24 h of the first view: one
        // filtered per-user aggregation per step, each joining only the
        // previous step's one-row-per-user result (never events×events).
        val ev = Tables.events(s, dir).select(col("user_id"),
          unix_timestamp(col("ts")).as("sec"), col("event_type"))
        graft.operators.Funnel.detect(ev, "user_id", "sec", "event_type",
          Seq("view", "click", "purchase"), horizon = 86400L)
      },
      Some("""WITH e AS (SELECT user_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type FROM events),
          s0 AS (SELECT user_id, MIN(sec) AS t_0 FROM e
            WHERE event_type = 'view' GROUP BY 1),
          s1 AS (SELECT e.user_id, MIN(e.sec) AS t_1
            FROM e JOIN s0 ON s0.user_id = e.user_id
            WHERE e.event_type = 'click'
              AND e.sec >= s0.t_0 AND e.sec <= s0.t_0 + 86400 GROUP BY 1),
          s2 AS (SELECT e.user_id, MIN(e.sec) AS t_2
            FROM e JOIN s0 ON s0.user_id = e.user_id
            JOIN s1 ON s1.user_id = e.user_id
            WHERE e.event_type = 'purchase'
              AND e.sec >= s1.t_1 AND e.sec <= s0.t_0 + 86400 GROUP BY 1)
        SELECT s0.user_id, s0.t_0, s1.t_1, s2.t_2,
          CAST(1 + CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END
                 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
            AS INTEGER) AS stages_reached
        FROM s0
        LEFT JOIN s1 ON s1.user_id = s0.user_id
        LEFT JOIN s2 ON s2.user_id = s0.user_id""")),

    GraftQuery(
      "q107_moving_avg",
      (s, dir) => {
        // trailing-hour moving average per event type: a time-RANGE
        // window frame (not ROWS — duplicate timestamps are peers on
        // both engines). DECIMAL frame sums so partial order can't
        // perturb the double; the division operands are then identical
        // cross-engine.
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir).select(col("event_id"),
          col("event_type"), unix_timestamp(col("ts")).as("sec"),
          col("value"))
        val w = Window.partitionBy("event_type").orderBy(col("sec"))
          .rangeBetween(-3600L, 0L)
        ev.withColumn("n_window", count(lit(1)).over(w))
          .withColumn("mavg",
            sum(col("value").cast(DecimalType(18, 2))).over(w)
              .cast("double") / col("n_window"))
          .select("event_id", "event_type", "sec", "n_window", "mavg")
      },
      Some("""WITH e AS (SELECT event_id, event_type,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events)
        SELECT event_id, event_type, sec,
          COUNT(*) OVER w AS n_window,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
            / (COUNT(*) OVER w) AS mavg
        FROM e WINDOW w AS (PARTITION BY event_type ORDER BY sec
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"""),
      bench = true),

    GraftQuery(
      "q108_cohort_retention",
      (s, dir) => {
        // cohort analysis: users grouped by first-active day, retention
        // counted per day offset — two aggregations keyed by user then
        // (cohort, offset); the distinct day grid keeps the join input
        // at |user × active-days|, not |events|.
        val ev = Tables.events(s, dir).select(col("user_id"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        val days = ev.distinct()
        val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
        days.join(cohort, "user_id")
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH d AS (SELECT DISTINCT user_id,
            CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
          c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1)
        SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
          COUNT(DISTINCT d.user_id) AS n_users
        FROM d JOIN c ON c.user_id = d.user_id
        GROUP BY 1, 2""")),

    GraftQuery(
      "q113_time_weighted_avg",
      (s, dir) => {
        // time-weighted mean per series: each reading holds until the
        // next one, so it weighs by its interval (last reading carries
        // no interval) — the correct average for irregularly-sampled
        // telemetry like the reference's PON optical readings. DECIMAL
        // interval products sum exactly; the final division's operands
        // are then identical cross-engine.
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir).select(col("event_type"),
          unix_timestamp(col("ts")).as("sec"), col("event_id"), col("value"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("sec").asc, col("event_id").asc)
        ev.withColumn("__dt", lead(col("sec"), 1).over(w) - col("sec"))
          .groupBy("event_type")
          .agg(
            sum((col("value").cast(DecimalType(18, 2)) *
              coalesce(col("__dt"), lit(0L))).cast(DecimalType(38, 2)))
              .as("__num"),
            (max(col("sec")) - min(col("sec"))).as("t_span"))
          .select(col("event_type"), col("t_span"),
            when(col("t_span") === 0L, lit(0.0))
              .otherwise(col("__num").cast("double") / col("t_span"))
              .as("twa"))
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id, value
          FROM events),
          d AS (SELECT event_type, sec, value,
            LEAD(sec) OVER (PARTITION BY event_type
              ORDER BY sec ASC, event_id ASC) - sec AS dt
          FROM e),
          a AS (SELECT event_type,
            SUM(CAST(CAST(value AS DECIMAL(18,2)) * COALESCE(dt, 0)
              AS DECIMAL(38,2))) AS num,
            MAX(sec) - MIN(sec) AS t_span
          FROM d GROUP BY event_type)
        SELECT event_type, t_span,
          CASE WHEN t_span = 0 THEN 0.0E0
            ELSE CAST(num AS DOUBLE) / t_span END AS twa
        FROM a""")),

    GraftQuery(
      "q210_last_touch_attribution",
      (s, dir) => {
        // marketing attribution: every purchase credited to the user's
        // most recent click within 7 days (channel synthesized from the
        // click's props), else 'direct'. ONE user-partitioned window
        // carries the last click forward — never a purchases×clicks
        // self-join — then a plain channel rollup.
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"), col("value"), col("props"))
        val channel = concat(lit("ch"),
          (get_json_object(col("props"), "$.k").cast("long") % 5)
            .cast("string"))
        graft.operators.Funnel.lastTouchAttribution(ev, "user_id", "ts",
            "event_id", "event_type", touchType = "click",
            convType = "purchase", channel = channel,
            lookbackSec = 604800L)
          .groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast(DecimalType(18, 2)))
              .cast("double").as("revenue"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, value, ts,
            CAST(floor(epoch(ts)) AS BIGINT) AS tse,
            'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
              % 5 AS VARCHAR) AS ch
          FROM events),
        c AS (SELECT event_type, value, tse,
            last_value(CASE WHEN event_type = 'click' THEN ch END
              IGNORE NULLS) OVER w AS last_ch,
            last_value(CASE WHEN event_type = 'click' THEN tse END
              IGNORE NULLS) OVER w AS last_ts
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        p AS (SELECT CASE WHEN last_ch IS NOT NULL
              AND tse - last_ts <= 604800 THEN last_ch
              ELSE 'direct' END AS channel, value
          FROM c WHERE event_type = 'purchase')
      SELECT channel, COUNT(*) AS n_purchases,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM p GROUP BY channel"""))
  ,

    GraftQuery(
      "q286_linear_attribution",
      (s, dir) => {
        // linear multi-touch attribution
        // ([[graft.operators.Funnel.linearAttribution]]): every click in
        // the 7-day window shares the purchase's cents equally, the most
        // recent click absorbs the integer remainder — credits sum
        // exactly to revenue (reconciled against q210's winner-take-all
        // view). One user window carries the touch list; the split is
        // an array projection.
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"), col("value"), col("props"))
        val channel = concat(lit("ch"),
          (get_json_object(col("props"), "$.k").cast("long") % 5)
            .cast("string"))
        graft.operators.Funnel.linearAttribution(ev, "user_id", "ts",
            "event_id", "event_type", touchType = "click",
            convType = "purchase", channel = channel,
            valueCents = floor(col("value") * lit(100.0) + lit(0.5))
              .cast("long"),
            lookbackSec = 604800L)
          .groupBy("channel")
          .agg(count(lit(1)).as("n_credits"),
            sum(col("credit_cents")).as("credit_cents"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, value, ts,
            CAST(floor(epoch(ts)) AS BIGINT) AS tse,
            'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
              % 5 AS VARCHAR) AS ch
          FROM events),
        c AS (SELECT event_id, event_type, value, tse,
            list(CASE WHEN event_type = 'click'
              THEN {'t': tse, 'ch': ch} END) OVER w AS touches
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        p AS (SELECT event_id,
            CAST(FLOOR(value * 100.0E0 + 0.5E0) AS BIGINT) AS cents,
            list_filter(touches, x -> x IS NOT NULL
              AND x.t >= tse - 604800 AND x.t <= tse) AS tf
          FROM c WHERE event_type = 'purchase'),
        credited AS (SELECT r.ch AS channel, r.credit AS credit_cents
          FROM (SELECT unnest(list_transform(range(1, len(tf) + 1), i ->
              {'ch': tf[i].ch,
               'credit': cents // len(tf) + CASE WHEN i = len(tf)
                 THEN cents - (cents // len(tf)) * len(tf)
                 ELSE 0 END})) AS r
            FROM p WHERE len(tf) > 0)),
        direct AS (SELECT 'direct' AS channel, cents AS credit_cents
          FROM p WHERE len(tf) = 0),
        u AS (SELECT * FROM credited UNION ALL SELECT * FROM direct)
      SELECT channel, COUNT(*) AS n_credits,
        CAST(SUM(credit_cents) AS BIGINT) AS credit_cents
      FROM u GROUP BY channel""")),

    GraftQuery(
      "q288_kaplan_meier",
      (s, dir) => {
        // user time-to-churn survival curve
        // ([[graft.operators.TimeSeries.kaplanMeierMicro]]): duration =
        // days between a user's first and last event; users still active
        // in the corpus' final week are CENSORED, not churned — the
        // estimator a naive churned-only lifetime average silently
        // biases. Risk table from one grouped aggregate; the product
        // fold is all-integer micro-units, replayed by the oracle as a
        // recursive CTE.
        val ev = Tables.events(s, dir).select(col("user_id"),
          expr("unix_timestamp(ts) div 86400L").as("d"))
        val users = ev.groupBy("user_id")
          .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
        val horizon = ev.agg(max(col("d"))).collect()(0).getLong(0)
        val subj = users.select(
          (col("last_d") - col("first_d")).as("dur"),
          when(col("last_d") < horizon - 7L, 1L).otherwise(0L)
            .as("churned"))
        graft.operators.TimeSeries.kaplanMeierMicro(subj, "dur", "churned")
      },
      Some("""WITH RECURSIVE ev AS (SELECT user_id,
              CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d FROM events),
          u AS (SELECT user_id, MIN(d) AS fd, MAX(d) AS ld
            FROM ev GROUP BY user_id),
          h AS (SELECT MAX(d) AS h FROM ev),
          subj AS (SELECT ld - fd AS t,
              CASE WHEN ld < h.h - 7 THEN 1 ELSE 0 END AS e
            FROM u, h),
          risk AS (SELECT t, CAST(SUM(e) AS BIGINT) AS d,
              CAST(COUNT(*) AS BIGINT) AS m
            FROM subj GROUP BY t),
          tab AS (SELECT t, d, m,
              CAST(SUM(m) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
              ROW_NUMBER() OVER (ORDER BY t) AS rn
            FROM risk),
          rec AS (
            SELECT t, n, d, m, rn, (1000000 * (n - d)) // n AS s
            FROM tab WHERE rn = 1
            UNION ALL
            SELECT x.t, x.n, x.d, x.m, x.rn, (r.s * (x.n - x.d)) // x.n
            FROM rec r JOIN tab x ON x.rn = r.rn + 1)
        SELECT t, n AS n_at_risk, d AS d_events, m - d AS c_censored,
          CAST(s AS BIGINT) AS surv_micro
        FROM rec""")),

    GraftQuery(
      "q302_merge_intervals",
      (s, dir) => {
        // per-user union of session validity windows ([[graft.operators
        // .TimeSeries.mergeIntervals]]): each event opens a
        // deterministic 5min–2h window (the q272 synthesis); merging
        // collapses overlaps so per-user covered time can be summed
        // without double-counting — the normalization q272's global
        // census and any SCD2 validity union both stand on.
        val ev = Tables.events(s, dir).select(
          col("user_id"),
          unix_timestamp(col("ts")).as("start_s"),
          (unix_timestamp(col("ts")) +
            (col("event_id") % 6900L + 300L)).as("end_s"))
        graft.operators.TimeSeries.mergeIntervals(
          ev, "user_id", "start_s", "end_s")
      },
      Some("""WITH iv AS (SELECT user_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS s,
              CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 6900) + 300
                AS e
            FROM events),
          m AS (SELECT user_id, s, e,
              MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS pmax
            FROM iv),
          isl AS (SELECT user_id, s, e,
              SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS isl
            FROM m)
        SELECT user_id, CAST(MIN(s) AS BIGINT) AS span_start,
          CAST(MAX(e) AS BIGINT) AS span_end,
          CAST(COUNT(*) AS BIGINT) AS n_merged
        FROM isl GROUP BY user_id, isl""")),

    GraftQuery(
      "q291_rate_spikes",
      (s, dir) => {
        // volume-spike alerting over each event type's daily counts
        // ([[graft.operators.TimeSeries.rateSpikes]]): a day fires when
        // its count beats the trailing-7-day mean by 4σ under the
        // Poisson test (W·n − μ)² > z²·W·μ — all-BIGINT algebra, no
        // sqrt, so both engines flag the identical day set.
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400L").as("d"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.rateSpikes(
          daily, "event_type", "d", "n", w = 7, z = 4)
      },
      Some("""WITH daily AS (SELECT event_type,
              CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          t AS (SELECT event_type, d, n,
              COALESCE(CAST(SUM(n) OVER w AS BIGINT), 0) AS win_sum,
              CAST(COUNT(*) OVER w AS BIGINT) AS n_prior
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        SELECT event_type, d, n, win_sum, n_prior,
          (n_prior = 7 AND (7 * n - win_sum) * (7 * n - win_sum)
            > 16 * 7 * win_sum AND 7 * n > win_sum) AS spike
        FROM t""")),

    GraftQuery(
      "q272_interval_census",
      (s, dir) => {
        // concurrent-sessions-over-time from an interval table
        // ([[graft.operators.TimeSeries.intervalCensus]]): each event
        // opens a session whose deterministic duration hashes off the
        // event id (5 min – 2 h), and the +1/−1 sweep reports the hourly
        // concurrency at every change point — the SCD2-validity /
        // job-overlap census. All bucket math is integer `div` on epoch
        // seconds; the running sum is one row per changed hour,
        // calendar-bounded (PlanSpec exemption class).
        val ev = Tables.events(s, dir).select(
          unix_timestamp(col("ts")).as("start_s"),
          (unix_timestamp(col("ts")) +
            (col("event_id") % 6900L + 300L)).as("end_s"))
        graft.operators.TimeSeries.intervalCensus(
          ev, "start_s", "end_s", bucketSeconds = 3600L)
      },
      Some("""WITH iv AS (SELECT
              CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
              CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 6900) + 300
                AS end_s
            FROM events),
          d AS (SELECT start_s // 3600 AS b, CAST(1 AS BIGINT) AS d
              FROM iv
            UNION ALL
            SELECT end_s // 3600 + 1 AS b, CAST(-1 AS BIGINT) AS d
              FROM iv),
          n AS (SELECT b, CAST(SUM(d) AS BIGINT) AS net FROM d GROUP BY b
            HAVING SUM(d) <> 0)
        SELECT CAST(b * 3600 AS BIGINT) AS bucket_start, net,
          CAST(SUM(net) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS active
        FROM n""")),

    GraftQuery(
      "q274_ewma",
      (s, dir) => {
        // α=1/8 EWMA over each event type's daily volume
        // ([[graft.operators.TimeSeries.ewmaMicro]]) — the smoothed
        // baseline a volume alert thresholds against. The recurrence is
        // all-integer (shift, not divide), inherently sequential per
        // key, folded inside one `aggregate` per calendar-bounded
        // series; the oracle replays the identical fold with the q129
        // string-accumulator trick (DuckDB's list_reduce loses list
        // state in struct accumulators).
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400L").as("d"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.ewmaMicro(
          daily, "event_type", "d", "n", num = 1L, shift = 3)
      },
      Some("""WITH daily AS (SELECT event_type,
              CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          ser AS (SELECT event_type,
              list(d ORDER BY d) AS ts, list(n ORDER BY d) AS xs
            FROM daily GROUP BY event_type),
          fld AS (SELECT event_type, ts, xs,
              string_split(list_reduce(
                list_prepend({'s': CAST('' AS VARCHAR),
                              'last': CAST(0 AS BIGINT)},
                  list_transform(xs, x ->
                    {'s': CAST('' AS VARCHAR), 'last': x})),
                (acc, e) -> CASE WHEN acc.s = ''
                  THEN {'s': CAST(e.last AS VARCHAR), 'last': e.last}
                  ELSE {'s': acc.s || chr(31) || CAST(
                          (7 * acc.last + e.last) // 8 AS VARCHAR),
                        'last': (7 * acc.last + e.last) // 8} END).s,
                chr(31)) AS es
            FROM ser)
        SELECT event_type, r.t AS d, r.x AS n, r.ewma AS ewma
        FROM (SELECT event_type,
            unnest(list_transform(range(1, len(xs) + 1), i ->
              {'t': ts[i], 'x': xs[i],
               'ewma': CAST(es[i] AS BIGINT)})) AS r
          FROM fld)""")),

    GraftQuery(
      "q277_holt_trend",
      (s, dir) => {
        // Holt level+trend smoothing (α=1/4, β=1/2) over each event
        // type's daily volume ([[graft.operators.TimeSeries.holtMicro]])
        // — where q274's EWMA lags a ramping series forever, Holt tracks
        // the ramp and emits a one-step forecast. The recurrence is
        // all-integer with TRUNCATING division (Spark `div`-style ≡
        // DuckDB `//` — trends go negative, so a floor-based shift would
        // land one off); the oracle replays the identical fold as a
        // RECURSIVE CTE stepping rn → rn+1 per key. NOT list_reduce:
        // DuckDB 1.0 mis-evaluates a two-numeric-field struct
        // accumulator (the level fold stayed right while the trend
        // field silently read stale values — the q129 LIST-field bug's
        // wider family; even the all-VARCHAR re-parse carry corrupted).
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400L").as("d"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.holtMicro(
          daily, "event_type", "d", "n", num = 1L, shift = 2)
      },
      Some {
        val lN = "(s.n + 3 * (r.level + r.trend)) // 4"
        s"""WITH RECURSIVE daily AS (SELECT event_type,
              CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          ser AS (SELECT event_type, d, n, ROW_NUMBER() OVER (
              PARTITION BY event_type ORDER BY d) AS rn
            FROM daily),
          rec AS (
            SELECT event_type, d, n, rn, n AS level,
              CAST(0 AS BIGINT) AS trend
            FROM ser WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.d, s.n, s.rn,
              $lN AS level,
              (($lN) - r.level + r.trend) // 2 AS trend
            FROM rec r JOIN ser s
              ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        SELECT event_type, d, n, level, trend,
          level + trend AS forecast
        FROM rec"""
      })
  )
}
