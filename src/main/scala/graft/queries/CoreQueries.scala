package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.TimeBuckets
import graft.operators.KeepLatest

/** Relational core: aggregation, broadcast dim joins, semi/anti joins,
  * keep-latest, explode, top-k, time buckets (SURVEY.md §2.4–§2.7).
  *
  * Scale notes baked into each plan:
  *  - dims (`customer`/`nation`/`region`) are `broadcast()` — no shuffle of
  *    the fact side, the join runs map-side on every executor;
  *  - double-typed SUMs go through DECIMAL(18,2) so partial aggregation
  *    order (map-side combine across 1000 executors) cannot perturb the
  *    result — exact arithmetic, still codegen'd;
  *  - keep-latest is a single hash-partitioned `row_number`, not a global
  *    sort.
  */
object CoreQueries {

  /** q152/q186 shared oracle fragment: the line-level gross with the same
    * scale-6 rounding the Spark side applies before the decimal sum. */
  private val SafeMathReconcileSql: String =
    graft.functions.SafeMath.roundHalfUpSql(
      "(l_extendedprice * (1.0E0 - l_discount)) * (1.0E0 + l_tax)", 6)

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q01_agg_pricing",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        // Sums run in DECIMAL (partial-agg order independent), but the
        // FINAL output is pinned to DOUBLE on both sides: the driver hashes
        // rendered values, and Spark DECIMAL ("261.60") vs DuckDB
        // SUM→DECIMAL(38,x)→float ("261.6") flip the hash on any value with
        // trailing zeros.
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
            sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
              .cast(DecimalType(28, 4))).cast("double").as("sum_disc_price"),
            graft.functions.SafeMath.roundHalfUp(
              sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") /
                count(lit(1)), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        ${graft.functions.SafeMath.roundHalfUpSql(
          "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus"""),
      bench = true),

    GraftQuery(
      "q02_hourly_agg",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.groupBy(
            TimeBuckets.hourStart(col("ts")).as("hour_start"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2"""),
      bench = true),

    GraftQuery(
      "q03_time_buckets",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        TimeBuckets.withBuckets(ev, "ts", "ts")
          .select("event_id", "ts_h", "ts_d", "ts_w", "ts_m")
      },
      Some("""SELECT event_id,
        CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ts_h,
        CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS ts_d,
        CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS ts_w,
        CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS ts_m
        FROM events""")),

    GraftQuery(
      "q04_dim_enrich",
      (s, dir) => {
        // J1-J3 analog: fact → chained broadcast dim joins (probe/task/param
        // in the reference, customer/nation/region here). No fact shuffle.
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
          .select(o("o_orderkey"), o("o_totalprice"),
            c("c_name"), n("n_name").as("nation_name"), r("r_name").as("region_name"))
      },
      Some("""SELECT o_orderkey, o_totalprice, c_name,
        n_name AS nation_name, r_name AS region_name
        FROM orders
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey"""),
      bench = true),

    GraftQuery(
      "q05_exists_semi",
      (s, dir) => {
        // J7 analog (heartbeat branch): rows whose key exists in the dim.
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    GraftQuery(
      "q06_not_exists_anti",
      (s, dir) => {
        // J7 analog (register branch): rows missing from the dim. The dim
        // side is filtered first (predicate pushdown), keeping the anti
        // join non-trivial at every SF.
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 400000)""")),

    GraftQuery(
      "q07_keep_latest",
      (s, dir) => {
        // W1: ReplacingMergeTree / c_p_pinfo_real semantics — latest row per
        // key. One shuffle on the key; ties broken by event_id.
        val ev = Tables.events(s, dir)
        KeepLatest(ev, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
          .select("user_id", "event_id", "event_type", "value")
      },
      Some("""SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1"""),
      bench = true),

    GraftQuery(
      "q08_explode_tokens",
      (s, dir) => {
        // U3 analog: 1 parent row → N child rows (detail explosion), then a
        // grouped count. Explode is a codegen'd Generator, agg is map-side
        // partial + one shuffle on token.
        val d = Tables.load(s, dir, "documents")
        d.select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT token, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> '' GROUP BY token""")),

    GraftQuery(
      "q09_json_extract",
      (s, dir) => {
        // F14: pull a field out of the semi-structured props payload.
        val ev = Tables.events(s, dir)
        ev.select(col("event_type"),
            regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
              .cast("long").as("k"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      },
      // CAST(SUM AS BIGINT): DuckDB SUM(BIGINT)→HUGEINT renders as float
      // ("99111.0") in the driver compare while Spark emits LongType.
      Some("""SELECT event_type,
        CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(*) AS n
        FROM events GROUP BY event_type""")),

    GraftQuery(
      "q39_distinct_agg",
      (s, dir) => {
        // §2.5: distinct aggregation (Spark expands to a two-phase
        // partial-distinct plan — no full row shuffle).
        val ev = Tables.events(s, dir)
        ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        COUNT(*) AS n_events FROM events GROUP BY event_type""")),

    GraftQuery(
      "q40_approx_distinct",
      (s, dir) => {
        // HLL++ sketch — the estimate itself is engine-specific (DuckDB's
        // approx sketch can't hash-match Spark's), so the gated output is
        // the ASSERTION: the exact count plus a boolean that Spark's
        // rsd=0.02 estimate landed within ±5% of it. A drifting estimate
        // flips the boolean and fails the hash gate — a real correctness
        // check, not rows-only. (q93 gates a fully portable HLL twin.)
        // At 100 TB this operator replaces exact distinct wherever ±2%
        // error is acceptable.
        val ev = Tables.events(s, dir)
        ev.groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02).as("__approx"),
            countDistinct(col("user_id")).as("n_users"))
          .select(col("event_type"), col("n_users"),
            (abs(col("__approx") - col("n_users")).cast("double") <=
              col("n_users").cast("double") * 0.05).as("approx_within_5pct"))
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        true AS approx_within_5pct FROM events GROUP BY event_type""")),

    GraftQuery(
      "q93_hll_portable",
      (s, dir) => graft.operators.Sketches.hllDistinct(
        Tables.events(s, dir).select("event_type", "user_id"),
        "event_type", "user_id"),
      // q40's asterisk, closed: our own md5-register HLL is deterministic
      // and engine-portable, so the estimate itself hash-gates.
      Some(graft.operators.Sketches.hllDistinctSql(
        "events", "event_type", "user_id"))),

    GraftQuery(
      "q41_percentiles",
      (s, dir) => {
        // §2.5 analytics the reference delegates to ClickHouse: exact
        // interpolated percentiles (sort-based; for 100 TB use
        // approx_percentile and accept the sketch error).
        val li = Tables.load(s, dir, "lineitem")
        li.groupBy("l_returnflag").agg(
          graft.functions.SafeMath.roundHalfUp(
            percentile(col("l_quantity"), lit(0.5)), 6).as("p50_qty"),
          graft.functions.SafeMath.roundHalfUp(
            percentile(col("l_quantity"), lit(0.9)), 6).as("p90_qty"),
          graft.functions.SafeMath.roundHalfUp(
            percentile(col("l_extendedprice"), lit(0.95)), 6).as("p95_price"))
      },
      Some(s"""SELECT l_returnflag,
        ${graft.functions.SafeMath.roundHalfUpSql("quantile_cont(l_quantity, 0.5)", 6)} AS p50_qty,
        ${graft.functions.SafeMath.roundHalfUpSql("quantile_cont(l_quantity, 0.9)", 6)} AS p90_qty,
        ${graft.functions.SafeMath.roundHalfUpSql("quantile_cont(l_extendedprice, 0.95)", 6)} AS p95_price
        FROM lineitem GROUP BY l_returnflag""")),

    GraftQuery(
      "q158_hdr_quantiles",
      (s, dir) => {
        // q41's scale path made concrete: a log-linear (HDR/DDSketch-
        // style) quantile HISTOGRAM — O(64·m) counters per group however
        // large the column, mergeable by summing counts — with integer-
        // exact bucketing (length(bin(x)), never log()) so the estimate
        // itself hash-gates across engines. Relative error ≤ 2^-6.
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"),
            floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        val hist = graft.operators.Sketches.hdrHistogram(
          li, "l_returnflag", "cents")
        graft.operators.Sketches.hdrQuantiles(hist, "l_returnflag",
          Seq(500000, 900000, 990000))
      },
      Some(s"""WITH v AS (SELECT l_returnflag,
            CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem),
        h AS (SELECT l_returnflag,
            ${graft.operators.Sketches.hdrBucketSql("cents")} AS bucket,
            CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1, 2),
        c AS (SELECT l_returnflag, bucket, cnt,
            SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
            SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
          FROM h),
        q AS (SELECT c.*, CAST(r.q AS BIGINT) AS q_ppm,
            greatest(1, (n * r.q + 999999) // 1000000) AS rank
          FROM c, (SELECT unnest([500000, 900000, 990000]) AS q) r)
      SELECT l_returnflag, q_ppm, CAST(n AS BIGINT) AS n_values,
        CASE WHEN bucket < 128 THEN bucket
          ELSE CAST((64 + bucket % 64) *
            CAST(power(2, bucket // 64 - 1) AS BIGINT) AS BIGINT) END AS est
      FROM q WHERE cum >= rank AND cum - cnt < rank""")),

    GraftQuery(
      "q164_global_rank",
      (s, dir) => {
        // global total-order ranking WITHOUT the SinglePartition window:
        // range-repartition + local row_numbers + driver prefix-sum of
        // ≤32 partition counts (PlanSpec asserts no single-partition
        // exchange in this plan — the anti-pattern this operator kills).
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
        graft.operators.GlobalSort.withGlobalRank(li,
          Seq(col("l_extendedprice"), col("l_orderkey"),
            col("l_linenumber")))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice,
          CAST(row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
            l_linenumber) AS BIGINT) AS rank
        FROM lineitem""")),

    GraftQuery(
      "q42_salted_join",
      (s, dir) => {
        // skew-proof fact⋈dim join: row-identical to the plain join (the
        // oracle IS the plain join), hot keys spread across 8 salts.
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
        graft.operators.SkewTools.saltedJoin(li, o, Seq("l_orderkey"), saltN = 8)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
        FROM (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem)
        JOIN (SELECT o_orderkey AS l_orderkey, o_totalprice FROM orders)
        USING (l_orderkey)""")),

    GraftQuery(
      "q44_set_ops",
      (s, dir) => {
        // §2.7: the reference has union only; intersect/except come free
        // in Spark (hash-aggregated semi/anti under the hood).
        val ev = Tables.events(s, dir)
        def users(t: String) =
          ev.filter(col("event_type") === t).select("user_id")
        val both = users("click").intersect(users("purchase"))
          .withColumn("set_kind", lit("click_and_purchase"))
        val only = users("click").except(users("purchase"))
          .withColumn("set_kind", lit("click_only"))
        both.unionByName(only)
      },
      Some("""SELECT user_id, 'click_and_purchase' AS set_kind FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT user_id, 'click_only' AS set_kind FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          EXCEPT
          SELECT user_id FROM events WHERE event_type = 'purchase')""")),

    GraftQuery(
      "q10_topk",
      (s, dir) => {
        // §2.7: top-k = TakeOrderedAndProject physical op — no global sort,
        // each partition keeps k rows, driver merges k×partitions.
        val o = Tables.load(s, dir, "orders")
        o.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    GraftQuery(
      "q134_fk_audit",
      (s, dir) => {
        // data-quality audit before trusting an ingest: two healthy FK
        // relations plus one deliberately corrupted child (every 100th
        // o_custkey shifted out of range → orphans) so the nonzero path
        // is exercised, not just the all-green one.
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        val lineitem = Tables.load(s, dir, "lineitem")
        val corrupted = orders.select(
          when(col("o_orderkey") % 100 === 0, col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")).as("o_custkey"))
        graft.operators.Audit
          .fkAudit("orders->customer", orders, "o_custkey",
            customer, "c_custkey")
          .unionByName(graft.operators.Audit.fkAudit(
            "lineitem->orders", lineitem, "l_orderkey",
            orders, "o_orderkey"))
          .unionByName(graft.operators.Audit.fkAudit(
            "corrupted->customer", corrupted, "o_custkey",
            customer, "c_custkey"))
      },
      Some {
        def row(rel: String, child: String, fk: String, parent: String,
            pk: String): String =
          s"""SELECT '$rel' AS relation,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_child,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM $child
              WHERE $fk IS NULL) AS n_null_fk,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM $child
              WHERE $fk IS NOT NULL
                AND $fk NOT IN (SELECT $pk FROM $parent)) AS n_orphans,
            (SELECT CAST(COUNT(DISTINCT $pk) AS BIGINT) FROM $parent)
              AS n_parent_keys,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT $pk FROM $parent
              GROUP BY 1 HAVING COUNT(*) > 1)) AS n_dup_parent_keys"""
        val corrupted = """(SELECT CASE WHEN o_orderkey % 100 = 0
            THEN o_custkey + 10000000 ELSE o_custkey END AS o_custkey
          FROM orders)"""
        s"""${row("orders->customer", "orders", "o_custkey",
            "customer", "c_custkey")}
          UNION ALL
          ${row("lineitem->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey")}
          UNION ALL
          ${row("corrupted->customer", corrupted + " c", "o_custkey",
            "customer", "c_custkey")}"""
      }),

    GraftQuery(
      "q145_star_join",
      (s, dir) => {
        // the TPC-H Q5 shape — the canonical star join: region/nation/
        // customer/supplier dims broadcast into the lineitem fact scan,
        // one shuffle for the final nation rollup. Date range + region
        // filters push into the dim scans before any join.
        val revenue = sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2))))
          .cast(DecimalType(28, 4))).cast("double")
        Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
          .join(Tables.load(s, dir, "nation"),
            col("n_regionkey") === col("r_regionkey"))
          .join(Tables.load(s, dir, "customer"),
            col("c_nationkey") === col("n_nationkey"))
          .join(Tables.load(s, dir, "orders")
              .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.load(s, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "supplier"),
            col("s_suppkey") === col("l_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM region, nation, customer, orders, lineitem, supplier
        WHERE r_name = 'ASIA'
          AND n_regionkey = r_regionkey
          AND c_nationkey = n_nationkey
          AND o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_orderkey = o_orderkey
          AND s_suppkey = l_suppkey
          AND s_nationkey = c_nationkey
        GROUP BY n_name"""),
      bench = true),

    GraftQuery(
      "q146_shipping_priority",
      (s, dir) => {
        // the TPC-H Q3 shape: segment-filtered customer dim broadcast
        // into orders⋈lineitem, per-order revenue, top 10 by
        // TakeOrderedAndProject (never a global sort materialization).
        val revenue = sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2))))
          .cast(DecimalType(28, 4))).cast("double")
        Tables.load(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .join(Tables.load(s, dir, "orders")
              .filter(col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.load(s, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"),
            unix_timestamp(col("o_orderdate")).as("order_date"),
            col("o_orderpriority"))
          .agg(revenue.as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey,
          CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_date,
          o_orderpriority,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND o_custkey = c_custkey
          AND l_orderkey = o_orderkey
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""),
      bench = true),

    GraftQuery(
      "q151_delete_audit",
      (s, dir) => {
        // right-to-be-forgotten propagation audit: every 97th customer
        // files a deletion request; report the blast radius across the
        // customer table itself and the orders fact before purging.
        val customer = Tables.load(s, dir, "customer")
        val orders = Tables.load(s, dir, "orders")
        val requests = customer.filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("subject"))
        graft.operators.Audit.deleteAudit(requests, "subject", Seq(
          ("customer", customer.select(col("c_custkey")), "c_custkey"),
          ("orders", orders.select(col("o_custkey")), "o_custkey")))
      },
      Some("""WITH req AS (SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_custkey % 97 = 0),
          nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM req)
        SELECT 'customer' AS relation, nk.n AS n_request_keys,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_before,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_custkey IN (SELECT k FROM req)) AS n_deleted,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM req)) AS n_after
        FROM nk
        UNION ALL
        SELECT 'orders', nk.n,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_custkey IN (SELECT k FROM req)),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_custkey NOT IN (SELECT k FROM req))
        FROM nk""")),

    GraftQuery(
      "q261_delete_apply",
      (s, dir) => {
        // the EXECUTION half of q151: purge every 97th customer from a
        // month-partitioned orders fact by rewriting ONLY the partitions
        // they touch ([[graft.sources.FactWriter.deleteSubjects]]). The
        // gate hashes the rewrite report JOINED with a re-read of the
        // post-delete storage — rows_now comes from the files the
        // overwrite actually left behind and subjects_left must be 0 in
        // every partition, so a botched write (or a partition the
        // dynamic overwrite missed) flips the hash, not just a spec.
        val tmp = java.nio.file.Files.createTempDirectory("graft-q261")
          .toFile.getAbsolutePath
        Tables.load(s, dir, "orders")
          .withColumn("d", date_format(col("o_orderdate"), "yyyy-MM"))
          .write.mode("overwrite").partitionBy("d").parquet(s"$tmp/fact")
        val subjects = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("subject"))
        val report = graft.sources.FactWriter.deleteSubjects(
          s, s"$tmp/fact", "d", "o_custkey", subjects, "subject")
        val after = s.read.parquet(s"$tmp/fact")
        val subj = broadcast(subjects.distinct())
        val post = after
          .join(subj, after("o_custkey") === col("subject"), "left")
          .groupBy(col("d"))
          .agg(count(lit(1)).as("rows_now"),
            sum(when(col("subject").isNotNull, 1L).otherwise(0L))
              .as("subjects_left"))
        // left join + coalesce: a fully-emptied partition leaves no
        // files to re-read, and must still report rows_now = 0
        report.join(post, report("partition_value") === post("d"), "left")
          .select(col("partition_value"), col("rows_before"),
            col("rows_removed"), col("rows_after"),
            coalesce(col("rows_now"), lit(0L)).as("rows_now"),
            coalesce(col("subjects_left"), lit(0L)).as("subjects_left"))
      },
      Some("""WITH f AS (SELECT strftime(o_orderdate, '%Y-%m') AS d,
              o_custkey FROM orders),
          req AS (SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_custkey % 97 = 0),
          aff AS (SELECT DISTINCT d FROM f
            JOIN req ON f.o_custkey = req.k)
        SELECT d AS partition_value,
          CAST(COUNT(*) AS BIGINT) AS rows_before,
          CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS rows_removed,
          CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS rows_after,
          CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS rows_now,
          CAST(0 AS BIGINT) AS subjects_left
        FROM f JOIN aff USING (d) LEFT JOIN req ON f.o_custkey = req.k
        GROUP BY d""")),

    GraftQuery(
      "q264_fk_discovery",
      (s, dir) => {
        // schema-inference: which column pairs LOOK like FKs? The four
        // probes cover the quadrant — two true FKs (total containment +
        // unique parent), one total-containment pair whose parent is
        // NOT a key (the classic join-trap a naive containment check
        // blesses), and one reversed pair with partial containment.
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        val lineitem = Tables.load(s, dir, "lineitem")
        graft.operators.Audit.fkDiscovery(Seq(
          ("orders", orders, "o_custkey", "customer", customer,
            "c_custkey"),
          ("lineitem", lineitem, "l_orderkey", "orders", orders,
            "o_orderkey"),
          ("orders", orders, "o_orderkey", "lineitem", lineitem,
            "l_orderkey"),
          ("customer", customer, "c_custkey", "orders", orders,
            "o_custkey")))
      },
      Some {
        def pair(cn: String, cc: String, pn: String, pc: String) =
          s"""SELECT '$cn.$cc' AS child, '$pn.$pc' AS parent,
            (SELECT CAST(COUNT(DISTINCT $cc) AS BIGINT) FROM $cn
              WHERE $cc IS NOT NULL) AS n_child_keys,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT $cc AS k FROM $cn WHERE $cc IS NOT NULL)
              WHERE k IN (SELECT $pc FROM $pn WHERE $pc IS NOT NULL))
              AS n_matched,
            (SELECT COUNT($pc) = COUNT(DISTINCT $pc) FROM $pn)
              AS parent_unique"""
        val rows = Seq(
          pair("orders", "o_custkey", "customer", "c_custkey"),
          pair("lineitem", "l_orderkey", "orders", "o_orderkey"),
          pair("orders", "o_orderkey", "lineitem", "l_orderkey"),
          pair("customer", "c_custkey", "orders", "o_custkey"))
          .mkString(" UNION ALL ")
        s"""SELECT child, parent, n_child_keys, n_matched,
          CAST(CASE WHEN n_child_keys = 0 THEN 0
            ELSE (n_matched * 1000000) // n_child_keys END AS BIGINT)
            AS containment_ppm,
          parent_unique,
          (n_child_keys > 0 AND n_matched = n_child_keys
            AND parent_unique) AS is_fk_candidate
        FROM ($rows)"""
      }),

    GraftQuery(
      "q265_compaction",
      (s, dir) => {
        // ReplacingMergeTree compaction end-to-end: the fact gets a base
        // append (ver=1) plus an update wave (ver=2 for every third
        // key), so each month partition holds duplicates until
        // compactPartitions resolves last-write-wins back into storage.
        // The gate hashes the compaction report JOINED with a re-read of
        // the compacted files: rows_now proves the rewrite, ver_sum
        // proves the SURVIVORS are the ver=2 rows (a compactor that kept
        // the stale version would match counts but flip ver_sum).
        val tmp = java.nio.file.Files.createTempDirectory("graft-q265")
          .toFile.getAbsolutePath
        val base = Tables.load(s, dir, "orders")
          .withColumn("d", date_format(col("o_orderdate"), "yyyy-MM"))
          .select(col("o_orderkey"), col("o_custkey"), col("d"),
            lit(1L).as("ver"))
        base.write.mode("overwrite").partitionBy("d")
          .parquet(s"$tmp/fact")
        base.filter(col("o_orderkey") % 3 === 0)
          .withColumn("ver", lit(2L))
          .write.mode("append").partitionBy("d").parquet(s"$tmp/fact")
        val report = graft.sources.FactWriter.compactPartitions(
          s, s"$tmp/fact", "d", Seq("o_orderkey"),
          versionOrder = Seq(col("ver").desc),
          clusterCols = Seq(col("o_custkey"), col("o_orderkey")))
        val post = s.read.parquet(s"$tmp/fact").groupBy(col("d"))
          .agg(count(lit(1)).as("rows_now"), sum(col("ver")).as("ver_sum"))
        report.join(post, report("partition_value") === post("d"))
          .select(col("partition_value"), col("rows_before"),
            col("dups_removed"), col("rows_after"), col("rows_now"),
            col("ver_sum"))
      },
      Some("""WITH f AS (SELECT o_orderkey,
              strftime(o_orderdate, '%Y-%m') AS d FROM orders),
          c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n3
            FROM f GROUP BY d)
        SELECT d AS partition_value,
          CAST(n + n3 AS BIGINT) AS rows_before,
          n3 AS dups_removed, n AS rows_after, n AS rows_now,
          CAST(n + n3 AS BIGINT) AS ver_sum
        FROM c""")),

    GraftQuery(
      "q269_view_maintenance",
      (s, dir) => {
        // incremental join-view maintenance: the stored orders⋈customer
        // view absorbs an order delta AND a customer delta via three
        // delta-sided broadcast joins ([[graft.operators.IncrementalAgg
        // .deltaJoin]]) — neither base table is re-shuffled. The oracle
        // is the FULL recompute of the post-delta join, so any missed or
        // double-counted delta combination (the dA⋈dB corner is the one
        // naive implementations drop) flips the hash.
        val orders = Tables.load(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey").as("custkey"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        val cust = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("custkey"), col("c_mktsegment"))
        val dA = orders.filter(col("o_orderkey") % 7 === 0)
        val a0 = orders.filter(col("o_orderkey") % 7 =!= 0)
        val dB = cust.filter(col("custkey") % 11 === 0)
        val b0 = cust.filter(col("custkey") % 11 =!= 0)
        val view0 = a0.join(b0, Seq("custkey"))
        graft.operators.IncrementalAgg
          .deltaJoin(view0, a0, dA, b0, dB, Seq("custkey"))
          .groupBy(col("c_mktsegment"), col("mon"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""SELECT c_mktsegment, strftime(o_orderdate, '%Y-%m') AS mon,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2""")),

    GraftQuery(
      "q152_reconcile_totals",
      (s, dir) => {
        // cross-table reconciliation: does the order header total equal
        // the line-level gross (ext·(1−disc)·(1+tax))? One line-item
        // aggregation + one join; the report counts agreements within a
        // cent — the integrity check a finance pipeline runs per load.
        // (The synthetic generator need not maintain the invariant; the
        // REPORT is the deliverable and both engines must agree on it.)
        val li = Tables.load(s, dir, "lineitem")
        val orders = Tables.load(s, dir, "orders")
        val gross = li.groupBy(col("l_orderkey")).agg(
          sum(graft.functions.SafeMath.roundHalfUp(
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) *
                (lit(1.0) + col("l_tax")), 6)
            .cast(DecimalType(28, 6))).as("li_total"))
        val joined = orders.join(gross,
            col("o_orderkey") === col("l_orderkey"), "left")
          .select(
            abs(col("o_totalprice").cast(DecimalType(18, 2))
                .cast(DecimalType(28, 6)) -
              coalesce(col("li_total"), lit(0).cast(DecimalType(28, 6))))
              .cast("double").as("diff"))
        joined.agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("diff") <= 0.01, 1L).otherwise(0L)).as("n_reconciled"),
          graft.functions.SafeMath.roundHalfUp(max(col("diff")), 2)
            .as("max_abs_diff"))
      },
      Some(s"""WITH gross AS (SELECT l_orderkey,
            SUM(CAST(${graft.functions.SafeMath.roundHalfUpSql(
              "(l_extendedprice * (1.0E0 - l_discount)) * (1.0E0 + l_tax)",
              6)} AS DECIMAL(28,6))) AS li_total
          FROM lineitem GROUP BY l_orderkey),
        d AS (SELECT abs(CAST(CAST(o_totalprice AS DECIMAL(18,2))
              AS DECIMAL(28,6)) -
            COALESCE(li_total, CAST(0 AS DECIMAL(28,6)))) AS diff
          FROM orders LEFT JOIN gross ON o_orderkey = l_orderkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(SUM(CASE WHEN CAST(diff AS DOUBLE) <= 0.01E0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "MAX(CAST(diff AS DOUBLE))", 2)} AS max_abs_diff
        FROM d"""),
      bench = false),

    GraftQuery(
      "q135_skew_profile",
      (s, dir) => {
        // detect-then-salt, the detection half: two natural TPC-H keys
        // plus a synthetically skewed one (every even order collapses
        // onto key 0 → ~50% of rows in one bucket, skew_ratio ≈ n_keys/2).
        val orders = Tables.load(s, dir, "orders")
        val lineitem = Tables.load(s, dir, "lineitem")
        val skewed = orders.select(
          when(col("o_orderkey") % 2 === 0, lit(0L))
            .otherwise(col("o_custkey")).as("k"))
        graft.operators.SkewTools
          .skewProfile("lineitem.l_orderkey", lineitem, "l_orderkey")
          .unionByName(graft.operators.SkewTools
            .skewProfile("orders.o_custkey", orders, "o_custkey"))
          .unionByName(graft.operators.SkewTools
            .skewProfile("orders.skewed", skewed, "k"))
      },
      Some {
        def row(rel: String, table: String, key: String): String =
          s"""SELECT '$rel' AS relation, n_rows, n_keys, max_key_rows,
              p99_key_rows,
              ${graft.functions.SafeMath.roundHalfUpSql(
                "CAST(max_key_rows AS DOUBLE) / " +
                "(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))", 4)}
                AS skew_ratio
            FROM (SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                CAST(COUNT(*) AS BIGINT) AS n_keys,
                CAST(MAX(n) AS BIGINT) AS max_key_rows,
                ${graft.functions.SafeMath.roundHalfUpSql(
                  "quantile_cont(n, 0.99E0)", 4)} AS p99_key_rows
              FROM (SELECT $key AS k, CAST(COUNT(*) AS BIGINT) AS n
                FROM $table GROUP BY 1))"""
        val skewed = """(SELECT CASE WHEN o_orderkey % 2 = 0 THEN 0
            ELSE o_custkey END AS k FROM orders)"""
        s"""${row("lineitem.l_orderkey", "lineitem", "l_orderkey")}
          UNION ALL ${row("orders.o_custkey", "orders", "o_custkey")}
          UNION ALL ${row("orders.skewed", skewed + " s", "k")}"""
      }),

    GraftQuery(
      "q136_profile_card",
      (s, dir) => graft.operators.Audit.profileCard(
        Tables.load(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars")),
      Some {
        def row(c: String): String =
          s"""SELECT '$c' AS col_name,
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
            CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
            CAST(MIN($c) AS VARCHAR) AS min_value,
            CAST(MAX($c) AS VARCHAR) AS max_value
          FROM documents"""
        Seq("doc_id", "text", "lang", "source", "n_chars")
          .map(row).mkString("\nUNION ALL\n")
      }),

    GraftQuery(
      "q181_profile_drift",
      (s, dir) => {
        // day-over-day dataset drift report: the profile card of
        // yesterday's slice vs today's full snapshot, joined per column
        // — row growth, null-rate delta (ppm, integer-exact), distinct
        // growth, and range-moved flags. This is the check a pipeline
        // runs BEFORE publishing a snapshot: a column whose null rate
        // jumped or whose range collapsed is a broken upstream, caught
        // from two tiny card frames, never a row-level diff. Cards are
        // one fused aggregation pass each; the join is card-sized.
        import graft.operators.Audit
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val full = Tables.load(s, dir, "documents")
        val prev = Audit.profileCard(full.filter(col("doc_id") % 10 < 7), cols)
        val cur = Audit.profileCard(full, cols)
        def ppm(n: org.apache.spark.sql.Column,
            d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          floor(n.cast("double") / d.cast("double") * 1000000.0 + 0.5)
            .cast("long")
        prev.select(col("col_name"), col("n_rows").as("rows_prev"),
            col("n_null").as("null_prev"),
            col("n_distinct").as("dst_prev"),
            col("min_value").as("min_prev"), col("max_value").as("max_prev"))
          .join(cur.select(col("col_name"), col("n_rows").as("rows_cur"),
            col("n_null").as("null_cur"),
            col("n_distinct").as("dst_cur"),
            col("min_value").as("min_cur"), col("max_value").as("max_cur")),
            "col_name")
          .select(col("col_name"),
            col("rows_prev"), col("rows_cur"),
            (ppm(col("null_cur"), col("rows_cur")) -
              ppm(col("null_prev"), col("rows_prev"))).as("null_ppm_delta"),
            (col("dst_cur") - col("dst_prev")).as("distinct_delta"),
            (col("min_cur") =!= col("min_prev") ||
              col("max_cur") =!= col("max_prev")).as("range_moved"))
      },
      Some {
        def card(name: String, pred: String): String = {
          def row(c: String): String =
            s"""SELECT '$c' AS col_name,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
              CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
              CAST(MIN($c) AS VARCHAR) AS min_value,
              CAST(MAX($c) AS VARCHAR) AS max_value
            FROM documents $pred"""
          Seq("doc_id", "text", "lang", "source", "n_chars")
            .map(row).mkString(" UNION ALL ")
        }
        s"""WITH prev AS (${card("prev", "WHERE doc_id % 10 < 7")}),
          cur AS (${card("cur", "")})
        SELECT p.col_name, p.n_rows AS rows_prev, c.n_rows AS rows_cur,
          CAST(floor(CAST(c.n_null AS DOUBLE) / c.n_rows * 1000000 + 0.5)
              AS BIGINT)
            - CAST(floor(CAST(p.n_null AS DOUBLE) / p.n_rows * 1000000 + 0.5)
              AS BIGINT) AS null_ppm_delta,
          c.n_distinct - p.n_distinct AS distinct_delta,
          (c.min_value <> p.min_value OR c.max_value <> p.max_value)
            AS range_moved
        FROM prev p JOIN cur c ON c.col_name = p.col_name"""
      }),

    GraftQuery(
      "q186_health_report",
      (s, dir) => {
        // the morning health report — the warehouse analogue of q92's
        // composed curation pipeline: row volume, FK orphans, financial
        // reconciliation misses, and checksum coverage folded into ONE
        // (check_name, value) frame a scheduler can diff against
        // yesterday and alert on. Each signal is the already-gated
        // operator (q134/q152/q177) reused as a library call — the
        // composition IS the artifact.
        import graft.functions.SafeMath
        import org.apache.spark.sql.types.DecimalType
        val orders = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        def metric(name: String, v: org.apache.spark.sql.DataFrame) =
          v.select(lit(name).as("check_name"),
            col("v").cast("long").as("value"))
        val rows = metric("orders_rows", orders.agg(count(lit(1)).as("v")))
        val orphans = metric("lineitem_orphans",
          graft.operators.Audit.fkAudit("x", li, "l_orderkey",
            orders, "o_orderkey").select(col("n_orphans").as("v")))
        val gross = li.groupBy(col("l_orderkey")).agg(
          sum(SafeMath.roundHalfUp(
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) *
                (lit(1.0) + col("l_tax")), 6)
            .cast(DecimalType(28, 6))).as("li_total"))
        val unrecon = metric("orders_unreconciled",
          orders.join(gross, col("o_orderkey") === col("l_orderkey"), "left")
            .select(abs(col("o_totalprice").cast(DecimalType(18, 2))
                .cast(DecimalType(28, 6)) -
              coalesce(col("li_total"), lit(0).cast(DecimalType(28, 6))))
              .cast("double").as("diff"))
            .agg(sum(when(col("diff") > 0.01, 1L).otherwise(0L)).as("v")))
        val buckets = metric("checksum_buckets",
          graft.operators.Audit.tableChecksum(
            orders.withColumn("bucket_d",
              unix_timestamp(date_trunc("day", col("o_orderdate")))),
            "bucket_d", Seq("o_orderkey", "o_custkey"))
            .agg(count(lit(1)).as("v")))
        rows.unionByName(orphans).unionByName(unrecon).unionByName(buckets)
      },
      Some(s"""SELECT 'orders_rows' AS check_name,
          CAST(COUNT(*) AS BIGINT) AS value FROM orders
        UNION ALL
        SELECT 'lineitem_orphans', CAST(COUNT(*) AS BIGINT) FROM lineitem
          WHERE l_orderkey IS NOT NULL
            AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orders_unreconciled', (
          WITH gross AS (SELECT l_orderkey,
              SUM(CAST(${SafeMathReconcileSql} AS DECIMAL(28,6))) AS li_total
            FROM lineitem GROUP BY l_orderkey)
          SELECT CAST(SUM(CASE WHEN
              CAST(abs(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                  AS DECIMAL(28,6))
                - COALESCE(li_total, CAST(0 AS DECIMAL(28,6)))) AS DOUBLE)
                > 0.01E0
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders LEFT JOIN gross ON l_orderkey = o_orderkey)
        UNION ALL
        SELECT 'checksum_buckets',
          CAST(COUNT(DISTINCT date_trunc('day', o_orderdate)) AS BIGINT)
          FROM orders""")),

    GraftQuery(
      "q188_decile_report",
      (s, dir) => {
        // customer-value decile report — the classic contribution curve
        // ("do the top 10% carry 40% of revenue?"): per-customer revenue,
        // decile cutoffs as ONE aggregate (9 doubles to the driver —
        // q124's percentile-cutoff pattern, never a global ntile sort),
        // zero-shuffle bin assignment, then per-decile totals and share
        // of a window total over the 10-row result. Cutoffs and shares
        // are roundHalfUp'd on both engines.
        import graft.functions.SafeMath
        import org.apache.spark.sql.types.DecimalType
        import org.apache.spark.sql.expressions.Window
        val rev = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("rev"))
          .localCheckpoint() // one pass feeds cutoffs and binning
        val ps = (1 until 10).map(_.toDouble / 10)
        val cutRow = rev.agg(
          percentile(col("rev"), typedLit(ps)).as("cuts")).collect()(0)
        val cuts =
          if (cutRow.isNullAt(0)) Seq.empty[Double]
          else cutRow.getSeq[Double](0).map(SafeMath.roundHalfUpD(_, 6))
        val bin = cuts.foldLeft(lit(1)) { (acc, c) =>
          acc + when(col("rev") > lit(c), 1).otherwise(0)
        }
        val byDecile = rev.groupBy(bin.as("decile"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("rev").cast(DecimalType(18, 2)))
              .cast("double").as("decile_rev"))
        // window total sums DECIMAL, not raw doubles — partition arrival
        // order must not move the sum by a ulp across runs
        byDecile.select(col("decile"), col("n_customers"), col("decile_rev"),
          SafeMath.roundHalfUp(col("decile_rev") /
            sum(col("decile_rev").cast(DecimalType(18, 2)))
              .over(Window.partitionBy()).cast("double"), 6)
            .as("rev_share"))
      },
      Some {
        val cutsSql = (1 until 10).map(i =>
          graft.functions.SafeMath.roundHalfUpSql(
            s"quantile_cont(rev, 0.$i)", 6) + s" AS c$i").mkString(", ")
        val binSql = "1 + " + (1 until 10).map(i =>
          s"CASE WHEN rev > c$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH rev AS (SELECT o_custkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS rev
            FROM orders GROUP BY 1),
          cuts AS (SELECT $cutsSql FROM rev),
          binned AS (SELECT CAST(($binSql) AS INTEGER) AS decile, rev
            FROM rev, cuts),
          d AS (SELECT decile, COUNT(*) AS n_customers,
              CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS decile_rev
            FROM binned GROUP BY 1)
        SELECT decile, n_customers, decile_rev,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "decile_rev / CAST(SUM(CAST(decile_rev AS DECIMAL(18,2)))" +
              " OVER () AS DOUBLE)", 6)} AS rev_share
        FROM d"""
      }),

    GraftQuery(
      "q190_partition_audit",
      (s, dir) => {
        // backfill triage: which expected day partitions are MISSING
        // and which are THIN (under half the average density)? The
        // expected grid is a sequence explode over the observed [min,
        // max] span (never a driver loop); the verdict joins the grid
        // to per-day counts. Input is deliberately damaged (q134's
        // corrupted-child precedent): every 50th day index dropped,
        // every 31st thinned to ~30% — so both verdict paths prove out.
        val days = Tables.load(s, dir, "orders")
          .select(unix_timestamp(date_trunc("day", col("o_orderdate")))
            .as("day"), col("o_orderkey"))
          .withColumn("__di", (col("day") / 86400L).cast("long"))
          .filter(col("__di") % 50 =!= 0)
          .filter(col("__di") % 31 =!= 0 || col("o_orderkey") % 10 < 3)
        val counts = days.groupBy("day").agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val mm = counts.agg(min(col("day")), max(col("day")),
          sum(col("n"))).collect()(0)
        if (mm.isNullAt(0)) counts.select(col("day"), col("n"),
          lit("").as("status")) // empty input → empty audit
        else {
          val (lo, hi, tot) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
          val nDays = (hi - lo) / 86400L + 1L
          val avg = tot.toDouble / nDays.toDouble
          val grid = s.range(1).select(explode(
            sequence(lit(lo), lit(hi), lit(86400L))).as("day"))
          grid.join(counts, Seq("day"), "left")
            .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
            .withColumn("status",
              when(col("n") === 0, "missing")
                .when(col("n") < lit(0.5) * lit(avg), "thin"))
            .filter(col("status").isNotNull)
        }
      },
      Some("""WITH src AS (SELECT
            CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day,
            o_orderkey,
            CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) // 86400
              AS di
          FROM orders),
        damaged AS (SELECT day, o_orderkey FROM src
          WHERE di % 50 <> 0 AND (di % 31 <> 0 OR o_orderkey % 10 < 3)),
        counts AS (SELECT day, COUNT(*) AS n FROM damaged GROUP BY 1),
        mm AS (SELECT MIN(day) AS lo, MAX(day) AS hi,
            CAST(SUM(n) AS DOUBLE) /
              (CAST((MAX(day) - MIN(day)) // 86400 + 1 AS DOUBLE)) AS avg
          FROM counts),
        grid AS (SELECT unnest(generate_series(mm.lo, mm.hi, 86400))
            AS day, mm.avg FROM mm),
        audit AS (SELECT g.day, COALESCE(c.n, 0) AS n,
            CASE WHEN COALESCE(c.n, 0) = 0 THEN 'missing'
              WHEN COALESCE(c.n, 0) < 0.5E0 * g.avg THEN 'thin' END
              AS status
          FROM grid g LEFT JOIN counts c ON c.day = g.day)
        SELECT day, n, status FROM audit WHERE status IS NOT NULL""")),

    GraftQuery(
      "q201_bloom_join_reduction",
      (s, dir) => {
        // Runtime-filter semi-join reduction: the selective dim's join
        // keys become a 262144-bit portable Bloom filter pushed into the
        // fact SCAN as a pure projection predicate — ~(1 − fp) of the
        // non-matching fact rows die before the join instead of being
        // shuffled/probed, the move that pays for itself many times over
        // on a 100 TB fact side. No false negatives, so the result is
        // IDENTICAL to the plain join — which is exactly what the plain-
        // join oracle checks.
        val dim = Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderstatus") === "F")
        val fact = graft.operators.JoinReduction.bloomPrefilter(
          Tables.load(s, dir, "lineitem"), "l_orderkey", dim, "o_orderkey")
        val revenue = sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2))))
          .cast(DecimalType(28, 4))).cast("double")
        fact.join(broadcast(dim), col("l_orderkey") === col("o_orderkey"))
          .groupBy(month(col("o_orderdate")).cast("long").as("mon"))
          .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT month(o_orderdate) AS mon,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        GROUP BY 1""")),

    GraftQuery(
      "q202_hll_overlap",
      // distinct-set overlap between two segments by inclusion–exclusion
      // over the portable HLL — |A∩B| ≈ |A| + |B| − |A∪B| with the union
      // sketch a per-register max-merge. The audience-overlap question
      // answered from ≤ 3·256 register rows, never a distinct-set
      // materialization or an intersection join.
      (s, dir) => graft.operators.Sketches.hllOverlap(
        Tables.load(s, dir, "orders"), "o_orderpriority", "o_custkey",
        "1-URGENT", "5-LOW"),
      Some(graft.operators.Sketches.hllOverlapSql(
        "orders", "o_orderpriority", "o_custkey", "1-URGENT", "5-LOW"))),

    GraftQuery(
      "q204_cms_join_size",
      (s, dir) => {
        // the optimizer-statistics question — how big will this join be?
        // — answered from two count-min sketches via the AMS inner
        // product, never by running the join. Gated on the hardest case,
        // a self-join on a repeated key (Σ n² — the second frequency
        // moment), next to the exact answer so the artifact shows the
        // estimate AND its error. Each sketch is one map-side-combined
        // pass; the estimate joins 2·depth·width counter rows.
        val orders = Tables.load(s, dir, "orders")
          .filter(col("o_custkey").isNotNull)
        val est = graft.operators.Sketches.cmsJoinSize(
          orders, "o_custkey", orders, "o_custkey")
        val exact = orders.groupBy("o_custkey")
          .agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * col("n")).as("exact_rows"))
        est.crossJoin(exact)
      },
      Some(s"""WITH k AS (SELECT CAST(o_custkey AS VARCHAR) AS t
            FROM orders WHERE o_custkey IS NOT NULL),
          h AS (SELECT r.j AS j,
              ${CurationQueries.md5Key60Sql(
                "'graft-cms' || CAST(r.j AS VARCHAR) || t")} % 1024 AS bucket
            FROM k, range(0, 4) r(j)),
          counters AS (SELECT j, bucket, COUNT(*) AS c FROM h GROUP BY 1, 2),
          -- HUGEINT inner product mirrors the Spark side's DECIMAL(18,0)
          -- multiply-sum: both exact, so the estimate cannot wrap on
          -- either engine (the q133 overflow class)
          ip AS (SELECT j, SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ip
            FROM counters GROUP BY j),
          e AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_rows FROM ip),
          x AS (SELECT CAST(SUM(n * n) AS BIGINT) AS exact_rows FROM (
            SELECT COUNT(*) AS n FROM orders
            WHERE o_custkey IS NOT NULL GROUP BY o_custkey))
        SELECT e.est_rows, x.exact_rows FROM e, x""")),

    GraftQuery(
      "q205_snapshot_diff",
      (s, dir) => {
        // data-versioning diff: day-2 snapshot synthesized from orders by
        // deterministic mutations (drop %97 keys, bump %89 prices, add
        // %101 keys shifted out of range), then classified against day 1
        // — added/removed/changed/unchanged counts from a (key, md5)
        // full-outer join that never ships whole rows. Prices compare as
        // integer cents so the fingerprint string is engine-exact.
        val base = Tables.load(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("price_cents"))
        val day2 = base.filter(col("o_orderkey") % 97 =!= 0)
          .withColumn("price_cents", when(col("o_orderkey") % 89 === 0,
            col("price_cents") + 100L).otherwise(col("price_cents")))
          .unionByName(base.filter(col("o_orderkey") % 101 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + 1000000000L))
        graft.operators.Audit.snapshotDiff(base, day2, "o_orderkey",
          Seq("o_custkey", "o_orderstatus", "o_orderpriority", "price_cents"))
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
            o_orderpriority,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM orders),
        day2 AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
            CASE WHEN o_orderkey % 89 = 0 THEN price_cents + 100
              ELSE price_cents END AS price_cents
          FROM base WHERE o_orderkey % 97 <> 0
          UNION ALL
          SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
            o_orderpriority, price_cents
          FROM base WHERE o_orderkey % 101 = 0),
        fp_old AS (SELECT o_orderkey AS k, md5(concat_ws(chr(31),
            COALESCE(CAST(o_custkey AS VARCHAR), chr(0)),
            COALESCE(o_orderstatus, chr(0)),
            COALESCE(o_orderpriority, chr(0)),
            COALESCE(CAST(price_cents AS VARCHAR), chr(0)))) AS h FROM base),
        fp_new AS (SELECT o_orderkey AS k, md5(concat_ws(chr(31),
            COALESCE(CAST(o_custkey AS VARCHAR), chr(0)),
            COALESCE(o_orderstatus, chr(0)),
            COALESCE(o_orderpriority, chr(0)),
            COALESCE(CAST(price_cents AS VARCHAR), chr(0)))) AS h FROM day2),
        j AS (SELECT o.k AS ok, n.k AS nk, o.h AS oh, n.h AS nh
          FROM fp_old o FULL OUTER JOIN fp_new n ON o.k = n.k)
      SELECT CASE WHEN ok IS NULL THEN 'added'
          WHEN nk IS NULL THEN 'removed'
          WHEN oh <> nh THEN 'changed' ELSE 'unchanged' END AS change_type,
        COUNT(*) AS n_rows
      FROM j GROUP BY 1""")),

    GraftQuery(
      "q208_hot_key_salted_join",
      (s, dir) => {
        // detect-then-salt, end to end: a synthetic hot key (30% of the
        // fact stream collapses onto part 1) would hand one reduce
        // partition a third of the join at any scale; hotKeySaltedJoin
        // counts keys, finds the ones above threshold (a bounded driver
        // read), and spreads ONLY those — dim replication |hot|·saltN
        // rows, result row-identical to the plain join, which is exactly
        // what the plain-join oracle checks.
        val fact = Tables.load(s, dir, "lineitem")
          .withColumn("join_key",
            when(col("l_orderkey") % 10 < 3, 1L).otherwise(col("l_partkey")))
        val dim = Tables.load(s, dir, "part")
          .select(col("p_partkey").as("join_key"), col("p_brand"))
        graft.operators.SkewTools.hotKeySaltedJoin(
            fact, dim, "join_key", saltN = 8, hotThreshold = 1000L)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast(DecimalType(18, 2)))
              .cast("double").as("sum_qty"))
      },
      Some("""SELECT p_brand, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM (SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1
              ELSE l_partkey END AS join_key, l_quantity FROM lineitem) f
        JOIN (SELECT p_partkey AS join_key, p_brand FROM part) d
          USING (join_key)
        GROUP BY p_brand""")),

    GraftQuery(
      "q212_k_anonymity",
      (s, dir) => {
        // privacy release audit+fix: customers generalized over the
        // (segment, nation, overdrawn) quasi-identifier ladder with
        // bottom-up escalation — a combo with ≥ k=8 rows releases at
        // full detail; the survivors regroup one level coarser, so the
        // size of every RELEASED class (the generalized tuples an
        // attacker actually sees) reaches k, except the fully-suppressed
        // residue reported at the top. The oracle unrolls the |QI|=3
        // escalation steps over the same combo census.
        val c = Tables.load(s, dir, "customer").select(
          col("c_mktsegment"), col("c_nationkey"),
          (col("c_acctbal") < 0).as("overdrawn"))
        graft.operators.Audit.kAnonymize(c,
          Seq("c_mktsegment", "c_nationkey", "overdrawn"), k = 8)
      },
      Some("""WITH base AS (SELECT c_mktsegment AS seg,
            CAST(c_nationkey AS VARCHAR) AS nat,
            CAST(c_acctbal < 0 AS VARCHAR) AS od FROM customer),
        combos AS (SELECT seg, nat, od, COUNT(*) AS cnt
          FROM base GROUP BY 1, 2, 3),
        rel0 AS (SELECT seg, nat, od, 0 AS lev, cnt AS n
          FROM combos WHERE cnt >= 8),
        rem0 AS (SELECT seg, nat, od, cnt FROM combos WHERE cnt < 8),
        g1 AS (SELECT seg, nat, SUM(cnt) AS gn FROM rem0 GROUP BY 1, 2),
        rel1 AS (SELECT seg, nat, '*' AS od, 1 AS lev, gn AS n
          FROM g1 WHERE gn >= 8),
        rem1 AS (SELECT r.seg, r.nat, r.od, r.cnt FROM rem0 r
          JOIN g1 ON g1.seg = r.seg AND g1.nat = r.nat WHERE g1.gn < 8),
        g2 AS (SELECT seg, SUM(cnt) AS gn FROM rem1 GROUP BY 1),
        rel2 AS (SELECT seg, '*' AS nat, '*' AS od, 2 AS lev, gn AS n
          FROM g2 WHERE gn >= 8),
        rem2 AS (SELECT r.seg, r.nat, r.od, r.cnt FROM rem1 r
          JOIN g2 ON g2.seg = r.seg WHERE g2.gn < 8),
        res AS (SELECT '*' AS seg, '*' AS nat, '*' AS od, 3 AS lev,
            SUM(cnt) AS n
          FROM rem2 HAVING SUM(cnt) IS NOT NULL),
        allout AS (SELECT * FROM rel0 UNION ALL SELECT * FROM rel1
          UNION ALL SELECT * FROM rel2 UNION ALL SELECT * FROM res)
      SELECT seg AS c_mktsegment, nat AS c_nationkey, od AS overdrawn,
        CAST(lev AS INTEGER) AS suppression_level, CAST(n AS BIGINT) AS n_rows
      FROM allout""")),

    GraftQuery(
      "q214_l_diversity",
      (s, dir) => {
        // the homogeneity-attack audit on top of q212: a released class
        // can reach k members and still leak its sensitive attribute if
        // every member shares one value — per released class of the
        // (segment, nation) generalization, count DISTINCT balance
        // signs and flag classes below l=2. The oracle unrolls the same
        // escalation fixpoint and joins the per-(combo, sensitive)
        // counts to the combo levels.
        val c = Tables.load(s, dir, "customer").select(
          col("c_mktsegment"), col("c_nationkey"),
          when(col("c_acctbal") < 0, "neg").otherwise("pos")
            .as("balance_sign"))
        graft.operators.Audit.lDiversityAudit(c,
          Seq("c_mktsegment", "c_nationkey"), "balance_sign", k = 8, l = 2)
      },
      Some("""WITH base AS (SELECT c_mktsegment AS seg,
            CAST(c_nationkey AS VARCHAR) AS nat,
            CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sens
          FROM customer),
        combos AS (SELECT seg, nat, COUNT(*) AS cnt FROM base GROUP BY 1, 2),
        lev0 AS (SELECT seg, nat, 0 AS lev FROM combos WHERE cnt >= 8),
        rem0 AS (SELECT seg, nat, cnt FROM combos WHERE cnt < 8),
        g1 AS (SELECT seg, SUM(cnt) AS gn FROM rem0 GROUP BY 1),
        lev1 AS (SELECT r.seg, r.nat, 1 AS lev FROM rem0 r
          JOIN g1 ON g1.seg = r.seg WHERE g1.gn >= 8),
        rem1 AS (SELECT r.seg, r.nat, r.cnt FROM rem0 r
          JOIN g1 ON g1.seg = r.seg WHERE g1.gn < 8),
        lev2 AS (SELECT seg, nat, 2 AS lev FROM rem1),
        levels AS (SELECT * FROM lev0 UNION ALL SELECT * FROM lev1
          UNION ALL SELECT * FROM lev2),
        sc AS (SELECT seg, nat, sens, COUNT(*) AS c FROM base
          GROUP BY 1, 2, 3),
        d AS (SELECT
            CASE WHEN lev < 2 THEN s.seg ELSE '*' END AS c_mktsegment,
            CASE WHEN lev < 1 THEN s.nat ELSE '*' END AS c_nationkey,
            CAST(lev AS INTEGER) AS suppression_level, s.sens, s.c
          FROM sc s JOIN levels v ON v.seg = s.seg AND v.nat = s.nat)
      SELECT c_mktsegment, c_nationkey, suppression_level,
        CAST(SUM(c) AS BIGINT) AS n_rows,
        CAST(COUNT(DISTINCT sens) AS BIGINT) AS n_sensitive,
        COUNT(DISTINCT sens) >= 2 AS meets_l
      FROM d GROUP BY 1, 2, 3""")),

    GraftQuery(
      "q217_k_anonymize_apply",
      (s, dir) => {
        // the ROW-LEVEL release of q212's generalization: every customer
        // with its quasi-identifiers generalized to the class it releases
        // in (payload key carried through) — the table a publisher
        // actually ships. The oracle maps each combo to its escalation
        // level and joins the rows back.
        val c = Tables.load(s, dir, "customer").select(
          col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
          (col("c_acctbal") < 0).as("overdrawn"))
        graft.operators.Audit.kAnonymizeApply(c,
          Seq("c_mktsegment", "c_nationkey", "overdrawn"), k = 8,
          carryCols = Seq("c_custkey"))
      },
      Some("""WITH base AS (SELECT c_custkey AS ck, c_mktsegment AS seg,
            CAST(c_nationkey AS VARCHAR) AS nat,
            CAST(c_acctbal < 0 AS VARCHAR) AS od FROM customer),
        combos AS (SELECT seg, nat, od, COUNT(*) AS cnt
          FROM base GROUP BY 1, 2, 3),
        lev0 AS (SELECT seg, nat, od, 0 AS lev FROM combos WHERE cnt >= 8),
        rem0 AS (SELECT seg, nat, od, cnt FROM combos WHERE cnt < 8),
        g1 AS (SELECT seg, nat, SUM(cnt) AS gn FROM rem0 GROUP BY 1, 2),
        lev1 AS (SELECT r.seg, r.nat, r.od, 1 AS lev FROM rem0 r
          JOIN g1 ON g1.seg = r.seg AND g1.nat = r.nat WHERE g1.gn >= 8),
        rem1 AS (SELECT r.seg, r.nat, r.od, r.cnt FROM rem0 r
          JOIN g1 ON g1.seg = r.seg AND g1.nat = r.nat WHERE g1.gn < 8),
        g2 AS (SELECT seg, SUM(cnt) AS gn FROM rem1 GROUP BY 1),
        lev2 AS (SELECT r.seg, r.nat, r.od, 2 AS lev FROM rem1 r
          JOIN g2 ON g2.seg = r.seg WHERE g2.gn >= 8),
        rem2 AS (SELECT r.seg, r.nat, r.od FROM rem1 r
          JOIN g2 ON g2.seg = r.seg WHERE g2.gn < 8),
        lev3 AS (SELECT seg, nat, od, 3 AS lev FROM rem2),
        levels AS (SELECT * FROM lev0 UNION ALL SELECT * FROM lev1
          UNION ALL SELECT * FROM lev2 UNION ALL SELECT * FROM lev3)
      SELECT b.ck AS c_custkey,
        CASE WHEN lev < 3 THEN b.seg ELSE '*' END AS c_mktsegment,
        CASE WHEN lev < 2 THEN b.nat ELSE '*' END AS c_nationkey,
        CASE WHEN lev < 1 THEN b.od ELSE '*' END AS overdrawn,
        CAST(lev AS INTEGER) AS suppression_level
      FROM base b JOIN levels v
        ON v.seg = b.seg AND v.nat = b.nat AND v.od = b.od""")),

    GraftQuery(
      "q280_bootstrap_ci",
      (s, dir) => {
        // deterministic percentile-bootstrap 95% CI on the mean quantity
        // per return flag ([[graft.operators.Curation.bootstrapCi]]) —
        // error bars on a corpus statistic with zero RNG: every draw is
        // md5-indexed, so the resamples are identical on every engine
        // and replay. B=40 replicates of m=256 draws each; the interval
        // is the 2nd-smallest/2nd-largest replicate mean.
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"),
            (col("l_orderkey") * 10L + col("l_linenumber")).as("rid"),
            col("l_quantity"))
        graft.operators.Curation.bootstrapCi(
          li, "l_returnflag", "rid", "l_quantity", b = 40, m = 256)
      },
      Some(s"""WITH b AS (SELECT l_returnflag AS g,
              l_orderkey * 10 + l_linenumber AS rid,
              CAST(l_quantity AS BIGINT) AS v
            FROM lineitem),
          idx AS (SELECT g, v, CAST(ROW_NUMBER() OVER (PARTITION BY g
                ORDER BY rid, v) AS BIGINT) - 1 AS rn
            FROM b),
          sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
              CAST(SUM(v) AS BIGINT) AS s FROM b GROUP BY g),
          draws AS (SELECT g, ng,
              unnest(range(1, 41)) AS rb FROM sizes),
          draws2 AS (SELECT g, ng, rb,
              unnest(range(1, 257)) AS dj FROM draws),
          -- dj, NOT j: md5Key60Sql's internal hex-fold lambda binds j,
          -- which would SHADOW the draw index (every draw in a
          -- replicate hashed identically; caught by the sf0.01 gate)
          keyed AS (SELECT g, rb,
              ${CurationQueries.md5Key60Sql(
                "g || ':' || CAST(rb AS VARCHAR) || ':' || CAST(dj AS VARCHAR)")}
                % ng AS rn
            FROM draws2),
          reps AS (SELECT k.g, k.rb,
              (SUM(idx.v) * 1000000) // 256 AS mm
            FROM keyed k JOIN idx ON idx.g = k.g AND idx.rn = k.rn
            GROUP BY k.g, k.rb),
          ci AS (SELECT g,
              CAST(list_sort(list(mm))[2] AS BIGINT) AS lo_micro,
              CAST(list_sort(list(mm))[39] AS BIGINT) AS hi_micro
            FROM reps GROUP BY g)
        SELECT ci.g AS l_returnflag, sizes.ng AS n,
          CAST((sizes.s * 1000000) // sizes.ng AS BIGINT) AS mean_micro,
          lo_micro, hi_micro
        FROM ci JOIN sizes ON sizes.g = ci.g""")),

    GraftQuery(
      "q289_benford_audit",
      (s, dir) => graft.operators.Audit.benfordAudit(
        Tables.load(s, dir, "lineitem").select(
          floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long").as("cents")),
        "cents"),
      // the Benford reference shares are ONE driver-computed literal set
      // (Audit.benfordMicro) embedded in both plans — no cross-engine
      // log10; the leading digit comes from the integer's string head
      Some {
        val refs = graft.operators.Audit.benfordMicro
          .map { case (d, m) =>
            s"(CAST($d AS INTEGER), CAST($m AS BIGINT))" }
          .mkString(", ")
        s"""WITH b AS (SELECT CAST(FLOOR(l_extendedprice * 100.0E0
                + 0.5E0) AS BIGINT) AS v
              FROM lineitem),
            f AS (SELECT v FROM b WHERE v >= 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
            o AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1)
                AS INTEGER) AS digit, CAST(COUNT(*) AS BIGINT) AS n
              FROM f GROUP BY 1),
            ref(digit, benford_micro) AS (VALUES $refs)
          SELECT ref.digit, COALESCE(o.n, 0) AS n,
            (COALESCE(o.n, 0) * 1000000) // nn.n AS share_micro,
            ref.benford_micro,
            (COALESCE(o.n, 0) * 1000000) // nn.n - ref.benford_micro
              AS delta_micro
          FROM ref LEFT JOIN o USING (digit) CROSS JOIN nn"""
      }),

    GraftQuery(
      "q292_golden_record",
      (s, dir) => {
        // MDM survivorship merge ([[graft.operators.KeepLatest
        // .goldenRecord]]): sparse order "updates" (status masked on
        // every 3rd key, priority on every 2nd) fold into one golden row
        // per customer — each field independently from its latest
        // NON-NULL version, so a sparse update doesn't wipe the other
        // attributes the way plain keep-latest does.
        val u = Tables.load(s, dir, "orders").select(
          col("o_custkey"), col("o_orderdate").as("ts"),
          col("o_orderkey").as("k"),
          when(col("o_orderkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("status"),
          when(col("o_orderkey") % 2 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("prio"))
        graft.operators.KeepLatest.goldenRecord(u, "o_custkey",
          Seq(col("ts"), col("k")), Seq("status", "prio"))
      },
      Some("""WITH u AS (SELECT o_custkey, o_orderdate AS ts,
              o_orderkey AS k,
              CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_orderstatus END AS status,
              CASE WHEN o_orderkey % 2 = 0 THEN NULL
                ELSE o_orderpriority END AS prio
            FROM orders),
          f AS (SELECT o_custkey,
              last_value(status IGNORE NULLS) OVER w AS status,
              last_value(prio IGNORE NULLS) OVER w AS prio,
              ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY ts DESC, k DESC) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT)
                AS n_versions
            FROM u
            WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT o_custkey, status, prio, n_versions FROM f WHERE rn = 1"""))
  )
}
