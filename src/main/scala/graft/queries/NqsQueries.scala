package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.SafeMath
import graft.operators.SetDiff

/** Stream-shape operators gated in batch form: timestamp clamp, union of
  * routed branches, CDC set diff, null-defaulting, rollup
  * (SURVEY.md §2.3 P9-P10, §2.7, §2.4 J8).
  */
object NqsQueries {

  /** Fixed "now" so the clamp is replay-deterministic (the reference uses
    * wall-clock; tests would never converge). */
  private val NowLit = "2024-01-20 00:00:00"

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q17_ts_clamp",
      (s, dir) => {
        // P9: stale/garbled timestamps repaired to "now", never dropped.
        val ev = Tables.events(s, dir)
        val now = to_timestamp(lit(NowLit))
        ev.select(col("event_id"),
          unix_timestamp(SafeMath.clampTimestamp(col("ts"), now)).as("ts_fixed"))
      },
      Some(s"""SELECT event_id,
        CASE WHEN ABS(CAST(epoch(TIMESTAMP '$NowLit') AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT)) > 108000
          THEN CAST(epoch(TIMESTAMP '$NowLit') AS BIGINT)
          ELSE CAST(floor(epoch(ts)) AS BIGINT) END AS ts_fixed
        FROM events""")),

    GraftQuery(
      "q18_union_branches",
      (s, dir) => {
        // §2.7: register/heartbeat branches re-unioned into one sink table.
        val ev = Tables.events(s, dir)
        val a = ev.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), lit("register").as("kind"))
        val b = ev.filter(col("event_type") =!= "signup")
          .select(col("event_id"), col("user_id"), lit("heartbeat").as("kind"))
        a.unionByName(b)
      },
      Some("""SELECT event_id, user_id, 'register' AS kind FROM events WHERE event_type = 'signup'
        UNION ALL
        SELECT event_id, user_id, 'heartbeat' AS kind FROM events WHERE event_type <> 'signup'""")),

    GraftQuery(
      "q19_cdc_set_diff",
      (s, dir) => {
        // J8: stored set vs reported set → insert/update/delete actions.
        val ev = Tables.events(s, dir)
        val current = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(count(lit(1)).as("n_current"))
        val report = ev.filter(col("event_type") === "login" || col("event_type") === "click")
          .groupBy("user_id").agg(count(lit(1)).as("n_report"))
        SetDiff(current, report, Seq("user_id"))
      },
      Some("""SELECT COALESCE(c.user_id, r.user_id) AS user_id, c.n_current, r.n_report,
        CASE WHEN c.user_id IS NULL THEN 'insert'
             WHEN r.user_id IS NULL THEN 'delete'
             ELSE 'update' END AS action
        FROM (SELECT user_id, COUNT(*) AS n_current FROM events WHERE event_type = 'signup' GROUP BY 1) c
        FULL OUTER JOIN (SELECT user_id, COUNT(*) AS n_report FROM events WHERE event_type IN ('login','click') GROUP BY 1) r
        ON c.user_id = r.user_id""")),

    GraftQuery(
      "q20_null_defaults",
      (s, dir) => {
        // P10: sink-side null coercion after an outer join.
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(col("c_custkey"),
            SafeMath.defStr(col("o_orderstatus")).as("status"),
            SafeMath.defDouble(col("o_totalprice")).as("amount"),
            SafeMath.defNum(col("o_orderkey")).as("order_key"))
      },
      Some("""SELECT c_custkey, COALESCE(o_orderstatus, '') AS status,
        COALESCE(o_totalprice, 0) AS amount, COALESCE(o_orderkey, 0) AS order_key
        FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        ON c_custkey = o_custkey""")),

    GraftQuery(
      "q45_cube",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            // DOUBLE pin: r01 passed only because every price sum happened
            // to have nonzero cents — a trailing-zero sum flips the hash.
            sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""")),

    GraftQuery(
      "q46_pivot",
      (s, dir) => {
        // wide-format rollup: one column per event type (the BI-facing
        // shape downstream ClickHouse consumers build by hand).
        val ev = Tables.events(s, dir)
        ev.groupBy("user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
      },
      Some("""SELECT user_id,
        COUNT(*) FILTER (event_type = 'click') AS click,
        COUNT(*) FILTER (event_type = 'view') AS view,
        COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        COUNT(*) FILTER (event_type = 'signup') AS signup,
        COUNT(*) FILTER (event_type = 'error') AS error
        FROM events GROUP BY user_id""")),

    GraftQuery(
      "q21_rollup",
      (s, dir) => {
        // §2.5: multi-level aggregation the reference delegates to
        // ClickHouse; Spark computes all grouping sets in one pass.
        val li = Tables.load(s, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            // final DOUBLE pin on both sides — DECIMAL renderings differ
            // in the driver's hash compare (q01 comment).
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    GraftQuery(
      "q170_grouping_sets",
      (s, dir) => {
        // §2.5 completes the multi-level-agg family: rollup (q21) and
        // cube (q45) are fixed lattices; GROUPING SETS is the general
        // form — here the two marginals + grand total WITHOUT the
        // (flag, status) cross cells a cube would add. grouping_id
        // disambiguates a synthesized NULL from a data NULL (both
        // engines emit the same MSB-first bitmask). One pass, one
        // shuffle — Spark expands sets map-side, same as rollup.
        val li = Tables.load(s, dir, "lineitem")
        li.groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast(DecimalType(18, 2)))
              .cast("double").as("sum_qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    GraftQuery(
      "q171_unpivot",
      (s, dir) => {
        // wide→long reshape (the inverse of q46's pivot): the four
        // lineitem measures melted to (measure, value) rows. Spark's
        // native unpivot is a zero-shuffle narrow map — the Expand
        // operator emits 4 rows per input row with no exchange; at
        // 100 TB this is scan-bound, exactly as cheap as the scan.
        val li = Tables.load(s, dir, "lineitem")
        li.unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
      },
      Some("""SELECT l_orderkey, l_linenumber, m AS measure, v AS value
        FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS m, l_quantity AS v FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)""")),

    GraftQuery(
      "q175_time_rollup",
      (s, dir) => {
        // the multi-granularity materialization the reference delegates
        // to four separate ClickHouse GROUP BYs over its _h/_d/_w/_m
        // bucket columns (SURVEY §2.8 F3) — here ALL four granularities
        // aggregate in ONE scan via GROUPING SETS: Expand emits 4 rows
        // per input (one per set), partial agg collapses them map-side,
        // one shuffle total. grouping_id → granularity label; the
        // surviving bucket column is coalesced into one output key.
        import graft.functions.TimeBuckets
        val ev = TimeBuckets.withBuckets(
          Tables.events(s, dir).select(col("ts"), col("value")), "ts", "ts")
        val gran = {
          // gid bitmask (MSB = ts_h): hour set → 0b0111, day → 0b1011,
          // week → 0b1101, month → 0b1110 on both engines
          val g = grouping_id()
          when(g === 7, "hour").when(g === 11, "day")
            .when(g === 13, "week").otherwise("month")
        }
        ev.groupingSets(
            Seq(Seq(col("ts_h")), Seq(col("ts_d")),
              Seq(col("ts_w")), Seq(col("ts_m"))),
            col("ts_h"), col("ts_d"), col("ts_w"), col("ts_m"))
          .agg(gran.as("gran"),
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2)))
              .cast("double").as("sum_value"))
          .select(
            coalesce(col("ts_h"), col("ts_d"), col("ts_w"), col("ts_m"))
              .as("bucket"),
            col("gran"), col("n"), col("sum_value"))
      },
      Some("""WITH b AS (SELECT value,
            CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ts_h,
            CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS ts_d,
            CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS ts_w,
            CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS ts_m
          FROM events)
        SELECT coalesce(ts_h, ts_d, ts_w, ts_m) AS bucket,
          CASE GROUPING(ts_h, ts_d, ts_w, ts_m)
            WHEN 7 THEN 'hour' WHEN 11 THEN 'day'
            WHEN 13 THEN 'week' ELSE 'month' END AS gran,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM b
        GROUP BY GROUPING SETS ((ts_h), (ts_d), (ts_w), (ts_m))"""))
  )
}
