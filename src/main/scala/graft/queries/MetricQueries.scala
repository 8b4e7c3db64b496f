package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.operators.{Curation, GameMetrics, HttpMetrics}

/** Protocol metric derivation over the driver testdata (SURVEY.md §2.8
  * F4-F7, §2.5 A2-A3). Lineitem columns are mapped onto the probe-report
  * field names, then the library transforms derive the same quantities the
  * reference computes per record.
  */
object MetricQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q14_http_page_metrics",
      (s, dir) => {
        // F4/F5: conn/text/first-screen/page costs + zero-safe speeds.
        // Pure per-row arithmetic — no shuffle at any scale.
        val li = Tables.load(s, dir, "lineitem")
        val mapped = li.select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("page_size"),
          (col("l_quantity") * 100.0).as("trans_body_cost"),
          (col("l_partkey") % 97).cast("double").as("dns_cost"),
          (col("l_suppkey") % 53).cast("double").as("tcp_cost"),
          (col("l_linenumber") * 3).cast("double").as("ssl_cost"),
          ((col("l_orderkey") % 11) * 50.0).as("element_load_cost"),
          (col("l_extendedprice") / 10.0).as("element_total_size"))
        HttpMetrics.deriveScalars(mapped, firstScreenFactor = 0.5)
          .select("l_orderkey", "l_linenumber", "conn_cost", "avg_speed",
            "text_cost", "first_screen_cost", "page_total_cost", "page_avg_speed")
      },
      Some("""SELECT l_orderkey, l_linenumber, conn_cost,
        CASE WHEN trans_body_cost = 0 THEN 0 ELSE (FLOOR((page_size / (trans_body_cost / 1000)) * 10000.0E0 + 0.5E0) / 10000.0E0) END AS avg_speed,
        conn_cost + trans_body_cost AS text_cost,
        (conn_cost + trans_body_cost) + element_load_cost * 0.5E0 AS first_screen_cost,
        (conn_cost + trans_body_cost) + element_load_cost AS page_total_cost,
        CASE WHEN ((conn_cost + trans_body_cost) + element_load_cost) = 0 THEN 0
          ELSE (FLOOR(((page_size + element_total_size) / (((conn_cost + trans_body_cost) + element_load_cost) / 1000)) * 10000.0E0 + 0.5E0) / 10000.0E0) END AS page_avg_speed
        FROM (SELECT l_orderkey, l_linenumber,
          l_extendedprice AS page_size,
          l_quantity * 100.0E0 AS trans_body_cost,
          CAST(l_partkey % 97 AS DOUBLE) + CAST(l_suppkey % 53 AS DOUBLE) + CAST(l_linenumber * 3 AS DOUBLE) AS conn_cost,
          (l_orderkey % 11) * 50.0E0 AS element_load_cost,
          l_extendedprice / 10.0E0 AS element_total_size
          FROM lineitem)"""),
      bench = true),

    GraftQuery(
      "q15_http_detail_agg",
      (s, dir) => {
        // A2/A3 at scale: the reference's per-record loop over the element
        // array becomes a two-level distributed aggregate — partial
        // map-side combine, one shuffle on the parent key, then a
        // broadcast-size per-thread max. DECIMAL sums keep the result
        // independent of partial-agg order.
        val li = Tables.load(s, dir, "lineitem")
        val elems = li.select(
          col("l_orderkey").as("parent_id"),
          (col("l_linenumber") % 4).as("thread_num"),
          when(col("l_returnflag") === "N", lit(0)).otherwise(lit(1)).as("element_status"),
          (col("l_quantity") * 10.0).cast(DecimalType(18, 4)).as("element_size"),
          // roundHalfUp BEFORE the decimal cast: double→decimal rounding of
          // an arbitrary double is engine-dependent at the half boundary.
          graft.functions.SafeMath.roundHalfUp(
              col("l_extendedprice") / 1000.0 + (col("l_partkey") % 50), 4)
            .cast(DecimalType(18, 4)).as("element_total_cost"))
        // Final output types pinned DOUBLE/BIGINT on both sides: DuckDB
        // SUM(BIGINT)→HUGEINT and SUM(DECIMAL)→DECIMAL(38,4) render
        // differently from Spark's LongType/DECIMAL(28,4) in the driver's
        // hash compare ("99111" vs "99111.0", "261.60" vs "261.6").
        // ONE full-data shuffle on the finer (parent, thread) key carrying
        // every partial aggregate, then a tiny per-parent combine (≤4 rows
        // per parent) — the previous separate per-parent and per-thread
        // groupBys each shuffled the whole element set. Counts and DECIMAL
        // sums re-aggregate exactly, so the cascade is value-identical.
        val perThread = elems.groupBy("parent_id", "thread_num").agg(
          count(lit(1)).as("n"),
          sum(when(col("element_status") === 0, 1L).otherwise(0L)).as("succ"),
          sum(when(col("element_status") =!= 0, 1L).otherwise(0L)).as("fail"),
          sum(col("element_size")).as("sz"),
          sum(col("element_total_cost")).as("thread_cost"))
        perThread.groupBy("parent_id").agg(
            sum(col("n")).as("elements_sum"),
            sum(col("succ")).as("elements_success_sum"),
            sum(col("fail")).as("elements_fail_sum"),
            sum(col("sz")).cast("double").as("element_total_size"),
            max(col("thread_cost")).cast("double").as("element_load_cost"))
          .withColumn("elements_success_rate",
            graft.functions.SafeMath.roundHalfUp(
              col("elements_success_sum").cast("double") / col("elements_sum") * 100, 4))
      },
      Some("""SELECT a.parent_id, a.elements_sum, a.elements_success_sum,
          a.elements_fail_sum, a.element_total_size, b.element_load_cost,
          (FLOOR((CAST(a.elements_success_sum AS DOUBLE) / a.elements_sum * 100) * 10000.0E0 + 0.5E0) / 10000.0E0) AS elements_success_rate
        FROM (
          SELECT l_orderkey AS parent_id, COUNT(*) AS elements_sum,
            CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS elements_success_sum,
            CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 0 ELSE 1 END) AS BIGINT) AS elements_fail_sum,
            CAST(SUM(CAST(l_quantity * 10.0E0 AS DECIMAL(18,4))) AS DOUBLE) AS element_total_size
          FROM lineitem GROUP BY 1) a
        JOIN (
          SELECT parent_id, CAST(MAX(thread_cost) AS DOUBLE) AS element_load_cost FROM (
            SELECT l_orderkey AS parent_id, l_linenumber % 4 AS thread_num,
              SUM(CAST((FLOOR((l_extendedprice / 1000.0E0 + (l_partkey % 50)) * 10000.0E0 + 0.5E0) / 10000.0E0) AS DECIMAL(18,4))) AS thread_cost
            FROM lineitem GROUP BY 1, 2) GROUP BY 1) b
        USING (parent_id)"""),
      bench = true),

    GraftQuery(
      "q55_detail_agg_hof",
      (s, dir) => {
        // A2/A3/F7 in the array-HOF form (the per-record shape the
        // reference computes inside its window loop): per-element derived
        // metrics and per-parent aggregates computed INSIDE the detail
        // array — no explode, no shuffle. Two elements per thread keep
        // the per-thread sums two-addend (addition is commutative, so the
        // oracle's SUM order can't perturb the double).
        val k = col("c_custkey")
        def el(i: Int) = struct(
          lit(s"e$i").as("element_name"),
          ((k + i) % 7).cast("long").as("element_num"),
          lit("u").as("element_url"),
          ((k + 3 * i) % 40).cast("double").as("dns_cost"),
          ((k + i) % 25).cast("double").as("tcp_cost"),
          (when(k % 4 === lit(i % 4), lit(null))
            .otherwise((k + i) % 9)).cast("double").as("ssl_cost"),
          (when(k % 31 === 0, lit(0)).otherwise((k + 11 * i) % 500))
            .cast("double").as("element_download_cost"),
          ((k + i) % 60).cast("double").as("first_byte_cost"),
          lit(i % 2).cast("long").as("thread_num"),
          ((k + i) % 3).cast("long").as("element_status"),
          (((k + i) % 200) * 5).cast("double").as("element_size"),
          lit("200").as("element_http_code"),
          lit("0").as("is_localnet"),
          lit("5.5.5.5").as("host_ip"))
        val df = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("pk"),
            array(el(0), el(1), el(2), el(3)).as("detail"))
        HttpMetrics.deriveDetailAgg(df)
          .select(col("pk"), col("elements_sum"), col("elements_success_sum"),
            col("elements_fail_sum"), col("element_total_size"),
            col("elements_success_rate"), col("element_load_cost"),
            element_at(col("detail"), 1).getField("conn_cost").as("e0_conn_cost"),
            element_at(col("detail"), 2).getField("element_total_cost").as("e1_total_cost"),
            element_at(col("detail"), 3).getField("avg_speed").as("e2_avg_speed"))
      },
      Some {
        val avgSpeedSql = graft.functions.SafeMath.roundHalfUpSql(
          "(element_size) / ((element_download_cost) / 1000)", 4)
        val elSelects = Seq(0, 1, 2, 3).map { i =>
          s"""SELECT k, $i AS i,
            CAST((k + ${3 * i}) % 40 AS DOUBLE) AS dns_cost,
            CAST((k + $i) % 25 AS DOUBLE) AS tcp_cost,
            CASE WHEN k % 4 = ${i % 4} THEN NULL
              ELSE CAST((k + $i) % 9 AS DOUBLE) END AS ssl_cost,
            CAST(CASE WHEN k % 31 = 0 THEN 0
              ELSE (k + ${11 * i}) % 500 END AS DOUBLE) AS element_download_cost,
            CAST(${i % 2} AS BIGINT) AS thread_num,
            CAST((k + $i) % 3 AS BIGINT) AS element_status,
            CAST(((k + $i) % 200) * 5 AS DOUBLE) AS element_size
          FROM base"""
        }.mkString(" UNION ALL ")
        s"""WITH base AS (SELECT c_custkey AS k FROM customer),
          els0 AS ($elSelects),
          els AS (
            SELECT e.*,
              COALESCE(dns_cost, 0) + COALESCE(tcp_cost, 0) + COALESCE(ssl_cost, 0) AS conn_cost,
              COALESCE(dns_cost, 0) + COALESCE(tcp_cost, 0) + COALESCE(ssl_cost, 0)
                + COALESCE(element_download_cost, 0) AS element_total_cost,
              CASE WHEN (element_download_cost / 1000) = 0 OR element_download_cost IS NULL
                THEN 0.0E0 ELSE $avgSpeedSql END AS avg_speed
            FROM els0 e),
          threads AS (
            SELECT k, thread_num, SUM(element_total_cost) AS thread_cost
            FROM els GROUP BY k, thread_num),
          agg AS (
            SELECT e.k,
              CAST(COUNT(*) AS INTEGER) AS elements_sum,
              CAST(SUM(CASE WHEN element_status = 0 THEN 1 ELSE 0 END) AS INTEGER) AS elements_success_sum,
              SUM(COALESCE(element_size, 0)) AS element_total_size
            FROM els e GROUP BY e.k),
          mx AS (SELECT k, MAX(thread_cost) AS element_load_cost FROM threads GROUP BY k)
          SELECT b.k AS pk, a.elements_sum, a.elements_success_sum,
            CAST(a.elements_sum - a.elements_success_sum AS INTEGER) AS elements_fail_sum,
            CAST(a.element_total_size AS DOUBLE) AS element_total_size,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "CAST(a.elements_success_sum AS DOUBLE) / a.elements_sum * 100", 4)} AS elements_success_rate,
            CAST(mx.element_load_cost AS DOUBLE) AS element_load_cost,
            (SELECT conn_cost FROM els WHERE els.k = b.k AND i = 0) AS e0_conn_cost,
            (SELECT element_total_cost FROM els WHERE els.k = b.k AND i = 1) AS e1_total_cost,
            (SELECT avg_speed FROM els WHERE els.k = b.k AND i = 2) AS e2_avg_speed
          FROM base b
          JOIN agg a ON a.k = b.k
          JOIN mx ON mx.k = b.k"""
      }),

    GraftQuery(
      "q16_game_metrics",
      (s, dir) => {
        // F6: GAME conn_cost falls back to the probe-reported value when
        // dns/tcp/ssl are all zero; avg_speed computed when unreported.
        val li = Tables.load(s, dir, "lineitem")
        val mapped = li.select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("page_size"),
          (col("l_quantity") * 50.0).as("trans_body_cost"),
          (col("l_partkey") % 5).cast("double").as("dns_cost"),
          (col("l_suppkey") % 3).cast("double").as("tcp_cost"),
          (col("l_linenumber") % 2).cast("double").as("ssl_cost"),
          ((col("l_orderkey") % 4) * 25.0).as("avg_speed"),
          (col("l_tax") * 1000.0).as("conn_cost"))
        GameMetrics.derive(mapped)
          .select("l_orderkey", "l_linenumber", "conn_cost", "avg_speed")
      },
      Some("""SELECT l_orderkey, l_linenumber,
        CASE WHEN dns_cost = 0 AND tcp_cost = 0 AND ssl_cost = 0 THEN conn_cost0
          ELSE dns_cost + tcp_cost + ssl_cost END AS conn_cost,
        CASE WHEN avg_speed0 = 0 THEN
            (CASE WHEN trans_body_cost = 0 THEN 0 ELSE (FLOOR((page_size / (trans_body_cost / 1000)) * 10000.0E0 + 0.5E0) / 10000.0E0) END)
          ELSE avg_speed0 END AS avg_speed
        FROM (SELECT l_orderkey, l_linenumber,
          l_extendedprice AS page_size,
          l_quantity * 50.0E0 AS trans_body_cost,
          CAST(l_partkey % 5 AS DOUBLE) AS dns_cost,
          CAST(l_suppkey % 3 AS DOUBLE) AS tcp_cost,
          CAST(l_linenumber % 2 AS DOUBLE) AS ssl_cost,
          (l_orderkey % 4) * 25.0E0 AS avg_speed0,
          l_tax * 1000.0E0 AS conn_cost0
          FROM lineitem)""")),

    GraftQuery(
      "q84_zscore_outliers",
      (s, dir) => Curation.zscoreFlag(
          Tables.events(s, dir).select("event_id", "event_type", "value"),
          "event_type", "value")
        .select("event_id", "event_type", "value", "z", "is_outlier"),
      Some {
        def rhu(x: String, sc: Int) =
          graft.functions.SafeMath.roundHalfUpSql(x, sc)
        s"""WITH e AS (SELECT event_id, event_type,
              CAST(value AS DOUBLE) AS v FROM events),
          st AS (SELECT event_type,
              CAST(SUM(CAST(${rhu("v", 8)} AS DECIMAL(38,8))) AS DOUBLE)
                / COUNT(*) AS m,
              COUNT(*) AS n
            FROM e GROUP BY event_type),
          sq AS (SELECT e.event_type,
              CAST(SUM(CAST(${rhu("(e.v - st.m) * (e.v - st.m)", 8)}
                AS DECIMAL(38,8))) AS DOUBLE) AS ssq
            FROM e JOIN st USING (event_type) GROUP BY e.event_type),
          f AS (SELECT e.event_id, e.event_type, e.v, st.m,
              sqrt(sq.ssq / st.n) AS sd
            FROM e JOIN st USING (event_type) JOIN sq USING (event_type)),
          z AS (SELECT event_id, event_type, v,
              CASE WHEN sd = 0.0E0 THEN 0.0E0
                ELSE ${rhu("(v - m) / sd", 6)} END AS z
            FROM f)
        SELECT event_id, event_type, v AS value, z,
          (abs(z) > 3.0E0) AS is_outlier
        FROM z"""
      }),

    GraftQuery(
      "q110_mad_outliers",
      (s, dir) => Curation.madFlag(
          Tables.events(s, dir).select("event_id", "event_type", "value"),
          "event_type", "value")
        .select("event_id", "event_type", "value", "robust_z", "is_outlier"),
      Some {
        def rhu(x: String, sc: Int) =
          graft.functions.SafeMath.roundHalfUpSql(x, sc)
        s"""WITH e AS (SELECT event_id, event_type,
              CAST(value AS DOUBLE) AS v FROM events),
          med AS (SELECT event_type, quantile_cont(v, 0.5) AS m
            FROM e GROUP BY event_type),
          mad AS (SELECT e.event_type,
              quantile_cont(abs(e.v - med.m), 0.5) AS d
            FROM e JOIN med USING (event_type) GROUP BY e.event_type),
          z AS (SELECT e.event_id, e.event_type, e.v,
              CASE WHEN mad.d = 0.0E0 THEN 0.0E0
                ELSE ${rhu("abs(e.v - med.m) / (1.4826E0 * mad.d)", 6)}
              END AS robust_z
            FROM e JOIN med USING (event_type) JOIN mad USING (event_type))
        SELECT event_id, event_type, v AS value, robust_z,
          (robust_z > 3.0E0) AS is_outlier
        FROM z"""
      }),

    GraftQuery(
      "q180_ab_test",
      (s, dir) => {
        // experiment analysis: users hash-assigned to two variants (the
        // q75 split discipline — replay-stable, no RNG), conversion =
        // "did a purchase event", and the two-proportion z-test on the
        // conversion rates. Everything reduces to ONE aggregation over
        // users; the z statistic is IEEE arithmetic over exact longs
        // (sqrt is correctly rounded per IEEE 754) so even the test
        // statistic hash-gates without rounding discipline — provided
        // both engines mirror the expression tree exactly.
        val ev = Tables.events(s, dir)
        val visits = ev
          .select(col("user_id"),
            unix_timestamp(date_trunc("day", col("ts"))).as("day"),
            col("event_type"))
          .groupBy(col("user_id"), col("day"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("converted"))
          .withColumn("variant",
            graft.functions.TextFunctions.md5Key60(
              concat(lit("graft-ab"), col("user_id").cast("string"),
                lit(":"), col("day").cast("string"))) % 2L)
        val agg = visits.groupBy(col("variant"))
          .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
        val a = agg.filter(col("variant") === 0)
          .select(col("n").as("n_a"), col("conv").as("conv_a"))
        val b = agg.filter(col("variant") === 1)
          .select(col("n").as("n_b"), col("conv").as("conv_b"))
        val pA = col("conv_a").cast("double") / col("n_a")
        val pB = col("conv_b").cast("double") / col("n_b")
        val pPool = (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b"))
        val degenerate = (col("conv_a") + col("conv_b")) === 0 ||
          (col("conv_a") + col("conv_b")) === (col("n_a") + col("n_b"))
        a.crossJoin(b) // 1×1 rows: the two variant summaries
          .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
            pA.as("p_a"), pB.as("p_b"),
            // all-converted / none-converted corpora have zero pooled
            // variance: the test is undefined (NULL), not an error
            when(degenerate, lit(null).cast("double"))
              .otherwise((pA - pB) / sqrt(pPool * (lit(1.0) - pPool) *
                (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
              .as("z"))
      },
      Some(s"""WITH u AS (SELECT user_id,
            CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS converted,
            ${CurationQueries.md5Key60Sql(
              "'graft-ab' || CAST(user_id AS VARCHAR) || ':' || " +
              "CAST(CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS VARCHAR)"
            )} % 2 AS variant
          FROM events GROUP BY 1, 2, 4),
        v AS (SELECT variant, COUNT(*) AS n,
            CAST(SUM(converted) AS BIGINT) AS conv
          FROM u GROUP BY 1),
        a AS (SELECT n AS n_a, conv AS conv_a FROM v WHERE variant = 0),
        b AS (SELECT n AS n_b, conv AS conv_b FROM v WHERE variant = 1)
        SELECT n_a, conv_a, n_b, conv_b,
          CAST(conv_a AS DOUBLE) / n_a AS p_a,
          CAST(conv_b AS DOUBLE) / n_b AS p_b,
          CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN NULL
            ELSE (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
              sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
                (1.0E0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
                (1.0E0 / n_a + 1.0E0 / n_b)) END AS z
        FROM a, b""")),

    GraftQuery(
      "q187_trimmed_mean",
      (s, dir) => {
        // robust per-group central tendency: the 5–95% trimmed mean of
        // event values — the metric ops dashboards use when raw means
        // are spike-dragged. Per-group percentile cutoffs (one grouped
        // aggregate, groups×2 doubles) broadcast back into a zero-sort
        // filter; the trimmed mean itself is a DECIMAL sum / count.
        // Cutoffs are roundHalfUp'd on both engines before the BETWEEN
        // (the half-boundary discipline), the mean rounded at scale 6.
        import graft.functions.SafeMath
        import org.apache.spark.sql.types.DecimalType
        val ev = Tables.events(s, dir).select(col("event_type"),
          col("value").as("v"))
        val cuts = ev.groupBy("event_type").agg(
          SafeMath.roundHalfUp(percentile(col("v"), lit(0.05)), 6).as("lo"),
          SafeMath.roundHalfUp(percentile(col("v"), lit(0.95)), 6).as("hi"))
        ev.join(broadcast(cuts), Seq("event_type"))
          .filter(col("v") >= col("lo") && col("v") <= col("hi"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"),
            SafeMath.roundHalfUp(
              sum(col("v").cast(DecimalType(18, 2))).cast("double") /
                count(lit(1)).cast("double"), 6).as("trimmed_mean"))
      },
      Some(s"""WITH cuts AS (SELECT event_type,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "quantile_cont(value, 0.05)", 6)} AS lo,
            ${graft.functions.SafeMath.roundHalfUpSql(
              "quantile_cont(value, 0.95)", 6)} AS hi
          FROM events GROUP BY 1)
        SELECT e.event_type, COUNT(*) AS n_kept,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) / " +
              "CAST(COUNT(*) AS DOUBLE)", 6)} AS trimmed_mean
        FROM events e JOIN cuts c ON c.event_type = e.event_type
        WHERE e.value >= c.lo AND e.value <= c.hi
        GROUP BY 1""")),

    GraftQuery(
      "q191_fulfillment_latency",
      (s, dir) => {
        // cross-table latency distribution: order date → line ship date
        // in whole days, summarized per order priority (count, mean,
        // p50/p90) — the SLA report shape. The join ships only two
        // columns of each table; day deltas are exact integers, the mean
        // a DECIMAL sum / count, percentiles rounded on both engines.
        import graft.functions.SafeMath
        import org.apache.spark.sql.types.DecimalType
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            unix_timestamp(date_trunc("day", col("o_orderdate"))).as("od"))
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"),
            unix_timestamp(date_trunc("day", col("l_shipdate"))).as("sd"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            ((col("sd") - col("od")) / 86400L).cast("long").as("lat_days"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            SafeMath.roundHalfUp(
              sum(col("lat_days").cast(DecimalType(18, 0))).cast("double") /
                count(lit(1)).cast("double"), 6).as("mean_days"),
            SafeMath.roundHalfUp(
              percentile(col("lat_days"), lit(0.5)), 6).as("p50_days"),
            SafeMath.roundHalfUp(
              percentile(col("lat_days"), lit(0.9)), 6).as("p90_days"))
      },
      Some(s"""WITH d AS (SELECT o_orderpriority,
            (CAST(epoch(date_trunc('day', l_shipdate)) AS BIGINT)
              - CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT))
              // 86400 AS lat_days
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT o_orderpriority, COUNT(*) AS n,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "CAST(SUM(CAST(lat_days AS DECIMAL(18,0))) AS DOUBLE) / " +
              "CAST(COUNT(*) AS DOUBLE)", 6)} AS mean_days,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "quantile_cont(lat_days, 0.5)", 6)} AS p50_days,
          ${graft.functions.SafeMath.roundHalfUpSql(
            "quantile_cont(lat_days, 0.9)", 6)} AS p90_days
        FROM d GROUP BY 1""")),

    GraftQuery(
      "q192_series_correlation",
      (s, dir) => {
        // do views drive purchases? Pearson correlation between the two
        // daily count series, computed from exact INTEGER sufficient
        // statistics (the q141 OLS discipline): counts are longs, all
        // five sums exact, FP only in the final expression — so even r
        // hash-gates without rounding games. One aggregation over days.
        val ev = Tables.events(s, dir)
          .select(unix_timestamp(date_trunc("day", col("ts"))).as("day"),
            col("event_type"))
          .groupBy("day")
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
        val st = ev.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        val num = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double")
        val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
        st.select(col("n").as("n_days"),
          when(den === 0.0, lit(null).cast("double"))
            .otherwise(num / den).as("r"))
      },
      Some("""WITH d AS (SELECT
            CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
          FROM events GROUP BY 1),
        st AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
            SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM d)
        SELECT n AS n_days,
          CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
              CAST(n * syy - sy * sy AS DOUBLE)) = 0.0E0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
              sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                CAST(n * syy - sy * sy AS DOUBLE)) END AS r
        FROM st"""))
  )
}
