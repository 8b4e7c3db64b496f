package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.IpGeo

/** IP → region range-lookup gate (reference `IPHelper.java:35-67,113-221`).
  *
  * The driver testdata carries no IP range db, so both sides derive the
  * SAME deterministic inputs: probe IPs hashed from `customer.c_custkey`
  * (with sentinel rows exercising the invalid / inner-IP paths) and a
  * half-covering range table generated from a sequence (gaps exercise the
  * miss→defaults path, blank attrs the 其他 defaults, and province-level
  * municipality codes the 京/津/沪/渝 fix-up). The Spark side runs the
  * real bucketed-broadcast-join operator; DuckDB mirrors with BETWEEN.
  */
object GeoQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q48_ip_geo_range",
      (s, dir) => {
        val ipInt = (col("c_custkey") * 2654435761L) % 4294967296L
        val ips = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("id"),
          when(col("c_custkey") % 97 === 0, lit("10.1.2.3"))
            .when(col("c_custkey") % 89 === 0, lit("999.1.2.3"))
            .when(col("c_custkey") % 83 === 0, lit("127.0.0.1"))
            .otherwise(concat_ws(".",
              shiftright(ipInt, 24).bitwiseAND(255),
              shiftright(ipInt, 16).bitwiseAND(255),
              shiftright(ipInt, 8).bitwiseAND(255),
              ipInt.bitwiseAND(255))).as("ip"))
        val ranges = s.range(0, 4096).filter(col("id") % 2 === 0)
          .select(
            (col("id") * 1048576L).as("range_start"),
            ((col("id") + 1) * 1048576L - 1).as("range_end"),
            when(col("id") % 31 === 0, lit("中国"))
              .when(col("id") % 29 === 0, lit(""))
              .otherwise(concat(lit("省"), col("id") % 34)).as("province_name"),
            when(col("id") % 7 === 0, lit(""))
              .otherwise(concat(lit("市"), col("id") % 97)).as("city_name"),
            when(col("id") % 3 === 0, lit(""))
              .otherwise(concat(lit("区"), col("id") % 53)).as("district_name"),
            when(col("id") % 11 === 0, lit(""))
              .otherwise(concat(lit("ISP"), col("id") % 4)).as("operator"),
            when(col("id") % 13 === 0, lit("110000"))
              .when(col("id") % 13 === 1, lit("120000"))
              .when(col("id") % 13 === 2, lit("310000"))
              .when(col("id") % 13 === 3, lit("500000"))
              .when(col("id") % 17 === 0, lit(""))
              .otherwise((col("id") % 1000 + 140000).cast("string")).as("code"))
        IpGeo.withGeo(ips, "ip", ranges)
          .select("id", "ip", "province_name", "city_name", "district_name",
            "operator", "region_code")
      },
      Some("""WITH ips AS (
          SELECT c_custkey AS id,
            CASE WHEN c_custkey % 97 = 0 THEN '10.1.2.3'
                 WHEN c_custkey % 89 = 0 THEN '999.1.2.3'
                 WHEN c_custkey % 83 = 0 THEN '127.0.0.1'
                 ELSE concat_ws('.',
                   ((c_custkey * 2654435761) % 4294967296) >> 24 & 255,
                   ((c_custkey * 2654435761) % 4294967296) >> 16 & 255,
                   ((c_custkey * 2654435761) % 4294967296) >> 8 & 255,
                   ((c_custkey * 2654435761) % 4294967296) & 255)
            END AS ip
          FROM customer),
        rngs AS (
          SELECT i * 1048576 AS range_start, (i + 1) * 1048576 - 1 AS range_end,
            CASE WHEN i % 31 = 0 THEN '中国'
                 WHEN i % 29 = 0 THEN ''
                 ELSE concat('省', i % 34) END AS province_name,
            CASE WHEN i % 7 = 0 THEN '' ELSE concat('市', i % 97) END AS city_name,
            CASE WHEN i % 3 = 0 THEN '' ELSE concat('区', i % 53) END AS district_name,
            CASE WHEN i % 11 = 0 THEN '' ELSE concat('ISP', i % 4) END AS operator,
            CASE WHEN i % 13 = 0 THEN '110000'
                 WHEN i % 13 = 1 THEN '120000'
                 WHEN i % 13 = 2 THEN '310000'
                 WHEN i % 13 = 3 THEN '500000'
                 WHEN i % 17 = 0 THEN ''
                 ELSE CAST(i % 1000 + 140000 AS VARCHAR) END AS code
          FROM (SELECT unnest(range(0, 4096)) AS i) WHERE i % 2 = 0),
        probe AS (
          SELECT id, ip,
            regexp_full_match(ip, '(\d{1,3}\.){3}\d{1,3}')
              AND list_max(list_transform(string_split(ip, '.'),
                x -> CAST(x AS INTEGER))) <= 255 AS valid,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(ip, '.'), x -> CAST(x AS BIGINT))),
              (a, x) -> a * 256 + x) AS raw_int
          FROM ips),
        typed AS (
          SELECT id, ip, valid,
            valid AND ((raw_int BETWEEN 167772160 AND 184549375)
              OR (raw_int BETWEEN 2886729728 AND 2887778303)
              OR (raw_int BETWEEN 3232235520 AND 3232301055)
              OR raw_int = 2130706433) AS inner_ip,
            CASE WHEN valid THEN raw_int ELSE NULL END AS ip_int
          FROM probe),
        joined AS (
          SELECT t.*, r.province_name AS r_prov, r.city_name AS r_city,
            r.district_name AS r_dist, r.operator AS r_op, r.code AS r_code
          FROM typed t LEFT JOIN rngs r
            ON t.ip_int BETWEEN r.range_start AND r.range_end)
        SELECT id, ip,
          CASE WHEN inner_ip THEN '局域网'
               WHEN NOT valid OR r_prov IS NULL OR trim(r_prov) = ''
                 OR r_prov = 'null' OR r_prov = '其他' OR r_prov = '中国'
                 THEN '其他'
               ELSE r_prov END AS province_name,
          CASE WHEN NOT valid OR inner_ip OR r_city IS NULL
                 OR trim(r_city) = '' OR r_city = 'null' OR r_city = '其他'
                 THEN '其他'
               ELSE r_city END AS city_name,
          CASE WHEN NOT valid OR inner_ip OR r_dist IS NULL
                 OR trim(r_dist) = '' OR r_dist = 'null' OR r_dist = '其他'
                 THEN '其他'
               ELSE r_dist END AS district_name,
          CASE WHEN NOT valid OR inner_ip OR r_op IS NULL
                 OR trim(r_op) = '' OR r_op = 'null' OR r_op = '其他'
                 THEN '其他'
               ELSE r_op END AS operator,
          CASE WHEN NOT valid OR inner_ip OR r_code IS NULL
                 OR trim(r_code) = '' OR r_code = 'null' OR r_code = '其他'
                 THEN '000000'
               WHEN r_dist IS NULL OR trim(r_dist) = '' OR r_dist = 'null'
                 OR r_dist = '其他' THEN
                 CASE r_code WHEN '110000' THEN '110100'
                             WHEN '120000' THEN '120100'
                             WHEN '310000' THEN '310100'
                             WHEN '500000' THEN '500100'
                             ELSE r_code END
               ELSE r_code END AS region_code
        FROM joined"""),
      bench = true),

    GraftQuery(
      "q268_grid_nearest",
      (s, dir) => {
        // nearest-site assignment via the 3×3 grid-cell equi-join
        // ([[graft.operators.Spatial.nearestWithin]]): deterministic
        // integer micro-degree coordinates hashed from the driver keys
        // (the q48 convention — no geo columns in the testdata), site
        // density ~1/37 of suppliers so the no-site-in-radius branch
        // fires alongside matches. All-integer squared distances: zero
        // FP discipline needed, the oracle mirrors the same cells and
        // must agree bit-for-bit.
        val points = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("id"),
          ((col("c_custkey") * 48271L) % 100000000L).as("px"),
          ((col("c_custkey") * 16807L) % 100000000L).as("py"))
        val sites = Tables.load(s, dir, "supplier")
          .filter(col("s_suppkey") % 37 === 0)
          .select(col("s_suppkey").as("st"),
            ((col("s_suppkey") * 69621L) % 100000000L).as("sx"),
            ((col("s_suppkey") * 40503L) % 100000000L).as("sy"))
        graft.operators.Spatial.nearestWithin(points, "id", "px", "py",
          sites, "st", "sx", "sy", radius = 20000000L)
      },
      Some("""WITH p AS (SELECT c_custkey AS id,
              CAST((c_custkey * 48271) % 100000000 AS BIGINT) AS px,
              CAST((c_custkey * 16807) % 100000000 AS BIGINT) AS py
            FROM customer),
          s AS (SELECT s_suppkey AS site,
              CAST((s_suppkey * 69621) % 100000000 AS BIGINT) AS sx,
              CAST((s_suppkey * 40503) % 100000000 AS BIGINT) AS sy
            FROM supplier WHERE s_suppkey % 37 = 0),
          se AS (SELECT site, sx, sy,
              sx // 20000000 + ox.dx AS cx, sy // 20000000 + oy.dy AS cy
            FROM s, range(-1, 2) ox(dx), range(-1, 2) oy(dy)),
          cand AS (SELECT p.id, se.site,
              (p.px - se.sx) * (p.px - se.sx)
                + (p.py - se.sy) * (p.py - se.sy) AS d2
            FROM p JOIN se ON p.px // 20000000 = se.cx
              AND p.py // 20000000 = se.cy
            WHERE (p.px - se.sx) * (p.px - se.sx)
              + (p.py - se.sy) * (p.py - se.sy) <= 400000000000000),
          best AS (SELECT id, site, d2, ROW_NUMBER() OVER (
              PARTITION BY id ORDER BY d2, site) AS rn FROM cand)
        SELECT p.id, b.site, b.d2
        FROM p LEFT JOIN (SELECT id, site, d2 FROM best WHERE rn = 1) b
          USING (id)"""))
  )
}
