package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IP → region resolution as a RANGE lookup, re-expressing the reference's
  * binary-ipdb prefix search + canonicalization
  * (`nqs-common/.../util/IPHelper.java:35-67,113-221`,
  * `IPIPUtil.java:10-70`) as a Spark broadcast interval join.
  *
  * The reference resolves one IP at a time through redis-cached ipdb
  * lookups; at 100 TB the equivalent is a JOIN against the range table.
  * A naive `ip BETWEEN start AND end` broadcast join degenerates to a
  * nested-loop scan of every range per row, so [[withGeo]] buckets both
  * sides by the high bits (`/16` by default): each range explodes to the
  * buckets it covers, the probe side computes its bucket, and the join is
  * a plain broadcast HASH join on the bucket with a residual range filter
  * — candidate set per row ≈ ranges overlapping one /16, not the whole
  * table.
  *
  * Canonicalization rules carried over (`IPHelper.java`):
  *   - invalid IP → all defaults (`其他`/`000000`), `:46-48`
  *   - inner IP → province `局域网`, rest defaults, `:49-52`
  *   - blank attribute, or province `中国` → default, `:90-99`
  *   - municipality province codes (京110000/津120000/沪310000/渝500000)
  *     with a blank district resolve to the city-level code, `:116-127`
  */
object IpGeo {

  val DefaultName = "其他"
  val DefaultCode = "000000"
  val InnerProvince = "局域网"

  /** Dotted-quad → uint32 (as long). Assumes a syntactically valid quad;
    * gate with [[isValidIp]] first. */
  def ipToLong(ip: Column): Column =
    aggregate(transform(split(ip, "\\."), _.cast("long")),
      lit(0L), (acc, x) => acc * 256 + x)

  /** Syntactic + octet-range validity (`IPIPUtil.checkIp`). */
  def isValidIp(ip: Column): Column =
    ip.isNotNull && ip.rlike("^(\\d{1,3}\\.){3}\\d{1,3}$") &&
      !exists(split(ip, "\\."), o => o.cast("int") > 255)

  /** RFC1918 A/B/C ranges + loopback (`NetUtil.isInnerIP` semantics). */
  def isInnerIp(ip: Column): Column = {
    val n = ipToLong(ip)
    (n >= 0x0A000000L && n <= 0x0AFFFFFFL) || // 10.0.0.0/8
    (n >= 0xAC100000L && n <= 0xAC1FFFFFL) || // 172.16.0.0/12
    (n >= 0xC0A80000L && n <= 0xC0A8FFFFL) || // 192.168.0.0/16
    n === 0x7F000001L                         // 127.0.0.1
  }

  private def blank(c: Column): Column =
    c.isNull || trim(c) === "" || c === "null" || c === DefaultName

  /** Municipality fix-up: province-level code + blank district → the
    * city-level code (`IPHelper.java:116-127`). */
  def municipalityFix(code: Column, districtName: Column): Column =
    when(blank(districtName),
      when(code === "110000", "110100")
        .when(code === "120000", "120100")
        .when(code === "310000", "310100")
        .when(code === "500000", "500100")
        .otherwise(code))
      .otherwise(code)

  /** Resolve `ipCol` against a range dim
    * `(range_start, range_end, province_name, city_name, district_name,
    * operator, code)` (longs + strings; ranges non-overlapping). Adds the
    * canonical columns `province_name/city_name/district_name/operator/
    * region_code`.
    *
    * `bucketBits` controls the equi-join granularity: ranges explode to
    * `2^(32-bucketBits)`-sized buckets. 16 suits ISP-allocation-sized
    * ranges; lower it if the dim has very wide ranges (fewer, fatter
    * buckets) to keep the exploded dim small.
    */
  def withGeo(df: DataFrame, ipCol: String, ranges: DataFrame,
      bucketBits: Int = 16): DataFrame = {
    val shift = 32 - bucketBits
    val bucketed = ranges.withColumn("__bucket",
        explode(sequence(shiftright(col("range_start"), shift),
          shiftright(col("range_end"), shift))))
      .select(col("__bucket"), col("range_start"), col("range_end"),
        col("province_name").as("__r_prov"), col("city_name").as("__r_city"),
        col("district_name").as("__r_dist"), col("operator").as("__r_op"),
        col("code").as("__r_code"))

    val ip = col(ipCol)
    val valid = isValidIp(ip)
    val probe = df
      .withColumn("__valid", valid)
      .withColumn("__inner", valid && isInnerIp(ip))
      .withColumn("__ip_int", when(valid, ipToLong(ip)).otherwise(lit(null)))
      .withColumn("__bucket",
        when(valid, shiftright(ipToLong(ip), shift)).otherwise(lit(null)))

    val joined = probe.join(broadcast(bucketed),
      probe("__bucket") === bucketed("__bucket") &&
        col("__ip_int") >= col("range_start") &&
        col("__ip_int") <= col("range_end"),
      "left")

    def attr(c: Column, default: String): Column =
      when(!col("__valid") || col("__inner") || blank(c), lit(default))
        .otherwise(c)

    joined
      .withColumn("province_name",
        when(col("__inner"), lit(InnerProvince))
          .otherwise(attr(
            // `中国` is not a province — the reference treats it as blank
            when(col("__r_prov") === "中国", lit(null)).otherwise(col("__r_prov")),
            DefaultName)))
      .withColumn("city_name", attr(col("__r_city"), DefaultName))
      .withColumn("district_name", attr(col("__r_dist"), DefaultName))
      .withColumn("operator", attr(col("__r_op"), DefaultName))
      .withColumn("region_code",
        when(!col("__valid") || col("__inner") || blank(col("__r_code")),
          lit(DefaultCode))
          .otherwise(municipalityFix(col("__r_code"), col("__r_dist"))))
      .drop("__valid", "__inner", "__ip_int", "__bucket", "range_start",
        "range_end", "__r_prov", "__r_city", "__r_dist", "__r_op", "__r_code")
  }
}
