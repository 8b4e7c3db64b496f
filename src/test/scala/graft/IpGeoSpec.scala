package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IpGeo

/** Canonicalization semantics of the IP range-lookup operator
  * (reference `IPHelper.java:35-67,113-221`). */
class IpGeoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // 1.0.0.0/16 → full attrs; 2.0.0.0/16 → Beijing prov-code with blank
  // district; 3.0.0.0/16 → blank city + 中国 province
  private lazy val ranges = Seq(
    (16777216L, 16842751L, "广东省", "深圳市", "南山区", "电信", "440305"),
    (33554432L, 33619967L, "北京", "北京市", "", "联通", "110000"),
    (50331648L, 50397183L, "中国", "", "佛山市", "移动", "440600")
  ).toDF("range_start", "range_end", "province_name", "city_name",
    "district_name", "operator", "code")

  private def resolve(ip: String): Map[String, String] = {
    val out = IpGeo.withGeo(Seq(Tuple1(ip)).toDF("ip"), "ip", ranges)
      .select("province_name", "city_name", "district_name", "operator",
        "region_code")
      .collect()(0)
    Seq("province_name", "city_name", "district_name", "operator",
      "region_code").zip(out.toSeq.map(_.asInstanceOf[String])).toMap
  }

  test("in-range IP resolves full attributes") {
    val r = resolve("1.0.1.2")
    assert(r("province_name") === "广东省")
    assert(r("city_name") === "深圳市")
    assert(r("district_name") === "南山区")
    assert(r("operator") === "电信")
    assert(r("region_code") === "440305")
  }

  test("municipality code with blank district resolves to city level") {
    val r = resolve("2.0.200.9")
    assert(r("province_name") === "北京")
    assert(r("district_name") === "其他")
    assert(r("region_code") === "110100") // 110000 fixed up
  }

  test("中国 province and blank city fall back to defaults") {
    val r = resolve("3.0.0.1")
    assert(r("province_name") === "其他")
    assert(r("city_name") === "其他")
    assert(r("district_name") === "佛山市")
    assert(r("region_code") === "440600") // not a municipality code
  }

  test("unmatched, invalid, and inner IPs canonicalize") {
    assert(resolve("9.9.9.9")("province_name") === "其他") // gap → miss
    assert(resolve("9.9.9.9")("region_code") === "000000")
    assert(resolve("300.1.1.1")("province_name") === "其他") // invalid octet
    assert(resolve("not-an-ip")("province_name") === "其他")
    assert(resolve("10.0.0.1")("province_name") === "局域网") // RFC1918 A
    assert(resolve("172.31.0.1")("province_name") === "局域网") // RFC1918 B
    assert(resolve("192.168.1.1")("province_name") === "局域网") // RFC1918 C
    assert(resolve("127.0.0.1")("province_name") === "局域网") // loopback
    assert(resolve("10.0.0.1")("region_code") === "000000")
  }

  test("bucketed join matches ranges spanning bucket boundaries") {
    // range spanning multiple /16 buckets still matches via explode
    val wide = Seq((16777216L, 67108863L, "省A", "市B", "区C", "ISP", "140001"))
      .toDF("range_start", "range_end", "province_name", "city_name",
        "district_name", "operator", "code")
    val r = IpGeo.withGeo(Seq(Tuple1("2.255.0.1")).toDF("ip"), "ip", wide)
      .select("province_name").collect()(0).getString(0)
    assert(r === "省A")
  }

  test("ipdb-converted dim fixture feeds withGeo (q48 schema end-to-end)") {
    // src/test/resources/ip_region_fixture.parquet was emitted by
    // tools/ipdb_to_parquet.py from the committed synthetic fixture.ipdb
    // (the tool's --selftest builds and re-parses the same trie) — this
    // closes the reference's binary-ipdb seam: .ipdb -> range dim ->
    // broadcast range join, with CJK payloads surviving the round trip
    val url = getClass.getResource("/ip_region_fixture.parquet")
    assume(url != null, "fixture parquet missing")
    val dim = spark.read.parquet(url.getPath)
    assert(dim.columns.toSeq === Seq("range_start", "range_end",
      "province_name", "city_name", "district_name", "operator", "code"))
    val probes = Seq("1.0.0.7", "9.8.250.1", "222.20.3.4", "8.8.8.8")
      .toDF("ip")
    val got = IpGeo.withGeo(probes, "ip", dim)
      .select("ip", "province_name", "city_name", "operator", "region_code")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
      .toMap
    assert(got("1.0.0.7") === (("北京", "北京", "电信", "110100")))
    assert(got("9.8.250.1") === (("广东", "深圳", "联通", "440305")))
    assert(got("222.20.3.4") === (("四川", "成都", "移动", "510100")))
    assert(got("8.8.8.8")._1 === IpGeo.DefaultName) // gap range: defaults
  }
}
