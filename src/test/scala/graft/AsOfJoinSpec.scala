package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Boundary semantics of the point-in-time join: ≤ at equal timestamps,
  * nulls before the first dim version, latest-version selection. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("as-of join picks the latest version at or before the fact time") {
    val dims = Seq(
      ("k1", 100L, "v1"), ("k1", 200L, "v2"), ("k1", 300L, "v3"),
      ("k2", 500L, "w1")
    ).toDF("key", "vt", "cfg")
    val facts = Seq(
      (1L, "k1", 99L),   // before any version → null
      (2L, "k1", 100L),  // equal timestamp → v1 applies (≤ semantics)
      (3L, "k1", 250L),  // between v2 and v3 → v2
      (4L, "k1", 999L),  // after all → v3
      (5L, "k2", 499L),  // before k2's only version → null
      (6L, "k3", 100L)   // key with no dims at all → null
    ).toDF("fact_id", "key", "t")
    val out = AsOfJoin.lastKnown(facts, dims, "key", "t", "vt", Seq("cfg"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out === Map(
      1L -> None, 2L -> Some("v1"), 3L -> Some("v2"),
      4L -> Some("v3"), 5L -> None, 6L -> None))
  }

  test("a matched version's legitimately-NULL attribute is NOT replaced " +
      "by the previous version's value") {
    val dims = Seq(
      ("k1", 100L, Some("v1")),
      ("k1", 200L, None) // newer version explicitly nulls the attribute
    ).toDF("key", "vt", "cfg")
    val facts = Seq((1L, "k1", 150L), (2L, "k1", 250L)).toDF("fact_id", "key", "t")
    val out = AsOfJoin.lastKnown(facts, dims, "key", "t", "vt", Seq("cfg"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    // fact 2 matches the 200L version, whose cfg is NULL — the DuckDB
    // ASOF JOIN contract returns that NULL, not the carried "v1"
    assert(out === Map(1L -> Some("v1"), 2L -> None))
  }
}
