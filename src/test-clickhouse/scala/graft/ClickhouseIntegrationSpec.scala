package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcBatchSink

/** LIVE ClickHouse-dialect leg of [[JdbcBatchSink]] — the engine the
  * reference sink actually speaks (`nqs-console/.../sink/
  * ClickhouseSink.java:28-31`). The flush/batch/shard/evolution PHYSICS
  * are hash-gated against embedded DuckDB (q198/q213/q309); what only a
  * real ClickHouse can verify is the dialect surface this spec covers:
  *
  *   - type mapping: the generic DDL (`VARCHAR NULL`, `BIGINT`,
  *     `TIMESTAMP NULL`, ...) must land as `Nullable(String)`, `Int64`,
  *     `Nullable(DateTime)` in system.columns — ClickHouse's SQL-alias
  *     layer, plus the explicit NULL modifier (ClickHouse defaults
  *     columns NOT NULL, unlike every other engine the sink targets);
  *   - `ddlSuffix`: CREATE TABLE needs the engine-mandatory
  *     `ENGINE = MergeTree ORDER BY ...` clause;
  *   - `evolveTable`: ALTER TABLE ADD COLUMN semantics mid-stream, and
  *     the drift guard unwrapping `Nullable(T)` metadata spellings
  *     (Int64/Float64/DateTime → the sink's type names).
  *
  * Compiled ONLY under `sbt -Dgraft.clickhouse=true` (see build.sbt):
  * this sandbox has zero egress, so neither the ClickHouse JDBC driver
  * nor the testcontainer image can be pulled here. On a networked
  * machine with Docker:
  *
  *   sbt -Dgraft.clickhouse=true "testOnly graft.ClickhouseIntegrationSpec"
  */
class ClickhouseIntegrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val container =
    new org.testcontainers.clickhouse.ClickHouseContainer(
      "clickhouse/clickhouse-server:24.3")
  private var url: String = _

  private val Engine = "ENGINE = MergeTree ORDER BY tuple()"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    container.start()
    url = container.getJdbcUrl +
      s"?user=${container.getUsername}&password=${container.getPassword}"
  }

  override def afterAll(): Unit =
    try spark.stop() finally container.stop()

  private def query[A](sql: String)(read: java.sql.ResultSet => A): Seq[A] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      try Iterator.continually(rs).takeWhile(_.next()).map(read).toVector
      finally rs.close()
    } finally conn.close()
  }

  private def columnTypes(table: String): Map[String, String] =
    query("SELECT name, type FROM system.columns WHERE table = '" +
        table + "' AND database = currentDatabase()")(
      r => r.getString(1) -> r.getString(2)).toMap

  test("generic DDL lands as Nullable(T) ClickHouse types; values round-trip") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a"), Option(1.5), true),
      (2L, Option.empty[String], Option.empty[Double], false))
      .toDF("id", "s", "d", "flag")
      .withColumn("ts", lit("2024-01-02 03:04:05").cast("timestamp"))
    JdbcBatchSink.write(df, url, "t_types", ddlSuffix = Engine)

    val types = columnTypes("t_types")
    // primitives arrive non-nullable from the tuple encoder → bare types;
    // Option/lit-cast columns must be Nullable — the mapping this spec
    // exists to pin (an implicit-NULL DDL would have made every column
    // NOT NULL here and the None row would have failed to insert)
    assert(types("id") === "Int64")
    assert(types("flag") === "Bool")
    assert(types("s") === "Nullable(String)")
    assert(types("d") === "Nullable(Float64)")
    assert(types("ts") === "Nullable(DateTime)")

    val counts = query(
      "SELECT count(*), countIf(s IS NULL), countIf(d IS NULL) FROM t_types")(
      r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(counts === ((2L, 1L, 1L)))
    val vals = query(
      "SELECT id, s, toString(ts) FROM t_types ORDER BY id")(
      r => (r.getLong(1), Option(r.getString(2)), r.getString(3)))
    assert(vals.head === ((1L, Some("a"), "2024-01-02 03:04:05")))
    assert(vals(1)._2 === None)
  }

  test("evolveTable ALTERs new columns in mid-stream; old rows read NULL") {
    import spark.implicits._
    val narrow = Seq((1L, "x"), (2L, "y")).toDF("id", "payload")
    JdbcBatchSink.write(narrow, url, "t_evolve", ddlSuffix = Engine)
    // day-2 producer adds a column — the reference's dead-code
    // ClickhouseSink.java:70-125 behavior, live through evolveTable
    val wide = Seq((3L, "z", Option(42L))).toDF("id", "payload", "extra")
    JdbcBatchSink.write(wide, url, "t_evolve", ddlSuffix = Engine)

    assert(columnTypes("t_evolve")("extra") === "Nullable(Int64)")
    val rows = query(
      "SELECT count(*), countIf(extra IS NULL) FROM t_evolve")(
      r => (r.getLong(1), r.getLong(2))).head
    assert(rows === ((3L, 2L))) // pre-evolution rows read back NULL
  }

  test("drift guard unwraps Nullable(T) spellings: same type passes, real drift throws") {
    import spark.implicits._
    val base = Seq((1L, Option("a"))).toDF("id", "s")
    JdbcBatchSink.write(base, url, "t_drift", ddlSuffix = Engine)
    // identical schema again: Nullable(String) metadata must normalize
    // to VARCHAR and NOT read as drift
    JdbcBatchSink.write(base, url, "t_drift", ddlSuffix = Engine)
    assert(query("SELECT count(*) FROM t_drift")(_.getLong(1)).head === 2L)
    // s re-typed Long → loud throw, never a silent cast
    val drift = Seq((1L, Option(9L))).toDF("id", "s")
    val ex = intercept[Exception] {
      JdbcBatchSink.write(drift, url, "t_drift", ddlSuffix = Engine)
    }
    assert(ex.getMessage.contains("type drift"))
  }
}
