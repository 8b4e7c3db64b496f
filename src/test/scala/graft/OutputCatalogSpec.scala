package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.OutputCatalog

/** The typed output catalog generated from the reference's 17-table
  * ClickHouse DDL: completeness, and conform()'s drift handling. */
class OutputCatalogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("catalog carries all 17 reference fact tables with layout metadata") {
    val expected = Set(
      "c_p_heartbeat", "c_p_pinfo", "c_p_pinfo_real", "c_p_traffic",
      "c_p_status", "c_p_pon", "gw_dns", "gw_dns_detail",
      "gw_dns_resolution", "gw_dns_resolution_detail", "gw_ping", "gw_http",
      "gw_game", "gw_flash", "gw_http_detail", "gw_trace", "gw_trace_detail")
    assert(OutputCatalog.tables.keySet === expected)
    // every table has the ReplacingMergeTree version column and a sort key
    OutputCatalog.tables.foreach { case (name, spec) =>
      assert(spec.versionCol.contains("create_time"), name)
      assert(spec.orderBy.nonEmpty, name)
      assert(spec.schema.fieldNames.contains("id"), name)
    }
    // fact tables shard by task_param_id, probe tables by probe_id
    assert(OutputCatalog.tables("gw_http").shardKey.contains("task_param_id"))
    assert(OutputCatalog.tables("c_p_heartbeat").shardKey.contains("probe_id"))
    assert(OutputCatalog.tables("gw_http").partitionCol.contains("test_time_d"))
  }

  test("conform: reorders, casts, nulls nullable gaps, drops extras") {
    val df = Seq(("h1", "p1", 5, "x")).toDF(
      "id", "probe_id", "task_queue_size", "not_in_schema")
      .withColumn("heartbeat_time", lit(1700000000))
      .withColumn("task_size", lit(0L))
      .withColumn("type", lit(0L))
      .withColumn("heartbeat_time_par", to_timestamp(lit(1700000000)))
      .withColumn("heartbeat_time_d", lit(1L))
      .withColumn("heartbeat_time_h", lit(1L))
      .withColumn("heartbeat_time_m", lit(1L))
      .withColumn("heartbeat_time_w", lit(1L))
      .withColumn("create_time", lit(1L))
    val out = OutputCatalog.conform(df, "c_p_heartbeat")
    assert(out.schema.fieldNames.toSeq ===
      OutputCatalog.tables("c_p_heartbeat").schema.fieldNames.toSeq)
    assert(!out.columns.contains("not_in_schema"))
    // int input cast to the DDL's Int64
    assert(out.schema("task_queue_size").dataType === LongType)
    // absent nullable column materialized as typed null
    val row = out.collect()(0)
    assert(row.isNullAt(out.schema.fieldIndex("internet_ip")))
  }

  test("conform fails loudly when a required column is missing") {
    val df = Seq(("h1")).toDF("id") // no probe_id etc.
    val e = intercept[IllegalArgumentException] {
      OutputCatalog.conform(df, "c_p_heartbeat")
    }
    assert(e.getMessage.contains("required column"))
  }
}
