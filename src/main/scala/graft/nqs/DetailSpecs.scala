package graft.nqs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.score.{PQConfig, PQDefaults, ScoreEngine}
import graft.score.ScoreEngine.Source

/** Per-protocol detail parsers beyond HTTP (SURVEY.md §2.10 U3): the
  * reference declares DNS_DETAIL / TRACE_DETAIL / DNS_RESOLUTION_DETAIL
  * explosions (`DnsDataParser.java:8-10`, `TraceDataParser.java:8-10`,
  * `DnsResolutionDataParser.java:8-10`) over the same `detail` JSON key
  * with protocol-specific element shapes. Each spec explodes the raw
  * `detail_json` captured by [[Parse.dataUpload]] into child fact rows
  * carrying the parent FK, then scores them with the child criteria.
  */
object DetailSpecs {

  final case class DetailSpec(
      parentProtocol: String,
      childProtocol: String,
      elementSchema: StructType)

  val dnsDetail: DetailSpec = DetailSpec("DNS", "DNS_DETAIL", StructType(Seq(
    StructField("domain", StringType),
    StructField("dns_cost", DoubleType),
    StructField("success_rate", DoubleType),
    StructField("host_ip", StringType))))

  val traceDetail: DetailSpec = DetailSpec("TRACE", "TRACE_DETAIL", StructType(Seq(
    StructField("hops", LongType),
    StructField("ip", StringType),
    StructField("rtt", DoubleType),
    StructField("jitter", DoubleType),
    StructField("lost_rate", DoubleType))))

  val dnsResolutionDetail: DetailSpec =
    DetailSpec("DNS_RESOLUTION", "DNS_RESOLUTION_DETAIL", StructType(Seq(
      StructField("domain", StringType),
      StructField("time_cost", DoubleType),
      StructField("success_rate", DoubleType))))

  val all: Seq[DetailSpec] = Seq(dnsDetail, traceDetail, dnsResolutionDetail)

  /** Explode one spec's detail arrays into scored child rows. `facts` must
    * carry `task_type_name`, `detail_json`, the envelope ids and buckets
    * (i.e. the output of [[TaskDataPipeline]]). */
  def explode(facts: DataFrame, spec: DetailSpec,
      cfg: PQConfig = PQDefaults.config): DataFrame = {
    val parents = facts
      .filter(col("task_type_name") === spec.parentProtocol &&
        col("detail_json").isNotNull)
    val base = parents.select(
      col("id").as("parent_id"),
      col("probe_id"), col("task_id"), col("task_param_id"),
      col("test_time"), col("test_time_h"), col("test_time_d"),
      col("test_time_w"), col("test_time_m"), col("month_time"),
      col("create_time"),
      posexplode(from_json(col("detail_json"), ArrayType(spec.elementSchema)))
        .as(Seq("element_idx", "e")))
    val flat = base.select(col("*"), col("e.*")).drop("e")
      .withColumn("task_type_name", lit(spec.childProtocol))
      .withColumn("id", TaskDataPipeline.rowId(
        col("parent_id"), col("element_idx"), col("test_time")))
    val src = (name: String) =>
      if (flat.columns.contains(name)) Source(col(name), name)
      else Source(lit(null).cast("double"), "NULL")
    flat.withColumn("score",
      ScoreEngine.scoreAll(cfg, col("task_type_name"), src))
  }
}
