package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KafkaIO
import graft.sources.KafkaIO.KafkaConf

/** Shape tests for the Kafka wiring (S1/K6). The environment has no kafka
  * connector jar, so the smoke test drives the source to the connector
  * -resolution boundary and asserts Spark's specific failure — proving the
  * code path executes (options validated, format dispatched) and would
  * bind to `spark-sql-kafka-0-10` on a real cluster. */
class KafkaIOSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val conf = KafkaConf(
    bootstrapServers = "broker1:9092,broker2:9092",
    topic = "data_upload",
    groupId = Some("graft-data_upload2"),
    username = Some("user"),
    password = Some("secret"))

  test("client options mirror the reference's SASL/SCRAM consumer config") {
    val opts = KafkaIO.clientOptions(conf)
    assert(opts("kafka.security.protocol") === "SASL_PLAINTEXT")
    assert(opts("kafka.sasl.mechanism") === "SCRAM-SHA-256")
    assert(opts("kafka.sasl.jaas.config").contains("ScramLoginModule required"))
    assert(opts("kafka.sasl.jaas.config").contains("""username="user""""))
    assert(opts("kafka.group.id") === "graft-data_upload2")
    // no credentials → no SASL options at all
    assert(KafkaIO.clientOptions(conf.copy(username = None)).get(
      "kafka.sasl.jaas.config").isEmpty)
  }

  test("kafka source path executes to the connector-resolution boundary") {
    val err = intercept[Exception] {
      KafkaIO.source(spark, conf).isStreaming
    }
    // Spark's canonical missing-connector failure: the format string was
    // dispatched, the classpath lookup ran — only the jar is absent here
    assert(err.getMessage.toLowerCase.contains("kafka"))
  }

  test("file fallback keeps the same value:string surface") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-kafkaio").toFile
    val df = KafkaIO.messageSource(spark, None, tmp.getAbsolutePath)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.contains("value"))
    assert(df.schema("value").dataType ===
      org.apache.spark.sql.types.StringType)
  }

  // ---- wire-byte boundary: everything downstream of the socket ----
  // The connector jar is absent, so these fabricate frames with the exact
  // record schema spark-sql-kafka-0-10 emits and drive the REAL payload
  // bytes (raw 0x02 separators, non-ASCII UTF-8) through
  // decodeKafkaFrame → Parse, asserting parity with the file fallback.

  import java.nio.charset.StandardCharsets.UTF_8

  /** `<json>\x02<ip>\x02<ts>` with a REAL 0x02 byte and CJK UTF-8 content —
    * the byte-for-byte heartbeat_info payload (HeartBeatMessage.java:16-21). */
  private val hbJson =
    """{"info":{"id":"p-上海-01","soft_ver":"2.1","so_ver":"ubuntu","task_queue_size":3,"task_size":7},"time":1700000100}"""
  private val hbWire: Array[Byte] =
    hbJson.getBytes(UTF_8) ++ Array[Byte](0x02) ++
      "114.80.12.9".getBytes(UTF_8) ++ Array[Byte](0x02) ++
      "1700000111".getBytes(UTF_8)

  private def kafkaFrame(payloads: Seq[Array[Byte]], topic: String) = {
    val rows = payloads.zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.Row(
        null, v, topic, 0, i.toLong,
        new java.sql.Timestamp(1700000000000L + i), 0)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      KafkaIO.kafkaRecordSchema)
  }

  test("decodeKafkaFrame UTF-8-decodes connector-shaped binary values") {
    val decoded = KafkaIO.decodeKafkaFrame(
      kafkaFrame(Seq(hbWire), "heartbeat_info"))
    assert(decoded.schema("value").dataType ===
      org.apache.spark.sql.types.StringType)
    val row = decoded.collect().head
    assert(row.getAs[String]("value") === new String(hbWire, UTF_8))
    assert(row.getAs[String]("value").count(_ == 2.toChar) === 2)
    assert(row.getAs[String]("topic") === "heartbeat_info")
    assert(row.getAs[Long]("offset") === 0L)
  }

  test("kafka wire bytes parse identically to the file fallback (heartbeat)") {
    import graft.nqs.Parse
    val viaKafka = Parse.heartbeat(
      KafkaIO.decodeKafkaFrame(kafkaFrame(Seq(hbWire), "heartbeat_info"))
        .select("value")).collect()
    // file fallback delivers the same payload as a pre-decoded string line
    val viaFile = Parse.heartbeat(
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(new String(hbWire, UTF_8))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))).collect()
    assert(viaKafka.toSeq === viaFile.toSeq)
    val r = viaKafka.head
    assert(r.getAs[String]("probe_id") === "p-上海-01")
    assert(r.getAs[String]("internet_ip") === "114.80.12.9")
    assert(r.getAs[Long]("recv_time") === 1700000111L)
    assert(!r.getAs[Boolean]("bad_msg"))
  }

  test("kafka-schemed MemoryStream streams through decode + parse") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
    mem.addData((null, hbWire, "heartbeat_info", 0, 0L,
      new java.sql.Timestamp(1700000000000L), 0))
    val records = mem.toDF().toDF(
      "key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val parsed = graft.nqs.Parse.heartbeat(
      KafkaIO.decodeKafkaFrame(records).select("value"))
    val q = parsed.writeStream.format("memory")
      .queryName("kafka_boundary").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val out = spark.table("kafka_boundary").collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("probe_id") === "p-上海-01")
  }

  test("encodeForKafka roundtrips the K6 saved-event shape") {
    import spark.implicits._
    val events = Seq(
      ("probe-9", "GW-中文-7", 1700000400L),
      ("probe-8", "GW-2", 1700000500L))
      .toDF("probe_id", "gateway_name", "event_time")
    val wire = KafkaIO.encodeForKafka(events, "probe_id")
    assert(wire.columns.toSeq === Seq("key", "value"))
    val back = wire
      .select(org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("value"),
        events.schema).as("m"))
      .select("m.*")
    assert(back.orderBy("probe_id").collect().toSeq ===
      events.orderBy("probe_id").collect().toSeq)
    // key column carries the keyCol value as string (partitioning key)
    assert(wire.orderBy("key").collect().map(_.getString(0)).toSeq ===
      Seq("probe-8", "probe-9"))
  }
}
