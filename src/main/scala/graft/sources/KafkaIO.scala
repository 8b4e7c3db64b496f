package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Kafka source/sink wiring for the streaming jobs (S1/K6), the Spark
  * equivalent of the reference's SASL/SCRAM consumer
  * (`nqs-console/.../env/BaseFlink.java:107-129`) and message producer
  * (`CONSOLE/kafka/KafkaMessageProducer.java`).
  *
  * Structured Streaming replaces the consumer-group offset commit with
  * checkpointed offsets (exactly-once source tracking); group.id is still
  * settable for ACL-scoped clusters. The `value` lands as a STRING column
  * named like the file-source stand-in, so [[graft.streaming.StreamJobs]]
  * pipelines run unchanged on either source.
  *
  * This environment ships no kafka connector jar, so `.load()` here fails
  * fast with Spark's "Failed to find data source: kafka" — the path is
  * compiled, option-complete, and smoke-tested to that boundary
  * (KafkaIOSpec); on a cluster with `spark-sql-kafka-0-10` deployed it is
  * the production source.
  */
object KafkaIO {

  /** Connection + auth config (the reference's `kafka.*` properties). */
  final case class KafkaConf(
      bootstrapServers: String,
      topic: String,
      groupId: Option[String] = None,
      username: Option[String] = None,
      password: Option[String] = None,
      securityProtocol: String = "SASL_PLAINTEXT",
      saslMechanism: String = "SCRAM-SHA-256",
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Long = 100000L)

  /** The `kafka.`-prefixed options Spark passes through to the client —
    * mirrors BaseFlink's consumer Properties (SCRAM login module). */
  def clientOptions(conf: KafkaConf): Map[String, String] = {
    val auth = (conf.username, conf.password) match {
      case (Some(u), Some(p)) => Map(
        "kafka.security.protocol" -> conf.securityProtocol,
        "kafka.sasl.mechanism" -> conf.saslMechanism,
        "kafka.sasl.jaas.config" ->
          ("org.apache.kafka.common.security.scram.ScramLoginModule required " +
            s"""username="$u" password="$p";"""))
      case _ => Map.empty[String, String]
    }
    auth ++ conf.groupId.map("kafka.group.id" -> _)
  }

  /** The exact record schema `spark-sql-kafka-0-10` emits from `.load()`
    * (key/value as BINARY plus consumer metadata). Public so tests can
    * fabricate connector-shaped frames and drive [[decodeKafkaFrame]] on
    * real wire bytes without a broker. */
  val kafkaRecordSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
  }

  /** Wire-decode step shared by [[source]] and the broker-less boundary
    * tests: UTF-8-decodes the binary Kafka `value` (the byte-for-byte
    * payload the reference consumer sees, incl. the heartbeat topic's raw
    * 0x02 separators, `HeartBeatMessage.java:16-21`) into the STRING
    * `value` column every `graft.nqs.Parse` parser takes, and keeps the
    * consumer metadata. */
  def decodeKafkaFrame(records: DataFrame): DataFrame =
    records.select(
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"), col("timestamp"))

  /** Streaming source: one STRING `value` row per message (the wire format
    * every `graft.nqs.Parse` parser takes), plus the Kafka metadata. */
  def source(spark: SparkSession, conf: KafkaConf): DataFrame =
    decodeKafkaFrame(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", conf.bootstrapServers)
        .option("subscribe", conf.topic)
        .option("startingOffsets", conf.startingOffsets)
        .option("maxOffsetsPerTrigger", conf.maxOffsetsPerTrigger)
        .options(clientOptions(conf))
        .load())

  /** Producer-side projection shared by [[sink]] and the boundary tests:
    * JSON-serializes the full row into the Kafka `value` keyed by `keyCol`
    * — the K6 saved-event wire shape (`KafkaMessageProducer.java`). */
  def encodeForKafka(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Streaming sink: JSON-serializes the frame into Kafka `value`s keyed by
    * `keyCol` — the K6 saved-event branch shape. Returns the writer so the
    * caller picks trigger/checkpoint and starts it. */
  def sink(df: DataFrame, conf: KafkaConf, keyCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[Row] =
    encodeForKafka(df, keyCol)
      .writeStream
      .format("kafka")
      .trigger(trigger)
      .option("kafka.bootstrap.servers", conf.bootstrapServers)
      .option("topic", conf.topic)
      .option("checkpointLocation", checkpointDir)
      .options(clientOptions(conf))

  /** Source selector: a Kafka conf when provided, else the directory
    * file-source stand-in — jobs are source-agnostic (both yield a STRING
    * `value` column). */
  def messageSource(spark: SparkSession, kafka: Option[KafkaConf],
      fileDir: => String, maxFilesPerTrigger: Int = 10): DataFrame =
    kafka match {
      case Some(conf) => source(spark, conf)
      case None =>
        spark.readStream
          .option("maxFilesPerTrigger", maxFilesPerTrigger)
          .text(fileDir)
    }
}
