package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * columns with typed metadata alongside (the lakehouse-standard layout —
  * media bytes inline for small assets, else object-store URIs).
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) needs
  * native libraries that are NOT in this environment, so the decoders are
  * deliberate STUBS with real Spark plumbing: correct schemas, per-batch
  * iteration via `mapPartitions` (the Scala analog of `mapInPandas` batch
  * shape), and size-binned repartitioning so one 4 GB video doesn't skew
  * an executor. Swapping `StubCodec` for a JNI/javacv implementation is a
  * one-class change.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)))

  /** The codec seam. A real deployment implements this against libjpeg /
    * ffmpeg; the stub derives deterministic pseudo-metadata from the bytes
    * so every downstream stage (schema, partitioning, joins) is testable. */
  trait MediaCodec extends Serializable {
    def decodeMeta(id: Long, bytes: Array[Byte]): Row
  }

  /** STUB: deterministic fake decode — NOT a real image parser. */
  object StubCodec extends MediaCodec {
    def decodeMeta(id: Long, bytes: Array[Byte]): Row = {
      val n = bytes.length.toLong
      val fmt = if (n % 3 == 0) "jpeg" else if (n % 3 == 1) "png" else "webp"
      Row(id, n, fmt,
        (n % 640 + 1).toInt, (n % 480 + 1).toInt,
        (n % 16 + 1).toInt, n * 40)
    }
  }

  /** Attach a binary media column (test stand-in: the UTF-8 bytes of a
    * text column — real pipelines read actual media files here). */
  def withBinaryFromText(df: DataFrame, textCol: String,
      out: String = "media_bytes"): DataFrame =
    df.withColumn(out, encode(col(textCol), "UTF-8"))

  /** Decode metadata for every media row. Batch shape: one partition =
    * one codec instance iterating rows (exactly `mapInPandas`' contract).
    * Rows are first binned by payload size so large blobs spread evenly —
    * at 100 TB this is the difference between a smooth stage and one
    * straggler executor holding the long tail. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String,
      codec: MediaCodec = StubCodec, sizeBins: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val binned = df
      .select(col(idCol).cast("long"), col(binCol))
      .repartition(sizeBins, pmod(length(col(binCol)), lit(sizeBins)))
    val rdd = binned.rdd.mapPartitions { it =>
      it.map(r => codec.decodeMeta(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
    spark.createDataFrame(rdd, mediaMetaSchema)
  }

  /** STUB resize: passes metadata through with target dims attached —
    * the real implementation maps the binary column batch-wise. */
  def resizeStub(meta: DataFrame, targetW: Int, targetH: Int): DataFrame =
    meta.withColumn("resized_width", least(col("width"), lit(targetW)))
      .withColumn("resized_height", least(col("height"), lit(targetH)))

  /** STUB frame sampling plan: every Nth frame index as an array column —
    * a real video pipeline explodes this against the decoded stream. */
  def frameSamplePlan(meta: DataFrame, everyN: Int): DataFrame =
    meta.withColumn("sample_frames",
      when(col("n_frames").isNotNull && col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(everyN)))
        .otherwise(array()))
}
