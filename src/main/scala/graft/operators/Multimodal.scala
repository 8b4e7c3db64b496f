package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * columns with typed metadata alongside (the lakehouse-standard layout —
  * media bytes inline for small assets, else object-store URIs).
  *
  * IMAGE decode is REAL: [[ImageIoCodec]] and [[decodeImageStats]] run
  * the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP — pure Java, no native
  * libs) through the distributed `mapPartitions` batch seam. Audio/video
  * codec work (resampling, frame extraction) needs ffmpeg-class native
  * libraries that are NOT in this environment, so those stay deliberate
  * STUBS behind the same [[MediaCodec]] seam with real Spark plumbing:
  * correct schemas, per-batch iteration via `mapPartitions` (the Scala
  * analog of `mapInPandas` batch shape), and size-binned repartitioning
  * so one 4 GB video doesn't skew an executor. Swapping in a JNI/javacv
  * implementation is a one-class change.
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

  /** REAL image codec: `javax.imageio` decode — pure JDK, no native
    * libs. Format is sniffed from magic bytes (container truth, not the
    * decoder's guess); undecodable payloads yield a null-metadata row
    * instead of failing the partition, so one corrupt blob can't kill a
    * 100 TB stage. Stills report n_frames=1 and no duration. */
  object ImageIoCodec extends MediaCodec {
    def decodeMeta(id: Long, bytes: Array[Byte]): Row = {
      val img = readImage(bytes)
      if (img == null)
        Row(id, bytes.length.toLong, sniffFormat(bytes), null, null, null, null)
      else Row(id, bytes.length.toLong, sniffFormat(bytes),
        img.getWidth, img.getHeight, 1, null)
    }
  }

  /** In-memory `javax.imageio` decode: the disk cache is disabled ONCE
    * per JVM (the default spills every ImageInputStream to a /tmp file —
    * per-row temp-file churn on a decode-heavy executor); null on any
    * decode failure. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false)
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: Exception => null }
  }

  /** Container format from magic bytes: PNG / JPEG / GIF / BMP, else
    * null. Deliberately independent of the decode path so a mislabeled
    * payload (jpeg bytes in a .png column) is visible as
    * format≠decoder-success. */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else null

  /** Attach a binary media column (test stand-in: the UTF-8 bytes of a
    * text column — real pipelines read actual media files here). */
  def withBinaryFromText(df: DataFrame, textCol: String,
      out: String = "media_bytes"): DataFrame =
    df.withColumn(out, encode(col(textCol), "UTF-8"))

  /** Header-only PNG dimension scan — the census pass a 100 TB image
    * corpus runs BEFORE paying any decode: a PNG's IHDR chunk sits at a
    * fixed offset (8-byte signature, 4-byte length, "IHDR", then
    * big-endian u32 width and height — PNG spec §5.2/§11.2.2), so the
    * dims are a 24-byte peek expressible entirely in codegen'd Catalyst
    * functions (substring + hex + conv): no mapPartitions seam, no
    * image library, no decode — the scan runs at parquet-read speed and
    * whole-stage codegen fuses it into downstream aspect/size filters
    * ("drop icons and banners" gates). Non-PNG or truncated payloads
    * yield NULL dims (signature and chunk tag checked). Returns
    * (idCol, width, height, aspect_milli = 1000·w div h). */
  def pngHeaderDims(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    val sigOk = b.isNotNull && length(b) >= 24 &&
      hex(substring(b, 1, 8)) === "89504E470D0A1A0A" &&
      hex(substring(b, 13, 4)) === "49484452"
    def be32(off: Int) = conv(hex(substring(b, off, 4)), 16, 10).cast("long")
    df.select(col(idCol),
        when(sigOk, be32(17)).as("width"),
        when(sigOk, be32(21)).as("height"))
      .withColumn("aspect_milli",
        expr("CASE WHEN height IS NULL OR height = 0 THEN NULL " +
          "ELSE (1000 * width) div height END"))
  }

  /** Encode one RGB image to PNG bytes, pixel value supplied per (x,y).
    * JDK-only; used by tests and the synthetic-media gate generator. */
  def pngBytes(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // no per-task tmp files
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic synthetic media: one real PNG per row, dimensions and
    * solid fill derived from the id (w=id%16+1, h=id%8+1,
    * rgb=(7id,13id,29id) mod 256) — so an arithmetic oracle can predict
    * the DECODED stats without being able to decode PNG itself. Real
    * pipelines read actual media files here; this is the gate/test
    * stand-in that still exercises a genuine encode→decode round trip. */
  def attachSyntheticPng(df: DataFrame, idCol: String,
      out: String = "media_bytes"): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField(out, BinaryType)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val rgb = (((id * 7) % 256).toInt << 16) |
          (((id * 13) % 256).toInt << 8) | ((id * 29) % 256).toInt
        Row(id, pngBytes((id % 16 + 1).toInt, (id % 8 + 1).toInt,
          (_, _) => rgb))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Synthetic GRADIENT PNG per row — per-pixel variation (unlike
    * [[attachSyntheticPng]]'s solid fill) so geometric transforms like
    * resize sampling are actually exercised pixel-by-pixel: every
    * channel is an integer function of (x, y, id) an oracle can replay.
    * Dims w=id%12+4, h=id%6+3; r=(31x+7y+id)%256, g=(13x+3id)%256,
    * b=(11y+5id)%256. */
  def attachSyntheticGradientPng(df: DataFrame, idCol: String,
      out: String = "media_bytes", seedCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField(out, BinaryType)))
    // seedCol (default: the id itself) drives the pixel formulas — two
    // rows sharing a seed carry byte-identical images, the exact-copy
    // planting a dedup gate needs
    val rdd = df.select(col(idCol).cast("long"),
        col(seedCol.getOrElse(idCol)).cast("long"))
      .rdd.mapPartitions { it =>
      it.map { r =>
        val mediaId = r.getLong(0)
        val id = r.getLong(1)
        val (w, h) = ((id % 12 + 4).toInt, (id % 6 + 3).toInt)
        Row(mediaId, pngBytes(w, h, (x, y) => {
          val rr = ((x * 31 + y * 7 + id) % 256).toInt
          val gg = ((x * 13 + id * 3) % 256).toInt
          val bb = ((y * 11 + id * 5) % 256).toInt
          (rr << 16) | (gg << 8) | bb
        }))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val imageStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  val resizedStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("src_width", IntegerType),
    StructField("src_height", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** REAL distributed resize — the upgrade of [[resizeStub]]: decode,
    * NEAREST-NEIGHBOR sample onto the (targetW × targetH) grid
    * (sx = ⌊x·srcW/targetW⌋ — pure integer arithmetic, so the transform
    * is bit-deterministic and an oracle can replay it; interpolating
    * resamplers are FP-order-fragile and could never hash-gate), and
    * emit the resized per-channel means — the thumbnail-feature pass of
    * a vision curation pipeline. Same scale shape as
    * [[decodeImageStats]]: size-binned partitions, one decoder loop per
    * partition, exact integer sums, work per row bounded by
    * targetW·targetH (not source pixels). Undecodable rows keep their
    * id with null stats. */
  def resizeImageStats(df: DataFrame, idCol: String, binCol: String,
      targetW: Int, targetH: Int, sizeBins: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val binned = df
      .select(col(idCol).cast("long"), col(binCol))
      .repartition(sizeBins, pmod(length(col(binCol)), lit(sizeBins)))
    val rdd = binned.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Row(id, null, null, null, null, null, null, null)
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < targetH) {
            val sy = y * sh / targetH
            var x = 0
            while (x < targetW) {
              val p = img.getRGB(x * sw / targetW, sy)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = targetW.toLong * targetH
          Row(id, sw, sh, targetW, targetH,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
    spark.createDataFrame(rdd, resizedStatsSchema)
  }

  /** Distributed REAL image feature extraction: decode every payload with
    * `javax.imageio` and emit (dims, per-channel means) — the feature
    * row a vision-pretraining curation pass filters on. Same batch shape
    * as [[decodeMeta]]: size-binned partitions, one decoder loop per
    * partition, integer sums (exact — no FP accumulation order to
    * disagree on) divided once per image. Undecodable rows keep their id
    * with null stats. */
  def decodeImageStats(df: DataFrame, idCol: String, binCol: String,
      sizeBins: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val binned = df
      .select(col(idCol).cast("long"), col(binCol))
      .repartition(sizeBins, pmod(length(col(binCol)), lit(sizeBins)))
    val rdd = binned.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Row(id, null, null, null, null, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Row(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
    spark.createDataFrame(rdd, imageStatsSchema)
  }

  val videoFrameStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** Minimal deterministic video container for the gate/test stand-in —
    * "GMJ1": 4-byte magic, big-endian frame count, then per frame a
    * big-endian byte length + a REAL PNG payload (a motion-JPEG-style
    * intra-only stream, with PNG in place of JPEG so decode is lossless
    * and the oracle arithmetic stays exact). Real pipelines read actual
    * containers here; the Spark-side plumbing — binary column, size
    * binning, per-partition decode loop, length-prefix frame skipping —
    * is the same either way. */
  def mjpegBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    out.write("GMJ1".getBytes("US-ASCII"))
    out.writeInt(frames.size)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    baos.toByteArray
  }

  /** Deterministic synthetic video per row: n = id%6+2 solid-fill PNG
    * frames (w = id%8+2, h = id%4+2), frame f's channels
    * (7id+11f, 13id+3f, 29id+5f) mod 256 — so an arithmetic oracle
    * predicts every SAMPLED frame's decoded stats without being able to
    * parse the container. */
  def attachSyntheticVideo(df: DataFrame, idCol: String,
      out: String = "media_bytes"): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField(out, BinaryType)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = (id % 6 + 2).toInt
        val frames = (0 until n).map { f =>
          val rgb = (((id * 7 + f * 11) % 256).toInt << 16) |
            (((id * 13 + f * 3) % 256).toInt << 8) |
            ((id * 29 + f * 5) % 256).toInt
          pngBytes((id % 8 + 2).toInt, (id % 4 + 2).toInt, (_, _) => rgb)
        }
        Row(id, mjpegBytes(frames))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame-SAMPLED video feature extraction — the video leg of the
    * image/audio/video column family: every everyN-th frame is decoded
    * into (dims, per-channel means), one output row per sampled frame
    * (the training-data shape — frames become rows). Unsampled frames
    * are skipped at the CONTAINER level via the length prefix, never
    * decoded, so work per row is bounded by the sampled frame count —
    * at everyN=30 a curation pass pays ~3% of the decode cost of the
    * stream. Same scale shape as [[decodeImageStats]]: size-binned
    * partitions (blob skew can't create stragglers), one decoder loop
    * per partition, exact integer channel sums. A row whose payload is
    * not a GMJ1 container — wrong magic, truncated, or carrying a
    * garbage frame length — keeps its id with null stats: every frame
    * length is bounds-checked against the remaining bytes BEFORE any
    * allocation, and the whole per-row parse is exception-guarded, so
    * one poison-pill blob can never kill a corpus-scale pass. */
  def sampleFrameStats(df: DataFrame, idCol: String, binCol: String,
      everyN: Int, sizeBins: Int = 32): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    val spark = df.sparkSession
    val binned = df
      .select(col(idCol).cast("long"), col(binCol))
      .repartition(sizeBins, pmod(length(col(binCol)), lit(sizeBins)))
    val rdd = binned.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
        val nullRow = Row(id, null, null, null, null, null, null, null)
        try {
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val magic = new Array[Byte](4)
          val ok = bytes != null && bytes.length >= 8 &&
            { in.readFully(magic); true } &&
            java.util.Arrays.equals(magic, "GMJ1".getBytes("US-ASCII"))
          if (!ok) rows += nullRow
          else {
            val n = in.readInt()
            var remaining = bytes.length - 8
            var corrupt = n < 0
            var f = 0
            while (!corrupt && f < n) {
              if (remaining < 4) corrupt = true
              else {
                val len = in.readInt()
                remaining -= 4
                if (len < 0 || len > remaining) corrupt = true
                else {
                  if (f % everyN == 0) {
                    val buf = new Array[Byte](len)
                    in.readFully(buf)
                    val img = readImage(buf)
                    if (img == null)
                      rows += Row(id, n, f, null, null, null, null, null)
                    else {
                      val (w, h) = (img.getWidth, img.getHeight)
                      var (sr, sg, sb) = (0L, 0L, 0L)
                      var y = 0
                      while (y < h) {
                        var x = 0
                        while (x < w) {
                          val p = img.getRGB(x, y)
                          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff
                          sb += p & 0xff
                          x += 1
                        }
                        y += 1
                      }
                      val np = w.toLong * h
                      rows += Row(id, n, f, w, h,
                        sr.toDouble / np, sg.toDouble / np, sb.toDouble / np)
                    }
                  } else in.skipBytes(len)
                  remaining -= len
                  f += 1
                }
              }
            }
            // a corrupt container yields ONE null-stats row; partially
            // parsed frames are discarded (a frame count the container
            // can't back is not trustworthy data)
            if (corrupt) { rows.clear(); rows += nullRow }
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            rows.clear(); rows += nullRow
        }
        rows.iterator
      }
    }
    spark.createDataFrame(rdd, videoFrameStatsSchema)
  }

  val dHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("b0", IntegerType),
    StructField("b1", IntegerType),
    StructField("b2", IntegerType),
    StructField("b3", IntegerType)))

  /** Perceptual difference-hash (dHash) of every image, emitted as four
    * 16-bit band keys — the visual near-dup key of an image-curation
    * pipeline. REAL decode (`javax.imageio`), then a 9×8 grayscale grid
    * by nearest-neighbor sampling (sx = ⌊x·w/9⌋ — integer arithmetic, so
    * an oracle replays it exactly; gray = (299r+587g+114b)/1000, the
    * ITU-R 601 luma weights in integer form), then bit y·8+x = 1 iff
    * grid[x+1][y] > grid[x][y] (64 horizontal-gradient signs — invariant
    * to global brightness and to any resize that preserves the sampled
    * gradient signs). The 64 bits ship as four 16-bit bands b0..b3
    * little-endian so [[imageNearDupPairs]] can bucket-join without
    * reassembling a 64-bit value. Same scale shape as
    * [[decodeImageStats]]: size-binned partitions, one decode loop per
    * partition, work per row bounded by the 9×8 grid (not source
    * pixels). Undecodable rows keep their id with null bands. */
  def dHashBands(df: DataFrame, idCol: String, binCol: String,
      sizeBins: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val binned = df
      .select(col(idCol).cast("long"), col(binCol))
      .repartition(sizeBins, pmod(length(col(binCol)), lit(sizeBins)))
    val rdd = binned.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Row(id, null, null, null, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val grid = Array.ofDim[Int](9, 8)
          var y = 0
          while (y < 8) {
            val sy = y * h / 8
            var x = 0
            while (x < 9) {
              val p = img.getRGB(x * w / 9, sy)
              grid(x)(y) = (((p >> 16) & 0xff) * 299 +
                ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
              x += 1
            }
            y += 1
          }
          val bands = Array.fill(4)(0)
          var i = 0
          while (i < 64) {
            if (grid(i % 8 + 1)(i / 8) > grid(i % 8)(i / 8))
              bands(i / 16) |= 1 << (i % 16)
            i += 1
          }
          Row(id, bands(0), bands(1), bands(2), bands(3))
        }
      }
    }
    spark.createDataFrame(rdd, dHashSchema)
  }

  /** Visual near-duplicate pairs over [[dHashBands]] output: pairs of
    * images whose dHashes differ in at most `maxHamming` of 64 bits.
    * EXACT, not approximate: with 4 bands and maxHamming ≤ 3, any
    * qualifying pair agrees on at least one whole band (pigeonhole), so
    * the band bucket join misses nothing — LSH recall mechanics with a
    * guarantee. Scale shape: byte-identical images collapse FIRST to one
    * representative per distinct hash (min id — one map-side-combined
    * aggregation), which is also the hot-bucket fix: a million copies of
    * one boilerplate banner become ONE row in the band join, so bucket
    * volume is bounded by distinct VISUAL content, not corpus rows; full
    * pair closure = these rep-level pairs ∘ the exact-hash groups. Then
    * 4 band-keyed join buckets (one shuffle each side), popcount-verified
    * hamming, multi-band matches deduped by a keyed aggregate.
    * Output: (id_a, id_b, hamming), id_a < id_b, reps of distinct
    * hashes. Null-band (undecodable) rows are excluded. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 100000): DataFrame =
    bandNearDupPairs(hashes, 4, maxHamming, maxBucket)

  /** Shared banded near-dup machinery over a (media_id, b0..b{n-1})
    * hash frame — the image ([[dHashBands]]) and audio
    * ([[audioEnvelopeBands]]) legs differ only in how the bands are
    * computed. Distinct-hash collapse first (exact-dup layer + the
    * first hot-bucket cap: identical content is ONE row), then one
    * band-keyed self-join per band via a single posexplode,
    * popcount-verified hamming, keyed dedup. Exact for
    * maxHamming < nBands (pigeonhole).
    *
    * Second cap, for DISTINCT hashes crowding one band value (smooth
    * regions at corpus scale): band buckets over `maxBucket` reps are
    * censused and sub-split by rep hash (the minhashLsh recipe) —
    * candidate volume is O(maxBucket · reps), and the pigeonhole
    * guarantee is traded ONLY for pairs whose every matching band is
    * over-cap. When no bucket is hot (the common case) the plan is
    * bit-identical to the uncapped one. The reps frame is
    * `localCheckpoint`ed so the census never re-runs the upstream
    * media decode. */
  private[operators] def bandNearDupPairs(hashes: DataFrame, nBands: Int,
      maxHamming: Int, maxBucket: Int = 100000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < nBands,
      s"$nBands-band pigeonhole exactness needs maxHamming in " +
        s"[0,${nBands - 1}], got $maxHamming")
    val bandCols = (0 until nBands).map(j => col(s"b$j"))
    val reps = hashes.filter(col("b0").isNotNull)
      .groupBy(bandCols: _*)
      .agg(min(col("media_id")).as("rep"))
      .localCheckpoint()
    val banded = reps.select(col("rep") +: bandCols :+
      posexplode(array(bandCols: _*)).as(Seq("j", "bv")): _*)
    // band values are 16-bit, so j·2^16 + bv is a collision-free map key
    val hot: Map[Long, Int] = banded
      .groupBy("j", "bv").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .collect()
      .map(r => (r.getInt(0).toLong * 65536L + r.getInt(1)) ->
        ((r.getLong(2) + maxBucket - 1) / maxBucket).toInt)
      .toMap
    val sided =
      if (hot.isEmpty) banded
      else banded.withColumn("__sub",
        pmod(xxhash64(col("rep")),
          coalesce(element_at(typedLit(hot),
            col("j").cast("long") * 65536L + col("bv")), lit(1))))
    val joinCond =
      if (hot.isEmpty)
        col("x.j") === col("y.j") && col("x.bv") === col("y.bv") &&
          col("x.rep") < col("y.rep")
      else col("x.j") === col("y.j") && col("x.bv") === col("y.bv") &&
        col("x.__sub") === col("y.__sub") && col("x.rep") < col("y.rep")
    val ham = (0 until nBands).map(j =>
        bit_count(col(s"x.b$j").bitwiseXOR(col(s"y.b$j"))))
      .reduce(_ + _)
    sided.as("x").join(sided.as("y"), joinCond)
      .select(col("x.rep").as("id_a"), col("y.rep").as("id_b"),
        ham.cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      // a pair matching in several bands appears once per matching band;
      // hamming is identical on every copy — one keyed aggregate dedups
      .groupBy("id_a", "id_b").agg(min(col("hamming")).as("hamming"))
  }

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

  /** Real WAV bytes from PCM samples (16-bit signed little-endian mono):
    * a genuine RIFF container via `javax.sound.sampled`, so the decode
    * side exercises real header parsing — the audio analog of
    * [[pngBytes]]. */
  def wavBytes(rate: Float, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Deterministic synthetic audio: one real WAV per row, length and
    * samples derived from the id (n = id%32+16 samples at 8 kHz,
    * sample[i] = (37i + 11·id) mod 2003 − 1001) — the [[attachSyntheticPng]]
    * recipe for the audio column. */
  def attachSyntheticWav(df: DataFrame, idCol: String,
      out: String = "media_bytes", seedCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField(out, BinaryType)))
    // seedCol (default: the id) drives the sample formula — shared seeds
    // carry byte-identical audio, the exact-copy planting a dedup gate
    // needs (the attachSyntheticGradientPng rule)
    val rdd = df.select(col(idCol).cast("long"),
        col(seedCol.getOrElse(idCol)).cast("long"))
      .rdd.mapPartitions { it =>
      it.map { r =>
        val mediaId = r.getLong(0)
        val id = r.getLong(1)
        val n = (id % 32 + 16).toInt
        val samples = Array.tabulate(n)(i =>
          (((i * 37 + id * 11) % 2003) - 1001).toShort)
        Row(mediaId, wavBytes(8000f, samples))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val audioBandsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("b0", IntegerType),
    StructField("b1", IntegerType)))

  /** Audio energy-envelope fingerprint — the audio leg of the visual
    * [[dHashBands]]: REAL WAV decode, the sample stream split into 16
    * equal frames (frame f covers samples [⌊f·n/16⌋, ⌊(f+1)·n/16⌋) —
    * integer bounds an oracle replays), per-frame energy = Σ|sample|
    * (exact integer), and 15 envelope-gradient sign bits
    * (bit f = 1 iff energy_{f+1} > energy_f) — invariant to global gain,
    * the property that makes it a fingerprint rather than a checksum.
    * Ships as two band keys (bits 0–7, bits 8–14) so
    * [[audioNearDupPairs]]'s 2-band join is EXACT for hamming ≤ 1.
    * Same scale shape as [[decodeAudioStats]]; undecodable or
    * non-16-bit-mono rows keep their id with null bands. */
  def audioEnvelopeBands(df: DataFrame, idCol: String, binCol: String,
      sizeBins: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val binned = df
      .select(col(idCol).cast("long"), col(binCol))
      .repartition(sizeBins, pmod(length(col(binCol)), lit(sizeBins)))
    val rdd = binned.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val f = ais.getFormat
          if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
              f.isBigEndian) Row(id, null, null)
          else {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            if (n < 16) Row(id, null, null)
            else {
              val energy = new Array[Long](16)
              var fr = 0
              while (fr < 16) {
                var i = fr * n / 16
                val hi = (fr + 1) * n / 16
                var e = 0L
                while (i < hi) {
                  val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8))
                    .toShort.toLong
                  e += math.abs(s)
                  i += 1
                }
                energy(fr) = e
                fr += 1
              }
              var (b0, b1) = (0, 0)
              var t = 0
              while (t < 15) {
                if (energy(t + 1) > energy(t)) {
                  if (t < 8) b0 |= 1 << t else b1 |= 1 << (t - 8)
                }
                t += 1
              }
              Row(id, b0, b1)
            }
          }
        } catch {
          case _: Exception => Row(id, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, audioBandsSchema)
  }

  /** Audio near-duplicate pairs over [[audioEnvelopeBands]]: reps of
    * distinct envelope hashes within `maxHamming` of 15 bits — exact
    * via the 2-band pigeonhole for maxHamming ≤ 1; byte-identical
    * audio collapses first ([[imageNearDupPairs]]'s contract). */
  def audioNearDupPairs(hashes: DataFrame, maxHamming: Int = 1,
      maxBucket: Int = 100000): DataFrame =
    bandNearDupPairs(hashes, 2, maxHamming, maxBucket)

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_amp", LongType),
    StructField("sum_sq", LongType)))

  /** Distributed REAL audio feature extraction: parse each payload's
    * RIFF/fmt headers with `javax.sound.sampled`, decode the 16-bit PCM
    * stream, and emit (rate, length, Σ amplitude, Σ amplitude²) — the
    * loudness/energy sufficient statistics an audio-curation pass
    * filters on (mean and RMS derive from them), kept as EXACT integer
    * sums so the gate hashes with no FP discipline needed at all. Same
    * scale shape as [[decodeImageStats]]: size-binned partitions, one
    * decoder loop per partition; undecodable or non-16-bit-mono rows
    * keep their id with null stats. */
  def decodeAudioStats(df: DataFrame, idCol: String, binCol: String,
      sizeBins: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val binned = df
      .select(col(idCol).cast("long"), col(binCol))
      .repartition(sizeBins, pmod(length(col(binCol)), lit(sizeBins)))
    val rdd = binned.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val f = ais.getFormat
          if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
              f.isBigEndian) Row(id, null, null, null, null)
          else {
            val bytes = ais.readAllBytes()
            var (sa, sq) = (0L, 0L)
            var i = 0
            while (i + 1 < bytes.length) {
              val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
              sa += s; sq += s * s
              i += 2
            }
            Row(id, f.getSampleRate.toInt, bytes.length.toLong / 2, sa, sq)
          }
        } catch {
          case _: Exception => Row(id, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, audioStatsSchema)
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
