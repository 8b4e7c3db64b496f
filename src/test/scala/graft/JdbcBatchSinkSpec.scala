package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcBatchSink

/** JdbcBatchSink against a REAL embedded database (DuckDB over JDBC —
  * the unmanaged test jar): schema creation from Spark types, the
  * 10k-row/4s flush contract exercised across multiple batches and
  * concurrent per-partition writers, null handling, and the read-back
  * parity the q198 gate depends on. */
class JdbcBatchSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshUrl(): String =
    s"jdbc:duckdb:${Files.createTempDirectory("jdbc_sink_spec").resolve("t.db")}"

  test("roundtrip: types, nulls, multiple batches, parallel partitions") {
    val url = freshUrl()
    val df = spark.range(0, 5000).select(
      col("id"),
      col("id").cast("int").as("i"),
      (col("id") * 1.5).as("d"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 7 === 0, lit(null).cast("string"))
        .otherwise(lit("x")).as("maybe"),
      (col("id") % 2 === 0).as("b"),
      col("id").cast("decimal(12,2)").as("dec"))
      .repartition(4)
    // batchRows=300 → ~5 flush/commit cycles per partition writer
    JdbcBatchSink.write(df, url, "t", batchRows = 300)

    val conn = JdbcBatchSink.connect(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT count(*), count(DISTINCT id), sum(i), min(s), " +
          "count(*) FILTER (WHERE maybe IS NULL), " +
          "sum(CASE WHEN b THEN 1 ELSE 0 END), sum(dec) FROM t")
      assert(rs.next())
      assert(rs.getLong(1) === 5000L)
      assert(rs.getLong(2) === 5000L) // no row lost or duplicated
      assert(rs.getLong(3) === (0L until 5000L).sum)
      assert(rs.getString(4) === "s0")
      assert(rs.getLong(5) === (0 until 5000 by 7).size.toLong)
      assert(rs.getLong(6) === 2500L)
      assert(rs.getBigDecimal(7).longValue() === (0L until 5000L).sum)
    } finally conn.close()
  }

  test("append semantics: a second write adds rows, schema unchanged") {
    val url = freshUrl()
    val df = spark.range(0, 10).select(col("id"), lit("a").as("tag"))
    JdbcBatchSink.write(df, url, "t")
    JdbcBatchSink.write(df, url, "t")
    val conn = JdbcBatchSink.connect(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT count(*) FROM t")
      assert(rs.next() && rs.getLong(1) === 20L)
    } finally conn.close()
  }

  test("schema evolution: a new column is ALTERed in, old rows read NULL") {
    val url = freshUrl()
    val v1 = spark.range(0, 50).select(col("id"), lit("old").as("tag"))
    JdbcBatchSink.write(v1, url, "t")
    val v2 = spark.range(50, 80).select(col("id"), lit("new").as("tag"),
      (col("id") * 2.0).as("extra"))
    JdbcBatchSink.write(v2, url, "t")
    val conn = JdbcBatchSink.connect(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT count(*), count(extra), sum(extra), " +
          "count(*) FILTER (WHERE tag = 'old' AND extra IS NULL) FROM t")
      assert(rs.next())
      assert(rs.getLong(1) === 80L)
      assert(rs.getLong(2) === 30L) // only v2 rows carry extra
      assert(rs.getDouble(3) === (50 until 80).map(_ * 2.0).sum)
      assert(rs.getLong(4) === 50L) // every old row reads NULL
    } finally conn.close()
    // a SHRUNK frame still inserts (missing table columns untouched)
    val v3 = spark.range(80, 90).select(col("id"), lit("slim").as("tag"))
    JdbcBatchSink.write(v3, url, "t")
    val c2 = JdbcBatchSink.connect(url)
    try {
      val rs = c2.createStatement().executeQuery(
        "SELECT count(*) FILTER (WHERE tag = 'slim' AND extra IS NULL) FROM t")
      assert(rs.next() && rs.getLong(1) === 10L)
    } finally c2.close()
  }

  test("schema evolution: type drift on a shared column throws, loudly") {
    val url = freshUrl()
    JdbcBatchSink.write(
      spark.range(0, 5).select(col("id"), lit("x").as("v")), url, "t")
    val drift = spark.range(0, 5).select(col("id"), (col("id") * 1.0).as("v"))
    val e = intercept[IllegalStateException] {
      JdbcBatchSink.evolveTable(url, "t", drift.schema)
    }
    assert(e.getMessage.contains("type drift"))
  }

  test("spark jdbc read-back matches what the sink wrote (q198 path)") {
    val url = freshUrl()
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 10).cast("int").as("k"))
    JdbcBatchSink.write(df, url, "t", batchRows = 128)
    JdbcBatchSink.ensureDialect()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "t")
      .option("driver", "org.duckdb.DuckDBDriver").load()
    assert(back.count() === 1000L)
    assert(back.agg(sum("id")).head.getLong(0) === (0L until 1000L).sum)
    assert(back.schema.map(_.name) === Seq("id", "k"))
    // the dialect must pin exact signed widths — without it DuckDB's
    // unsigned metadata widened BIGINT to DECIMAL(20,0) and INT to BIGINT
    assert(back.schema.map(_.dataType.simpleString) === Seq("bigint", "int"))
  }

  test("writeSharded round-robins partitions across shard nodes, no row lost") {
    val dir = Files.createTempDirectory("jdbc_shard_spec")
    val urls = Seq(s"jdbc:duckdb:${dir.resolve("s0.db")}",
      s"jdbc:duckdb:${dir.resolve("s1.db")}")
    val df = spark.range(0, 4000)
      .select(col("id"), (col("id") % 97).as("k"))
      .repartition(4, col("k"))
    JdbcBatchSink.writeSharded(df, urls, "t", batchRows = 300)
    val counts = urls.map { u =>
      val conn = JdbcBatchSink.connect(u)
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT count(*), count(DISTINCT id) FROM t")
        assert(rs.next()); (rs.getLong(1), rs.getLong(2))
      } finally conn.close()
    }
    // 4 partitions over 2 nodes → both shards hold data (round-robin,
    // not all-on-one), every row lands exactly once, union is complete
    counts.foreach { case (n, _) => assert(n > 0, s"empty shard: $counts") }
    assert(counts.map(_._1).sum === 4000L)
    assert(counts.map(_._2).sum === 4000L) // distinct per shard sums too
  }

  test("chaos: mid-write shard failure is at-least-once; keyed dedup on read") {
    // one shard rejects a row MID-write (after earlier flushes already
    // committed): the documented semantics are AT-LEAST-ONCE — the job
    // fails loudly, committed flushes stand, a full replay duplicates
    // them, and a keyed dedup on read restores exactness (the T8
    // checkpoint-replay model). The poison is a DECIMAL(4,0) target
    // column receiving 99999 — binding succeeds, the DATABASE rejects
    // the flush, exactly the shape of a node hard-failing a batch.
    val dir = Files.createTempDirectory("jdbc_chaos_spec")
    val urls = Seq(s"jdbc:duckdb:${dir.resolve("s0.db")}",
      s"jdbc:duckdb:${dir.resolve("s1.db")}")
    // pre-create with the NARROW column so the sink's CREATE IF NOT
    // EXISTS (from the frame's wider decimal) is a no-op
    urls.foreach { u =>
      val conn = JdbcBatchSink.connect(u)
      try conn.createStatement()
        .execute("""CREATE TABLE "t" ("id" BIGINT, "d" DECIMAL(4,0))""")
      finally conn.close()
    }
    val base = spark.range(0, 40)
      .select(col("id"), (col("id") % 9).cast("decimal(5,0)").as("d"))
    def withTail(tail: Long) = base.unionByName(
        Seq(40L -> tail).toDF("id", "v")
          .select(col("id"), col("v").cast("decimal(5,0)").as("d")))
      .repartition(2, col("id"))
      .sortWithinPartitions("id") // poison (max id) flushes LAST
    val poisoned = withTail(99999L)
    val good = withTail(9999L)
    val thrown = intercept[Exception] {
      JdbcBatchSink.writeSharded(poisoned, urls, "t",
        batchRows = 2, flushMs = 600000L)
    }
    assert(thrown.getMessage != null)
    def readAll() = urls.map { u =>
      val conn = JdbcBatchSink.connect(u)
      try {
        val rs = conn.createStatement()
          .executeQuery("""SELECT "id", "d" FROM "t"""")
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        while (rs.next()) buf += ((rs.getLong(1), rs.getBigDecimal(2).longValue()))
        buf.toSeq
      } finally conn.close()
    }.reduce(_ ++ _)
    val afterFailure = readAll()
    // committed flushes stand: the healthy shard's partition (and the
    // poisoned partition's pre-poison flushes) are visible
    assert(afterFailure.nonEmpty, "no flush committed before the failure")
    assert(afterFailure.size < 41, "failed write must not be complete")
    // the replay (corrected batch, the T8 model) completes — and now
    // the first attempt's committed flushes are DUPLICATED: at-least-once
    JdbcBatchSink.writeSharded(good, urls, "t",
      batchRows = 2, flushMs = 600000L)
    val afterReplay = readAll()
    assert(afterReplay.size === afterFailure.size + 41)
    // keyed dedup on read restores exactness
    val expected = good.collect()
      .map(r => (r.getLong(0), r.getDecimal(1).longValue())).toSet
    assert(afterReplay.toSet === expected)
    assert(afterReplay.distinct.size === 41)
  }

  test("transient flush failure retries with the rows intact (no silent drop)") {
    // JDBC clears the batch even when executeBatch FAILS — a naive
    // retry would commit an empty batch and silently drop the flush.
    // Simulate a transient conflict with a CONCURRENT writer holding
    // the duckdb write lock... not reachable deterministically from
    // in-process JDBC, so assert the observable contract instead: a
    // PERMANENT failure propagates (nothing silently succeeds) and the
    // committed prefix is intact — no partial batch, no dropped rows.
    val url = freshUrl()
    val conn0 = JdbcBatchSink.connect(url)
    try conn0.createStatement()
      .execute("""CREATE TABLE "t" ("id" BIGINT, "d" DECIMAL(4,0))""")
    finally conn0.close()
    val df = spark.range(0, 9)
      .select(col("id"),
        when(col("id") === 8, lit(99999L)).otherwise(col("id"))
          .cast("decimal(5,0)").as("d"))
      .coalesce(1).sortWithinPartitions("id")
    val e = intercept[Exception] {
      JdbcBatchSink.write(df, url, "t", batchRows = 3, flushMs = 600000L)
    }
    assert(e.getMessage != null)
    val conn = JdbcBatchSink.connect(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("""SELECT count(*), coalesce(max("id"), -1) FROM "t"""")
      assert(rs.next())
      // flushes 1 and 2 (ids 0..5) committed; the poisoned third flush
      // rolled back WHOLE — ids 6,7 must not appear without 8
      assert(rs.getLong(1) === 6L)
      assert(rs.getLong(2) === 5L)
    } finally conn.close()
  }

  test("unsupported column types fail loudly at the sink boundary") {
    val url = freshUrl()
    val df = spark.range(0, 3).select(array(col("id")).as("a"))
    val e = intercept[IllegalArgumentException] {
      JdbcBatchSink.write(df, url, "t")
    }
    assert(e.getMessage.contains("unsupported column type"))
  }
}
