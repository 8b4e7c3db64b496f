package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.score.{PQDefaults, ScoreEngine}
import graft.score.ScoreEngine.Source
import graft.sources.FactWriter

/** SQL function surface + fact storage layout. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("pq_score functions callable from spark.sql, equal to Column API") {
    GraftFunctions.register(spark)
    Seq((20.0, 0.005), (5000.0, 0.0), (100.0, 0.5))
      .toDF("rtt", "lost_rate").createOrReplaceTempView("pings")
    val viaSql = spark.sql("SELECT pq_score_ping(rtt, lost_rate) AS s FROM pings")
      .collect().map(_.getDouble(0)).toSeq
    val viaCol = spark.table("pings")
      .select(ScoreEngine.scoreFor(PQDefaults.config.byProtocol("PING"),
        n => Source(col(n), n)).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql === viaCol)
    assert(viaSql(1) === 0.0) // outlier via SQL path too
  }

  test("pq_score arity is validated with metric names in the error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT pq_score_ping(1.0)").collect()
    }
    assert(e.getMessage.contains("rtt") || e.getCause.getMessage.contains("rtt"))
  }

  test("extensions class registers the full function family") {
    val names = GraftFunctions.functionNames()
    assert(names.contains("pq_score_http") && names.contains("pq_score_ftp"))
    assert(GraftFunctions.injections(PQDefaults.config).size === names.size)
  }

  test("Graft.init: SQL over tables + engine functions in one call") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT COUNT(*) FROM lineitem").collect()(0).getLong(0)
    assert(n === 6000L)
    val scored = spark.sql(
      """SELECT pq_score_ping(value, 0.05) AS s, rolling_hash(event_type) AS h
         FROM events LIMIT 5""").collect()
    assert(scored.forall(r => r.getDouble(0) >= 0 && r.getDouble(0) <= 100))
    assert(scored.forall(r => r.getLong(1) > 0))
  }

  test("WindowedAgg API: tumbling/sliding/session shapes") {
    import graft.streaming.WindowedAgg
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val t = WindowedAgg.tumbling(ev, "ts", "1 hour", Seq("event_type"),
      Seq(count(lit(1)).as("n")))
    assert(t.columns.toSeq === Seq("window_start", "window_end", "event_type", "n"))
    assert(t.count() > 0)
    val sl = WindowedAgg.sliding(ev, "ts", "1 hour", "30 minutes", Seq.empty,
      Seq(count(lit(1)).as("n")))
    // sliding doubles the window rows vs tumbling of the same duration
    val tTotal = t.agg(sum(col("n"))).collect()(0).getLong(0)
    val slTotal = sl.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(slTotal === 2 * tTotal)
    val se = WindowedAgg.session(ev, "ts", "30 minutes", Seq("user_id"),
      Seq(count(lit(1)).as("n")))
    assert(se.columns.toSeq === Seq("window_start", "window_end", "user_id", "n"))
    assert(se.agg(sum(col("n"))).collect()(0).getLong(0) === ev.count())
  }

  test("text functions callable from spark.sql, equal to Column API") {
    import graft.functions.TextFunctions
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog."),
      (2L, "短い中文テキスト 混在 text"))
      .toDF("id", "text").createOrReplaceTempView("sqltext")
    val viaSql = spark.sql(
      """SELECT id, graft_token_count(text) AS n, graft_quality(text) AS q,
        graft_lang_id(text) AS l, graft_simhash(text) AS sh,
        graft_md5key(text) AS mk FROM sqltext""").collect()
    val viaCol = spark.table("sqltext").select(col("id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langId(col("text")).as("l"),
      graft.operators.Dedup.simhash(col("text")).as("sh"),
      TextFunctions.md5Key60(col("text")).as("mk")).collect()
    assert(viaSql.map(_.toSeq).toSeq === viaCol.map(_.toSeq).toSeq)
    assert(GraftFunctions.functionNames().contains("graft_quality"))
  }

  test("rolling_hash: eval == codegen == hand computation; SQL-registered") {
    import graft.expressions.RollingHash
    val df = Seq((1L, "abc"), (2L, ""), (3L, "the quick brown fox"))
      .toDF("id", "text")
    val got = df.select(col("id"), RollingHash.rolling_hash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand fold: ((0*31+97)%M*31+98)%M*31+99 % M
    val abc = (( (97L * 31 + 98) % 1000000007L) * 31 + 99) % 1000000007L
    assert(got(1L) === abc)
    assert(got(2L) === 0L)
    assert(got(3L) === RollingHash.hash("the quick brown fox"))
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("rh_docs")
    val viaSql = spark.sql("SELECT rolling_hash(text) AS h FROM rh_docs WHERE id = 1")
      .collect()(0).getLong(0)
    assert(viaSql === abc)
  }

  test("schema evolution: appended columns unify under mergeSchema read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-evo").toFile.getAbsolutePath
    Seq(("p1", 1L)).toDF("probe_id", "test_time")
      .write.mode("append").parquet(s"$tmp/t")
    Seq(("p2", 2L, 99.5)).toDF("probe_id", "test_time", "new_metric")
      .write.mode("append").parquet(s"$tmp/t")
    val merged = FactWriter.readEvolved(spark, s"$tmp/t")
      .select("probe_id", "test_time", "new_metric")
    val byId = merged.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byId("p1") === None && byId("p2") === Some(99.5))
  }

  test("salted join and salted agg equal their unsalted counterparts") {
    import graft.operators.SkewTools
    val facts = (1 to 200).map(i => (i % 3L, i.toLong, i * 1.5))
      .toDF("k", "row_id", "v") // key 0/1/2, heavily skewed by design
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unused"))
      .toDF("k", "name")
    val plain = facts.join(dim, Seq("k")).orderBy("row_id")
      .collect().map(_.toSeq).toSeq
    val salted = SkewTools.saltedJoin(facts, dim, Seq("k"), saltN = 7)
      .orderBy("row_id").collect().map(_.toSeq).toSeq
    assert(salted === plain)
    val aggPlain = facts.groupBy("k").agg(count(lit(1)), sum(col("v")))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val aggSalted = SkewTools.saltedAgg(facts, Seq("k"), Seq("v"), saltN = 7)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(aggSalted === aggPlain)
  }

  test("fact writer: day-partitioned, shard-clustered, prunable, expirable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-facts").toFile.getAbsolutePath
    val day0 = 1723420800L - (1723420800L % 86400)
    val facts = Seq(
      ("p1", 5L, day0, 100.0), ("p2", 6L, day0, 50.0),
      ("p1", 5L, day0 + 86400, 70.0))
      .toDF("probe_id", "task_param_id", "test_time_d", "score")
    FactWriter.write(facts, s"$tmp/gw", "test_time_d", "probe_id",
      Seq("task_param_id", "probe_id"), shards = 2)
    // partition dirs exist
    val dirs = new java.io.File(s"$tmp/gw").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet === Set(s"test_time_d=$day0", s"test_time_d=${day0 + 86400}"))
    // pruning: filter on the partition col reads one partition
    val pruned = spark.read.parquet(s"$tmp/gw").filter(col("test_time_d") === day0)
    assert(pruned.count() === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains(s"test_time_d=${day0 + 86400}"))
    // retention
    val expired = FactWriter.expiredPartitions(s"$tmp/gw", "test_time_d", day0 + 1)
    assert(expired.length === 1 && expired.head.contains(s"test_time_d=$day0"))
  }

  test("deleteSubjects rewrites only touched partitions; untouched files stay byte-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-del")
      .toFile.getAbsolutePath
    // d=a holds subjects+others, d=b holds none, d=c holds ONLY subjects
    val facts = Seq(
      (1L, "a", "x1"), (2L, "a", "x2"), (3L, "a", "x3"),
      (4L, "b", "x4"), (5L, "b", "x5"),
      (1L, "c", "x6"), (2L, "c", "x7"))
      .toDF("k", "d", "payload")
    facts.write.mode("overwrite").partitionBy("d").parquet(s"$tmp/fact")
    def files(p: String) =
      Option(new java.io.File(s"$tmp/fact/d=$p").listFiles())
        .map(_.filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap)
    val bBefore = files("b")
    val subjects = Seq(1L, 2L).toDF("subject")
    val report = FactWriter.deleteSubjects(spark, s"$tmp/fact", "d", "k",
      subjects, "subject")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // untouched partition b: absent from the report, files unmodified
    assert(report === Map("a" -> ((3L, 2L, 1L)), "c" -> ((2L, 2L, 0L))))
    assert(files("b") === bBefore, "partition b must not be rewritten")
    // fully-emptied partition c is dropped from storage
    assert(!new java.io.File(s"$tmp/fact/d=c").exists())
    val after = spark.read.parquet(s"$tmp/fact")
    assert(after.select("k", "d").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet ===
      Set((3L, "a"), (4L, "b"), (5L, "b")))
    // idempotent: a second run is a no-op with an empty report
    val again = FactWriter.deleteSubjects(spark, s"$tmp/fact", "d", "k",
      subjects, "subject")
    assert(again.count() === 0L)
    assert(after.count() === 3L)
  }

  test("compactPartitions resolves last-write-wins into ONE file per partition") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
      .toFile.getAbsolutePath
    val v1 = Seq((1L, "a", 1L, "old1"), (2L, "a", 1L, "old2"),
      (3L, "b", 1L, "old3")).toDF("k", "d", "ver", "payload")
    val v2 = Seq((1L, "a", 2L, "new1"), (3L, "b", 2L, "new3"))
      .toDF("k", "d", "ver", "payload")
    v1.repartition(3).write.mode("overwrite").partitionBy("d")
      .parquet(s"$tmp/fact")
    v2.repartition(2).write.mode("append").partitionBy("d")
      .parquet(s"$tmp/fact")
    val report = FactWriter.compactPartitions(spark, s"$tmp/fact", "d",
      Seq("k"), versionOrder = Seq(col("ver").desc),
      clusterCols = Seq(col("k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(report === Map("a" -> ((3L, 1L, 2L)), "b" -> ((2L, 1L, 1L))))
    // storage state: latest versions survived, one file per partition
    val after = spark.read.parquet(s"$tmp/fact")
    assert(after.select("k", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "new1"), (2L, "old2"), (3L, "new3")))
    Seq("a", "b").foreach { p =>
      val files = new java.io.File(s"$tmp/fact/d=$p").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"partition $p should compact to 1 file")
    }
    // idempotent: recompacting finds no duplicates
    val again = FactWriter.compactPartitions(spark, s"$tmp/fact", "d",
      Seq("k"), Seq(col("ver").desc), Seq(col("k")))
    assert(again.collect().map(_.getLong(2)).sum === 0L)
  }
}
