package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.ArrayDot.array_dot

/** ArrayDot must be bit-identical to the HOF formulation it replaced —
  * the gate hashes depend on it — in BOTH evaluation modes (interpreted
  * eval and generated code). */
class ArrayDotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(transform(a, _.cast("double")), transform(b, _.cast("double")),
        (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  test("array_dot equals the HOF fold bit-for-bit on float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), array_dot(col("a"), col("b")).as("d"),
        hofDot(col("a"), col("b")).as("h"))
      .withColumn("eq", col("d") === col("h") ||
        (col("d").isNull && col("h").isNull))
    assert(got.filter(!col("eq")).count() === 0)
    // sanity: values are real dot products, not all zero
    assert(got.filter(abs(col("d")) > 0.1).count() > 100)
  }

  test("null contract: null array, null element, length mismatch") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, null, Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (4L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        array_dot(col("a"), col("b")).as("d"),
        hofDot(col("a"), col("b")).as("h"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) === 11.0)
    (0 until 4).foreach { i =>
      assert(out(i).isNullAt(1) === out(i).isNullAt(2),
        s"row ${i + 1}: ArrayDot null-ness differs from HOF")
    }
  }

  test("codegen path actually compiles (CODEGEN_ONLY factory mode)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((Array(1.0f, 2.0f), Array(0.5f, 0.25f))).toDF("a", "b")
      val v = df.select(array_dot(col("a"), col("b")).as("d"))
        .collect()(0).getDouble(0)
      assert(v === (1.0f * 0.5f + 2.0f * 0.25f: Double))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("q38's LSH pair plan compiles clean — no silent codegen fallback") {
    // cosineCols inlines three dots (a·b, a·a, b·b) into one generated
    // method; doGenCode locals must come from ctx.freshName or janino
    // rejects the method ("Redefinition of local variable __n") and the
    // stage SILENTLY drops to interpreted eval — the pre-fix bench paid
    // 20 such failures and 6–12 CPU-s per 0.5 MB stage, all attributed
    // to q38's bucket self-join. Compile failure is logged, not thrown,
    // so the guard watches the CodeGenerator logger while the real
    // gated query runs.
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender("graft-codegen-watch", null, null,
        true, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.ERROR))
          errors.add(String.valueOf(e.getMessage.getFormattedMessage))
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val loggerName =
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
    val lc = cfg.getLoggerConfig(loggerName)
    lc.addAppender(appender, Level.ERROR, null)
    try {
      val q = graft.queries.Registry.all
        .find(_.name == "q38_embedding_near_dup_lsh").get
      assert(q.run(spark, "/root/testdata/sf0.001").count() > 0)
      val bad = scala.jdk.CollectionConverters.CollectionHasAsScala(errors)
        .asScala.filter(_.contains("Failed to compile"))
      assert(bad.isEmpty,
        s"codegen compile failures during q38: ${bad.take(2).mkString("; ")}")
    } finally {
      lc.removeAppender("graft-codegen-watch")
      appender.stop()
    }
  }
}
