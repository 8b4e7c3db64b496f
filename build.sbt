ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nqsconsoleflinkwindowspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// DuckDB's JDBC driver, straight from the pre-warmed LOCAL coursier
// cache as an unmanaged jar (no resolver involvement — offline-safe,
// zero egress): it backs the q198 gate and spec for the pure-java.sql
// JdbcBatchSink with a real embedded database. Located by glob so no
// repository layout is hardcoded; when absent everything still
// compiles — only the gate/spec would fail.
def duckdbJdbcJar: Seq[Attributed[File]] = {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  (cache ** "duckdb_jdbc-1.0.0.jar").get().headOption.toSeq.map(Attributed.blank)
}
Runtime / unmanagedJars ++= duckdbJdbcJar
Test / unmanagedJars ++= duckdbJdbcJar
// OPT-IN Kafka integration profile: `sbt -Dgraft.kafka=true ...` adds the
// Structured Streaming Kafka connector (+ its kafka-clients transitive) so
// KafkaIO.source/sink bind to a real broker. Deliberately NOT on by
// default: this sandbox has zero egress, so the artifact cannot resolve
// here — KafkaIO.messageSource transparently falls back to the file
// source and every downstream stage is exercised on real wire bytes
// (KafkaIOSpec). On a networked build the flag turns the one untested
// seam (the socket itself) into a live integration target.
libraryDependencies ++= (
  if (sys.props.get("graft.kafka").exists(_.toBoolean))
    Seq(
      "org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2",
      // embedded KRaft broker for the integration spec (server + tools;
      // version pinned to the connector's kafka-clients line)
      "org.apache.kafka" %% "kafka" % "3.9.0" % Test)
  else Seq())
// The Kafka integration spec lives in its own source dir, compiled ONLY
// under the profile: in this sandbox the connector/broker artifacts can't
// resolve (zero egress), so the spec must not even be compiled here — on
// a networked build `sbt -Dgraft.kafka=true test` picks it up and drives
// a real format("kafka") round-trip through KafkaIO (verdict r09 item 4).
Test / unmanagedSourceDirectories ++= (
  if (sys.props.get("graft.kafka").exists(_.toBoolean))
    Seq(baseDirectory.value / "src" / "test-kafka" / "scala")
  else Seq())
// OPT-IN ClickHouse integration profile: `sbt -Dgraft.clickhouse=true ...`
// adds the real ClickHouse JDBC driver + a testcontainer so
// ClickhouseIntegrationSpec can verify the DIALECT surface of
// JdbcBatchSink (Nullable(T)/DateTime mapping, ENGINE ddlSuffix,
// evolveTable's ALTER semantics) against the engine the reference sink
// actually targets. Same zero-egress story as the Kafka profile: the
// artifacts/image can't resolve here, so both the deps and the source
// dir are gated off by default.
libraryDependencies ++= (
  if (sys.props.get("graft.clickhouse").exists(_.toBoolean))
    Seq(
      ("com.clickhouse" % "clickhouse-jdbc" % "0.6.5" % Test)
        .classifier("all"),
      "org.testcontainers" % "clickhouse" % "1.20.1" % Test)
  else Seq())
Test / unmanagedSourceDirectories ++= (
  if (sys.props.get("graft.clickhouse").exists(_.toBoolean))
    Seq(baseDirectory.value / "src" / "test-clickhouse" / "scala")
  else Seq())
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
