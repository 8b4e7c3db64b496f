package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Settings mirror what we would submit to a 1000-executor cluster, minus the
  * cluster manager bits: AQE on (runtime coalescing + skew-join splitting),
  * shuffle partitions sized to the parallelism at hand (32 locally — on a
  * real cluster this is `max(2×cores, input_bytes / 128MB)`), UTC session
  * timezone pinned so time-bucket semantics are deterministic (the reference
  * used the JVM default TZ — SURVEY.md §2.8 F3).
  */
object GraftSession {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
