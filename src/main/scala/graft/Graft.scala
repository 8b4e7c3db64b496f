package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** One-call user facade: a reference user points this at a data directory
  * and gets SQL views over every table plus the engine's function family
  * (`pq_score_*`, `rolling_hash`) — then works entirely in `spark.sql` or
  * the operator APIs.
  */
object Graft {

  /** Register every testdata table as a temp view + all engine functions. */
  def init(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    GraftFunctions.register(spark)
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
