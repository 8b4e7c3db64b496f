package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star-schema tables (TESTDATA.md).
  *
  * All engine queries read these via `Tables.load` so the scan always goes
  * through the DataFrame reader (parquet → columnar scan with predicate
  * pushdown + column pruning). At cluster scale the same call resolves a
  * partitioned directory instead of a single file — no code change needed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // per-session memo of the ANALYZED read: `spark.read.parquet` builds a
  // fresh InMemoryFileIndex per call — a file-listing Spark job on every
  // query, every bench pass, for immutable inputs. A catalog table would
  // cache this metadata; the memo is that catalog. DataFrames reference
  // their session, so SessionMemo holds them SOFTLY — the cache can
  // never pin a dead session (review r10); a cleared entry just re-lists.
  private val loaded = new SessionMemo[String, DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.softGetOrElseUpdate(spark, s"$dir/$name") {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** `events` with a proper TimestampType `ts`.
    *
    * The driver data stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark does not read natively; with `nanosAsLong` it surfaces as a
    * LongType of epoch-nanos, which we convert via integer division (no
    * double round-trip — epoch-nanos exceed 2^53).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
}
