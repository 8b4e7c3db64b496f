package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Mergeable sketch structures for corpus statistics at 100 TB. The hash
  * family is the md5-derived 60-bit fold ([[TextFunctions.md5Key60]]), so
  * sketches are deterministic across engines, partitionings, and replays
  * — a DuckDB oracle reproduces the exact counters, and two sketches
  * built on different clusters merge by summing counters.
  */
object Sketches {

  /** Count-min sketch over a token column: `depth` hash rows × `width`
    * counters. One explode (×depth) + one (row, bucket) aggregation with
    * full map-side combine — output is depth×width rows regardless of
    * corpus size, and sketches MERGE by summing counters (the algebraic-
    * aggregate property [[IncrementalAgg.merge]] exploits). */
  def cmSketch(tokens: DataFrame, tokCol: String, width: Int = 1024,
      depth: Int = 4, salt: String = "graft-cms"): DataFrame = {
    val rows = explode(array((0 until depth).map(lit): _*)).as("j")
    tokens.select(col(tokCol).as("__t"), rows)
      .select(col("j"),
        (TextFunctions.md5Key60(
          concat(lit(salt), col("j"), col("__t"))) % width).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Point estimate for each query term: min over the depth rows of the
    * term's counter — ≥ the true count, with the classic CM overestimate
    * bound. The sketch side is tiny (depth×width) → broadcast join. */
  def cmsEstimate(sketch: DataFrame, terms: Seq[String], width: Int = 1024,
      depth: Int = 4, salt: String = "graft-cms"): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val q = terms.toDF("term")
      .select(col("term"), explode(array((0 until depth).map(lit): _*)).as("j"))
      .select(col("term"), col("j"),
        (TextFunctions.md5Key60(
          concat(lit(salt), col("j"), col("term"))) % width).as("bucket"))
    q.join(sketch, Seq("j", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
