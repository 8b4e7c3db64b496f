package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Runtime Bloom-filter semi-join reduction — the "runtime filter" every
  * large-scale warehouse join leans on (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` and parquet's split-block
  * bloom headers are the same idea): when a selective dimension joins a
  * huge fact table, build a compact bit-set of the dimension's join keys
  * and push it into the fact SCAN as a pure projection predicate, so
  * non-matching fact rows die at the scan instead of travelling through
  * the shuffle. At 100 TB the join's dominant cost is shuffling fact rows
  * that will not survive the join — the reduction removes (1 − fp) of
  * them for the price of k hash evaluations per row.
  *
  * The filter is the portable [[Sketches.bloomBuild]] (md5 family,
  * low-32-bits-per-word layout), so the reduction is deterministic and
  * reduced queries hash-gate (q201). No false negatives — the reduced
  * join result is IDENTICAL to the unfiltered join; false positives only
  * cost shuffle volume at the standard (1 − e^(−kn/m))^k rate.
  *
  * Scale: the collected filter is mBits/32 longs (16 KB at the
  * 262144-bit default) REGARDLESS of build-side cardinality — the one
  * driver-side materialization is bounded by the sketch size, not the
  * data (same discipline as the percentile cutoffs and k-means
  * centroids). The word table enters the plan as ONE array Literal (a
  * single generated-code reference, never a thousands-element
  * CreateArray), and the probe predicate is k codegen'd md5 evaluations
  * per row.
  */
object JoinReduction {

  /** Filter `probe` down to rows whose `keyCol` might appear in
    * `build`'s `buildKeyCol` (NULL keys are removed too — an inner join
    * drops them anyway). Chain `.join(build, ...)` after this for the
    * reduced join; results are identical to joining the unfiltered
    * probe. */
  def bloomPrefilter(probe: DataFrame, keyCol: String,
      build: DataFrame, buildKeyCol: String,
      mBits: Int = 262144, k: Int = 5,
      salt: String = "graft-bloom"): DataFrame = {
    val words = new Array[Long](mBits / 32)
    Sketches.bloomBuild(build.select(col(buildKeyCol)), buildKeyCol,
        mBits, k, salt)
      .collect() // ≤ mBits/32 rows — bounded by the sketch, not the data
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    val wordsLit = typedlit(words.toSeq)
    // probe-side bit tests: EXACTLY the bloomBuild arithmetic (same salt
    // prefix, same word/bit split) so a built bit is always found
    val pred = (0 until k).map { j =>
      val h = TextFunctions.md5Key60(
        concat(lit(salt), lit(j), col(keyCol).cast("string"))) % mBits
      call_function("shiftright",
          element_at(wordsLit, (h / 32).cast("int") + 1),
          (h % 32).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    probe.filter(col(keyCol).isNotNull && pred)
  }
}
