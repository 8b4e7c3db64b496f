package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4; the "hot key" problem at 100 TB).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one join/grouping key dominates so badly
  * that even split partitions won't fit (a single probe or task id holding
  * a double-digit percentage of the stream).
  *
  *  - [[saltedJoin]]: fact rows get a deterministic salt in [0, n); the
  *    dim side is replicated n× with every salt value; the join key
  *    becomes (key, salt) so one hot key spreads across n partitions.
  *    Result is row-identical to the unsalted join.
  *  - [[saltedAgg]]: two-phase aggregation through a salted intermediate
  *    key — for algebraic aggregates (sum/count/min/max) where even
  *    map-side partial aggregation leaves one hot reduce partition.
  */
object SkewTools {

  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
      saltN: Int, joinType: String = "inner"): DataFrame = {
    // deterministic salt from the full fact row (replay-stable, unlike
    // rand()); any well-spread hash works
    val salt = pmod(hash(facts.columns.map(col): _*), lit(saltN))
    val f = facts.withColumn("__salt", salt)
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    f.join(d, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Join-key skew PROFILE — the detection half of the detect-then-salt
    * loop ([[saltedJoin]] is the cure): per key column, the row count,
    * distinct keys, the heaviest key's count, the exact p99 of per-key
    * counts, and `skew_ratio` = max_count / (rows / distinct) — how many
    * times heavier the hottest partition is than a uniform spread. One
    * map-side-combined count aggregation per key (vocab-bounded), then a
    * 5-number summary of the counts — cheap enough to run on every
    * ingest and gate joins on. */
  def skewProfile(relation: String, df: DataFrame, keyCol: String,
      scale: Int = 4): DataFrame = {
    import graft.functions.SafeMath
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    counts.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_key_rows"),
        SafeMath.roundHalfUp(percentile(col("n"), lit(0.99)), scale)
          .as("p99_key_rows"))
      .select(lit(relation).as("relation"), col("n_rows"), col("n_keys"),
        col("max_key_rows"), col("p99_key_rows"),
        SafeMath.roundHalfUp(
          col("max_key_rows").cast("double") /
            (col("n_rows").cast("double") / col("n_keys").cast("double")),
          scale).as("skew_ratio"))
  }

  /** PARTIAL (hot-key-only) salting — the production refinement of
    * [[saltedJoin]], closing the detect-then-salt loop [[skewProfile]]
    * opens: count the fact side's keys, pull back only those above
    * `hotThreshold` (a BOUNDED driver read — at most rows/hotThreshold
    * keys can exceed the threshold, by construction), and salt ONLY
    * them. Cold keys join on (key, 0) with zero dim replication; hot
    * keys spread across saltN partitions with the dim replicated saltN×
    * FOR THE HOT KEYS ALONE — dim bloat is |hotKeys|·saltN rows instead
    * of [[saltedJoin]]'s |dim|·saltN, which is what makes salting
    * affordable when the dim itself is large. Row-identical to the
    * plain join (inner and left alike: every fact row carries exactly
    * one salt, and its dim key exists at every salt value). */
  def hotKeySaltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltN: Int, hotThreshold: Long,
      joinType: String = "inner"): DataFrame = {
    // saltN <= 1 means "don't salt" — short-circuit to the plain join.
    // (sequence(1, saltN-1) at saltN=1 is the [1,0] trap: Spark infers a
    // NEGATIVE step for sequence(1, 0), so hot dim rows would replicate
    // at salts 1 AND 0 and the join would silently emit duplicates.)
    if (saltN <= 1) return facts.join(dim, Seq(key), joinType)
    val hot = facts.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      // ≤ |facts| / hotThreshold rows by pigeonhole — a handful of keys
      // for any threshold worth salting, bounded by construction
      .select(col(key)).collect().map(_.get(0))
    if (hot.isEmpty) return facts.join(dim, Seq(key), joinType)
    val saltF = when(col(key).isin(hot: _*),
      pmod(hash(facts.columns.map(col): _*), lit(saltN))).otherwise(lit(0))
    val f = facts.withColumn("__salt", saltF)
    val d = dim.withColumn("__salt", lit(0)).unionByName(
      dim.filter(col(key).isin(hot: _*))
        .withColumn("__salt", explode(sequence(lit(1), lit(saltN - 1)))))
    f.join(d, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted sum/count: partial per (keys, salt), final per keys.
    * `sumCols` are summed, plus a `n_rows` count. */
  def saltedAgg(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      saltN: Int): DataFrame = {
    val salt = pmod(hash(df.columns.map(col): _*), lit(saltN))
    val partial = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sumCols.map(c => sum(col(c)).as(s"__s_$c")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        sumCols.map(c => sum(col(s"__s_$c")).as(s"sum_$c")): _*)
  }
}
