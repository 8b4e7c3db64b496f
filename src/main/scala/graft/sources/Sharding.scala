package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Consistent-hash shard assignment with virtual nodes — the key→shard
  * rule that makes adding a storage/sink node move only ~1/(S+1) of the
  * keys instead of rehashing everything (the `key % S` failure mode: S→
  * S+1 remaps nearly every key, invalidating caches and forcing a full
  * data movement). Each shard owns `vnodes` pseudo-random ring tokens;
  * a key belongs to the first ring token ≥ its own token (wrapping).
  * Tokens come from the engine-portable md5Key60, so the DuckDB oracle
  * computes the identical ring and assignment.
  *
  * Scale shape: the ring is CONFIG-sized (shards × vnodes, typically
  * hundreds) and embeds as array literals — assignment is a pure
  * projection, zero shuffle, one md5 per row (bound once; the ring
  * probe is a suffix count over the sorted literal array). For rings
  * beyond ~10⁴ tokens the linear probe should become a native
  * binary-search expression (the ArrayDot precedent); at config scale
  * the probe is noise next to the md5.
  */
object Sharding {

  /** Driver-side twin of [[TextFunctions.md5Key60]]: first 15 md5 hex
    * chars as a 60-bit BIGINT. */
  def token60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** The sorted ring: `vnodes` tokens per shard, ascending. */
  def ring(shards: Seq[String], vnodes: Int): Seq[(Long, String)] = {
    require(shards.nonEmpty && vnodes > 0)
    val r = for (s <- shards; v <- 0 until vnodes)
      yield (token60(s"ring-$s-$v"), s)
    require(r.map(_._1).distinct.size == r.size,
      "ring token collision — change vnode count or shard names")
    r.sortBy(_._1)
  }

  /** Shard-of-key expression over a prebuilt ring: first token ≥
    * md5Key60("key-" ++ key), wrapping to the smallest. The key token
    * is let-bound (bindOnce) so the md5 runs ONCE per row, not once per
    * ring element inside the filter lambda. */
  def shardOf(key: Column, ringTokens: Seq[(Long, String)]): Column = {
    val toks = array(ringTokens.map(t => lit(t._1)): _*)
    val names = array(ringTokens.map(t => lit(t._2)): _*)
    val n = ringTokens.size
    TextFunctions.bindOnce(
      TextFunctions.md5Key60(concat(lit("key-"), key.cast("string")))) {
      kt =>
        val ge = size(filter(toks, t => t >= kt))
        element_at(names, when(ge === 0, lit(1))
          .otherwise(lit(n) - ge + 1))
    }
  }

  /** Rebalance report for a ring change: per (from_shard, to_shard) key
    * counts — the consistent-hash guarantee is that every row with
    * from ≠ to lands on a NEWLY added shard (tested in ShardingSpec).
    * One projection + one small keyed aggregate. */
  def rebalanceReport(keys: DataFrame, keyCol: String,
      before: Seq[(Long, String)], after: Seq[(Long, String)]): DataFrame =
    keys.select(
      shardOf(col(keyCol), before).as("from_shard"),
      shardOf(col(keyCol), after).as("to_shard"))
      .groupBy(col("from_shard"), col("to_shard"))
      .agg(count(lit(1)).as("n"))
}
