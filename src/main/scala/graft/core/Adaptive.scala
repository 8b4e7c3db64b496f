package graft.core

import org.apache.spark.sql.SparkSession

/** Data-proportional shuffle sizing for iterative operators.
  *
  * AQE's partition coalescing honors `parallelismFirst` (Spark's
  * default), which floors post-shuffle partition counts at
  * defaultParallelism — the right call for one-shot scans, but an
  * iterative operator whose state frame holds a few thousand rows then
  * pays ~32 near-empty tasks per stage, several stages per round, every
  * round (measured: ~100 ms of fixed per-task cost dominating the
  * pagerank/connected-components benches). These helpers pin
  * `spark.sql.shuffle.partitions` to the COUNTED size of the iteration
  * state for the duration of the loop (and only the loop), so a small
  * graph iterates on one partition while a 10^9-edge one keeps the
  * session default untouched — the adaptive choice AQE declines to make
  * below defaultParallelism.
  *
  * The conf mutation is session-visible while `body` runs (restored in
  * `finally`): fine for the sequential Verify/Bench drivers; sessions
  * running concurrent queries should schedule iterative ops accordingly.
  */
object Adaptive {

  /** Partition count for `rows` rows of iteration state: at most the
    * session's configured shuffle width (big data keeps its tuning), at
    * least 1, targeting `rowsPerPartition` thin rows per task. */
  def partsFor(spark: SparkSession, rows: Long,
      rowsPerPartition: Long = 100000L): Int = {
    val cur = spark.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(1, math.min(cur.toLong,
      (rows + rowsPerPartition - 1) / rowsPerPartition).toInt)
  }

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `parts`;
    * plans COMPILED inside pick it up, the previous value is restored on
    * exit (also on failure). */
  def withShufflePartitions[T](spark: SparkSession, parts: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, parts.toString)
    try body finally spark.conf.set(key, prev)
  }
}
