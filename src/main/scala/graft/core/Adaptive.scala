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

  /** Run `body` with arbitrary session confs set, restoring (or
    * unsetting) them on exit. */
  def withConf[T](spark: SparkSession, kv: (String, String)*)(body: => T): T = {
    val prev = kv.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Run `body` with AQE allowed to coalesce post-shuffle partitions
    * BELOW defaultParallelism (`parallelismFirst=false`): the SETUP
    * stages of an iterative operator (initial distinct/count of an
    * uncounted graph) can't use [[partsFor]] — the count doesn't exist
    * yet — so without this they pay defaultParallelism near-empty tasks
    * per shuffle. With it, AQE sizes those stages to the measured
    * shuffle bytes: a tiny bench graph collapses to 1 task, a
    * billion-edge graph keeps its width (bytes-targeted, 64 MB
    * advisory) — the adaptive setup twin of the counted-loop pinning. */
  def withSmallShuffleCoalesce[T](spark: SparkSession)(body: => T): T =
    withConf(spark,
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      // a small advisory target (not the 64 MB default): these scopes
      // hold graph-setup shuffles whose rows are CPU-dense relative to
      // their bytes (string dedup ~2 µs/row) — 64 MB targets would
      // serialize several cpu-seconds onto one task, 256 KB keeps
      // ~10-way parallelism per shuffled MB while still collapsing the
      // truly tiny iteration-state stages to one task
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k",
      // persisted plans keep their exchanges outside AQE's reach unless
      // this is on — and the iterative setup frames are persisted, so
      // without it the coalesce above never fires on exactly the stages
      // it exists for (measured: the distinct/count setup stayed at 32
      // near-empty tasks)
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true"
    )(body)

  /** Run `body` with AQE OFF. For the PINNED-WIDTH loop of an iterative
    * operator ([[withShufflePartitions]] around [[partsFor]]) AQE has
    * nothing left to decide — the width is already data-proportional and
    * every loop input is a localCheckpoint at that width — but it still
    * splits each round into one JOB PER SHUFFLE STAGE (materialize,
    * re-optimize, continue), and on a small iteration state those extra
    * driver round-trips ARE the cost (q103: ~25 jobs for 3 rounds,
    * ~40 ms floor each). With AQE off each round compiles once and runs
    * as one job. Big graphs lose nothing: the loop width is already
    * counted, skew inside a pinned loop is bounded by the graph's own
    * key distribution, and the setup stages (which DO need adaptive
    * coalescing) stay under [[withSmallShuffleCoalesce]]. */
  def withNoAqe[T](spark: SparkSession)(body: => T): T =
    withConf(spark, "spark.sql.adaptive.enabled" -> "false")(body)
}
