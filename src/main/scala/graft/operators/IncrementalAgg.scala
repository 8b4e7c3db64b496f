package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a materialized aggregate
  * current by aggregating ONLY a new slice and merging it with the
  * stored aggregate — the pattern that turns a daily 100 TB
  * re-aggregation into "aggregate one day + merge two small agg tables".
  *
  * Works for ALGEBRAIC aggregates only: counts and sums re-aggregate by
  * summing partials (sums carried as DECIMAL so the merge is exact and
  * order-independent); min/max by min/max. Derived values (mean, rate)
  * must be computed at read time from the carried partials, never
  * merged. The merged result is bit-identical to a full recompute —
  * which is exactly what the q86 gate asserts via the DuckDB oracle.
  */
object IncrementalAgg {

  /** Merge a stored aggregate with a delta aggregate over the same
    * schema: `keys` ++ partial columns, where every partial column is
    * summable (COUNT partials as LONG, SUM partials as DECIMAL). One
    * shuffle over the two (small) agg tables — the raw data is not
    * touched. */
  def merge(prev: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val partials = prev.columns.filterNot(keys.contains)
    prev.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(partials.head -> "sum", partials.tail.map(_ -> "sum"): _*)
      .select(keys.map(col) ++
        partials.map(p => col(s"sum($p)").as(p)): _*)
  }

  /** Incremental INNER-join view maintenance for insert-only deltas —
    * the join analog of [[merge]]: with the stored view V = A ⋈ B and
    * new slices dA, dB, the refreshed view is exactly
    *
    *   V ∪ (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB)
    *
    * (inner join distributes over the disjoint unions A∪dA and B∪dB).
    * Every join has a DELTA on one side: with `broadcastDeltas` the
    * day's slice broadcasts and neither 100 TB base table shuffles —
    * three map-side joins + a union replace re-joining two full tables.
    * A and B are the PRE-delta snapshots; non-key column names must be
    * disjoint across the two sides (standard view schema). The q269
    * gate proves maintained ≡ full recompute via the DuckDB oracle. */
  def deltaJoin(view: DataFrame, a: DataFrame, da: DataFrame,
      b: DataFrame, db: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    val (daj, dbj) =
      if (broadcastDeltas) (broadcast(da), broadcast(db)) else (da, db)
    view.unionByName(daj.join(b, keys))
      .unionByName(a.join(dbj, keys))
      .unionByName(daj.join(dbj, keys))
  }
}
