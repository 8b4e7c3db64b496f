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
}
