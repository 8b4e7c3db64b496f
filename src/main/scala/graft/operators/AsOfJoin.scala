package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: attach to each fact row the dimension
  * version with the greatest `dimTime` ≤ the fact's `factTime`, per key —
  * the lookup the reference approximates with mutable Redis/MySQL dims
  * (whatever version happened to be cached when the record arrived),
  * made deterministic and replayable.
  *
  * Spark-first formulation: tag + union + one `Window.partitionBy(key)
  * .orderBy(time)` pass with `last(_, ignoreNulls = true)` — dim
  * attributes are null on fact rows, so the running `last` carries the
  * most recent dim version forward onto each fact. ONE shuffle on the
  * key, linear in |facts| + |dims|; the naive `t_fact >= t_dim`
  * range-join explodes to |facts| × |versions-per-key| intermediate rows
  * and is quadratic on hot keys. At equal timestamps the dim sorts FIRST
  * (`is_dim` descending tiebreak), giving ≤ (not <) semantics — the same
  * contract as DuckDB's `ASOF JOIN ... ON f.t >= d.t`, which is the
  * oracle for q66.
  */
object AsOfJoin {

  /** Left as-of join. `dimCols` are the dim attributes to attach; facts
    * with no dim version at-or-before their time get nulls. Dim rows must
    * be unique per (key, dimTime) for a deterministic result.
    *
    * The dim attributes are carried as ONE struct (with `last(_,
    * ignoreNulls = true)` over the struct column), not per-attribute:
    * a per-attribute carry would skip a matched version whose attribute is
    * legitimately NULL and leak the PREVIOUS version's value onto later
    * facts — the struct itself is never null on a dim row, so a matched
    * version's NULL attributes are preserved, exactly the DuckDB
    * `ASOF JOIN` contract. */
  def lastKnown(facts: DataFrame, dims: DataFrame, keyCol: String,
      factTime: String, dimTime: String, dimCols: Seq[String]): DataFrame = {
    val factSide = facts.withColumn("__t", col(factTime).cast("long"))
      .withColumn("__is_dim", lit(0))
    val dimSide = dims.select(
      col(keyCol), col(dimTime).cast("long").as("__t"),
      lit(1).as("__is_dim"),
      struct(dimCols.map(col): _*).as("__dim"))
    val factCols = facts.columns.toSeq
    val unioned = factSide.unionByName(dimSide, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").asc, col("__is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__dim", last(col("__dim"), ignoreNulls = true).over(w))
      .filter(col("__is_dim") === 0)
      .select((factCols.map(col) ++
        dimCols.map(c => col("__dim")(c).as(c))): _*)
  }
}
