package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder: turn a keyed update
  * stream into versioned rows with `[valid_from, valid_to)` intervals —
  * the durable form of the reference's last-write-wins dim upserts
  * (`ConsoleProbeInfoDataMain.java` keeps only the newest probe state;
  * SCD2 keeps every state WITH its validity window, which is what a
  * warehouse needs to answer "what was the config at time t" without the
  * as-of join recomputing it from raw updates each time — [[AsOfJoin]]
  * then degenerates to a plain range probe on this table).
  *
  * Two steps, one shuffle: (1) drop no-op updates — an update whose
  * tracked attributes equal the previous version's is noise, compared
  * with a null-safe struct equality over a `lag` window; (2) stamp each
  * surviving version with `valid_to` = the NEXT version's `valid_from`
  * via `lead` (null = current version). Both windows share the same
  * partitioning and ordering, so Catalyst plans ONE exchange; the filter
  * between them preserves distribution and order (no second shuffle,
  * and at 100 TB the per-key state is the version chain, never the
  * corpus).
  */
object Scd2 {

  /** Build the version history. Ordering must be total for determinism:
    * pass `tieBreak` (e.g. a unique update id) when `tsCol` can repeat
    * within a key. */
  def history(updates: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    updates
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: the first version (lag = null) always survives
      .filter(!(attrs <=> col("__prev")))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols ++
        Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }
}
