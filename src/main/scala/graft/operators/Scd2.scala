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

  /** Day-2 incremental merge: fold ONE new snapshot (current state per
    * key, observed at `asOf`) into an EXISTING history, without touching
    * the closed rows — the warehouse MERGE that keeps an SCD2 table
    * current without rebuilding it from raw updates (q156 gates
    * bit-equality against the from-scratch rebuild):
    *
    *   - open row whose attrs equal the snapshot's → unchanged (no-op
    *     update, mirroring [[history]]'s consecutive-dedup);
    *   - open row whose attrs differ → closed at `asOf` and a new open
    *     version inserted at `asOf`;
    *   - snapshot key with no history → new open chain at `asOf`;
    *   - history key absent from the snapshot → left open (a snapshot
    *     may be partial; deletion tracking is a tombstone attribute).
    *
    * Scale shape: closed rows pass through untouched (at 100 TB of
    * history that is the bulk — never rewritten, never shuffled); only
    * the open slice joins the snapshot, one key-partitioned full-outer
    * join, checkpointed once and read by the three output branches. */
  def merge(history: DataFrame, snapshot: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], asOf: Long): DataFrame = {
    val outCols = (keyCols ++ attrCols ++
      Seq("valid_from", "valid_to", "is_current")).map(col)
    val toType = history.schema("valid_to").dataType
    val closed = history.filter(!col("is_current"))
    val open = history.filter(col("is_current"))
      .withColumn("__in_open", lit(true))
    val snap = snapshot.select(
      keyCols.map(col) ++ attrCols.map(a => col(a).as(s"__s_$a")): _*)
      .withColumn("__in_snap", lit(true))
    val j = open.join(snap, keyCols, "full_outer").localCheckpoint()
    val inOpen = coalesce(col("__in_open"), lit(false))
    val inSnap = coalesce(col("__in_snap"), lit(false))
    val same = struct(attrCols.map(col): _*) <=>
      struct(attrCols.map(a => col(s"__s_$a")): _*)
    val keptOpen = j.filter(inOpen && (!inSnap || same)).select(outCols: _*)
    val closedNow = j.filter(inOpen && inSnap && !same)
      .select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col("valid_from"), lit(asOf).cast(toType).as("valid_to"),
        lit(false).as("is_current")): _*)
    val fresh = j.filter(inSnap && (!inOpen || !same))
      .select(keyCols.map(col) ++
        attrCols.map(a => col(s"__s_$a").as(a)) ++ Seq(
        lit(asOf).cast(history.schema("valid_from").dataType)
          .as("valid_from"),
        lit(null).cast(toType).as("valid_to"),
        lit(true).as("is_current")): _*)
    closed.select(outCols: _*)
      .unionByName(keptOpen).unionByName(closedNow).unionByName(fresh)
  }

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
