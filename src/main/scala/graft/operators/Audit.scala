package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality auditing over fact/dim relationships — the profiling pass
  * a pipeline runs before trusting a day's ingest: referential integrity
  * (orphaned foreign keys), key uniqueness, and null rates, each as one
  * aggregate/anti-join per relation, emitted as a compact metrics frame.
  */
object Audit {

  /** One metrics row for a child→parent FK relationship: child row count,
    * orphaned child rows (FK value absent from the parent key set —
    * NULLs count as orphans of their own bucket `n_null_fk`), parent key
    * count, and duplicated parent keys (a dim PK that isn't unique makes
    * every join fan out). The orphan check is a LEFT ANTI join shuffled
    * on the key — at dim scale broadcast it; the uniqueness check is one
    * map-side-combined aggregation. */
  def fkAudit(relation: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val spark = child.sparkSession
    import spark.implicits._
    val nChild = child.count()
    val nNullFk = child.filter(col(childKey).isNull).count()
    val orphans = child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .count()
    // NULL parent keys are excluded from the uniqueness metrics: SQL's
    // COUNT(DISTINCT pk) ignores NULLs, and a NULL dim PK can never be a
    // join target anyway — counting it as a "key" (or as a duplicate when
    // several rows carry NULL) would diverge from any SQL-side audit.
    val parentKeys = parent.filter(col(parentKey).isNotNull)
      .groupBy(col(parentKey))
      .agg(count(lit(1)).as("n"))
    val nParent = parentKeys.count()
    val nDup = parentKeys.filter(col("n") > 1).count()
    Seq((relation, nChild, nNullFk, orphans, nParent, nDup))
      .toDF("relation", "n_child", "n_null_fk", "n_orphans",
        "n_parent_keys", "n_dup_parent_keys")
  }

  /** Deletion-request (right-to-be-forgotten) propagation: given a frame
    * of subject keys, report per table how many rows the purge removes
    * — the audit artifact a compliance run files. The request set ships
    * as a distinct key column into one LEFT ANTI join per table
    * (broadcast it — request batches are small against fact tables);
    * counts are one aggregate per table. The kept frame is exactly
    * `table.join(requests, key, "left_anti")` — callers write that to
    * the purged location; this reports what it will do. */
  /** FK-candidate DISCOVERY — the schema-inference complement of
    * [[fkAudit]] (which checks DECLARED keys): for each candidate
    * (child, parent) column pair, measure distinct-key containment
    * |keys(child) ∩ keys(parent)| / |keys(child)| in exact integer ppm
    * and whether the parent column is unique; the pair is an FK
    * candidate iff containment is total AND the parent is a key — both
    * halves matter (a contained pair with a non-unique parent is a join
    * trap, not a key). Per pair: two distinct aggregates (shipping only
    * the key column) and one semi-join; driver state is five scalars
    * per pair (the [[deleteAudit]] report shape). */
  def fkDiscovery(pairs: Seq[(String, DataFrame, String, String,
      DataFrame, String)]): DataFrame = {
    require(pairs.nonEmpty)
    val spark = pairs.head._2.sparkSession
    import spark.implicits._
    pairs.map { case (childName, child, childCol,
        parentName, parent, parentCol) =>
      val ck = child.select(col(childCol).as("k"))
        .filter(col("k").isNotNull).distinct().localCheckpoint()
      val pk = parent.select(col(parentCol).as("k"))
        .filter(col("k").isNotNull)
      val pkd = pk.distinct().localCheckpoint()
      val nChild = ck.count()
      val nMatched = ck.join(pkd, Seq("k"), "left_semi").count()
      val parentUnique = pk.count() == pkd.count()
      val ppm = if (nChild == 0) 0L else nMatched * 1000000L / nChild
      (s"$childName.$childCol", s"$parentName.$parentCol",
        nChild, nMatched, ppm, parentUnique,
        nChild > 0 && nMatched == nChild && parentUnique)
    }.toDF("child", "parent", "n_child_keys", "n_matched",
      "containment_ppm", "parent_unique", "is_fk_candidate")
  }

  def deleteAudit(requests: DataFrame, reqKey: String,
      tables: Seq[(String, DataFrame, String)]): DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    val keys = requests.select(col(reqKey)).distinct().localCheckpoint()
    val nKeys = keys.count()
    tables.map { case (name, df, keyCol) =>
      val before = df.count()
      val after = df.join(
        broadcast(keys.withColumnRenamed(reqKey, keyCol)),
        Seq(keyCol), "left_anti").count()
      (name, nKeys, before, before - after, after)
    }.toDF("relation", "n_request_keys", "n_before", "n_deleted", "n_after")
  }

  /** Dataset profile card — the per-column summary published with a
    * corpus release: row count, null count, distinct count, and the
    * min/max rendered as strings (so one frame covers mixed column
    * types). ONE scan: all per-column aggregates run in a single
    * aggregation pass (Spark fuses them); the distinct counts are exact
    * — swap in approx_count_distinct at the 100 TB/interactive point.
    * Output one row per column, deterministic, hash-gateable. */
  def profileCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val total = count(lit(1)).as("__total")
    val row = df.agg(total, aggs: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__cnt_$c")).as("n_null"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Order-independent per-bucket table checksum — the cross-replica
    * integrity primitive: after replicating/compacting/migrating a
    * table, both sides compute (row count, XOR of a portable row hash)
    * per bucket and diff the two tiny frames; a mismatched bucket
    * pinpoints where to re-sync without comparing rows. XOR is
    * commutative so partition order can't perturb it, and the row hash
    * is md5-based ([[graft.functions.TextFunctions.md5Key60]]) so ANY
    * engine can recompute it. NULLs are folded as a NUL-byte sentinel
    * ("\u0000") that no rendered value contains — a literal string
    * "NULL" in the data hashes differently from SQL NULL, so a
    * NULL-vs-'NULL' divergence between replicas IS visible. One
    * map-side-combined aggregation — scan bound at any scale. */
  def tableChecksum(df: DataFrame, bucketCol: String,
      cols: Seq[String]): DataFrame = {
    // unit-separator-joined so ("ab","c") can't collide with ("a","bc")
    val rendered = cols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000")))
    val rowKey = graft.functions.TextFunctions.md5Key60(
      concat_ws("\u001f", rendered: _*))
    df.select(col(bucketCol).as("bucket"), rowKey.as("__rk"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__rk)").as("xor_key"))
  }

  /** k-anonymity via local recoding over a suppression ladder — the
    * privacy audit+fix a dataset release runs before publishing
    * quasi-identifiers. Level i suppresses the last i QI columns to '*';
    * releases escalate BOTTOM-UP as a fixpoint: a full-detail combo with
    * ≥ k rows is released at level 0, the surviving rows regroup one
    * level coarser, and so on — so group sizes are counted over the
    * DISPLAYED (generalized) tuples each class actually releases, never
    * the original partition. (Counting the original partition is the
    * classic local-recoding bug: a level-i class contains only the rows
    * whose finer combos failed k, which can be arbitrarily smaller than
    * the partition that justified the level.) Every released class
    * therefore reaches k by construction, except the fully-suppressed
    * residue, which is reported at the top level for the release
    * decision. The ladder is nested, so |QI| escalation steps suffice —
    * no data-dependent iteration.
    *
    * Scale shape: the fixpoint runs over the combo census (one count per
    * distinct QI combination — bounded by the QI cross-product
    * cardinality, never corpus rows), checkpointed once; each ladder
    * level is one sum-window partitioned by its prefix columns over the
    * shrinking remainder — never a single-partition shuffle — and the
    * residue is a scalar aggregate. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    val leveled = comboLevels(df, qiCols, k)
    leveled
      .select(displayCols(qiCols, col("__level"))
        :+ col("__level").cast("int").as("suppression_level")
        :+ col("__cnt"): _*)
      .groupBy(qiCols.map(col) :+ col("suppression_level"): _*)
      .agg(sum(col("__cnt")).as("n_rows"))
  }

  /** Display projection for a suppression level: QI column j survives
    * while j < |QI| − level, else '*'. `qual` disambiguates the QI
    * references after a self-ish join. */
  private def displayCols(qiCols: Seq[String],
      level: org.apache.spark.sql.Column, qual: String = "") = {
    def ref(name: String) =
      if (qual.isEmpty) col(name) else col(s"$qual.$name")
    qiCols.zipWithIndex.map { case (c, j) =>
      when(level < qiCols.size - j, ref(c)).otherwise(lit("*")).as(c)
    }
  }

  /** The escalation fixpoint shared by [[kAnonymize]] and
    * [[lDiversityAudit]]: the combo census (qiCols cast to string,
    * `__cnt`) with `__level`, the ladder level each combo releases at —
    * bottom-up over displayed tuples, so summing `__cnt` within any
    * released (displayed, level) class gives ≥ k except at the top
    * residue level (= |QI|). */
  private[graft] def comboLevels(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nq = qiCols.size
    require(nq > 0, "need at least one quasi-identifier column")
    val combos = df
      .select(qiCols.map(c => col(c).cast("string").as(c)): _*)
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint()
    var remaining = combos
    val released = (0 until nq).map { i =>
      val w = Window.partitionBy(qiCols.dropRight(i).map(col): _*)
      val counted = remaining.withColumn("__gn", sum(col("__cnt")).over(w))
      val rel = counted.filter(col("__gn") >= k)
        .drop("__gn").withColumn("__level", lit(i))
      remaining = counted.filter(col("__gn") < k).drop("__gn")
      rel
    }
    (released :+ remaining.withColumn("__level", lit(nq)))
      .reduce(_.unionByName(_))
  }

  /** Row-level release of [[kAnonymize]]'s generalization: every input
    * row with its QI columns generalized to the class it releases in,
    * plus the suppression level — the table a publisher actually ships,
    * with `carryCols` (non-QI payload) passed through untouched. One
    * null-safe equi-join of the rows to the combo-level map; the map is
    * bounded by QI cross-product cardinality, so AQE broadcasts it in
    * the common case and falls back to a shuffled join when a huge QI
    * space outgrows that. */
  def kAnonymizeApply(df: DataFrame, qiCols: Seq[String], k: Long,
      carryCols: Seq[String]): DataFrame = {
    val levels = comboLevels(df, qiCols, k)
      .select(qiCols.map(col) :+ col("__level"): _*)
    val rows = df.select(
      carryCols.map(col) ++ qiCols.map(c => col(c).cast("string").as(c)): _*)
    val joinCond = qiCols.map(c =>
      col(s"__r.$c") <=> col(s"__l.$c")).reduce(_ && _)
    rows.as("__r").join(levels.as("__l"), joinCond)
      .select(carryCols.map(c => col(s"__r.$c"))
        ++ displayCols(qiCols, col("__level"), "__l")
        :+ col("__level").cast("int").as("suppression_level"): _*)
  }

  /** l-diversity audit over the k-anonymized release: a class whose
    * members all share one sensitive value leaks it even at size ≥ k
    * (the homogeneity attack) — so for every released class of
    * [[kAnonymize]]'s generalization, report the number of DISTINCT
    * sensitive values and flag classes below `l`. The release decision
    * reads `meets_l`; flagged classes need suppression or a coarser QI.
    *
    * Scale shape: one corpus-width aggregation to (combo, sensitive)
    * counts, the [[comboLevels]] fixpoint on the (smaller) QI census,
    * one broadcast-friendly equi-join between the two, and a final
    * class-level aggregation — no window touches corpus-sized data. */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String], sensCol: String,
      k: Long, l: Long): DataFrame = {
    val levels = comboLevels(df, qiCols, k)
      .select(qiCols.map(col) :+ col("__level"): _*)
    val sensCounts = df
      .select(qiCols.map(c => col(c).cast("string").as(c))
        :+ col(sensCol).cast("string").as("__sens"): _*)
      .groupBy(qiCols.map(col) :+ col("__sens"): _*)
      .agg(count(lit(1)).as("__sc"))
    // null-safe keys: a NULL QI value is a combo like any other on both
    // sides (groupBy groups NULLs; a plain equi-join would drop them)
    val joinCond = qiCols.map(c =>
      col(s"__sc_side.$c") <=> col(s"__lv_side.$c")).reduce(_ && _)
    sensCounts.as("__sc_side")
      .join(levels.as("__lv_side"), joinCond)
      .select(displayCols(qiCols, col("__level"), "__lv_side")
        :+ col("__level").cast("int").as("suppression_level")
        :+ col("__sens") :+ col("__sc"): _*)
      .groupBy(qiCols.map(col) :+ col("suppression_level"): _*)
      .agg(sum(col("__sc")).as("n_rows"),
        countDistinct(col("__sens")).as("n_sensitive"))
      .withColumn("meets_l", col("n_sensitive") >= l)
  }

  /** Snapshot row-diff — the data-versioning primitive: classify every
    * key of two table versions as added / removed / changed / unchanged
    * and count each class. Change detection hashes the compared columns
    * to one md5 per row BEFORE the join, so only (key, fingerprint)
    * pairs travel through the full-outer shuffle — at 100 TB the diff of
    * two fact snapshots moves two narrow key/hash projections, never the
    * rows. NULLs fold as the NUL-byte sentinel (the [[tableChecksum]]
    * rule) so NULL→'NULL' edits are visible. Assumes `keyCol` is unique
    * per snapshot (snapshot semantics; [[fkAudit]] is the uniqueness
    * check). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    def keyed(df: DataFrame, k: String, h: String) = df.select(
      col(keyCol).as(k),
      md5(concat_ws("\u001f", compareCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(h))
    keyed(oldSnap, "__ko", "__ho")
      .join(keyed(newSnap, "__kn", "__hn"),
        col("__ko") === col("__kn"), "full_outer")
      .select(when(col("__ko").isNull, "added")
        .when(col("__kn").isNull, "removed")
        .when(col("__ho") =!= col("__hn"), "changed")
        .otherwise("unchanged").as("change_type"))
      .groupBy("change_type").agg(count(lit(1)).as("n_rows"))
  }

  /** Benford reference shares in micro-units — log₁₀(1 + 1/d) for the
    * leading digit d, driver-computed ONCE so the Spark plan and the
    * oracle SQL embed the identical integers (no cross-engine log). */
  val benfordMicro: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong)

  /** Benford first-digit audit — the classic fabricated-numbers /
    * synthetic-data detector: naturally-occurring multiplicative
    * quantities lead with 1 ~30% of the time; uniform or hand-made data
    * doesn't. One grouped count over the leading digit (string head of
    * the integer value — no FP log10 anywhere), joined to the 9-row
    * Benford reference; shares in exact integer micro-units. Output per
    * digit: (digit, n, share_micro, benford_micro, delta_micro). */
  def benfordAudit(df: DataFrame, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(valCol).cast("long").as("__v"))
      .filter(col("__v") >= 1L)
    val n = base.count()
    require(n > 0, "benfordAudit needs at least one positive value")
    val obs = base
      .groupBy(substring(col("__v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .agg(count(lit(1)).as("n"))
    benfordMicro.toDF("digit", "benford_micro")
      .join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        expr(s"(coalesce(n, 0L) * 1000000L) div ${n}L").as("share_micro"),
        col("benford_micro"))
      .withColumn("delta_micro", col("share_micro") - col("benford_micro"))
  }
}
