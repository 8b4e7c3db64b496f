package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style diff of a reported set against the currently-stored set
  * (SURVEY.md §2.2 K5 / §2.4 J8).
  *
  * The reference diffs each gateway's reported access ports against the
  * MySQL/Redis copy per record, issuing insert/update/delete side effects
  * inline (`CONSOLE/sink/ProbeAccessTypeSink.java:48-106`). Re-expressed as
  * pure dataflow: one full-outer join on the key columns produces an
  * `action` column (`insert` = report-only, `delete` = stored-only,
  * `update` = both); the caller applies it with a MERGE-style writer in
  * `foreachBatch`. At scale this is a single co-partitioned shuffle join —
  * AQE handles skewed keys — instead of 3 round-trips per record.
  */
object SetDiff {
  def apply(current: DataFrame, report: DataFrame, keys: Seq[String]): DataFrame = {
    val cur = current.withColumn("__in_current", lit(1))
    val rep = report.withColumn("__in_report", lit(1))
    cur.join(rep, keys, "full_outer")
      .withColumn("action",
        when(col("__in_current").isNull, lit("insert"))
          .when(col("__in_report").isNull, lit("delete"))
          .otherwise(lit("update")))
      .drop("__in_current", "__in_report")
  }
}
