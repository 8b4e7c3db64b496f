package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Robust line-delimited ingest: the "100 TB of crawl output is never
  * clean" front door. A corpus-scale JSONL load must route malformed
  * records to a quarantine instead of failing the job (one poison line
  * killing a 10-hour ingest) or silently dropping them (unaccounted data
  * loss). Everything is per-row projection work — zero shuffle, full
  * scan speed, `from_json` in PERMISSIVE mode with an explicit
  * corrupt-record column.
  */
object Ingest {

  /** Parse `valueCol` as one JSON object per row against `schema`,
    * keeping EVERY input row: well-formed rows carry their fields and
    * `ok = true`; malformed rows carry null fields, `ok = false`, and
    * the raw line in `quarantine` for replay/debugging. A row whose JSON
    * is structurally valid but misses fields parses with nulls and stays
    * `ok = true` (schema drift is data, not garbage — route it with a
    * downstream required-field filter, the P4 discipline). */
  def jsonlQuarantine(lines: DataFrame, idCol: String, valueCol: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema must not already contain _corrupt")
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt", StringType))
    val parsed = lines.select(col(idCol), col(valueCol).as("__raw"),
      from_json(col(valueCol), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("__j"))
    val ok: Column = col("__j").isNotNull && col("__j._corrupt").isNull
    parsed.select(
      col(idCol) +:
        ok.as("ok") +:
        schema.fieldNames.toSeq.map(f =>
          when(ok, col(s"__j.$f")).otherwise(lit(null)).as(f)) :+
        when(!ok, col("__raw")).otherwise(lit(null)).as("quarantine"): _*)
  }
}
