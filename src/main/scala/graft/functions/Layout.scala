package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Storage-layout keys. Z-ordering is the standard multi-dimensional
  * data-skipping trick at 100 TB: sort (or range-partition) rows by the
  * interleaved-bit key before writing parquet and the per-file min/max
  * column statistics become tight boxes in BOTH dimensions, so a scan
  * filtered on either coordinate prunes most files — a single-column
  * sort can only prune one.
  */
object Layout {

  /** 62-bit Morton key interleaving the low 31 bits of two non-negative
    * coordinates (x in even bit positions, y in odd). Statically unrolled
    * arithmetic — 62 shift/mask terms, fully inside whole-stage codegen;
    * never a UDF. */
  def zorder2(x: Column, y: Column): Column = {
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until 31).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB twin of [[zorder2]]. */
  def zorder2Sql(x: String, y: String): String =
    s"""CAST(list_sum(list_transform(range(0, 31), i ->
        (((($x) >> i) & 1) << (2 * i)) + (((($y) >> i) & 1) << (2 * i + 1))))
      AS BIGINT)"""
}
