package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` API: wrap a raw Catalyst Expression as a
  * user-facing Column (Spark 4 removed the public `new Column(expr)`).
  * Standard extension-library pattern (same approach as frameless et al).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  /** Eagerly convert a Column tree to a Catalyst Expression (resolving
    * function names etc.) — `ExpressionUtils.expression` only wraps
    * lazily, which function-registry builders can't return. */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
