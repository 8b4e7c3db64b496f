package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (Rabin-Karp style): the
  * codepoint left-fold `h ← (h·B + c) mod M` over the string.
  *
  * A native Catalyst `Expression` WITH `doGenCode` — the generated Java
  * participates in whole-stage codegen (no boxing, no UDF serialization),
  * which is the preferred extension tier for scalar functions at scale
  * (a Scala UDF here would break the codegen stage in the middle of every
  * scan projection).
  *
  * B=31, M=1e9+7 keep every intermediate in signed-64 range, so the same
  * fold is expressible in any engine with checked 64-bit arithmetic (the
  * DuckDB oracle mirrors it with a list_reduce).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING, got ${child.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val Base = 31L
  val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * Base + s.codePointAt(i)) % Mod
      i += java.lang.Character.charCount(s.codePointAt(i))
    }
    h
  }

  /** Column-API entry point. */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      RollingHash(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** DuckDB twin: identical fold over codepoints. */
  def oracleSql(textExpr: String): String =
    s"""list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, length($textExpr) + 1),
            i -> unicode($textExpr[i]))),
        (h, c) -> (h * $Base + c) % $Mod)"""
}
