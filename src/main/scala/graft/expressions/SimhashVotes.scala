package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash bit-vote fold over an array of token hash keys: bit j of the
  * result is set when more keys have bit j set than clear —
  * `Σ_{j: votes_j > 0} 2^j` over votes_j = Σ_keys (±1).
  *
  * Bit-identical to the HOF formulation it replaces
  * (`aggregate(keys, array_repeat(0L, bits), (acc, h) => zip_with(acc,
  * [±1 per bit], _+_))` then the power-of-two re-fold): pure integer
  * arithmetic, including the quirk that a NULL key element votes −1 on
  * every bit (`when(null ≠ 0, 1).otherwise(-1)` falls to the
  * otherwise branch). Token keys from `md5Key60` are never null, but
  * the contract is preserved regardless.
  *
  * WHY an Expression: the HOF fold allocates and interpretedly zips a
  * `bits`-element array PER TOKEN (~60 closure walks each) — the
  * dominant CPU of the simhash corpus scan. This is a two-level integer
  * loop inside whole-stage codegen.
  *
  * Null contract: null keys array → null.
  */
case class SimhashVotes(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_votes requires ARRAY<BIGINT>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashVotes.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SimhashVotes.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashVotes =
    copy(child = newChild)

  override def prettyName: String = "simhash_votes"
}

object SimhashVotes {

  /** Shared by interpreted eval and generated code. */
  def compute(keys: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val n = keys.numElements()
    var i = 0
    while (i < n) {
      if (keys.isNullAt(i)) {
        // HOF quirk preserved: a null key votes -1 on every bit
        var j = 0
        while (j < bits) { votes(j) -= 1L; j += 1 }
      } else {
        val k = keys.getLong(i)
        var j = 0
        while (j < bits) {
          if (((k >>> j) & 1L) != 0L) votes(j) += 1L else votes(j) -= 1L
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0L) out |= 1L << j
      j += 1
    }
    out
  }

  /** Column-API entry point. */
  def simhash_votes(keys: Column, bits: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimhashVotes(org.apache.spark.sql.GraftColumnBridge.expression(keys),
        bits))
}
