package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature fold over an array of 31-bit shingle keys:
  * sig[i] = min over keys of (a_i·key + b_i) mod P, P = 2³¹−1, with the
  * (a_i, b_i) families derived exactly as `Dedup.mhA/mhB` (they are read
  * from there — one derivation, no drift).
  *
  * Bit-identical to the HOF formulation it replaces
  * (`aggregate(keys, array_repeat(Long.MaxValue, n), (acc, h) =>
  * zip_with(acc, [(h·a_i+b_i) % P], least))`): pure non-negative integer
  * arithmetic (keys and coefficients are < 2³¹ so products stay far from
  * Long overflow), empty input yields the all-MaxValue init, and a NULL
  * key element leaves the accumulator unchanged (`least(acc, null)` keeps
  * acc — key arrays from md5 are never null, but the contract holds).
  *
  * WHY an Expression: the HOF fold allocated and interpretedly zipped an
  * n-element array PER SHINGLE (~16 closure walks each) — the dominant
  * CPU of the minhash corpus scan after shingling itself was codegen'd.
  * This is a two-level integer loop inside whole-stage codegen.
  *
  * Null contract: null keys array → null.
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinhashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {

  private val P = 2147483647L // == Dedup.MinhashP

  // one coefficient derivation in the codebase: read Dedup's families
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def coeffs(n: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(n, _ =>
      (Array.tabulate(n)(graft.operators.Dedup.mhA),
        Array.tabulate(n)(graft.operators.Dedup.mhB)))

  /** Shared by interpreted eval and generated code. */
  def compute(keys: ArrayData, numHashes: Int): ArrayData = {
    val (a, b) = coeffs(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = keys.numElements()
    var i = 0
    while (i < n) {
      if (!keys.isNullAt(i)) { // least(acc, null) keeps acc
        val h = keys.getLong(i)
        var j = 0
        while (j < numHashes) {
          val v = (h * a(j) + b(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Column-API entry point. */
  def minhash_sig(keys: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinhashSig(org.apache.spark.sql.GraftColumnBridge.expression(keys),
        numHashes))
}
