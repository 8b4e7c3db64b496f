package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character entropy of a text column, in nats, rounded half-up
  * at `scale` — the gibberish / boilerplate / encoded-blob detector.
  *
  * Bit-identical to the HOF formulation it replaces
  * (`aggregate(array_sort(array_distinct(chars)), 0.0,
  * (acc, c) => acc + p(c) * roundHalfUp(ln p(c), 8))` over
  * `transform(sequence(1, length(text)), i => substr(text, i, 1))`,
  * negated and rounded at `scale`): characters are code points
  * (`substr` counts by code point), the distinct set folds in ascending
  * code-point order (single-char UTF8 binary sort IS code-point order),
  * p = count/len in double division, each ln() is
  * `floor(x·10⁸+0.5)/10⁸`, the final value `floor(x·10ˢ+0.5)/10ˢ` —
  * all reproduced op-for-op so every gated value and DuckDB oracle twin
  * is unchanged.
  *
  * WHY an Expression: the HOF chain is O(distinct-chars × len)
  * INTERPRETED closure walks per row (`filter(ch, _ === c)` re-scans
  * the char array once per distinct char — ~60k closure evaluations for
  * a 1000-char document, 10+ ms/row measured at sf1). This is one
  * code-point scan plus a sorted count map, inside whole-stage codegen.
  *
  * Null contract: null text → null (the HOF's bindOnce chain over null
  * also yielded null). Empty text → 0.0 on both paths.
  */
case class CharEntropy(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires a STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CharEntropy.compute($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  /** Shared by interpreted eval and generated code. The FP op order is
    * the HOF chain's exactly: per distinct code point ascending,
    * acc += (count/n) * floor(ln(count/n)·1e8 + 0.5)/1e8; result
    * floor(−acc·10ˢ + 0.5)/10ˢ. */
  def compute(text: UTF8String, scale: Int): Double = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
      n += 1
    }
    val nd = n.toDouble
    val p8 = 1.0e8 // == math.pow(10, 8) exactly
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / nd
      acc += p * (Math.floor(Math.log(p) * p8 + 0.5) / p8)
    }
    val ps = Math.pow(10, scale)
    Math.floor(-acc * ps + 0.5) / ps
  }

  /** Column-API entry point. */
  def char_entropy(text: Column, scale: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharEntropy(org.apache.spark.sql.GraftColumnBridge.expression(text),
        scale))
}
