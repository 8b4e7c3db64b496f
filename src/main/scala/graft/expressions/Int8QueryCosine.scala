package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Int8 max-abs round-trip cosine against a literal query vector: the
  * fused form of `Curation.dequantCosine(Curation.quantizeInt8(v), q)` —
  * quantize each component to `floor(x·127/maxAbs + 0.5)` as int8 codes,
  * dequantize, and score the dequantized vector against the query. The
  * read path of an int8-quantized ANN index does exactly this per
  * candidate, so the per-row cost IS the scan cost at scale.
  *
  * Bit-for-bit the Column chain it replaces (parity-spec'd on real data
  * in Int8QueryCosineSpec):
  *   - maxAbs folds `array_max` order (java.lang.Double.compare: NaN
  *     greatest), over |toDouble(x_i)|;
  *   - scale = 0.0 when maxAbs == 0.0, else 127.0/maxAbs — the same
  *     IEEE divide;
  *   - code_i = (int)(long) floor(x_i·scale + 0.5) — Spark's `floor`
  *     returns BIGINT (NaN→0, ±∞ saturate), the int cast then wraps;
  *     deq_i = 0.0 when scale == 0.0 else code_i/scale;
  *   - dot and self-dot are independent left folds from 0.0 (ArrayDot's
  *     order), cosine = dot / (sqrt(selfdot) · |q|) with |q| the driver
  *     fold of [[graft.operators.Similarity.normLit]], then
  *     `floor(x·10ˢ + 0.5)/10ˢ` ([[graft.functions.SafeMath.roundHalfUp]])
  *     — whose numerator is likewise Spark's LONG floor, so a NaN cosine
  *     rounds to 0.0 exactly as the Column form does;
  *   - null contract: null array → null; length ≠ |q| → null (ArrayDot's
  *     mismatch rule); any null element → null (poisons the chain);
  *     zero denominator (all-zero vector ⇒ sqrt(selfdot)·|q| == 0.0) →
  *     null — Spark's own division-by-zero convention. The split chain
  *     returns exactly this null under non-ANSI and RAISES under ANSI
  *     (Spark 4 default); a data-dependent abort mid-scan is the wrong
  *     behavior for a 100 TB pass, so the fused form keeps the null.
  *
  * WHY an Expression: the Column form is four higher-order-function
  * lambdas per row (two in quantizeInt8, two in dequantCosine) and HOFs
  * have no codegen — each evaluation walks an interpreted closure tree
  * per ELEMENT, measured at ~0.4 ms/row at dim=64 (q58's 2000-row scan
  * spent ~0.8 s single-task; its first compile of the inlined ~4·dim-term
  * tree cost ~20 s of janino once per JVM). This loop runs the same fold
  * at memory speed, composes into whole-stage codegen, and carries the
  * query as ONE reference object instead of two 64-literal arrays.
  */
case class Int8QueryCosine(child: Expression, query: Seq[Double],
    roundScale: Int) extends UnaryExpression {

  require(query.nonEmpty, "query vector must be non-empty")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"int8_query_cosine requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  }

  @transient private lazy val q: Array[Double] = query.toArray
  // same driver-side fold as Similarity.normLit
  @transient private lazy val qnorm: Double =
    math.sqrt(query.map(x => x * x).sum)
  @transient private lazy val pow: Double = math.pow(10, roundScale)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = q.length
    if (a.numElements() != dim) return null
    val isFloat = elemType.contains(FloatType)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var m = math.abs(v(0))
    i = 1
    while (i < dim) {
      val x = math.abs(v(i))
      if (java.lang.Double.compare(x, m) > 0) m = x
      i += 1
    }
    val qs = if (m == 0.0) 0.0 else 127.0 / m
    var dot = 0.0
    var sd = 0.0
    i = 0
    while (i < dim) {
      // Spark floor() → BIGINT (NaN→0), then the non-ANSI long→int cast
      val code = math.floor(v(i) * qs + 0.5).toLong.toInt
      val dq = if (qs == 0.0) 0.0 else code.toDouble / qs
      dot += dq * q(i)
      sd += dq * dq
      i += 1
    }
    val den = math.sqrt(sd) * qnorm
    if (den == 0.0) return null
    val cos = dot / den
    math.floor(cos * pow + 0.5).toLong.toDouble / pow
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, av => {
      val qRef = ctx.addReferenceObj("i8qQuery", q, "double[]")
      // qnorm and 10^scale ride as references too — Java double literals
      // would round-trip (shortest-repr), but a reference can never be
      // mis-printed
      val cRef = ctx.addReferenceObj("i8qConsts", Array(qnorm, pow), "double[]")
      val dim = q.length
      val getter = elemType.get match {
        case FloatType => (i: String) => s"(double) $av.getFloat($i)"
        case _ => (i: String) => s"$av.getDouble($i)"
      }
      // every local from freshName (join-codegen inlining, q38 precedent)
      val v = ctx.freshName("i8qV")
      val i = ctx.freshName("i8qI")
      val m = ctx.freshName("i8qM")
      val x = ctx.freshName("i8qX")
      val qs = ctx.freshName("i8qS")
      val dot = ctx.freshName("i8qDot")
      val sd = ctx.freshName("i8qSd")
      val code = ctx.freshName("i8qC")
      val dq = ctx.freshName("i8qDq")
      val cos = ctx.freshName("i8qCos")
      val den = ctx.freshName("i8qDen")
      s"""
         |if ($av.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($av.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $v[$i] = ${getter(i)};
         |  }
         |  if (!${ev.isNull}) {
         |    double $m = Math.abs($v[0]);
         |    for (int $i = 1; $i < $dim; $i++) {
         |      double $x = Math.abs($v[$i]);
         |      if (Double.compare($x, $m) > 0) $m = $x;
         |    }
         |    double $qs = ($m == 0.0) ? 0.0 : 127.0 / $m;
         |    double $dot = 0.0;
         |    double $sd = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      int $code = (int) (long) Math.floor($v[$i] * $qs + 0.5);
         |      double $dq = ($qs == 0.0) ? 0.0 : ((double) $code) / $qs;
         |      $dot += $dq * $qRef[$i];
         |      $sd += $dq * $dq;
         |    }
         |    double $den = Math.sqrt($sd) * $cRef[0];
         |    if ($den == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $cos = $dot / $den;
         |      ${ev.value} =
         |        ((double) (long) Math.floor($cos * $cRef[1] + 0.5)) / $cRef[1];
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QueryCosine =
    copy(child = newChild)

  override def prettyName: String = "int8_query_cosine"
}

object Int8QueryCosine {
  def int8_query_cosine(vec: Column, query: Seq[Double],
      scale: Int = 6): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Int8QueryCosine(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), query, scale))
}
