package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-LSH bucket of a vector against a literal hyperplane list: bit b
  * is set iff `dot(v, plane_b) >= 0` — the blocking key of the
  * embedding near-dup family (semDedupLsh, bitext mining, LSH top-k,
  * the ANN index layouts).
  *
  * Bit-for-bit the Column chain it replaces
  * (`when(dotLit(v, plane_b) >= 0, 1L << b).otherwise(0)` OR-reduced),
  * including its unusual null contract: a NULL dot (null array, length
  * mismatch, null element) falls through `when`'s otherwise to an
  * UNSET bit, so malformed rows land in bucket 0 rather than null —
  * this expression is therefore NOT null-intolerant and returns 0L for
  * them (gated plans since round 3 depend on that shape). A NaN dot
  * (NaN element) SETS the bit: Spark's `>=` is the NaN-greatest SQL
  * ordering, not Java's always-false NaN compare — so a NaN row lands
  * in the all-ones bucket exactly as the chain did. A dot of exactly
  * ±0.0 sets the bit in both forms.
  *
  * WHY an Expression: the Column form is bits × dim literal nodes
  * (6–12 planes × 64 components ≈ up to ~1.5k literals) that Catalyst
  * re-analyzes and janino re-compiles per ACTION — and the bucket is
  * usually spelled on BOTH sides of the blocking join. The executors
  * were fine (WSCG); the driver paid the q221/q310 compile class on
  * every gate in the family. Here the planes ride as one `double[][]`
  * reference object.
  */
case class SignBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.size == planes.head.size),
    "planes must be non-empty and rectangular")
  require(planes.size <= 63, "more than 63 sign bits cannot pack a Long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"sign_bucket requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  }

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  // NOT nullSafeEval: a null input maps to bucket 0, matching the
  // Column chain's when-null → otherwise(0) per bit
  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return 0L
    val arr = a.asInstanceOf[ArrayData]
    val dim = mat(0).length
    if (arr.numElements() != dim) return 0L
    val isFloat = elemType.contains(FloatType)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0L
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < mat.length) {
      var dot = 0.0
      var p = 0
      while (p < dim) { dot += v(p) * mat(b)(p); p += 1 }
      // Spark's SQL ordering: NaN sorts greatest, so NaN >= 0 is TRUE
      if (dot >= 0.0 || java.lang.Double.isNaN(dot)) acc |= 1L << b
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("sbMat", mat, "double[][]")
    val dim = mat(0).length
    val childGen = child.genCode(ctx)
    val getter = elemType.get match {
      case FloatType => (i: String) => s"(double) ${childGen.value}.getFloat($i)"
      case _ => (i: String) => s"${childGen.value}.getDouble($i)"
    }
    val v = ctx.freshName("sbV")
    val i = ctx.freshName("sbI")
    val b = ctx.freshName("sbB")
    val p = ctx.freshName("sbP")
    val dot = ctx.freshName("sbDot")
    val row = ctx.freshName("sbRow")
    val ok = ctx.freshName("sbOk")
    ev.copy(code = code"""
         |${childGen.code}
         |long ${ev.value} = 0L;
         |if (!${childGen.isNull} && ${childGen.value}.numElements() == $dim) {
         |  double[] $v = new double[$dim];
         |  boolean $ok = true;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if (${childGen.value}.isNullAt($i)) { $ok = false; break; }
         |    $v[$i] = ${getter(i)};
         |  }
         |  if ($ok) {
         |    for (int $b = 0; $b < ${mat.length}; $b++) {
         |      double[] $row = $matRef[$b];
         |      double $dot = 0.0;
         |      for (int $p = 0; $p < $dim; $p++) $dot += $v[$p] * $row[$p];
         |      if ($dot >= 0.0 || Double.isNaN($dot)) ${ev.value} |= 1L << $b;
         |    }
         |  }
         |}
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucket =
    copy(child = newChild)

  override def prettyName: String = "sign_bucket"
}

object SignBucket {
  def sign_bucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SignBucket(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), planes))
}
