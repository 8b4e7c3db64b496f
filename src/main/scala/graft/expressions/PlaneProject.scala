package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Johnson–Lindenstrauss projection of a vector onto a literal plane
  * list: component b = `roundHalfUpₛ(dot(v, plane_b) / divisor)` — the
  * "shrink 4096-dim embeddings before LSH/IVF" scan.
  *
  * Bit-for-bit the Column formulation it replaces (an `array(...)` of
  * outDim rounded literal-array dots): each dot is ArrayDot's left
  * fold, the rounding numerator is Spark's LONG floor, and the null
  * contract is the chain's — a NULL dot (null array, length mismatch,
  * null element) makes that COMPONENT null, so a malformed row yields
  * an array of outDim nulls rather than a null array. The output is
  * never null itself (`array()` of nullable components).
  *
  * WHY an Expression: outDim × dim literal nodes (16 × 64 ≈ 1k) paid
  * Catalyst analysis + a janino compile per action — q241 measured
  * 8.2 s at sf1 where the identical-shape q240 (already
  * reference-object-based) ran 1.0 s. The planes ride as one
  * `double[][]`.
  */
case class PlaneProject(child: Expression, planes: Seq[Seq[Double]],
    divisor: Double, roundScale: Int) extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.size == planes.head.size),
    "planes must be non-empty and rectangular")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"plane_project requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  }

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val pow: Double = math.pow(10, roundScale)

  private def allNulls: GenericArrayData =
    new GenericArrayData(new Array[Any](mat.length))

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return allNulls
    val arr = a.asInstanceOf[ArrayData]
    val dim = mat(0).length
    if (arr.numElements() != dim) return allNulls
    val isFloat = elemType.contains(FloatType)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return allNulls
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Any](mat.length)
    var b = 0
    while (b < mat.length) {
      var dot = 0.0
      var p = 0
      while (p < dim) { dot += v(p) * mat(b)(p); p += 1 }
      out(b) =
        math.floor(dot / divisor * pow + 0.5).toLong.toDouble / pow
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("ppMat", mat, "double[][]")
    // divisor and 10^scale as references (never mis-printed literals)
    val cRef = ctx.addReferenceObj("ppConsts", Array(divisor, pow), "double[]")
    val dim = mat(0).length
    val childGen = child.genCode(ctx)
    val getter = elemType.get match {
      case FloatType => (i: String) => s"(double) ${childGen.value}.getFloat($i)"
      case _ => (i: String) => s"${childGen.value}.getDouble($i)"
    }
    val v = ctx.freshName("ppV")
    val i = ctx.freshName("ppI")
    val b = ctx.freshName("ppB")
    val p = ctx.freshName("ppP")
    val dot = ctx.freshName("ppDot")
    val row = ctx.freshName("ppRow")
    val ok = ctx.freshName("ppOk")
    val out = ctx.freshName("ppOut")
    val gad = classOf[GenericArrayData].getName
    ev.copy(code = code"""
         |${childGen.code}
         |Object[] $out = new Object[${mat.length}];
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
         |      $out[$b] = Double.valueOf(
         |        ((double) (long) Math.floor($dot / $cRef[0] * $cRef[1] + 0.5))
         |          / $cRef[1]);
         |    }
         |  }
         |}
         |$gad ${ev.value} = new $gad($out);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneProject =
    copy(child = newChild)

  override def prettyName: String = "plane_project"
}

object PlaneProject {
  def plane_project(vec: Column, planes: Seq[Seq[Double]],
      divisor: Double, scale: Int = 6): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PlaneProject(
        org.apache.spark.sql.GraftColumnBridge.expression(vec),
        planes, divisor, scale))
}
