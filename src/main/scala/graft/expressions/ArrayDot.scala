package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential-fold dot product of two numeric array columns:
  * `acc ← acc + toDouble(a(i)) · toDouble(b(i))`, acc from 0.0, left to
  * right — bit-for-bit the fold order of the HOF formulation
  * `aggregate(zip_with(transform(a, cast double), transform(b, cast
  * double), _*_), 0.0, _+_)` it replaces, so every gated value and
  * DuckDB oracle is unchanged.
  *
  * WHY an Expression: higher-order functions have no `doGenCode` — each
  * evaluation walks an interpreted closure tree per element. Inside an
  * O(n²) pair join (brute-force near-dup scoring, in-cluster SemDedup)
  * that interpretation dominated end-to-end runtime (~100 µs/pair at
  * 64 dims; the sf1 sweep measured a 20k-vector all-pairs join at 390
  * CPU-minutes). This codegen'd loop runs the same fold at memory
  * speed and composes into whole-stage codegen and generated join
  * predicates (`SpecificPredicate`) alike.
  *
  * Null contract (mirrors the HOF chain): null array → null; length
  * mismatch → null (zip_with pads with null, null poisons the sum);
  * any null element → null.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  @inline private def get(a: ArrayData, et: DataType, i: Int): Double =
    et match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() != b.numElements()) return null
    val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, lt, i) * get(b, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv) => {
      // freshName, NOT fixed names: cosineCols inlines THREE ArrayDots
      // into one projection (a·b, a·a, b·b); fixed locals collide when
      // janino compiles them into the same method ("Redefinition of
      // local variable"), silently dropping the whole stage to
      // interpreted eval — the pre-fix bench spent 6–12 CPU-s per
      // 0.5 MB stage on exactly that.
      val n = ctx.freshName("adN")
      val acc = ctx.freshName("adAcc")
      val i = ctx.freshName("adI")
      def getter(side: Expression, arr: String) =
        elemType(side.dataType).get match {
          case FloatType => s"(double) $arr.getFloat($i)"
          case _ => s"$arr.getDouble($i)"
        }
      s"""
         |int $n = $av.numElements();
         |if ($n != $bv.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($av.isNullAt($i) || $bv.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += ${getter(left, av)} * ${getter(right, bv)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object ArrayDot {
  /** Column-API entry point. */
  def array_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ArrayDot(org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
