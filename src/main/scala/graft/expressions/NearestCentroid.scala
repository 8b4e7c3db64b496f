package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** First-min argmin of cosine distance (`-dot(v, c_j) / |c_j|`) over a
  * literal centroid list — the assignment step of every Lloyd loop
  * (kmeans, IVF coarse cells, PQ subspace codebooks).
  *
  * Bit-for-bit the fold of the Column formulation it replaces
  * (`array_position(dists, array_min(dists)) - 1` over
  * `array(cents.map(c => -ArrayDot(v, lit c) / lit(norm c)))`):
  *   - per-centroid distance = left-fold `acc += v(i) · c(i)` from 0.0,
  *     then `-acc / norm` with `norm = sqrt(Σ c(i)²)` precomputed on the
  *     driver by the same Scala fold as `Similarity.normLit`;
  *   - argmin uses Spark's nan-safe double ordering (NaN greatest,
  *     -0.0 == 0.0), ties to the LOWEST index — exactly
  *     `array_min` + first `array_position`;
  *   - null contract: null array → null; length ≠ dim → null (ArrayDot
  *     returns null per distance, array_min over all-null is null);
  *     any null element → null (poisons every distance equally).
  *
  * WHY an Expression when the Column form was already codegen'd: the
  * literal form is a tree of 2·k·dim Literal nodes (the dists array is
  * spelled twice for array_min + array_position), so every action pays
  * Catalyst analysis/optimization walks plus a janino compile over ~1k
  * inline terms — measured as the dominant cost of the iterative PQ/
  * kmeans benches (driver gap: q221 1.05 s wall vs 0.4 s of jobs). Here
  * the codebook rides along as ONE reference object (a double[][]), the
  * tree is a single node, and the generated code is a tight loop.
  *
  * LOCKSTEP: [[SilhouetteScore]] replicates this argmin rule internally
  * (its a/b distances key off the same assignment q310 groups by) —
  * any change to the ordering or null contract here must be mirrored
  * there, or q310's per-point scores silently desync from its cluster
  * column.
  */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.size == cents.head.size),
    "centroids must be non-empty and rectangular")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  }

  @transient private lazy val mat: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  // same driver-side fold as Similarity.normLit
  @transient private lazy val norms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum)).toArray

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = mat(0).length
    if (a.numElements() != dim) return null
    val isFloat = elemType.contains(FloatType)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var best = -1
    var bestD = 0.0
    var j = 0
    while (j < mat.length) {
      var acc = 0.0
      var p = 0
      while (p < dim) { acc += v(p) * mat(j)(p); p += 1 }
      val d = -acc / norms(j)
      // nan-safe strict less: d < bestD primitively, or bestD is NaN
      // while d is not (NaN sorts greatest; -0.0 == 0.0 → first wins)
      if (best < 0 || d < bestD ||
          (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(d))) {
        best = j; bestD = d
      }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, av => {
      val matRef = ctx.addReferenceObj("ncMat", mat, "double[][]")
      val normRef = ctx.addReferenceObj("ncNorms", norms, "double[]")
      val dim = mat(0).length
      val getter = elemType.get match {
        case FloatType => (i: String) => s"(double) $av.getFloat($i)"
        case _ => (i: String) => s"$av.getDouble($i)"
      }
      // every local from freshName: join codegen can inline several
      // instances flat into one method (q38 precedent)
      val v = ctx.freshName("ncV")
      val i = ctx.freshName("ncI")
      val j = ctx.freshName("ncJ")
      val p = ctx.freshName("ncP")
      val acc = ctx.freshName("ncAcc")
      val d = ctx.freshName("ncD")
      val best = ctx.freshName("ncBest")
      val bestD = ctx.freshName("ncBestD")
      val row = ctx.freshName("ncRow")
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
         |    int $best = -1; double $bestD = 0.0;
         |    for (int $j = 0; $j < ${mat.length}; $j++) {
         |      double[] $row = $matRef[$j];
         |      double $acc = 0.0;
         |      for (int $p = 0; $p < $dim; $p++) $acc += $v[$p] * $row[$p];
         |      double $d = -$acc / $normRef[$j];
         |      if ($best < 0 || $d < $bestD ||
         |          (Double.isNaN($bestD) && !Double.isNaN($d))) {
         |        $best = $j; $bestD = $d;
         |      }
         |    }
         |    ${ev.value} = $best;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  def nearest_centroid(vec: Column, cents: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NearestCentroid(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), cents))
}
