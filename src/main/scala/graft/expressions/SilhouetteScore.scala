package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Per-point simplified-silhouette score against a literal centroid
  * list: assign by the Lloyd cosine argmin ([[NearestCentroid]]'s exact
  * ordering), then a = Euclidean distance to the assigned centroid,
  * b = the nearest OTHER centroid, s = roundHalfUp₈((b − a)/max(a, b))
  * (0.0 when the max is 0 — the duplicate-centroid case).
  *
  * Bit-for-bit the Column formulation it replaces (parity-spec'd):
  * distances are `sqrt(max((v·v − 2·v·c_j) + c_j·c_j, 0))` with
  * ArrayDot's left fold, v·v folded once, c_j·c_j the driver-side fold;
  * the rounding numerator is Spark's LONG floor. Null contract: null
  * array / length mismatch / null element → null. One deliberate
  * divergence: the Column form masked the assigned cell with a
  * Double.MaxValue sentinel inside least(), so if every OTHER distance
  * overflows to Infinity (components ~1e155) the sentinel itself wins
  * there; here b is the true min over the others (Infinity), s = NaN →
  * collapses to 0.0 through the LONG floor. DuckDB's double FLOOR keeps
  * NaN (and a NaN DECIMAL cast would error), so the q310 oracle mirrors
  * the collapse with an explicit `isnan((b-a)/max) → 0.0` branch
  * (advice r10) rather than relying on its roundHalfUpSql.
  *
  * The argmin pass replicates [[NearestCentroid]]'s rule EXACTLY (and
  * must stay in lockstep with it — q310 groups by NearestCentroid's
  * cluster and the oracle assigns once for both, so a desync flips the
  * gate): first-min, NaN-greatest, -dot/|c| with the same norm fold.
  *
  * WHY an Expression: the Column form spells the k distance expressions
  * as CaseWhen chains over 2·k literal-array dots — ~2k literal nodes
  * that Catalyst re-analyzes and janino re-compiles per action
  * (measured 26.7 s at sf1 vs 2.7 s for the identical Lloyd training —
  * the q221 driver-compile lesson). Here the centroids ride as one
  * `double[][]` reference object and the whole score is a tight loop.
  */
case class SilhouetteScore(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.size >= 2 && cents.forall(_.size == cents.head.size),
    "silhouette needs >= 2 rectangular centroids")

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
      s"silhouette_score requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  }

  @transient private lazy val mat: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  // the Lloyd assignment ordering's norms (same fold as Similarity.normLit)
  @transient private lazy val norms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum)).toArray
  // c·c with the ArrayDot fold (+0.0 identity makes foldLeft identical)
  @transient private lazy val ccs: Array[Double] =
    cents.map(_.foldLeft(0.0)((acc, x) => acc + x * x)).toArray
  // per-instance scratch (eval is single-threaded per task)
  @transient private lazy val scratchDots = new Array[Double](cents.size)

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
    var vv = 0.0
    i = 0
    while (i < dim) { vv += v(i) * v(i); i += 1 }
    // pass 1: the cosine argmin (NearestCentroid's exact rule), caching
    // the k dot products for pass 2 (per-buffer scratch — zero per-row
    // allocation, and half the multiply-adds)
    val dots = scratchDots
    var best = -1
    var bestD = 0.0
    var aDist = 0.0
    var bDist = 0.0
    var j = 0
    while (j < mat.length) {
      var dot = 0.0
      var p = 0
      while (p < dim) { dot += v(p) * mat(j)(p); p += 1 }
      dots(j) = dot
      val d = -dot / norms(j)
      if (best < 0 || d < bestD ||
          (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(d))) {
        best = j; bestD = d
      }
      j += 1
    }
    // pass 2: Euclidean a (assigned) and min-other b from the cached dots
    var haveB = false
    j = 0
    while (j < mat.length) {
      val e = math.sqrt(math.max((vv - (2.0 * dots(j))) + ccs(j), 0.0))
      if (j == best) aDist = e
      else if (!haveB || java.lang.Double.compare(e, bDist) < 0) {
        bDist = e; haveB = true
      }
      j += 1
    }
    val g = math.max(aDist, bDist)
    if (g == 0.0) 0.0
    else math.floor((bDist - aDist) / g * 1e8 + 0.5).toLong.toDouble / 1e8
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, av => {
      val matRef = ctx.addReferenceObj("ssMat", mat, "double[][]")
      val normRef = ctx.addReferenceObj("ssNorms", norms, "double[]")
      val ccRef = ctx.addReferenceObj("ssCcs", ccs, "double[]")
      val dim = mat(0).length
      val getter = elemType.get match {
        case FloatType => (i: String) => s"(double) $av.getFloat($i)"
        case _ => (i: String) => s"$av.getDouble($i)"
      }
      val v = ctx.freshName("ssV")
      val i = ctx.freshName("ssI")
      val j = ctx.freshName("ssJ")
      val p = ctx.freshName("ssP")
      val vv = ctx.freshName("ssVv")
      val dot = ctx.freshName("ssDot")
      val d = ctx.freshName("ssD")
      val e = ctx.freshName("ssE")
      val best = ctx.freshName("ssBest")
      val bestD = ctx.freshName("ssBestD")
      val aD = ctx.freshName("ssA")
      val bD = ctx.freshName("ssB")
      val haveB = ctx.freshName("ssHaveB")
      val g = ctx.freshName("ssG")
      val row = ctx.freshName("ssRow")
      // operator-lifetime scratch for the k cached dot products (one
      // allocation per task, not per row)
      val dots = ctx.addMutableState("double[]", "ssDots",
        n => s"$n = new double[${mat.length}];")
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
         |    double $vv = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) $vv += $v[$i] * $v[$i];
         |    int $best = -1; double $bestD = 0.0;
         |    double $aD = 0.0; double $bD = 0.0; boolean $haveB = false;
         |    for (int $j = 0; $j < ${mat.length}; $j++) {
         |      double[] $row = $matRef[$j];
         |      double $dot = 0.0;
         |      for (int $p = 0; $p < $dim; $p++) $dot += $v[$p] * $row[$p];
         |      $dots[$j] = $dot;
         |      double $d = -$dot / $normRef[$j];
         |      if ($best < 0 || $d < $bestD ||
         |          (Double.isNaN($bestD) && !Double.isNaN($d))) {
         |        $best = $j; $bestD = $d;
         |      }
         |    }
         |    for (int $j = 0; $j < ${mat.length}; $j++) {
         |      double $e = Math.sqrt(Math.max(($vv - (2.0 * $dots[$j])) + $ccRef[$j], 0.0));
         |      if ($j == $best) $aD = $e;
         |      else if (!$haveB || Double.compare($e, $bD) < 0) {
         |        $bD = $e; $haveB = true;
         |      }
         |    }
         |    double $g = Math.max($aD, $bD);
         |    ${ev.value} = ($g == 0.0) ? 0.0
         |      : ((double) (long) Math.floor(($bD - $aD) / $g * 1.0E8 + 0.5)) / 1.0E8;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SilhouetteScore =
    copy(child = newChild)

  override def prettyName: String = "silhouette_score"
}

object SilhouetteScore {
  def silhouette_score(vec: Column, cents: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SilhouetteScore(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), cents))
}
