package graft.expressions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Accumulator for one task's per-position vector sums: a long per
  * position on the fast path (BigInteger-banked on overflow — exact at
  * any corpus size) plus the per-position row counts that the
  * posexplode formulation's `count(lit(1))` produced. */
final class VecSumBuffer(val dim: Int) {
  val sums = new Array[Long](dim)
  val counts = new Array[Long](dim)
  var bigs: Array[BigInteger] = _ // allocated on first overflow only

  def addLong(k: Int, p: Long): Unit = {
    val a = sums(k)
    val s = a + p
    if (((a ^ s) & (p ^ s)) < 0) {
      if (bigs == null) bigs = new Array[BigInteger](dim)
      val av = BigInteger.valueOf(a)
      bigs(k) = if (bigs(k) == null) av else bigs(k).add(av)
      sums(k) = p
    } else sums(k) = s
  }

  def addBig(k: Int, b: BigInteger): Unit = {
    if (b != null) {
      if (bigs == null) bigs = new Array[BigInteger](dim)
      bigs(k) = if (bigs(k) == null) b else bigs(k).add(b)
    }
  }

  def total(k: Int): BigInteger = {
    val l = BigInteger.valueOf(sums(k))
    if (bigs == null || bigs(k) == null) l else bigs(k).add(l)
  }
}

/** One-pass per-position snapped vector sums — the aggregate form of the
  * Lloyd recompute's posexplode scan: for each input array, add
  * `floor(v_pos·10^snap + 0.5)` (Spark's LONG floor — identical to
  * `roundHalfUp(v, snap)` before its DECIMAL cast, whose snapped values
  * round-trip the double exactly at our magnitudes) into position
  * `pos`, and count the row at every position it covers. Output:
  * struct(sums: array<decimal(38,snap)>, counts: array<long>) — the
  * exact SUM and COUNT the `groupBy(cell, pos)` formulation shipped,
  * without the dim× row fan-out.
  *
  * WHY an aggregate: the posexplode form multiplies every row by dim
  * before the hash aggregate — 64 generate + hash-update + Decimal-sum
  * steps per vector per Lloyd iteration, on every trainer in the vector
  * family (kmeans, IVF coarse cells, each PQ subspace). Here a row is a
  * tight dim-long loop into a long[] ([[VecSumBuffer]]), one buffer per
  * task on the shuffle.
  *
  * Row contract (mirrors posexplode + count(lit(1)) + null-skipping
  * SUM): null array → contributes nothing anywhere; a row counts toward
  * position pos iff pos < numElements (positions past `dim` are
  * ignored — the trainers define dim from the data's fixed width); a
  * null ELEMENT counts in the denominator but adds nothing to the sum —
  * exactly `count(lit(1))` vs null-skipping `sum`.
  *
  * Magnitude bound (same class as componentFromMoments' 2⁵³ assert):
  * the long floor here is EXACT, while the Column form it replaces —
  * and the kmeansCte oracle that replays it — round-trips each snapped
  * value through a double (`floor→long / 10^snap` then the DECIMAL
  * cast). The round trip is lossless while |v·10^snap| < ~2⁵²; past it
  * (|v| ≳ 4.5·10⁵ at snap=10) the engines can disagree by 1 ulp of the
  * snap. Unit-scale embeddings are orders of magnitude inside the
  * bound; training on unnormalized data should lower `snap`. The bound
  * is ENFORCED in `update` (throws past 2⁵², like
  * componentFromMoments' 2⁵³ assert) — the divergence can never flip a
  * gate hash silently. */
case class VectorMeanAgg(child: Expression, dim: Int, snap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] with UnaryLike[Expression] {

  require(dim >= 1 && snap >= 0)

  @transient private lazy val p = math.pow(10, snap)

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DecimalType(38, snap), containsNull = false),
      nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_mean requires ARRAY<DOUBLE>, got ${other.sql}")
  }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer(dim)

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      buf.counts(i) += 1
      if (!arr.isNullAt(i)) {
        val snapped = math.floor(arr.getDouble(i) * p + 0.5)
        // docstring's magnitude bound, ENFORCED (advice r10, the
        // componentFromMoments discipline): past |v·10^snap| ~ 2^52 the
        // oracle's double round-trip of the same snap can differ by an
        // ulp — fail loudly instead of flipping gate hashes silently.
        // NaN passes (the comparison is false) and keeps the Column
        // form's NaN→0 long cast.
        if (math.abs(snapped) >= 4503599627370496.0) {
          throw new IllegalArgumentException(
            s"vector_mean: |value * 10^$snap| = ${math.abs(snapped)} " +
              "exceeds the 2^52 double-round-trip bound shared with the " +
              "oracle replay - lower `snap` for unnormalized data")
        }
        buf.addLong(i, snapped.toLong)
      }
      i += 1
    }
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    var k = 0
    while (k < dim) {
      buf.addLong(k, other.sums(k))
      buf.counts(k) += other.counts(k)
      if (other.bigs != null) buf.addBig(k, other.bigs(k))
      k += 1
    }
    buf
  }

  override def eval(buf: VecSumBuffer): Any = {
    val sums = new GenericArrayData(Array.tabulate[Any](dim)(k =>
      Decimal(scala.math.BigDecimal(
        new java.math.BigDecimal(buf.total(k), snap)), 38, snap)))
    val counts = new GenericArrayData(buf.counts.clone())
    InternalRow(sums, counts)
  }

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bigBytes = new Array[Array[Byte]](dim)
    var extra = 0
    var cnt = 0
    if (buf.bigs != null) {
      var k = 0
      while (k < dim) {
        if (buf.bigs(k) != null) {
          bigBytes(k) = buf.bigs(k).toByteArray
          extra += 8 + bigBytes(k).length
          cnt += 1
        }
        k += 1
      }
    }
    val bb = ByteBuffer.allocate(8 + 16 * dim + extra)
    bb.putInt(dim)
    var k = 0
    while (k < dim) { bb.putLong(buf.sums(k)); k += 1 }
    k = 0
    while (k < dim) { bb.putLong(buf.counts(k)); k += 1 }
    bb.putInt(cnt)
    k = 0
    while (k < dim) {
      if (bigBytes(k) != null) {
        bb.putInt(k)
        bb.putInt(bigBytes(k).length)
        bb.put(bigBytes(k))
      }
      k += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt()
    val buf = new VecSumBuffer(m)
    var k = 0
    while (k < m) { buf.sums(k) = bb.getLong(); k += 1 }
    k = 0
    while (k < m) { buf.counts(k) = bb.getLong(); k += 1 }
    val cnt = bb.getInt()
    var c = 0
    while (c < cnt) {
      val idx = bb.getInt()
      val len = bb.getInt()
      val a = new Array[Byte](len)
      bb.get(a)
      buf.addBig(idx, new BigInteger(a))
      c += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): VectorMeanAgg =
    copy(child = newChild)

  override def prettyName: String = "vector_mean"
}

object VectorMeanAgg {
  /** Column-API entry point (an aggregate Column: use under `.agg`). */
  def vector_mean(vec: Column, dim: Int, snap: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      VectorMeanAgg(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), dim, snap)
        .toAggregateExpression())
}
