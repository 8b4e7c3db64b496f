package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles of a text column: whitespace tokens joined k-at-a-time
  * with a single space — `shingles("a b c d", 3) = ["a b c", "b c d"]`,
  * empty array when the document has fewer than k tokens.
  *
  * Bit-identical to the HOF formulation it replaces
  * (`transform(sequence(0, size(t)-k), i => concat_ws(" ",
  * slice(t, i+1, k)))` over `filter(split(text, "\\s+"), _ != "")`):
  * tokens are the maximal runs of non-whitespace, where whitespace is
  * Java regex `\s` = ASCII 0x09–0x0D and 0x20 — all single-byte in
  * UTF-8, so the scan works on raw bytes and never decodes. Every gated
  * value and DuckDB oracle twin is unchanged.
  *
  * WHY an Expression: higher-order functions have no `doGenCode`; the
  * HOF chain walked an interpreted closure tree per shingle
  * (~10 µs/shingle measured — the dominant CPU of the whole
  * jaccard/minhash/tfidf dedup family's corpus scan). This runs one
  * tight byte-scan per row inside whole-stage codegen.
  *
  * Null contract: null text → null (the HOF chain's `bindOnce` over a
  * null array also yielded null).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** Java-regex `\s` on the ASCII plane (multi-byte UTF-8 units all have
    * the high bit set, so a byte-level test is exact). */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Single tight pass shared by eval and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token offsets: [starts(i), ends(i))
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var t = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        if (t == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(t) = i
        while (i < n && !isWs(bytes(i))) i += 1
        ends(t) = i
        t += 1
      }
    }
    if (t < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](t - k + 1)
    var j = 0
    while (j <= t - k) {
      var len = k - 1 // k-1 joining spaces
      var q = j
      while (q < j + k) { len += ends(q) - starts(q); q += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      q = j
      while (q < j + k) {
        if (q > j) { buf(pos) = ' '; pos += 1 }
        val l = ends(q) - starts(q)
        System.arraycopy(bytes, starts(q), buf, pos, l)
        pos += l
        q += 1
      }
      out(j) = UTF8String.fromBytes(buf)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def word_shingles(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordShingles(org.apache.spark.sql.GraftColumnBridge.expression(text), k))
}
