package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character (byte) n-gram keys of a text column, each n-byte window
  * packed big-endian into one BIGINT — the posting-list key for
  * trigram-index substring search (the pg_trgm move). Packing instead of
  * substring-slicing means zero collisions (n ≤ 8 bytes injective into
  * 64 bits), no UTF-8 boundary hazards (a byte window may split a
  * multi-byte sequence; a LONG key doesn't care, and needle keys are
  * derived from the same byte stream), and a fixed-width shuffle key.
  *
  * WHY an Expression: the HOF formulation
  * (`transform(sequence(...), i => substring(...))`) walks an
  * interpreted closure per character — the same trap WordShingles
  * closed for word shingles; this is one tight byte scan under
  * whole-stage codegen. Emits the empty array for texts shorter than n;
  * null text → null.
  */
case class CharGramKeys(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= 8, s"gram width must be in [1, 8], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_gram_keys requires a STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    CharGramKeys.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharGramKeys.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGramKeys =
    copy(child = newChild)

  override def prettyName: String = "char_gram_keys"
}

object CharGramKeys {

  /** Shared by eval and generated code: one rolling-pack byte scan. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val mask = if (n == 8) -1L else (1L << (8 * n)) - 1L
    val out = new Array[Any](len - n + 1)
    var acc = 0L
    var i = 0
    while (i < n - 1) { acc = (acc << 8) | (bytes(i) & 0xffL); i += 1 }
    while (i < len) {
      acc = ((acc << 8) | (bytes(i) & 0xffL)) & mask
      out(i - n + 1) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The identical packing for a driver-side needle string — the query
    * keys MUST come from the same byte stream as the index keys. */
  def keysOf(s: String, n: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < n) return Seq.empty
    val mask = if (n == 8) -1L else (1L << (8 * n)) - 1L
    (0 to bytes.length - n).map { j =>
      var acc = 0L
      var q = j
      while (q < j + n) { acc = (acc << 8) | (bytes(q) & 0xffL); q += 1 }
      acc & mask
    }
  }

  /** Column-API entry point. */
  def char_gram_keys(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharGramKeys(org.apache.spark.sql.GraftColumnBridge.expression(text), n))
}
