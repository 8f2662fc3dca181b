package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character n-gram hashing: the xxhash64 (seed 42) of every
  * length-`n` CHARACTER window of the input, one entry per occurrence
  * (NOT deduplicated — corpus LM scoring is occurrence-weighted),
  * byte-identical to `xxhash64(substring(s, i, n))` for each window.
  *
  * Replaces the interpreted pipeline
  * `transform(sequence(0, len-n), i -> substr(...))` + string-keyed
  * aggregation, whose per-window lambda evaluation, 30M short-string
  * allocations, and string shuffle keys dominated lm_quality (~20 s at
  * sf0.1 for a ~3 s job). Downstream keys on the 64-bit hash; the
  * DuckDB oracle keys on the gram STRING — identical group counts,
  * the contract boilerplate_stats/decontaminate already rely on
  * (63-bit collision odds are nil and the hash compare itself
  * verifies).
  *
  * Windows are CHARACTER windows (UTF-8 boundary scan), so a
  * multibyte code point is one position — matching `substring`
  * semantics, not byte windows. Inputs shorter than `n` characters
  * emit an empty array (explode then drops the document, mirroring
  * `when(length(t) >= n, ...)` of the composable form).
  */
case class CharNgramHashes(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"n must be positive, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  /** Public so generated code can call it through the reference obj. */
  def ngramHashes(u: UTF8String): GenericArrayData = {
    val bytes = u.getBytes // compact copy when the string is offheap/offset
    val len = bytes.length
    // char-boundary offsets: offs(i) = byte offset of char i; offs has
    // one extra slot so a window's end byte is always offs(i + n).
    val offs = new Array[Int](len + 1)
    var nChars = 0
    var b = 0
    while (b < len) {
      offs(nChars) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    offs(nChars) = len
    if (nChars < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nChars - n + 1)
    var i = 0
    while (i <= nChars - n) {
      out(i) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offs(i),
        offs(i + n) - offs(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    ngramHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charNgramHashes", this, classOf[CharNgramHashes].getName)
    defineCodeGen(ctx, ev, c => s"$self.ngramHashes($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}
