package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize-and-score: splits the input on ASCII-whitespace
  * runs (the same class Java's `\s` matches, so semantics align with
  * `split(text, "\\s+")`) and sums each token's value from a word→long
  * map — a constant-time hash lookup per token.
  *
  * The composable form (`aggregate(split(...), acc + element_at(map,
  * t))`) is interpreted per token and `element_at` on a map literal is
  * a linear scan of all entries with string compares; over a corpus
  * that's tokens × entries string equality checks (lang_id: 6.9 s at
  * sf0.1). Here the scan stays byte-level (UTF-8 multibyte units never
  * collide with ASCII whitespace) and the whole operator remains
  * map-side inside whole-stage codegen.
  */
case class PackedWordScore(child: Expression, words: Seq[(String, Long)], laneBits: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(laneBits > 0 && laneBits <= 32, "laneBits must be in [1, 32]")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "packed_word_score"

  private def laneCount = 64 / laneBits // floor: trailing bits unused
  private def laneMask = (1L << laneBits) - 1

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](words.size * 2)
    words.foreach { case (w, v) => m.put(UTF8String.fromString(w), v) }
    m
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Public so generated code can call it through the reference obj.
    * Counters accumulate per lane in full longs and saturate at the
    * lane maximum when packed — a naive packed add carries a >4095
    * count into the neighboring lane (a 16k-token doc would corrupt
    * the adjacent language's score). */
  def score(u: UTF8String): Long = {
    val bytes = u.getBytes
    val counters = new Array[Long](laneCount)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val v = lookup.get(UTF8String.fromBytes(bytes, start, i - start))
        if (v != null) {
          val mask = v.longValue()
          var j = 0
          while (j < laneCount) {
            counters(j) += (mask >>> (j * laneBits)) & laneMask
            j += 1
          }
        }
      }
    }
    var acc = 0L
    var j = 0
    while (j < laneCount) {
      acc |= math.min(counters(j), laneMask) << (j * laneBits)
      j += 1
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("packedWordScore", this, classOf[PackedWordScore].getName)
    defineCodeGen(ctx, ev, c => s"$self.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PackedWordScore =
    copy(child = newChild)
}
