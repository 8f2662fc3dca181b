package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct shingle hashing: tokenize on ASCII-whitespace
  * runs, hash every `n`-token shingle (tokens joined by a single
  * space, xxhash64 seed 42 — byte-identical to
  * `xxhash64(concat_ws(" ", slice(tokens, i, n)))`), reduce below
  * `prime`, and de-duplicate — all inside one generated-code call.
  *
  * Replaces the interpreted pipeline
  * `transform(array_distinct(shingles(text, n)), xxhash64 ∘ pmod)`
  * whose per-shingle lambda evaluation and intermediate string arrays
  * dominated dedup_minhash/dedup_jaccard (10 s / 7 s at sf0.1 AFTER
  * the signature itself went native).
  *
  * Documents with fewer than n tokens shingle each token alone (the
  * short-doc fallback of TextF.shingles); zero-token documents emit
  * the hash of the empty string, matching `split(trim(""), "\\s+") =
  * [""]` — so every doc has a non-empty, content-determined shingle
  * set and empty docs (which ARE byte-identical) cluster together.
  * With `strict = true` short documents instead contribute an EMPTY
  * set (TextF.strictShingles semantics — decontamination must not
  * fall back to unigrams).
  *
  * Tokenization differs from the composable `split(trim(text),
  * "\\s+")` (TextF.shingles — kept as the composable API) in ONE
  * edge: text starting with non-space whitespace (e.g. a tab) gives
  * the split form a phantom leading empty token, which this scanner
  * correctly does not emit.
  *
  * `prime <= 0` skips the modulus: the raw xxhash64 (seed 42) value is
  * emitted, byte-identical to `xxhash64(shingle_string)` — required
  * when the hashes feed a sketch whose ESTIMATES are oracle-pinned
  * (dup_matrix_approx) and values therefore must not move.
  *
  * `dedup = false` keeps every occurrence in document order instead of
  * the per-doc distinct set — for operators that count occurrences
  * (total n-grams) as well as distincts (ngram_diversity).
  */
case class ShingleHashes(child: Expression, n: Int, prime: Long,
                         strict: Boolean = false, dedup: Boolean = true)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Public so generated code can call it through the reference obj. */
  def shingleHash(u: UTF8String): GenericArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    // token boundaries
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s) { starts.add(s); ends.add(i) }
    }
    val nTok = starts.size()
    // dedup=true: LinkedHashSet semantics; dedup=false: plain append.
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val all = if (dedup) null else new java.util.ArrayList[java.lang.Long]()
    def add(v: Long): Unit =
      if (dedup) out.add(v) else all.add(v)
    def hashRange(buf: Array[Byte], length: Int): Long = {
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, length, 42L)
      if (prime <= 0L) h else java.lang.Math.floorMod(h, prime)
    }
    if (nTok < n && strict) {
      // strict mode: a doc shorter than the shingle width contributes
      // NOTHING (decontamination semantics — single shared words must
      // not poison the corpus; cf. TextF.strictShingles)
    } else if (nTok == 0) {
      add(hashRange(Array.emptyByteArray, 0))
    } else if (nTok < n) {
      // short-doc fallback: each token is its own shingle
      var t = 0
      while (t < nTok) {
        val s = starts.get(t); val e = ends.get(t)
        val buf = java.util.Arrays.copyOfRange(bytes, s, e)
        add(hashRange(buf, buf.length))
        t += 1
      }
    } else {
      val buf = new Array[Byte](len + n) // upper bound: tokens + separators
      var first = 0
      while (first <= nTok - n) {
        var pos = 0
        var k = 0
        while (k < n) {
          if (k > 0) { buf(pos) = ' '; pos += 1 }
          val s = starts.get(first + k); val e = ends.get(first + k)
          System.arraycopy(bytes, s, buf, pos, e - s)
          pos += e - s
          k += 1
        }
        add(hashRange(buf, pos))
        first += 1
      }
    }
    val src: java.util.Collection[java.lang.Long] = if (dedup) out else all
    val arr = new Array[Long](src.size())
    val it = src.iterator(); var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(input: Any): Any =
    shingleHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    defineCodeGen(ctx, ev, c => s"$self.shingleHash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
