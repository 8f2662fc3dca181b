package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
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
  * Default tokenization differs from the composable `split(trim(text),
  * "\\s+")` (TextF.shingles — kept as the composable API) in ONE
  * edge: text starting (or ending, after space-only trim) with
  * non-space whitespace gives the split form a phantom empty token,
  * which the plain scan does not emit. `splitCompat = true`
  * reproduces the split convention EXACTLY — space-only trim, then a
  * phantom empty token wherever Java `split("\\s+", -1)` emits one —
  * so consumers whose DuckDB oracles tokenize with
  * `regexp_split_to_array(trim(text), '\s+')` agree with the engine
  * on EVERY input, not just corpora without tab/newline-edged text
  * (r18, ADVICE r17; property-tested against the real split in
  * KernelPropertySpec).
  *
  * `prime <= 0` skips the modulus: the raw xxhash64 (seed 42) value is
  * emitted, byte-identical to `xxhash64(shingle_string)` — required
  * when the hashes feed a sketch whose ESTIMATES are oracle-pinned
  * (dup_matrix_approx) and values therefore must not move.
  *
  * `dedup = false` keeps every occurrence in document order instead of
  * the per-doc distinct set — for operators that count occurrences
  * (total n-grams) as well as distincts (ngram_diversity).
  *
  * `pairSeed != 0` emits array<struct<h1, h2>> instead of
  * array<long>: h1 is the usual seed-42 hash, h2 the same bytes under
  * `pairSeed` — a 128-bit gram key whose collision odds are nil at
  * any corpus size (the r17 verdict's hardening of ngram_diversity's
  * exact leg: a 64-bit key's birthday bound becomes material near
  * 10¹⁰ distinct grams; two independent seeds push it past 10¹⁸).
  * Incompatible with `prime > 0` (the modulus exists to compress the
  * key, the pair to widen it).
  */
case class ShingleHashes(child: Expression, n: Int, prime: Long,
                         strict: Boolean = false, dedup: Boolean = true,
                         splitCompat: Boolean = false, pairSeed: Long = 0L)
  extends UnaryExpression with ExpectsInputTypes {

  require(pairSeed == 0L || prime <= 0L,
    "pairSeed (128-bit keys) cannot combine with a compressing prime")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    if (pairSeed != 0L)
      ArrayType(StructType(Seq(StructField("h1", LongType, nullable = false),
        StructField("h2", LongType, nullable = false))), containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Public so generated code can call it through the reference obj. */
  def shingleHash(u: UTF8String): GenericArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    // token boundaries (s == e encodes a phantom EMPTY token —
    // splitCompat only)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    if (splitCompat) {
      // Reproduce split(trim(text), "\\s+") with limit -1: space-ONLY
      // trim first, then Java-split semantics — a leading empty token
      // when the remainder starts with whitespace, a trailing one
      // when it ends with whitespace, and [""] for the empty string.
      var lo = 0
      var hi = len
      while (lo < hi && bytes(lo) == ' ') lo += 1
      while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
      if (lo >= hi) { starts.add(lo); ends.add(lo) } // "" → [""]
      else {
        if (isWs(bytes(lo))) { starts.add(lo); ends.add(lo) }
        var i = lo
        while (i < hi) {
          while (i < hi && isWs(bytes(i))) i += 1
          val s = i
          while (i < hi && !isWs(bytes(i))) i += 1
          if (i > s) { starts.add(s); ends.add(i) }
        }
        if (isWs(bytes(hi - 1))) { starts.add(hi); ends.add(hi) }
      }
    } else {
      var i = 0
      while (i < len) {
        while (i < len && isWs(bytes(i))) i += 1
        val s = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (i > s) { starts.add(s); ends.add(i) }
      }
    }
    val nTok = starts.size()
    // dedup=true: LinkedHashSet semantics; dedup=false: plain append.
    // Pair mode keys dedup on the full 128-bit value.
    val pair = pairSeed != 0L
    val out = new java.util.LinkedHashSet[AnyRef]()
    val all = if (dedup) null else new java.util.ArrayList[AnyRef]()
    def hashBuf(buf: Array[Byte], length: Int): Unit = {
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, length, 42L)
      val v: AnyRef =
        if (pair) {
          val h2 = XXH64.hashUnsafeBytes(
            buf, Platform.BYTE_ARRAY_OFFSET, length, pairSeed)
          (h, h2)
        } else java.lang.Long.valueOf(
          if (prime <= 0L) h else java.lang.Math.floorMod(h, prime))
      if (dedup) out.add(v) else all.add(v)
    }
    if (nTok < n && strict) {
      // strict mode: a doc shorter than the shingle width contributes
      // NOTHING (decontamination semantics — single shared words must
      // not poison the corpus; cf. TextF.strictShingles)
    } else if (nTok == 0) {
      hashBuf(Array.emptyByteArray, 0)
    } else if (nTok < n) {
      // short-doc fallback: each token is its own shingle
      var t = 0
      while (t < nTok) {
        val s = starts.get(t); val e = ends.get(t)
        val buf = java.util.Arrays.copyOfRange(bytes, s, e)
        hashBuf(buf, buf.length)
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
        hashBuf(buf, pos)
        first += 1
      }
    }
    val src: java.util.Collection[AnyRef] = if (dedup) out else all
    if (pair) {
      val arr = new Array[Any](src.size())
      val it = src.iterator(); var j = 0
      while (it.hasNext) {
        val (h1, h2) = it.next().asInstanceOf[(Long, Long)]
        arr(j) = new GenericInternalRow(Array[Any](h1, h2)): InternalRow
        j += 1
      }
      new GenericArrayData(arr)
    } else {
      val arr = new Array[Long](src.size())
      val it = src.iterator(); var j = 0
      while (it.hasNext) {
        arr(j) = it.next().asInstanceOf[java.lang.Long].longValue(); j += 1
      }
      new GenericArrayData(arr)
    }
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
