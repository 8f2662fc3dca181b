package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen MinHash signature: all `k` affine-permutation minima
  * `min_h((h*a_j + b_j) mod p)` computed in ONE fused pass over the
  * input hash array.
  *
  * The composable alternative — `array(64 × array_min(transform(...)))`
  * — embeds the shingle-hash subtree into every permutation element;
  * higher-order functions are interpreted and get no common-subexpression
  * elimination, so shingling was recomputed 64× per row (round-2 bench:
  * 384 s vs <15 s for every other query at sf0.1). This expression is
  * O(n·k) arithmetic inside whole-stage codegen, the form that survives
  * a 100 TB scan.
  *
  * Each element is reduced below `prime` (< 2^31) with floorMod
  * before the permutations, so arbitrary 64-bit hashes are safe at
  * the SQL surface (with a,b < 2^31 the product then stays under
  * 2^62 — no int64 overflow); pre-reduced inputs pass through
  * unchanged. NULL input → NULL; NULL elements are skipped like
  * array_min; an empty/all-NULL array (doc with no shingles) → NULL,
  * so callers can route empty docs to singleton clusters explicitly.
  */
case class MinHashSignature(
    child: Expression,
    coeffA: Seq[Long],
    coeffB: Seq[Long],
    prime: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(coeffA.length == coeffB.length && coeffA.nonEmpty,
    "coefficient vectors must be non-empty and equal-length")
  private def k = coeffA.length
  private lazy val aArr: Array[Long] = coeffA.toArray
  private lazy val bArr: Array[Long] = coeffB.toArray

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input yields NULL
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // NULL elements are skipped, matching array_min semantics in the
      // composable formulation (SQL callers can pass arrays with NULLs).
      if (!arr.isNullAt(i)) {
        val h = java.lang.Math.floorMod(arr.getLong(i), prime)
        var j = 0
        while (j < k) {
          val v = (h * aArr(j) + bArr(j)) % prime
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (sig(0) == Long.MaxValue) return null // all elements were NULL
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val sig = ctx.freshName("sig")
      s"""
        |int $n = $c.numElements();
        |if ($n == 0) { ${ev.isNull} = true; } else {
        |  long[] $sig = new long[$k];
        |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($c.isNullAt($i)) continue; // skip NULLs like array_min
        |    long $h = java.lang.Math.floorMod($c.getLong($i), ${prime}L);
        |    for (int $j = 0; $j < $k; $j++) {
        |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
        |      if ($v < $sig[$j]) $sig[$j] = $v;
        |    }
        |  }
        |  if ($sig[0] == Long.MAX_VALUE) { ${ev.isNull} = true; } // all NULL
        |  else { ${ev.value} = ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($sig); }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
