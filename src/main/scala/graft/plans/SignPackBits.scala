package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-bit packing for 1-bit embedding quantization: bit `i` of the
  * result is set iff `embedding[from + i] > 0` (strictly — zeros and
  * nulls pack as 0), for i in [0, 32). Two calls (`from` = 0 and 32)
  * turn a 64-dim float vector into two 32-bit codes whose pairwise
  * Hamming distance is two XOR+POPCNT ops.
  *
  * Exists as ONE scalar expression node because the equivalent
  * composition — 64 `when(element_at(..) > 0, 1L << i)` terms summed —
  * is semantically identical but generates a multi-kilobyte codegen
  * method whose JIT/compile cost dominates the whole query at bench
  * scale and recompiles per plan use. Here the generated code is a
  * single method call per row, like the library's other native
  * expressions ([[SimHash64]], [[CosineSimilarity]]).
  */
case class SignPackBits(child: Expression, from: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(from >= 0, s"from must be >= 0, got $from")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_pack_bits"

  /** Public so generated code can call it through the reference obj. */
  def pack(a: ArrayData): Long = {
    val n = a.numElements()
    var code = 0L
    var i = 0
    while (i < 32) {
      val idx = from + i
      if (idx < n && !a.isNullAt(idx) && a.getFloat(idx) > 0f) code |= (1L << i)
      i += 1
    }
    code
  }

  override protected def nullSafeEval(input: Any): Any =
    pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signPackBits", this, classOf[SignPackBits].getName)
    defineCodeGen(ctx, ev, c => s"$self.pack($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignPackBits =
    copy(child = newChild)
}
