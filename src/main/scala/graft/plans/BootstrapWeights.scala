package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic Poisson(1) bootstrap multiplicities for one row:
  * weight b comes from the md5 of `"<id>:<chunk>"` (chunk = (b-1)/4),
  * taking 32-bit big-endian slice (b-1)%4 of the digest as a uniform
  * and stepping it through the Poisson(1) CDF. Bit-identical to the
  * composable form `conv(substring(md5(concat(id, ':', chunk)), 1+8p,
  * 8), 16, 10)` — the DuckDB oracle parses the same hex prefixes — but
  * one JVM call per row instead of `reps` interpreted
  * substring/base-16-parse/CASE chains (which dominated the query in
  * both the explode and the unrolled-column formulations).
  */
case class BootstrapWeights(child: Expression, reps: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(reps > 0, s"reps must be positive, got $reps")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bootstrap_weights"

  // P(Poisson(1) <= k) · 2^32, the integer form of the CDF thresholds
  // 0.36787944 / 0.73575888 / 0.9196986 / 0.98101184 / 0.99634015 the
  // composable expression compares against as doubles: u32 < t·2^32
  // iff u32/2^32 < t because t·2^32 is not an integer.
  private val Cdf: Array[Long] = Array(0.36787944, 0.73575888, 0.9196986,
    0.98101184, 0.99634015).map(t => math.ceil(t * 4294967296.0).toLong)

  // One digest instance per thread: the reference obj is shared across
  // a stage's tasks and MessageDigest is stateful; digest() resets it.
  @transient private lazy val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** Public so generated code can call it through the reference obj. */
  def weights(id: Long): GenericArrayData = {
    val md = mdLocal.get()
    val out = new Array[Long](reps)
    var b = 0
    while (b < reps) {
      val chunk = b / 4
      val d = md.digest(s"$id:$chunk".getBytes(StandardCharsets.US_ASCII))
      var p = b % 4
      while (p < 4 && b < reps) {
        val u32 = ((d(4 * p) & 0xffL) << 24) | ((d(4 * p + 1) & 0xffL) << 16) |
          ((d(4 * p + 2) & 0xffL) << 8) | (d(4 * p + 3) & 0xffL)
        var w = 0
        while (w < Cdf.length && u32 >= Cdf(w)) w += 1
        out(b) = w.toLong
        p += 1
        b += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    weights(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bootstrapWeights", this, classOf[BootstrapWeights].getName)
    defineCodeGen(ctx, ev, c => s"$self.weights($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BootstrapWeights =
    copy(child = newChild)
}
