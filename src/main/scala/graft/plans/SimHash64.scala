package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column as a native expression. The typed
  * `Dataset.map` formulation forced a full row encode/decode per row
  * and dropped out of the columnar/codegen path; this stays inside
  * whole-stage codegen with one scalar call per row. Bit-identical to
  * [[graft.operators.Dedup.simhashOf]] over `trim.split("\\s+")`
  * tokens (DedupSpec asserts the equivalence).
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  /** Public so generated code can call it through the reference obj. */
  def simhash(u: UTF8String): Long =
    graft.operators.Dedup.simhashOf(SimHash64.tokenize(u.toString))

  override protected def nullSafeEval(input: Any): Any =
    simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhash64", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$self.simhash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  /** `trim.split("\\s+")` with the pattern compiled once (String.split
    * recompiles multi-char regexes on every call). */
  def tokenize(s: String): Array[String] = Ws.split(s.trim)
}
