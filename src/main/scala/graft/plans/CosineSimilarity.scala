package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression computing cosine similarity of two
  * double arrays with whole-stage codegen — a single fused loop, no
  * higher-order-function interpreter overhead and no UDF
  * serialization. This keeps the 100 TB ANN scan inside
  * WholeStageCodegen.
  *
  * Accumulation order is sequential (index 0..n-1) so results are
  * bit-stable and match a scalar reference implementation.
  * Returns NULL if either norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Return type inferred: AbstractDataType is private[sql] and cannot
  // be named here.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Nullable beyond child-nullability: zero-norm input yields NULL.
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val denom = ctx.freshName("denom")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xv = $a.getDouble($i);
        |  double $yv = $b.getDouble($i);
        |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        |}
        |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        |if ($denom == 0.0) { ${ev.isNull} = true; }
        |else { ${ev.value} = $dot / $denom; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
