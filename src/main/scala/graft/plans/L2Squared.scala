package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared-L2 distance between two double arrays — one fused
  * codegen loop, sequential accumulation (index order) so the result
  * is bit-stable. The interpreted `aggregate(zip_with(...))` form
  * walks an expression tree per element; at PQ-training volume
  * (vectors × subspaces × centroids × Lloyd rounds) that interpreter
  * overhead dominated the whole ann_pq query. Sibling of
  * [[CosineSimilarity]].
  *
  * Length-mismatched inputs return NULL: silently truncating to the
  * shorter array would UNDERSTATE the distance (an empty array would
  * "perfectly match" everything) — for a distance that is the worst
  * possible failure direction, so mismatches degrade to NULL like
  * CosineSimilarity's zero-norm case and drop out of any argmin.
  */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Nullable beyond child-nullability: length mismatch yields NULL.
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) { ${ev.isNull} = true; }
        |else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $d = $a.getDouble($i) - $b.getDouble($i);
        |    $acc += $d * $d;
        |  }
        |  ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}
