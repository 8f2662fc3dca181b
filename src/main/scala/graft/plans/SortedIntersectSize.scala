package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection cardinality of two ascending-sorted long arrays as one
  * linear merge — the verify kernel of the similarity self-joins.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side plus an
  * output array per row pair, and `size(array_union(a, b))` repeats
  * that for the union, only for both results to collapse to their
  * lengths. With both inputs pre-sorted (the dedup pipeline sorts its
  * shingle-hash sets once per DOC, upstream of the candidate join that
  * fans each doc out to many pairs), two pointers and zero allocation
  * count |a∩b| directly; |a∪b| follows as |a|+|b|-|a∩b|.
  *
  * Inputs must be sorted ascending and duplicate-free (shingle-hash
  * sets are: ShingleHashes de-duplicates, array_sort orders). Elements
  * must be non-null.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  /** Public so generated code can call it through the reference obj. */
  def merge(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedIntersectSize", this,
      classOf[SortedIntersectSize].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.merge($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
