package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between public `Column`s and catalyst `Expression`s.
  *
  * Spark 4 routes Columns through ColumnNodes; the converter helpers
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are bytecode-public
  * but Scala-`private[sql]`, so we bind them reflectively once at class
  * load. This is driver-side plan construction only — zero per-row
  * cost — and keeps our engine code out of `org.apache.spark.*`
  * packages.
  */
object ColumnBridge {
  private val utils = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private val toColumn = utils.getMethod("column", classOf[Expression])
  private val toExpression = utils.getMethod("expression", classOf[Column])

  def column(e: Expression): Column =
    toColumn.invoke(null, e).asInstanceOf[Column]

  def expression(c: Column): Expression =
    toExpression.invoke(null, c).asInstanceOf[Expression]
}
