package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Column ↔ Catalyst Expression conversion, which is
  * `private[sql]` in Spark 4 (ExpressionUtils). Lives under
  * org.apache.spark.sql so graft can register custom native expressions
  * as user-facing Columns.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
