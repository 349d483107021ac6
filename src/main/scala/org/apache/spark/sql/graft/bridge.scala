package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters (Spark 4
  * wraps Column around ColumnNode; the classic converters are not public).
  * Lives in the org.apache.spark.sql package solely to access them — the
  * standard technique for third-party Catalyst expression libraries.
  */
object ColumnBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
