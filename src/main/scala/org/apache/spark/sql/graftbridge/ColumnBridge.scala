package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** `ExpressionUtils` is `private[sql]`; this bridge (placed under the
  * `org.apache.spark.sql` namespace, the standard extension-point pattern)
  * exposes the two conversions a library defining custom Catalyst
  * expressions needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
