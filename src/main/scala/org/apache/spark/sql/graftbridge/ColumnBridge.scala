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

  /** Eagerly convert a Column's node tree to a catalyst expression.
    * [[expression]] wraps lazily in a `ColumnNodeExpression`, which is fine
    * inside a plan (the analyzer unwraps it) but useless when the TEXT of
    * the expression is needed (`.sql` renders the wrapper, not the tree) —
    * e.g. to generate a SQL-UDF body from a Column implementation.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** `NormalizeFloatingNumbers.normalize` is `private[sql]`: custom plan
    * nodes must normalize their own float/double grouping keys (-0.0 ==
    * 0.0, canonical NaN) because the optimizer rule only rewrites built-in
    * Aggregate/Window/Join keys.
    */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** `Dataset.ofRows` is `private[sql]`: the one constructor a library
    * needs to hand a CUSTOM LogicalPlan to the session (analyzer, optimizer
    * and planner then treat it like any built-in node).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
