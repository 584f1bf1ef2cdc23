package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package-private-access bridge: Column ⇄ Catalyst Expression for the
  * engine's custom expressions (ExpressionUtils is private[sql]). Lives
  * in org.apache.spark.sql purely for access; nothing is modified.
  */
object GraftColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
