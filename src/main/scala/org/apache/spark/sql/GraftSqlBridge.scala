package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters, so graft's
  * native Catalyst expressions (graft.functions.TextExprs) can be exposed as
  * ordinary `Column`s. This is the standard extension-library technique for
  * Spark 4's ColumnNode API (the pre-4.0 `Column(expr)` constructor is gone);
  * nothing else from the sql package internals is touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
