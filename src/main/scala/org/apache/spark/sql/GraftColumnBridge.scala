package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved the Column API onto Connect-compatible ColumnNodes, so
  * `Column.expr` / `new Column(expr)` are gone from the public surface;
  * the classic bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`. This one-file shim lives in the `org.apache.spark.sql`
  * package purely to re-export those two conversions for graft's native
  * Catalyst expressions (standard extension-library technique).
  */
object GraftColumnBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
