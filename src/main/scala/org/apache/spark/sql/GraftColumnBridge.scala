package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * supported conversion but is sql-package-private). This is the one
  * compilation unit that lives inside Spark's namespace. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
