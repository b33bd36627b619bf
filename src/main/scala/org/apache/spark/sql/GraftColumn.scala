package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `sql` package: the classic-API conversions between
  * `Column` and Catalyst `Expression` are `private[sql]` in Spark 4, so
  * custom Catalyst expressions (e.g. [[graft.functions.ArrayDot]]) need
  * this one-hop accessor to participate in the public DataFrame API.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
