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

  /** Execute a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — lets specs run a plan after applying one of
    * graft's optimizer rules ([[graft.plans.LevenshteinPrefilter]])
    * directly, without building a second extension-bearing session.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register graft's custom Catalyst expressions as SQL functions on an
    * already-built session (temp functions, session-scoped). The
    * cluster-deployment path is `spark.sql.extensions=graft.GraftExtensions`;
    * this runtime hook covers sessions built without that config.
    */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("array_dot",
      exprs => graft.functions.ArrayDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("zorder_key",
      exprs => graft.functions.InterleaveBits(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("zorder_key3",
      exprs => graft.functions.InterleaveBits3(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => graft.functions.SimHashExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("tokens",
      exprs => graft.functions.TokensExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("ewma_fold",
      exprs => graft.functions.EwmaFold(exprs(0), exprs(1)), "built-in")
  }
}
