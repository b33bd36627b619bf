package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's custom Catalyst
  * expressions callable from SQL on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster deployment
  * path; for an already-built session use
  * `org.apache.spark.sql.GraftColumn.registerFunctions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rules: lossless rewrites every query gets for free
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    ext.injectFunction((FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[functions.ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) => functions.ArrayDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[functions.InterleaveBits].getName, "zorder_key"),
      (exprs: Seq[Expression]) => functions.InterleaveBits(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("zorder_key3"),
      new ExpressionInfo(classOf[functions.InterleaveBits3].getName, "zorder_key3"),
      (exprs: Seq[Expression]) => functions.InterleaveBits3(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[functions.SimHashExpr].getName, "simhash64"),
      (exprs: Seq[Expression]) => functions.SimHashExpr(exprs(0))))
    ext.injectFunction((FunctionIdentifier("tokens"),
      new ExpressionInfo(classOf[functions.TokensExpr].getName, "tokens"),
      (exprs: Seq[Expression]) => functions.TokensExpr(exprs(0))))
  }
}
