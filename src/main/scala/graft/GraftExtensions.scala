package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: makes the engine's custom expressions
  * available via config instead of programmatic registration —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * [[graft.io.Tables.load]] also registers lazily, so sessions built
  * without the extension still work.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => plans.TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => plans.GlobalRowNumberTopK)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(
        functions.Md5Mod31.FunctionName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[functions.Md5Mod31].getCanonicalName,
        functions.Md5Mod31.FunctionName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.Md5Mod31(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
            org.apache.spark.sql.types.StringType))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(
        functions.GraftDot.FunctionName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[functions.GraftDot].getCanonicalName,
        functions.GraftDot.FunctionName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.GraftDot(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(0),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)),
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(
        functions.GraftSimhash.FunctionName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[functions.GraftSimhash].getCanonicalName,
        functions.GraftSimhash.FunctionName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.GraftSimhash(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(0),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)),
          exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions
                  .Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_simhash width must be an integer literal, got $other")
          })))
  }
}
