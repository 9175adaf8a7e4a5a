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
  }
}
