package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` constructors needed when a library
  * introduces its own logical plan nodes (the standard extension-library
  * pattern — Catalyst offers no public Dataset-from-LogicalPlan API). Kept
  * to the three calls the engine needs. */
object Bridge {

  /** DataFrame over a custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)

  /** The analyzed logical plan behind a DataFrame. */
  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** The (possibly unresolved) expression behind a Column. */
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
