package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package: Spark 4 removed the public
  * Column-from-Expression constructor (Column wraps ColumnNode now), and
  * the converter lives in private[sql] ExpressionUtils. This is the
  * supported pattern for libraries providing custom Catalyst expressions
  * without a SparkSessionExtensions registration round-trip.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom logical plan as a DataFrame (Dataset.ofRows is
    * private[sql]); the plan goes through the full analyzer, so unresolved
    * attributes in custom nodes resolve normally.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a temp SQL function on an existing session (the
    * FunctionRegistry lives behind private[sql] sessionState). For
    * config-time registration use `spark.sql.extensions` with
    * graft.GraftExtensions instead.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
