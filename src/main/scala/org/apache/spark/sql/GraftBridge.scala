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
}
