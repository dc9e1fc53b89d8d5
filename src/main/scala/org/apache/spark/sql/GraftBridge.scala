package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the `Column(Expression)` constructor internal
  * (`classic.ExpressionUtils` is `private[sql]`). This bridge lives in
  * the `org.apache.spark.sql` package purely to re-expose the two
  * conversions our custom Catalyst expressions need — the same shim
  * every Spark-4 extension library carries. No other internals are
  * touched.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** Fully-converted expression (ExpressionUtils.expression returns a
    * lazy ColumnNodeExpression wrapper that custom plan nodes cannot
    * evaluate; the session's converter produces the real tree). */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
