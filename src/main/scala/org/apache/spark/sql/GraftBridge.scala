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
}
