package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column ↔ Expression converters
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is
  * the supported classic-mode adapter but is private[sql]). Standard
  * extension-library technique: a single object inside the sql package.
  */
object GraftBridge {
  def column(e: Expression): Column    = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
