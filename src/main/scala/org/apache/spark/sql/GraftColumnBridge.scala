package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's package-private Column↔Expression converters (Spark 4
  * wraps Column around ColumnNode; `classic.ExpressionUtils` is private[sql]).
  * Lives in the org.apache.spark.sql package solely to re-export the two
  * conversions graft's custom expressions need. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
