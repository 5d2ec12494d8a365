package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ⇄ Expression converters —
  * the standard pattern for libraries that build custom Catalyst
  * expressions as first-class `Column`s without a per-session function
  * registry (Spark 4 moved `Column(expr)` behind `classic`). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
