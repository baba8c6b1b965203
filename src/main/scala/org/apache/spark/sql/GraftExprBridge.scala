package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private Column↔Expression converters —
  * the minimal hook a library needs to expose custom Catalyst
  * expressions as `Column`s in Spark 4 (the pre-4.0 public
  * `new Column(expr)` constructor is gone).
  */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
