package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression conversions.
  *
  * Spark 4 hid the classic `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; extension libraries that
  * ship native Catalyst expressions (as graft.functions does) need exactly
  * these two conversions, so this object re-exports them from inside the
  * sql package scope. No other internal API is touched.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
