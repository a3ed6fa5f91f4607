package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters so graft's
  * native Catalyst expressions (e.g. hamming distance) can surface as
  * public `Column`s. Lives in the org.apache.spark.sql package purely for
  * access; contains no logic of its own.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
