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

  /** Register a SQL function on an EXISTING session (same effect as
    * `SparkSessionExtensions.injectFunction`, which only applies at
    * session build time — sbt-shared JVMs reuse one session, so graft
    * installs its SQL surface through here; see
    * `graft.plans.GraftExtensions.registerAll`).
    */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
