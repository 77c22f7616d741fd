package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ↔ Expression
  * converters — the standard technique for Spark extension libraries
  * that define custom Catalyst expressions (the public `functions._`
  * builders use the same path internally). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
