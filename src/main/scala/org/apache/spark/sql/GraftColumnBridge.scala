package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions so
  * graft's native Catalyst expressions (graft.plans) can be exposed as
  * `Column`s programmatically. Spark 4's unified Column API hides the
  * classic constructors; extension libraries conventionally bridge from
  * inside the sql package. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
