package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions so
  * custom Catalyst expressions (graft.functions.SimHash64 et al.) can be
  * exposed as Columns. The classic-mode converters are stable internals
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this is the only
  * file that reaches inside the spark namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
