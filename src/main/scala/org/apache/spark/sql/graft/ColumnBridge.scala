package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge: Spark 4's `Column` wraps a `ColumnNode`, and the
  * Expression⇄Column converters (`ExpressionUtils`) are `private[sql]` —
  * this object lives under `org.apache.spark.sql` to expose exactly the
  * two conversions custom Catalyst expressions need. Public extension
  * point pattern; no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
