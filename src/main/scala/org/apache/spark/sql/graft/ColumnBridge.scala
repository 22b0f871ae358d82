package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst [[Expression]] to a user-facing [[Column]].
  *
  * Spark 4 made the direct `new Column(expr)` constructor internal
  * (`private[sql]` via ExpressionColumnNode); libraries adding native
  * expressions reach it through a package-qualified helper like this
  * one — the same approach Spark's own connectors use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
