package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  * Spark 4 made `Column.expr`/`new Column(expr)` package-private
  * (columns wrap ColumnNodes now); extensions reach them through
  * `classic.ExpressionUtils`, which this shim re-exports to graft. */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
