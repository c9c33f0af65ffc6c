package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  * Spark 4 made `Column.expr`/`new Column(expr)` package-private
  * (columns wrap ColumnNodes now); extensions reach them through
  * `classic.ExpressionUtils`, which this shim re-exports to graft.
  * Also exposes the session's table-function registry and a DataFrame's
  * logical plan (both private[sql]) for runtime TVF registration. */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. `expression` defers behind a
    * `ColumnNodeExpression` placeholder that only Dataset-API code paths
    * unwrap — an expression returned from a FunctionRegistry builder
    * (GraftSql's scalar kernels) never goes through them and would reach
    * codegen unresolved. This converts the node tree to plain (possibly
    * unresolved) Catalyst nodes the analyzer handles like any SQL. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  def tableFunctionRegistry(spark: SparkSession): TableFunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry

  def functionRegistry(spark: SparkSession): org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed
}
