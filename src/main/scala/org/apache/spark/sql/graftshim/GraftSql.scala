package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  * Spark 4 hides `classic.ExpressionUtils` behind `private[sql]`; custom
  * native expressions (graft.proto.*) need exactly these two hops, so we
  * expose them from inside the package — the standard extension-library
  * pattern (e.g. third-party connectors do the same). No Spark internals are
  * modified.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression. The lazy
    * wrapper from `expression` (ColumnNodeExpression) is only unwrapped when
    * a Column enters a plan through the DataFrame API; SQL-function builders
    * (SparkSessionExtensions.injectFunction) hand their result straight to
    * the analyzer, so the conversion must happen up front — the produced
    * Unresolved* nodes then resolve through the normal analyzer rules. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Analyzed logical plan of a DataFrame — what a table-function builder
    * (SparkSessionExtensions.injectTableFunction) must return so `FROM
    * nats_scan(...)` resolves to the same plan the DataFrame API builds. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
