package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Catalyst Expression ⇄ public Column, for the SQL planning rule.
  * Spark 4 moved this conversion behind private[sql]
  * (classic.ExpressionUtils), so the bridge lives in an
  * org.apache.spark.sql subpackage — the sanctioned pattern for
  * extensions that plan with Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
