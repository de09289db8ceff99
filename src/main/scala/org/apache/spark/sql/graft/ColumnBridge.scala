package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Materialize a resolved logical plan as a DataFrame (private[sql]
    * Dataset.ofRows) — used to re-run a command's source subtree. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Detach a streaming micro-batch into a batch frame over the same
    * compiled rows — exactly what Spark's ForeachBatchSink does
    * (LogicalRDD.fromDataset is private[sql]). */
  def detachBatch(data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : DataFrame =
    ofRows(data.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        data.queryExecution.toRdd,
        data.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]],
        isStreaming = false))
}
