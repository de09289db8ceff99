package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** V1 streaming sources must hand back batches whose logical plan is
  * flagged isStreaming=true (MicroBatchExecution asserts it). Spark's
  * own FileStreamSource does this by building a streaming-flagged
  * LogicalRelation through private[sql] surface; this bridge does the
  * identical thing for GraftAppendSource's parquet batches. */
object StreamingBridge {
  def asStreaming(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    df.queryExecution.analyzed match {
      case lr: LogicalRelation =>
        Dataset.ofRows(session, lr.copy(isStreaming = true))
      case _ =>
        // empty batches (LocalRelation) and anything else: route the
        // compiled rows through an explicitly streaming-flagged frame
        session.internalCreateDataFrame(
          df.queryExecution.toRdd, df.schema, isStreaming = true)
    }
  }
}
