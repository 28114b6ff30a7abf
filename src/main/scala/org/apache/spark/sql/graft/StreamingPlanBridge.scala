package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]`; a DSv1 streaming source must hand
  * the engine DataFrames whose plan is flagged `isStreaming` (the same
  * construction Spark's own `FileStreamSource` uses). This one-method
  * bridge lives in the `org.apache.spark.sql` namespace purely to reach
  * it — the standard technique for out-of-tree DSv1 connectors. */
object StreamingPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
