package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Package-private-access bridge: build a DataFrame from a custom
  * LogicalPlan (Dataset.ofRows is private[sql]), and reach the analyzed
  * plan of a DataFrame. Nothing in Spark is modified.
  */
object GraftPlans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def analyzed(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[ClassicDataFrame].queryExecution.analyzed
}
