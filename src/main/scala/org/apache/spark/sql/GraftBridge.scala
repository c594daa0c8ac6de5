package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: construct a DataFrame from a custom
  * LogicalPlan (Dataset.ofRows is package-private). Standard practice
  * for Catalyst extension libraries built outside the Spark tree. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
