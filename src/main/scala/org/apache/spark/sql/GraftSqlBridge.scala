package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for the one `private[sql]` entry point a custom
  * operator needs: turning a hand-built [[LogicalPlan]] back into a
  * [[DataFrame]]. Everything else graft's as-of join uses (Strategy,
  * SparkPlan, EnsureRequirements distributions) is public API; this is
  * the standard extension-package trick for the last constructor. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
