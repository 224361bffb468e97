package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction: turns a custom logical
  * node (e.g. graft.operators.AsofJoinNative.AsofJoinNode) into a
  * DataFrame. This is the same mechanism Spark's own connectors use to
  * surface custom plans; it touches no internal state beyond the public
  * `Dataset.ofRows` entry point that is package-private to org.apache.spark.sql.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
