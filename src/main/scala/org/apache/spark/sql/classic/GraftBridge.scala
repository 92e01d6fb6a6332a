package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the classic Dataset factory: building a DataFrame
  * from a custom LogicalPlan (`Dataset.ofRows`) is `private[sql]`, the
  * standard extension-library workaround being a same-package shim. Used
  * only by graft.plans to expose the native as-of join node.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[org.apache.spark.sql.Row] =
    Dataset.ofRows(spark, plan)
}
