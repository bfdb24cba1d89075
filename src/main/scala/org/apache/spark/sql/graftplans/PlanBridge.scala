package org.apache.spark.sql.graftplans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Bridge to the `private[sql]` `Dataset.ofRows` — the supported way to
  * wrap a custom logical plan into a DataFrame (same rationale as
  * [[org.apache.spark.sql.graftbench.PlanSurgeon]]). Used by
  * [[graft.plans.GroupedTopK]] to surface its custom operator. */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
