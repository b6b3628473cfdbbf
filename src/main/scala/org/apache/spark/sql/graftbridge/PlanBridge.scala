package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one place graft reaches for a `private[sql]` Spark API: wrapping a
  * Catalyst [[LogicalPlan]] back into a [[DataFrame]]. The workload advisor
  * observes Join subtrees inside analyzed plans and must later *profile* a
  * join's child (one key-distribution aggregation over its rows) and *rebuild*
  * the join salted — both need the subtree as a queryable frame, and
  * `Dataset.ofRows` is the supported-in-practice door every Spark extension
  * library (Delta Lake, Iceberg's Spark runtime) opens the same way: a helper
  * object inside the `org.apache.spark.sql` package hierarchy.
  *
  * Nothing else may import this from outside `graft.plans`.
  */
object PlanBridge {

  /** `Dataset.ofRows(spark, plan)` — the analyzed/queryable frame for a plan
    * subtree captured from another query's analyzed plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
