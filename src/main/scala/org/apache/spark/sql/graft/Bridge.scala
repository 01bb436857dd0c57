package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow bridge into `private[sql]` constructors: a custom logical
  * operator built by a library needs `Dataset.ofRows` to become a
  * user-facing DataFrame (the standard extension-library pattern — Spark
  * exposes plan INJECTION via SparkSessionExtensions but not plan
  * CONSTRUCTION). Everything else in graft uses the public API; keep this
  * file the only one inside the spark package tree. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
