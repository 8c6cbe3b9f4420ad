package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Package-escape bridge: `Dataset.ofRows` is `private[sql]`, and it is
  * the ONLY supported way to wrap a custom LogicalPlan into a DataFrame.
  * This object lives under `org.apache.spark.sql` solely to re-export it
  * to graft's plan builders (the standard pattern for Spark extension
  * libraries); nothing else reaches into Spark internals. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
