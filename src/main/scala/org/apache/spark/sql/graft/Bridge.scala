package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal private[sql] bridge: `Dataset.ofRows` is how a library turns
  * a hand-built [[LogicalPlan]] into a DataFrame, and Spark scopes it
  * `private[sql]` — so this one-liner lives inside the sql namespace
  * (the established pattern for Spark-native extension libraries).
  * Nothing else from the internal API is re-exported. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    Dataset.ofRows(spark, plan)
}
