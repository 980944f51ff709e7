package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession => SqlSparkSession}

/** Package-private bridge: wrap an already-built logical plan in a
  * DataFrame (`Dataset.ofRows` is private[sql]). Used by operators that
  * apply a graft optimizer rule EAGERLY to one plan — scoping the rewrite
  * to that query instead of flipping session-wide config.
  */
object Bridge {
  def ofRows(spark: SqlSparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
