package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the sql package: `classic.Dataset.ofRows` (the
  * only way to lift a custom LogicalPlan into a DataFrame) is
  * private[sql], so third-party planners expose it through a one-line
  * object declared in this package — the conventional extension
  * technique used by Delta/iceberg-style libraries.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
