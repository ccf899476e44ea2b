package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `private[sql] Dataset.ofRows` — the only way to wrap a custom
  * [[LogicalPlan]] node (e.g. `graft.plans.TopKPerKeyNode`) back into the
  * public DataFrame API. Same escape hatch as [[ColumnShim]].
  */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
