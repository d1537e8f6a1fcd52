package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal forwarder to `classic.Dataset.ofRows`, which is `private[sql]`
  * at the object level — the supported way for a library to materialize a
  * DataFrame from a custom LogicalPlan node (graft.plans.TopKPerKeyNode).
  * Lives under org.apache.spark.sql solely for package access; nothing
  * else belongs here.
  */
object DatasetAccess {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
