package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the graft library needs: wrapping a
  * hand-built [[LogicalPlan]] (graft's custom operators, e.g.
  * `graft.plans.AsOfJoin`) back into a public DataFrame. Spark exposes no
  * public constructor for this — `classic.Dataset.ofRows` is the blessed
  * internal entry point every extension library shims exactly like this.
  * Nothing else from the internal surface is re-exported.
  */
object GraftSqlBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
