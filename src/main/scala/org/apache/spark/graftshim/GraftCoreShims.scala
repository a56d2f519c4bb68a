package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** `private[spark]` bridge for the bench harness only: flush the async
  * listener bus so per-query task-metric sums (shuffle/spill bytes in
  * `graft.Bench`) are attributed to the query that produced them and
  * not the next one. Same justification as
  * [[org.apache.spark.sql.graftshim.GraftSqlShims]]: no public
  * equivalent exists (`waitUntilEmpty` is how Spark's own suites do
  * exactly this); nothing engine-side depends on it. */
object GraftCoreShims {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
