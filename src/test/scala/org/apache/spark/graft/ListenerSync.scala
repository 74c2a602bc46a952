// Lives under org.apache.spark so the test metrics helper can flush the
// private[spark] listener bus — same bridge pattern as the main-tree
// org.apache.spark.sql.graft expressions. Test-only.
package org.apache.spark.graft

import org.apache.spark.SparkContext

object ListenerSync {
  /** Block until every queued listener event has been delivered, so a
    * metrics-accumulating SparkListener has seen all task ends.
    */
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
