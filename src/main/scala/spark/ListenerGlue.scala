package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`, but deterministic
  * per-query shuffle/spill attribution (Bench's SPARK_GRAFT_METRICS
  * mode) needs to know the async listener queue has DRAINED before
  * reading the accumulated stage metrics — a fixed sleep can bleed one
  * query's stage bytes into the next query's bucket on a slow bus.
  * This glue lives under the spark package namespace solely to
  * re-export that one drain call (the ColumnGlue pattern).
  */
object GraftListenerGlue {
  /** Block until every queued listener event has been delivered, or
    * `timeoutMillis` elapses (best-effort: attribution degrades to the
    * old approximate behavior on timeout rather than failing the run).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
