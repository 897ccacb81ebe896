package org.apache.spark

/** Test-only shim into `private[spark]` surface (the standard Spark-testing
  * trick: a class in the `org.apache.spark` package sees package-private
  * members, which are public at the bytecode level).
  *
  * Exists for ONE job: deterministic listener drain. Metric-asserting suites
  * (ScaleContractsSpec's per-task shuffle contracts) read counters fed by
  * `SparkListener.onTaskEnd`, which arrives on the ASYNC listener bus — a
  * wall-clock "stable for 200 ms" poll under-reads on a loaded machine and
  * flips the assertions flaky. `LiveListenerBus.waitUntilEmpty` is the
  * mechanism Spark's own test kit (`SparkFunSuite`) uses for exactly this.
  */
object GraftTestHooks {

  /** Block until every queued listener event has been dispatched (10 s
    * default bound inherited from `waitUntilEmpty()`; a bus that can't
    * drain in 10 s is itself a failure worth surfacing, not masking).
    */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
