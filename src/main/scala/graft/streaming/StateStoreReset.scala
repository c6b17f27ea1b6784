package org.apache.spark.sql.execution.streaming.state

/** graft harness hook: deterministic state-store teardown between
  * oracle drains (same-package bridge to the `private[sql]`
  * [[StateStore.unloadAll]]).
  *
  * Why it exists: in a single-JVM harness that drains many streaming
  * queries back to back, each stopped query leaves its loaded
  * providers — the FULL keyed-state maps — registered in the
  * executor-global `StateStore.loadedProviders` until the async
  * maintenance task (default interval 60 s) notices the query is
  * inactive, SNAPSHOTS the maps, and unloads them. Two consequences
  * at the sf1 certification scale (~1.8M span-state keys per drain):
  * the dead maps pile up on the heap (~10 GB live was measured across
  * a 2-drain run, with multi-second G1 evacuation pauses totalling
  * 53 s), and the snapshot work lands in the MIDDLE of whichever
  * later drain the 60 s timer hits — per-drain wall time swung
  * 16 s → 160 s run to run. Unloading immediately after `query.stop()`
  * frees the state deterministically and gives every drain the same
  * starting conditions.
  *
  * A production cluster does not need this: long-lived queries own
  * their providers for the life of the job, state lives off-heap once
  * `spark.sql.streaming.stateStore.providerClass` is set to the
  * RocksDB provider (the right configuration at real state volumes),
  * and maintenance amortizes over hours. The hook is harness
  * plumbing, called only from the drain path.
  *
  * Safety: `unloadAll` closes providers under the `loadedProviders`
  * lock; a provider a RUNNING query still needs would simply be
  * reloaded from its checkpoint on the next micro-batch (correctness
  * is checkpoint-anchored, load is lazy). The drain harness runs
  * queries strictly sequentially, so in practice nothing is reloaded.
  */
object GraftStateStoreReset {
  def unloadAll(): Unit = StateStore.unloadAll()

  /** Number of state-store providers currently loaded in this JVM —
    * the drain-harness leak probe (StreamingSpec asserts 0 after a
    * failure-injected drain). The registry is object-private, so this
    * reads it reflectively (Spark rides the classpath's unnamed module,
    * so setAccessible is unrestricted); test/diagnostic plumbing only,
    * never on a data path.
    */
  def loadedProviderCount: Int = {
    val f = StateStore.getClass.getDeclaredField("loadedProviders")
    f.setAccessible(true)
    f.get(StateStore).asInstanceOf[scala.collection.mutable.HashMap[_, _]].size
  }
}
