package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge to the executor-side state-store registry (`private[sql]`, hence
  * this package): lets a long-lived driver that runs BOUNDED streaming jobs
  * (`Trigger.AvailableNow` + awaitTermination) release the state residue a
  * finished query leaves behind.
  *
  * Mechanism (named by the r18 ablation, r17 verdict #1): every stateful
  * micro-batch task loads an HDFSBackedStateStoreProvider per (operator,
  * partition) into a JVM-global registry, where it retains the recent
  * versions' key-value maps on heap and is visited by the periodic
  * maintenance thread (snapshot + file cleanup) until the coordinator
  * notices the query is gone. A finished AvailableNow run therefore keeps
  * occupying executor heap and background CPU/IO — measured at sf5: eight
  * finished stream entries inflated a later, storage-light batch query
  * (`x_ann_beam`) from 17.9 s to 49.0 s in the same session; unloading
  * restored it (the A/B/C experiment in SURVEY §8.5).
  *
  * Scope: in-process registry only — in `local[*]` that is the whole
  * engine; on a real cluster each executor clears its own registry when
  * the coordinator-driven maintenance pass detects the deactivated query,
  * so this hook is the local/long-lived-driver complement, not a
  * cluster-wide control. Safe at any point: a provider for a LIVE query
  * that gets unloaded is re-loaded from its checkpoint on the next batch
  * (a latency cost, never a correctness cost).
  */
object StreamStateResidue {
  /** Unload every loaded state-store provider in this JVM. */
  def unloadAll(): Unit = StateStore.unloadAll()
}
