package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Forwarder to `StateStore.unloadAll()`, which is `private[sql]` at the
  * object level — Bench/Verify unload every cached state-store provider
  * between queries. The suite runs ~13 live streaming queries, each
  * leaving its (4-32 shuffle partitions × operators) providers CACHED in
  * the executor-side provider registry after the query stops; every
  * provider then does periodic maintenance (snapshot + checkpoint file
  * listing, each `spark.sql.streaming.stateStore.maintenanceInterval` =
  * 60 s) on background threads for the rest of the JVM's life — i.e.
  * inside later queries' timed windows. Unloading between queries is
  * safe: a provider is re-loaded from its checkpoint on next use, and no
  * bench/verify query resumes another query's checkpoint.
  * Lives under org.apache.spark.sql solely for package access (the
  * DatasetAccess pattern); nothing else belongs here.
  */
object StateStoreAccess {
  def unloadAll(): Unit = StateStore.unloadAll()
}
