package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Registry of storage blocks that are pinned ON PURPOSE for the lifetime
  * of a session (e.g. NpmReplayOps' memoized replay catalog, shared by six
  * queries). Bench/Verify drop every other persistent RDD after each query
  * — per-query localCheckpoints (AnnSearch embeddings, Dedup shingles)
  * otherwise accumulate old-gen across ~110 sequential query executions
  * until full-GC pauses dominate the run (r03: alphabetically-late queries
  * ran 20-90× their isolated cost).
  *
  * Pins are keyed by SparkContext: RDD ids restart at 0 in every new
  * context, so a flat id set would let stale pins from a stopped context
  * collide with (and silently exempt) fresh RDDs in the next one. Entries
  * for stopped contexts are pruned on every call, bounding growth.
  *
  * Threading: pin() attributes the context's persistent-RDD delta during
  * `create` to the pinned set, which assumes no unrelated query is
  * persisting concurrently — true for Bench/Verify (single-threaded
  * driver loop), the only callers that also sweep().
  */
object PinnedStorage {
  private val ids = scala.collection.mutable.Map.empty[SparkContext, scala.collection.mutable.Set[Int]]

  private def prune(): Unit = ids.filterInPlace((sc, _) => !sc.isStopped)

  /** Run `create` (which persists/checkpoints something) and pin whatever
    * storage it added, so sweep() leaves it alone.
    */
  def pin[T](s: SparkSession)(create: => T): T = synchronized {
    prune()
    val sc = s.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val r = create
    ids.getOrElseUpdate(sc, scala.collection.mutable.Set.empty) ++=
      sc.getPersistentRDDs.keySet.diff(before)
    r
  }

  /** Unpersist every non-pinned RDD and clear the plan cache. Safe between
    * queries: per-query checkpoints are never reused across queries.
    * `blocking = true` waits for the block manager to actually drop the
    * blocks — Bench needs this so freeing one query's storage is never
    * charged to the next query's timed window.
    */
  def sweep(s: SparkSession, blocking: Boolean = false): Unit = synchronized {
    prune()
    val sc = s.sparkContext
    val pinned = ids.getOrElse(sc, scala.collection.mutable.Set.empty[Int])
    sc.getPersistentRDDs
      .filterNot { case (id, _) => pinned.contains(id) }
      .values.foreach(_.unpersist(blocking))
    s.catalog.clearCache()
  }
}
