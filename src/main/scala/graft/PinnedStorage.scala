package graft

import org.apache.spark.sql.SparkSession

/** Registry of storage blocks that are pinned ON PURPOSE for the lifetime
  * of a session (e.g. NpmReplayOps' memoized replay catalog, shared by six
  * queries). Bench/Verify drop every other persistent RDD after each query
  * — per-query localCheckpoints (AnnSearch embeddings, Dedup shingles)
  * otherwise accumulate old-gen across ~110 sequential query executions
  * until full-GC pauses dominate the run (r03: alphabetically-late queries
  * ran 20-90× their isolated cost).
  */
object PinnedStorage {
  private val ids = scala.collection.mutable.Set.empty[Int]

  /** Run `create` (which persists/checkpoints something) and pin whatever
    * storage it added, so sweep() leaves it alone.
    */
  def pin[T](s: SparkSession)(create: => T): T = synchronized {
    val before = s.sparkContext.getPersistentRDDs.keySet
    val r = create
    ids ++= s.sparkContext.getPersistentRDDs.keySet.diff(before)
    r
  }

  /** Unpersist every non-pinned RDD and clear the plan cache. Safe between
    * queries: per-query checkpoints are never reused across queries.
    */
  def sweep(s: SparkSession): Unit = synchronized {
    s.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => ids.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
    s.catalog.clearCache()
  }
}
