package graft

import org.apache.spark.sql.SparkSession

/** Session-keyed memoization for once-per-corpus pinned artifacts (the
  * replay catalog, the ANN signature index, the near-dup pair surface) —
  * one implementation instead of three hand-rolled copies of the same
  * synchronized/evict/getOrElseUpdate block.
  *
  * Entries owned by stopped SparkContexts are evicted on every access:
  * RDD ids restart at 0 in each new context, so a stale entry would both
  * pin the stopped session's objects and alias fresh storage ids (same
  * hazard PinnedStorage guards against).
  */
final class SessionCache[V] {
  private val entries =
    scala.collection.mutable.Map.empty[(SparkSession, String), V]

  def getOrElseUpdate(s: SparkSession, dir: String)(create: => V): V = synchronized {
    entries.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    entries.getOrElseUpdate((s, dir), create)
  }
}
