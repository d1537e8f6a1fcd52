package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the algebra that makes [[SketchOps.kmvDistinctLive]]'s
  * incremental maintenance correct under ANY micro-batching and under
  * replayed batches: the per-type KMV merge is idempotent, commutative
  * and batching-independent (folding the feed in any split equals the
  * batch KMV of the whole feed).
  */
class KmvLiveSpec extends SparkSpec {
  import spark.implicits._

  private def hashes(seed: Long, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (if (rnd.nextBoolean()) "view" else "click",
        rnd.nextLong().abs % 100000L))
      .distinct.toDF("event_type", "h").repartition(5)
  }

  private def canon(df: DataFrame): Set[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("merge is idempotent, commutative, and equals the batch KMV under any split") {
    val all = hashes(5L, 800)
    val Array(b1, b2, b3) = all.randomSplit(Array(1, 1, 1), seed = 9L)
    val empty = all.limit(0)
    // batch KMV of everything, in one merge
    val whole = canon(SketchOps.mergeKmvSketch(empty, all))
    // folded in two different orders
    val fold123 = canon(SketchOps.mergeKmvSketch(
      SketchOps.mergeKmvSketch(SketchOps.mergeKmvSketch(empty, b1), b2), b3))
    val fold321 = canon(SketchOps.mergeKmvSketch(
      SketchOps.mergeKmvSketch(SketchOps.mergeKmvSketch(empty, b3), b2), b1))
    assert(fold123 == whole, "fold order 1-2-3 diverged from batch KMV")
    assert(fold321 == whole, "fold order 3-2-1 diverged from batch KMV")
    // replayed batch (failure/retry) cannot change the sketch
    val once = SketchOps.mergeKmvSketch(empty, b1).localCheckpoint(true)
    val replayed = canon(SketchOps.mergeKmvSketch(once, b1))
    assert(replayed == canon(once), "replaying a batch changed the sketch")
  }
}
