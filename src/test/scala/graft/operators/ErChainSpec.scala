package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the pointer-doubling convergence bound of
  * [[Dedup.propagateMinLabels]]: a path graph is the worst case for
  * one-hop min-label propagation (the minimum walks one hop per round,
  * O(diameter) rounds); with the label-to-label shortcut the distance
  * to the minimum halves per round, so a 64-vertex chain must converge
  * in O(log d) driver rounds — and still to the exact component
  * minimum.
  */
class ErChainSpec extends SparkSpec {
  import spark.implicits._

  test("a 64-chain converges to the min label in O(log d) rounds") {
    val n = 64
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("ia", "ib")
    val labels = Dedup.propagateMinLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 1L), "every vertex must reach min=1")
    val rounds = Dedup.lastPropagationRounds.get()
    // one-hop propagation alone needs ~63 rounds here; doubling gives
    // ~log2(63)+slack. 12 = generous ceiling that still fails hard if
    // the shortcut join is ever dropped.
    assert(rounds <= 12, s"chain-64 took $rounds rounds — pointer doubling lost")
    assert(rounds >= 2, s"chain-64 in $rounds rounds is impossible — counter broken")
  }

  test("two disjoint components keep separate minima") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("ia", "ib")
    val labels = Dedup.propagateMinLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }
}
