package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[EntityResolution.blockComponents]] (per-block union-find,
  * zero driver rounds) against [[Dedup.propagateMinLabels]] (the
  * generic fixpoint loop) on random block-confined pair graphs: same
  * vertices, same component-minimum labels. Also exercises the
  * aggregator's merge path by running with enough input partitions
  * that map-side partial buffers must combine.
  */
class BlockUnionFindSpec extends SparkSpec {
  import spark.implicits._

  test("union-find labels equal the propagation fixpoint on random block graphs") {
    val rnd = new scala.util.Random(31L)
    for (trial <- 1 to 5) {
      // 8 blocks × up to 20 vertices, random in-block edges (including
      // chains: p=0.15 keeps components stringy, the union-find's worst
      // shape for root bookkeeping)
      val pairs = (0 until 8).flatMap { b =>
        val vs = (0 until (5 + rnd.nextInt(16))).map(i => b * 1000L + 100 + i)
        vs.combinations(2).collect {
          case Seq(a, c) if rnd.nextDouble() < 0.15 => (b, a, c)
        }
      }
      if (pairs.nonEmpty) {
        val matches = pairs
          .toDF("blkid", "ka", "kb")
          .select(lit(7).as("nation"), concat(lit("B"), col("blkid")).as("blk"),
            col("ka"), col("kb"))
          .repartition(7)
        val got = EntityResolution.blockComponents(matches)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = Dedup.propagateMinLabels(
            matches.select(col("ka").as("ia"), col("kb").as("ib")))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial: union-find != fixpoint")
      }
    }
  }

  test("a block whose pairs form a V keeps one component with min root") {
    val matches = Seq((1, "B0", 3L, 1L), (1, "B0", 3L, 2L))
      .toDF("nation", "blk", "ka", "kb")
    val got = EntityResolution.blockComponents(matches)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
