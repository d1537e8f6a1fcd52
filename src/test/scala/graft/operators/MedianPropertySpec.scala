package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Fuzzes the two-pass bucket-refinement median against a direct sort:
  * the refinement must return the ceil(n/2)-th smallest value per group
  * for ANY distribution — duplicates spanning buckets, values exactly on
  * bucket boundaries, all-equal groups, negatives, single rows — not
  * just the corpus the oracle covers.
  */
class MedianPropertySpec extends SparkSpec {

  private def check(data: Seq[(String, Double)], width: Double): Unit = {
    import spark.implicits._
    val rows = RelationalExtra
      .lowerMedianByBucket(data.toDF("g", "v"), "g", "v", width)
      .collect()
    val want = data.groupBy(_._1).map { case (g, grp) =>
      val vs = grp.map(_._2).sorted
      g -> vs((vs.size + 1) / 2 - 1)
    }
    // exactly ONE row per group — a Map compare alone would mask a
    // regression that emits a duplicate row (e.g. two buckets passing
    // the cum-crossing filter) as long as the last one is right
    assert(rows.length == want.size, s"width=$width data=$data rows=${rows.toSeq}")
    val got = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, s"width=$width data=$data")
  }

  test("hand-picked edge cases") {
    // values exactly on bucket boundaries, even and odd counts
    check(Seq("a" -> 64.0, "a" -> 128.0, "a" -> 192.0, "a" -> 256.0), 64.0)
    check(Seq("a" -> 64.0, "a" -> 128.0, "a" -> 192.0), 64.0)
    // duplicates spanning a bucket boundary
    check(Seq("a" -> 63.99, "a" -> 64.0, "a" -> 64.0, "a" -> 64.01), 64.0)
    // all-equal group (every row in one bucket, kin deep inside it)
    check(Seq.fill(9)("a" -> 7.5), 64.0)
    // single row; negatives (floor is monotone below zero too)
    check(Seq("a" -> -1.0), 64.0)
    check(Seq("a" -> -100.0, "a" -> -50.0, "a" -> 50.0), 64.0)
    // multiple groups with different shapes in one frame
    check(Seq("a" -> 1.0, "a" -> 2.0, "b" -> -64.0, "b" -> -64.0,
      "c" -> 0.0), 64.0)
  }

  private val dataGen: Gen[List[(String, Double)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      // mix of boundary-exact multiples and arbitrary decimals, signed —
      // maximizes ties and boundary collisions at width 32
      v <- Gen.oneOf(
        Gen.choose(-4, 4).map(_ * 32.0),
        Gen.choose(-130.0, 130.0))
    } yield g -> v)
  } yield rows

  test("random datasets match a direct sort (seeded sample)") {
    var seed = Seed(11L)
    (1 to 12).foreach { _ =>
      val data = dataGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      check(data, 32.0)
    }
  }
}
