package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Fuzzes the distributed span fold (positional gram join + gaps-and-
  * islands window) against an independent brute-force reference: for
  * every doc pair, every alignment offset, scan token arrays directly
  * for maximal runs of matching 5-grams. The two implementations share
  * no code or algorithmic shape, so agreement pins the operator's
  * semantics — maximality, exact positions, threshold — for corpora
  * with overlapping shared segments, repeated segments within one doc,
  * and accidental low-vocab collisions the hand-written cases miss.
  */
class SpanPropertySpec extends SparkSpec {

  /** Brute-force reference: maximal runs of matching 5-grams per
    * (pair, alignment), 1-based positions, reported at >= 10 words.
    */
  private def refSpans(docs: Seq[(Long, Array[String])]): Set[(Long, Long, Int, Int, Long)] = {
    val out = Set.newBuilder[(Long, Long, Int, Int, Long)]
    for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib && ta.length >= 5 && tb.length >= 5
    } {
      val matches = for {
        i <- 0 to ta.length - 5
        j <- 0 to tb.length - 5
        if ta.slice(i, i + 5).sameElements(tb.slice(j, j + 5))
      } yield (i, j)
      matches.groupBy { case (i, j) => i - j }.values.foreach { aligned =>
        var run = List.empty[(Int, Int)]
        def flush(): Unit = if (run.nonEmpty) {
          val words = run.length + 4
          if (words >= 10) {
            val (i0, j0) = run.last // run is built reversed; last = first match
            out += ((ia, ib, i0 + 1, j0 + 1, words.toLong))
          }
          run = Nil
        }
        aligned.sortBy(_._1).foreach { m =>
          if (run.nonEmpty && m._1 != run.head._1 + 1) flush()
          run = m :: run
        }
        flush()
      }
    }
    out.result()
  }

  private def sparkSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Int, Int, Long)] = {
    import spark.implicits._
    val grams = Dedup.gramTable(docs.toDF("doc_id", "text"))
    Dedup.spansFromMatches(Dedup.gramMatches(grams)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
  }

  private def check(docs: Seq[(Long, String)]): Unit = {
    val want = refSpans(docs.map { case (id, t) =>
      (id, t.split(" ").filter(_.nonEmpty))
    })
    val got = sparkSpans(docs)
    assert(got == want,
      s"spark=$got ref=$want docs=${docs.map(d => d._1 + ":" + d._2)}")
  }

  // Docs are 1-4 segments; each segment comes from a small shared pool
  // (genuine duplicated passages at random positions) or is fresh
  // low-vocab noise (accidental gram collisions).
  private val corpusGen: Gen[List[(Long, String)]] = for {
    pool <- Gen.listOfN(3, for {
      len <- Gen.choose(6, 14)
      toks <- Gen.listOfN(len, Gen.oneOf("pa", "pb", "pc", "pd"))
    } yield toks.mkString(" "))
    nDocs <- Gen.choose(2, 4)
    docs <- Gen.listOfN(nDocs, for {
      nSeg <- Gen.choose(1, 4)
      segs <- Gen.listOfN(nSeg, Gen.frequency(
        2 -> Gen.oneOf(pool),
        1 -> (for {
          len <- Gen.choose(0, 12)
          toks <- Gen.listOfN(len, Gen.oneOf("na", "nb"))
        } yield toks.mkString(" "))))
    } yield segs.filter(_.nonEmpty).mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("random corpora with shared segments match the brute-force reference") {
    var seed = Seed(7L)
    (1 to 15).foreach { _ =>
      val docs = corpusGen.apply(Gen.Parameters.default, seed).get
        .filter(_._2.nonEmpty)
      seed = seed.next
      if (docs.size >= 2) check(docs)
    }
  }
}
