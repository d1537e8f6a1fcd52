package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew-adversarial dedup stress (r8 verdict item #4): a deliberately
  * boilerplate-heavy corpus — ONE shingle shared by 50% of all documents
  * — is the worst case for co-occurrence candidate generation (the hot
  * posting list alone contributes O(df²) pairs). This spec pins, with
  * measured counts, that every scale arm of the family keeps its
  * candidate set bounded on that corpus while still finding the true
  * near-dup pairs:
  *
  *  - the df cap (`cappedShingles`) collapses the blow-up to exactly the
  *    true pairs;
  *  - the PPJoin prefix filter needs NO cap: the hot shingle is the
  *    globally most frequent, so the rarity sort puts it in no
  *    document's prefix and the blow-up never reaches the join;
  *  - MinHash+LSH banding needs NO cap either: one shared shingle out
  *    of four rarely wins all four min-hashes of a band on both sides,
  *    so band collisions stay ~4 orders of magnitude under the
  *    co-occurrence count.
  *
  * Measured counts are recorded in DESIGN.md §round 9.
  */
class DedupSkewSpec extends SparkSpec {

  import spark.implicits._

  private val nBoiler = 1000
  private val blowUp = nBoiler.toLong * (nBoiler - 1) / 2 // C(1000,2) = 499_500

  // 1000 boilerplate docs ("B0 B1 B2" header + unique tail), 1000 fully
  // unique docs, and two true near-dup pairs (identical 12-word docs
  // sharing only rare shingles).
  private lazy val docs = {
    val boiler = (0 until nBoiler).map(i => (i.toLong, s"B0 B1 B2 u${i}a u${i}b u${i}c"))
    val clean = (0 until nBoiler).map(i =>
      ((10000 + i).toLong, s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f"))
    val dupA = (0 until 12).map(j => s"d$j").mkString(" ")
    val dupB = (0 until 12).map(j => s"e$j").mkString(" ")
    (boiler ++ clean ++ Seq(
      (90000L, dupA), (90001L, dupA), (90002L, dupB), (90003L, dupB)))
      .toDF("doc_id", "text")
  }
  private lazy val sh = Dedup.shingles(docs).localCheckpoint(true)
  private val truePairs = Set((90000L, 90001L), (90002L, 90003L))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("uncapped co-shingle candidates blow up O(df²) on the hot shingle") {
    val n = Dedup.candidatePairsOf(sh, Int.MaxValue).count()
    info(s"uncapped candidate pairs: $n (blow-up bound $blowUp)")
    assert(n >= blowUp, s"expected ≥ $blowUp hot-shingle pairs, got $n")
  }

  test("df cap collapses the blow-up to exactly the true pairs") {
    val capped = pairSet(Dedup.candidatePairsOf(sh, maxDocFreq = 100))
    assert(capped == truePairs, s"capped candidates: $capped")
  }

  test("prefix filter excludes the hot shingle from every prefix — bounded with NO cap") {
    val cands = pairSet(Dedup.prefixCandidatePairs(sh, 0.5))
    assert(cands == truePairs,
      s"prefix candidates should be exactly the true pairs, got ${cands.size}")
  }

  test("minhash LSH band collisions stay bounded with NO cap") {
    val bands = Dedup.bandsOf(Dedup.minhashOf(sh)).localCheckpoint(true)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .distinct()
    val all = pairSet(cands)
    info(s"LSH candidate pairs: ${all.size}")
    assert(truePairs.subsetOf(all), s"LSH lost true pairs: ${truePairs -- all}")
    // deterministic (md5 hashes): far under the co-occurrence blow-up
    assert(all.size < blowUp / 1000,
      s"LSH candidates ${all.size} not bounded vs blow-up $blowUp")
  }

  test("gram df cap bounds the positional span join on a hot boilerplate gram") {
    // a 5-word boilerplate header shared by 1000 docs: one hot 5-gram
    // with df 1000, plus a true 12-word verbatim dup pair
    val dup = (0 until 12).map(j => s"d$j").mkString(" ")
    val spanDocs = ((0 until nBoiler).map(i =>
        (i.toLong, s"H0 H1 H2 H3 H4 u${i}a u${i}b u${i}c u${i}d u${i}e")) ++
      Seq((90000L, dup), (90001L, dup))).toDF("doc_id", "text")
    val grams = Dedup.gramTable(spanDocs).localCheckpoint(true)

    val uncapped = Dedup.gramMatches(grams).count()
    assert(uncapped >= blowUp, s"expected ≥ $blowUp hot-gram matches, got $uncapped")

    val cappedMatches = Dedup.gramMatches(grams, maxGramDf = 100).localCheckpoint(true)
    val capped = cappedMatches.count()
    info(s"span occurrence matches: uncapped $uncapped, capped $capped")
    // only the true pair's 8 gram matches survive the cap
    assert(capped == 8, s"capped matches should be the true pair's 8 grams, got $capped")
    val spans = Dedup.spansFromMatches(cappedMatches).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))).toList
    assert(spans == List((90000L, 90001L, 1, 1, 12L)),
      s"capped spans should still report the full true dup span, got $spans")
  }
}
