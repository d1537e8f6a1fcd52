package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The prefix filter must be LOSSLESS (every true Jaccard ≥ t pair is a
  * candidate — the SSJoin prefix lemma) while generating strictly fewer
  * candidates than the all-co-shingle surface it replaces.
  */
class PrefixFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered result equals the co-shingle-join result") {
    val got = graft.SparkEntry.queries("dedup_prefix_filter_jaccard")(spark, dir)
      .collect().toSeq
    val want = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .collect().toSeq
    assert(want.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    assert(got == want)
  }

  test("candidate set is a superset of true pairs and smaller than co-shingle pairs") {
    val sh = Dedup.shingleSurface(spark, dir)
    val prefixCands = Dedup.prefixCandidatePairs(sh, 0.5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.subsetOf(prefixCands),
      s"prefix filter LOST true pairs: ${truePairs -- prefixCands}")
    val coShingle = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(prefixCands.size < coShingle,
      s"prefix filter did not prune: ${prefixCands.size} vs $coShingle co-shingle pairs")
  }
}
