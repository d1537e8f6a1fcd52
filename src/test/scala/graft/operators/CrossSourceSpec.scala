package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the cross-source governance pair: the attribution
  * matrix and the per-source duplication-rate report are both exact
  * re-aggregations of the SAME LSH candidate-pair set, so their totals
  * must reconcile with each other and with the pair set itself.
  */
class CrossSourceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the production candidate derivation (checkpointed once): the spec
  // verifies the AGGREGATIONS against the pair set, so sharing the
  // derivation is intentional — a lazy val executes the join one time
  private lazy val lshPairs = Dedup.lshCandsFromSketch(spark, dir)

  test("attribution conserves the candidate-pair mass, src_a <= src_b") {
    val attr = Dedup.crossSourceAttribution.run(spark, dir).collect()
    val nPairs = lshPairs.count()
    assert(attr.map(_.getLong(2)).sum == nPairs,
      s"attribution total ${attr.map(_.getLong(2)).sum} != candidate pairs $nPairs")
    assert(attr.forall(r => r.getString(0) <= r.getString(1)),
      "unordered pair normalization violated (src_a > src_b)")
  }

  test("dup-rate covers the full source roster with bounded exact rates") {
    val report = Dedup.dupRateBySource.run(spark, dir).collect()
    val roster = graft.Tables.documents(spark, dir)
      .select("source").distinct().count()
    assert(report.length == roster, s"${report.length} rows != $roster sources")
    report.foreach { r =>
      val (nDocs, nDup, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nDup >= 0 && nDup <= nDocs, s"$r: n_dup out of [0, n_docs]")
      assert(rate == nDup.toDouble / nDocs, s"$r: rate is not the exact division")
    }
    // the distinct docs inside pairs, re-counted independently, must equal
    // the report's n_dup total (each doc belongs to exactly one source)
    val dupDocs = lshPairs.select(col("ia").as("d"))
      .union(lshPairs.select(col("ib").as("d"))).distinct().count()
    assert(report.map(_.getLong(2)).sum == dupDocs)
  }
}
