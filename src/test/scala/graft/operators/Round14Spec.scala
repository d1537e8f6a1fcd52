package graft.operators

import graft.{SparkSpec, SparkEntry}

/** Substance gates for the round-14 wave: the IVFADC offline-train /
  * online-probe split must be lossless (identical rows), and the
  * batched serving probe must actually serve — full per-query results,
  * cell-pruned, exact-ordered, and consistent with the single-query
  * arm on the query they share.
  */
class Round14Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("ivfadc: the prebuilt probe returns identical rows to the inline-build carrier") {
    // the split is ONLY an amortization (train once, probe many) — any
    // row drift would mean the pinned artifact diverged from a fresh
    // train, which is the failure mode that silently corrupts every
    // probe after the first
    val a = SparkEntry.queries("ann_ivfadc_topk")(spark, dir)
      .collect().map(_.toString)
    val b = SparkEntry.queries("ann_ivfadc_prebuilt")(spark, dir)
      .collect().map(_.toString)
    assert(a.sameElements(b),
      s"prebuilt probe diverged from the inline build:\n${a.mkString("\n")}\nvs\n${b.mkString("\n")}")
  }

  test("ivfadc batch: every query gets a full exact-ordered top-5 from ≤W cells") {
    val rows = SparkEntry.queries("ann_ivfadc_batch_topk")(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size >= 100 && rows.length == byQ.size * 5,
      s"batch shape wrong: ${byQ.size} qids / ${rows.length} rows")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(1L to 5L),
        s"qid=$q ranks not 1..5")
      val ex = sorted.map(_.getLong(5))
      assert(ex.sameElements(ex.sorted), s"qid=$q not in exact-distance order")
      assert(sorted.map(_.getLong(3)).distinct.length <= 2,
        s"qid=$q candidates leaked outside the W=2 probed cells")
      assert(sorted.forall(_.getLong(2) != q), s"qid=$q returned itself")
    }
  }

  test("ivfadc batch agrees with the single-query probe on the query they share") {
    // qid=1 runs through both plans; the batch's per-(query,cell)
    // distance tables and shortlist must reproduce the single arm's
    // neighbors exactly (at this SF the exact top-5 sits well inside
    // both shortlists, so any difference is a probe bug, not R)
    val single = SparkEntry.queries("ann_ivfadc_topk")(spark, dir)
      .collect().sortBy(_.getLong(0)).take(5)
      .map(r => (r.getLong(1), r.getLong(4))) // (vec_id, exact_e6)
    val batch = SparkEntry.queries("ann_ivfadc_batch_topk")(spark, dir)
      .collect().filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
      .map(r => (r.getLong(2), r.getLong(5)))
    assert(single.sameElements(batch),
      s"batch probe diverged from single on qid=1: ${single.mkString(",")} vs ${batch.mkString(",")}")
  }
}
