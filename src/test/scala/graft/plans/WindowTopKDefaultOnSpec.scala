package graft.plans

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r7 contract for the rewrite's DEFAULT: wherever the rule is present
  * in an optimizer (extension-built sessions), it fires with the conf
  * UNTOUCHED — the r5/r6 opt-in gate is gone, since its documented
  * reason (no spill path) was closed by the r6 grace-hash fallback.
  * Pinned here rather than assumed: (1) the gate's own window query
  * plans through TopKPerKey row-identically on an untouched-conf
  * session, (2) the spill fallback engages THROUGH the rewrite path at
  * adversarial key cardinality, (3) the conf remains a working
  * off-switch. All on an isolated newSession so the shared suite
  * session never sees the injected rule (ADVICE r6: no cross-suite conf
  * interference).
  */
class WindowTopKDefaultOnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Rule + strategy injected, conf NOT touched — the extension-built
    * session shape, exercising the default.
    */
  private lazy val iso = {
    val s = spark.newSession()
    TopK.ensureRegistered(s)
    val ex = s.experimental
    if (!ex.extraOptimizations.contains(WindowTopKRewrite))
      ex.extraOptimizations = ex.extraOptimizations :+ WindowTopKRewrite
    s
  }

  test("window_top3_orders_per_customer plans through TopKPerKey by default, rows identical") {
    assert(iso.conf.getOption(WindowTopKRewrite.EnabledKey).isEmpty,
      "test must exercise the DEFAULT, not an explicit enable")
    val rewritten = SparkEntry.queries("window_top3_orders_per_customer")(iso, dir)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"default-on rewrite did not fire:\n$plan")
    // a driver-contract-shaped session (rule never injected) keeps the
    // plain sort-based window plan — the bench baseline stays honest
    // (fresh newSession, not the shared suite session: WindowTopKRewriteSpec
    // temporarily injects the rule there and suites run in parallel)
    val baseline = SparkEntry.queries("window_top3_orders_per_customer")(spark.newSession(), dir)
    assert(!baseline.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(rewritten.collect().map(_.toSeq).toSet == baseline.collect().map(_.toSeq).toSet)
  }

  test("spill fallback engages through the rewrite path at adversarial cardinality") {
    // 5000 distinct keys against a 64-row memory cap, entered via the
    // PLAIN window idiom (not TopK.perKey): the rewritten plan must
    // spill-and-refine and still match the sort-based window exactly
    iso.conf.set("spark.graft.topk.maxKeptRowsPerPartition", "64")
    try {
      val before = TopKPerKeyExec.spillEvents.get()
      def frame(s: org.apache.spark.sql.SparkSession) = s.range(0, 20000).select(
        (col("id") % 5000).as("key"),
        (col("id") * 37 % 101).as("v"),
        col("id").as("id2"))
      val w = Window.partitionBy("key").orderBy(desc("v"), asc("id2"))
      def top2(s: org.apache.spark.sql.SparkSession) = frame(s)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      val rewritten = top2(iso)
      assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = rewritten.collect().map(_.toSeq).toSet
      assert(got == top2(spark.newSession()).collect().map(_.toSeq).toSet)
      assert(got.size == 10000) // 5000 keys × k=2
      assert(TopKPerKeyExec.spillEvents.get() > before,
        "64-row cap never triggered a spill through the rewrite path")
    } finally iso.conf.unset("spark.graft.topk.maxKeptRowsPerPartition")
  }

  test("the conf stays a working off-switch on a rule-injected session") {
    iso.conf.set(WindowTopKRewrite.EnabledKey, "false")
    try {
      val plan = SparkEntry.queries("window_top3_orders_per_customer")(iso, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), s"off-switch ignored:\n$plan")
    } finally iso.conf.unset(WindowTopKRewrite.EnabledKey)
  }
}
