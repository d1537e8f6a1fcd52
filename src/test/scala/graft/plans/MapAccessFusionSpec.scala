package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The map-access CSE rule (SURVEY §4.2's deferred rewrite): repeated
  * `element_at(versions, dist_tags['latest'])`-style chains written
  * INLINE must materialize the shared lookup once at the plan level,
  * with results identical to the unfused plan.
  */
class MapAccessFusionSpec extends SparkSpec {

  // Isolated newSession (r7, ADVICE r6): the suite toggles the fusion
  // EnabledKey, which on the shared session would disable the rule for
  // queries other suites plan in parallel. The rule is registered once
  // here; the shared session never sees it toggled.
  private lazy val iso = {
    val s = spark.newSession()
    MapAccessFusion.ensureRegistered(s)
    s
  }

  // parquet-backed (a LocalRelation would be constant-folded away before
  // the rule could matter); map columns built per row, with a null key
  // every third row to exercise null propagation
  private def docs = graft.Tables.documents(iso, "/root/testdata/sf0.001")
    .select(
      col("doc_id").as("id"),
      map(lit("latest"),
        when(col("doc_id") % 3 === 0, lit(null: String))
          .otherwise(lit("2.0.0"))).as("dist_tags"),
      map(lit("2.0.0"), substring(col("text"), 1, 8)).as("versions"),
      map(lit("2.0.0"), substring(col("text"), 9, 8)).as("time"))

  // the P3 shape, written naively: the versions[dist_tags[latest]] chain
  // repeated inline for every derived column
  private def naiveChain = docs.select(
    col("id"),
    element_at(col("versions"), element_at(col("dist_tags"), "latest")).as("tarball"),
    upper(element_at(col("versions"), element_at(col("dist_tags"), "latest"))).as("tarball_uc"),
    element_at(col("time"), element_at(col("dist_tags"), "latest")).as("latest_time"))

  private def countAccesses(plan: String, map: String): Int =
    s"element_at\\($map#\\d+".r.findAllIn(plan).size

  test("inline-duplicated map chains materialize each lookup once") {
    val opt = naiveChain.queryExecution.optimizedPlan.toString
    // versions is LOOKED UP twice inline (tarball, tarball_uc) and
    // dist_tags three times (every derived column's key); after fusion
    // each map column feeds exactly ONE element_at, computed in a fused
    // child Project and referenced by attribute everywhere else
    assert(countAccesses(opt, "versions") == 1,
      s"versions map looked up more than once after fusion:\n$opt")
    assert(countAccesses(opt, "dist_tags") == 1,
      s"dist_tags map looked up more than once after fusion:\n$opt")
    assert(opt.contains("_fused_map_access"), s"fusion did not fire:\n$opt")
  }

  test("fused results are identical to the unfused plan, nulls included") {
    val fused = naiveChain.collect().map(_.toSeq).toSet
    iso.conf.set(MapAccessFusion.EnabledKey, "false")
    val unfused =
      try naiveChain.collect().map(_.toSeq).toSet
      finally iso.conf.unset(MapAccessFusion.EnabledKey)
    assert(fused == unfused)
    assert(fused.exists(_.contains(null))) // doc "c" exercises null propagation
  }

  test("lambda-keyed lookups are never hoisted out of their HOF scope") {
    // element_at(versions, k) repeats inside the lambda with k the
    // LAMBDA VARIABLE: hoisting would unbind k (it contributes nothing
    // to references) and turn a per-element lookup into one constant
    val df = docs.select(col("id"), expr(
      "transform(map_keys(versions), k -> concat(element_at(versions, k), element_at(versions, k)))")
      .as("doubled"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("_fused_map_access"),
      s"lambda-scoped access was hoisted:\n$opt")
    val rows = df.collect()
    assert(rows.forall(r => r.getSeq[String](1).forall(s => s != null && s.length % 2 == 0)))
  }

  test("accesses occurring only in lazy branches are never hoisted (ANSI safety)") {
    // both occurrences of element_at(versions, 'absent') sit in a
    // never-taken When arm: the original plan never evaluates them, so
    // an unconditional hoist would introduce MAP_KEY_DOES_NOT_EXIST
    // under ANSI mode where the unfused plan returns nulls
    val df = docs.select(col("id"),
      when(col("id") < 0, element_at(col("versions"), "absent")).as("a"),
      when(col("id") < 0, upper(element_at(col("versions"), "absent"))).as("b"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("_fused_map_access"),
      s"conditionally-guarded access was hoisted:\n$opt")
    assert(df.collect().forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("one unconditional occurrence licenses fusing the guarded ones too") {
    val df = docs.select(col("id"),
      element_at(col("versions"), "2.0.0").as("x"),
      when(col("id") % 2 === 0, element_at(col("versions"), "2.0.0")).as("y"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("_fused_map_access"), s"mixed-position dup did not fuse:\n$opt")
    val fused = df.collect().map(_.toSeq).toSet
    iso.conf.set(MapAccessFusion.EnabledKey, "false")
    val unfused =
      try df.collect().map(_.toSeq).toSet
      finally iso.conf.unset(MapAccessFusion.EnabledKey)
    assert(fused == unfused)
  }

  test("no duplication → rule is a no-op (no extra Project, stable fixpoint)") {
    val single = docs.select(
      element_at(col("versions"), lit("1.0.0")).as("v1"))
    val opt = single.queryExecution.optimizedPlan.toString
    assert(!opt.contains("_fused_map_access"))
  }
}
