package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Adversarial ANSI-mode fixtures for the fusion rule's hoisting guards
  * (VERDICT r6 #5): under `spark.sql.ansi.enabled=true` (the Spark 4
  * default posture) an evaluated `element_at` on an absent key throws
  * MAP_KEY_DOES_NOT_EXIST, so a hoist that moves a lazily-guarded access
  * into an unconditional child Project turns working queries into
  * runtime errors. The generator composes random projections from the
  * exact shapes the guards reason about — If/CaseWhen arms, Coalesce
  * tails, And/Or short-circuit right sides, with present- and
  * absent-key accesses duplicated across columns — and checks on every
  * sample that the fused plan (a) evaluates without error and (b)
  * returns exactly the unfused plan's rows.
  */
class MapAccessFusionAnsiSpec extends SparkSpec {

  // isolated newSession: ANSI mode + the fusion rule + the EnabledKey
  // toggle must never leak to suites running in parallel on the shared
  // session (RetentionSpec isolation pattern, ADVICE r6)
  private lazy val iso = {
    val s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    MapAccessFusion.ensureRegistered(s)
    s
  }

  // parquet-backed (a LocalRelation is constant-folded before the rule
  // matters); keys "a"/"b" present with non-null values, "zz" absent
  private def base: DataFrame = graft.Tables.documents(iso, "/root/testdata/sf0.001")
    .select(col("doc_id").as("id"),
      map(lit("a"), substring(col("text"), 1, 4),
          lit("b"), substring(col("text"), 5, 4)).as("m"))

  private def present(k: String): Column = element_at(col("m"), k)
  private def absent: Column = element_at(col("m"), "zz")
  // data-dependent (not constant-foldable) predicates: doc_ids are >= 0
  private val neverTrue: Column = col("id") < lit(-1)
  private val alwaysTrue: Column = col("id") >= lit(-1)

  /** One projected column; the Int is its position (for a unique name). */
  private val pieceGen: Gen[Int => Column] = {
    val presentKey = Gen.oneOf("a", "b")
    Gen.oneOf[Int => Column](
      presentKey.map(k => (i: Int) => present(k).as(s"c$i")),
      presentKey.map(k => (i: Int) => upper(present(k)).as(s"c$i")),
      presentKey.map(k => (i: Int) =>
        concat(present(k), lit("/"), present(k)).as(s"c$i")),
      // absent-key accesses in every lazily-evaluated position the
      // guards enumerate — the unfused plan never evaluates them
      Gen.const((i: Int) => when(neverTrue, absent).as(s"c$i")),
      Gen.const((i: Int) => when(neverTrue, upper(absent)).as(s"c$i")),
      presentKey.map(k => (i: Int) => coalesce(present(k), absent).as(s"c$i")),
      Gen.const((i: Int) => (alwaysTrue || absent === lit("x")).as(s"c$i")),
      Gen.const((i: Int) => (neverTrue && absent === lit("x")).as(s"c$i")),
      // mixed: unconditional present occurrence + guarded twin (the
      // "one unconditional occurrence licenses the rest" case)
      presentKey.map(k => (i: Int) =>
        concat(present(k), when(neverTrue, present(k)).otherwise(lit("-"))).as(s"c$i")))
  }

  private val projGen: Gen[List[Int => Column]] = for {
    n <- Gen.choose(2, 7)
    ps <- Gen.listOfN(n, pieceGen)
  } yield ps

  private def samples(count: Int): Seq[List[Int => Column]] =
    (0 until count).flatMap(i =>
      projGen.apply(Gen.Parameters.default, Seed(4242L + i)))

  test("random guarded element_at chains under ANSI: fusion is error-free and row-identical") {
    var fired = 0
    samples(24).zipWithIndex.foreach { case (pieces, si) =>
      // a fresh Dataset per run: QueryExecution is cached per Dataset,
      // so the conf toggle below must re-plan from scratch
      def mkDf = base.select(col("id") +: pieces.zipWithIndex.map {
        case (f, i) => f(i)
      }: _*).orderBy("id")
      val fusedDf = mkDf
      val opt = fusedDf.queryExecution.optimizedPlan.toString
      if (opt.contains("_fused_map_access")) fired += 1
      val fusedRows =
        try fusedDf.collect()
        catch { case e: Exception =>
          fail(s"sample $si threw under ANSI with fusion on: $e\nplan:\n$opt")
        }
      iso.conf.set(MapAccessFusion.EnabledKey, "false")
      val unfusedRows =
        try mkDf.collect()
        finally iso.conf.unset(MapAccessFusion.EnabledKey)
      assert(fusedRows.map(_.toSeq).toSeq == unfusedRows.map(_.toSeq).toSeq,
        s"sample $si: fused and unfused results diverge")
    }
    assert(fired > 0, "no generated sample triggered fusion — the property is vacuous")
  }

  test("present-key dups fuse while guarded absent-key dups stay unhoisted (same projection)") {
    val df = base.select(col("id"),
      present("a").as("x"),
      upper(present("a")).as("y"),
      when(neverTrue, absent).as("g1"),
      when(neverTrue, upper(absent)).as("g2"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("_fused_map_access"), s"present-key dup did not fuse:\n$opt")
    // exactly ONE fused attribute: the present access — hoisting the
    // absent one would throw on the very first row under ANSI
    assert("_fused_map_access".r.findAllIn(
      df.queryExecution.optimizedPlan.output.map(_.name).mkString(",")).isEmpty,
      "fused helper attribute leaked into the output schema")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    assert(rows.forall(r => r.getString(2) == r.getString(1).toUpperCase))
  }
}
