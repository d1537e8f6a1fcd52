package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property equivalence: the codegen SemverClean expression must agree
  * with the pure Semver.clean on arbitrary inputs — through the real
  * Spark execution path (dataframe → codegen → collect), not just
  * interpreted eval.
  */
class SemverExpressionSpec extends SparkSpec {

  import spark.implicits._

  private val genVersionish: Gen[String] = {
    val num = Gen.chooseNum(0, 20).map(_.toString)
    val zeroPad = Gen.chooseNum(0, 9).map(n => s"0$n")
    val part = Gen.oneOf(num, zeroPad)
    val pre = Gen.oneOf("", "-beta", "beta", "-rc.1", "rc.01", "-01")
    val build = Gen.oneOf("", "+build.5", "+x")
    val prefix = Gen.oneOf("", "v", "V", "=", " ", " v")
    for {
      p <- prefix; a <- part; b <- part; c <- part
      pr <- pre; bd <- build
    } yield s"$p$a.$b.$c$pr$bd"
  }
  private val genGarbage: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("1.2", "x.y.z", "", "1.2.3.4", "latest"))

  private def samples(g: Gen[String], n: Int, seed: Long): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("expression output equals Semver.clean for version-ish and garbage inputs") {
    val inputs = (samples(genVersionish, 300, 7L) ++ samples(genGarbage, 200, 11L)).distinct
    SemverExpressions.register(spark)
    val viaExpr = inputs.toDF("raw")
      .repartition(4) // exercise codegen across partitions
      .selectExpr("raw", "semver_clean(raw) AS cleaned")
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap
    inputs.foreach { in =>
      assert(viaExpr(in) == graft.npm.Semver.clean(in),
        s"mismatch for '$in': expr=${viaExpr(in)} pure=${graft.npm.Semver.clean(in)}")
    }
  }
}
