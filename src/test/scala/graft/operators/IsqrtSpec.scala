package graft.operators

import graft.SparkSpec

/** The temperature mixture's integer-sqrt correction (one IEEE sqrt +
  * ±1 fix-up) must equal floor(√n) EXACTLY — checked against BigInt
  * sqrt on adversarial values: perfect squares, squares ±1, and
  * magnitudes up to 2⁵² where the double rounding actually misses.
  */
class IsqrtSpec extends SparkSpec {

  test("sql isqrt equals BigInt sqrt on adversarial values") {
    import spark.implicits._
    val bases = Seq(1L, 2L, 3L, 4L, 15L, 16L, 255L, 256L, 1L << 20, (1L << 26) - 1,
      1L << 26, 3037000499L /* isqrt(Long.Max) */, 1L << 40, (1L << 52) - 1, 1L << 52)
    val values = (bases ++ bases.map(b => b * b) ++ bases.map(b => b * b - 1)
      ++ bases.map(b => b * b + 1)).filter(v => v > 0 && v <= (1L << 52)).distinct
    val got = values.toDF("tokens")
      .selectExpr("tokens",
        "CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS s0")
      .selectExpr("tokens",
        """CASE WHEN (s0 + 1) * (s0 + 1) <= tokens THEN s0 + 1
          |     WHEN s0 * s0 > tokens THEN s0 - 1
          |     ELSE s0 END AS isqrt""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    values.foreach { v =>
      val want = java.math.BigInteger.valueOf(v).sqrt().longValueExact()
      assert(got(v) == want, s"isqrt($v): ${got(v)} want $want")
    }
  }
}
