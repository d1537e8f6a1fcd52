package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: for ANY random dataset (skewed keys, duplicate order
  * values, tiny and large groups), the custom operator's row set equals
  * the window row_number form's. Duplicate (v, tie) pairs within a key
  * are disambiguated by a unique id column in the ordering so both
  * definitions are deterministic.
  */
class TopKPerKeyPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 8L)   // few keys → big skewed groups
      v <- Gen.choose(0L, 20L)    // heavy duplicate order values
    } yield (key, v))
  } yield rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }

  private def samples(count: Int): Seq[List[(Long, Long, Long)]] =
    (0 until count).flatMap(i =>
      rowsGen.apply(Gen.Parameters.default, Seed(77L + i)))

  test("spill fallback engages at adversarial key cardinality and stays row-identical") {
    // 5000 distinct keys per few rows with a 64-row memory cap: the pass
    // must spill repeatedly and refine through at least one bucket level
    // (bucket of ~312 keys × k=2 kept rows still exceeds the cap), and
    // the result must equal the sort-based window's exactly.
    // Isolated newSession (r7, ADVICE r6): the cap conf must not leak to
    // suites planning TopK queries in parallel on the shared session.
    val iso = spark.newSession()
    iso.conf.set("spark.graft.topk.maxKeptRowsPerPartition", "64")
    val before = TopKPerKeyExec.spillEvents.get()
    val df = iso.range(0, 20000).select(
      (col("id") % 5000).as("key"),
      (col("id") * 37 % 101).as("v"),
      col("id").as("id2"))
    val native = TopK.perKey(df, Seq("key"), Seq(("v", false), ("id2", true)), 2)
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("key").orderBy(desc("v"), asc("id2"))
    val window = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .as[(Long, Long, Long)].collect().toSet
    assert(native == window)
    assert(native.size == 10000) // 5000 keys × k=2
    assert(TopKPerKeyExec.spillEvents.get() > before,
      "memory cap of 64 rows never triggered a spill — fallback untested")
  }

  test("depth-exhausted sort-merge fallback is bounded and row-identical") {
    // maxRefineDepth = -1 simulates total 32-bit hash collision: the very
    // first over-budget pass must go straight to the external sort-merge
    // (nibble refinement "exhausted"), never to unbounded in-memory heaps.
    // 64-row cap over 3000 distinct keys forces multiple sorted runs, so
    // the k-way merge and per-key-group prefix emission are both
    // exercised; duplicate order values within a key check the group
    // boundary logic.
    val iso = spark.newSession()
    iso.conf.set("spark.graft.topk.maxKeptRowsPerPartition", "64")
    iso.conf.set("spark.graft.topk.maxRefineDepth", "-1")
    val before = TopKPerKeyExec.sortFallbackEvents.get()
    val df = iso.range(0, 12000).select(
      (col("id") % 3000).as("key"),
      (col("id") * 13 % 7).as("v"), // heavy duplicates
      col("id").as("id2"))
    val native = TopK.perKey(df, Seq("key"), Seq(("v", false), ("id2", true)), 3)
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("key").orderBy(desc("v"), asc("id2"))
    val window = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .as[(Long, Long, Long)].collect().toSet
    assert(native == window)
    assert(native.size == 9000) // 3000 keys × min(k=3, 4 rows/key) = 3
    assert(TopKPerKeyExec.sortFallbackEvents.get() > before,
      "maxRefineDepth=-1 never engaged the sort-merge fallback — path untested")
  }

  test("row-identical to the window form on random skewed data") {
    samples(12).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("key", "v", "id")
      Seq(1, 2, 5).foreach { k =>
        val native = TopK.perKey(df, Seq("key"), Seq(("v", false), ("id", true)), k)
          .as[(Long, Long, Long)].collect().toSet
        val w = Window.partitionBy("key").orderBy(desc("v"), asc("id"))
        val window = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
          .as[(Long, Long, Long)].collect().toSet
        assert(native == window, s"sample $i k=$k: ${native.size} vs ${window.size}")
      }
    }
  }
}
