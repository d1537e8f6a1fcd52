package graft.npm

import graft.SparkSpec
import model.CatalogRecord

class LatestPerPackageSpec extends SparkSpec {

  import spark.implicits._

  private def rec(pkg: String, seq: Long, ver: String): CatalogRecord =
    CatalogRecord(pkg, seq, Some(s"$seq-r"), Some(ver), 1, 3, None,
      None, None, None, Some(s"path/$pkg-$seq.zip"), package_deleted = false, None)

  test("compaction keeps the highest-seq record per package") {
    val catalog = Seq(
      rec("a", 1, "1.0.0"), rec("a", 9, "1.2.0"), rec("a", 5, "1.1.0"),
      rec("b", 2, "0.1.0"),
      rec("c", 7, "3.0.0"), rec("c", 3, "2.0.0")).toDS()
    val got = LatestPerPackage.compact(catalog).collect()
      .map(r => r.package_name -> (r.change_seq_id, r.package_latest_version.get))
      .toMap
    assert(got == Map("a" -> (9L, "1.2.0"), "b" -> (2L, "0.1.0"), "c" -> (7L, "3.0.0")))
  }

  test("compaction is repartitioning-invariant (merge path exercised)") {
    val catalog = (1 to 200).map(i => rec(s"p${i % 10}", i.toLong, s"1.$i.0")).toDS()
    val direct = LatestPerPackage.compact(catalog).collect()
      .map(r => r.package_name -> r.change_seq_id).toMap
    val shuffled = LatestPerPackage.compact(catalog.repartition(13)).collect()
      .map(r => r.package_name -> r.change_seq_id).toMap
    assert(direct == shuffled)
    val expected = (0 until 10).map(k =>
      s"p$k" -> (if (k == 0) 200L else 190L + k)).toMap
    assert(direct == expected)
  }
}
