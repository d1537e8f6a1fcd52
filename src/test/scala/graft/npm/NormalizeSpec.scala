package graft.npm

import org.scalatest.funsuite.AnyFunSuite
import model._

class NormalizeSpec extends AnyFunSuite {

  private def mkDoc(
      id: String = "pkg",
      versions: Map[String, VersionDoc] = Map.empty,
      tags: Map[String, String] = Map.empty,
      time: Map[String, String] = Map.empty,
      deleted: Option[Boolean] = None,
      error: Option[String] = None,
      reason: Option[String] = None): PackageDoc =
    PackageDoc(Some(id), Some("1-a"), Some(id),
      if (tags.isEmpty) None else Some(tags),
      if (versions.isEmpty) None else Some(versions),
      if (time.isEmpty) None else Some(time),
      deleted, error, reason)

  private def v(ver: String): VersionDoc =
    VersionDoc(Some(ver), None, None, None, None, None)

  test("design docs, deleted docs, and not_found/deleted are dropped") {
    assert(Normalize.normalizeDoc(mkDoc(id = "_design/app")).isEmpty)
    assert(Normalize.normalizeDoc(mkDoc(deleted = Some(true))).isEmpty)
    assert(Normalize.normalizeDoc(
      mkDoc(error = Some("not_found"), reason = Some("deleted"))).isEmpty)
    assert(Normalize.normalizeDoc(mkDoc()).isDefined)
  }

  test("malformed version keys are cleaned; version/_id/time follow the rename") {
    val d = mkDoc(
      versions = Map("v1.0.0" -> v("v1.0.0"), "2.0.0" -> v("2.0.0")),
      time = Map("v1.0.0" -> "t1", "2.0.0" -> "t2", "created" -> "t0", "modified" -> "t2"),
      tags = Map("latest" -> "2.0.0"))
    val n = Normalize.normalizeDoc(d).get
    assert(n.versions.get.keySet == Set("1.0.0", "2.0.0"))
    assert(n.versions.get("1.0.0").version.contains("1.0.0"))
    assert(n.versions.get("1.0.0")._id.contains("pkg@1.0.0"))
    assert(n.time.get.keySet == Set("1.0.0", "2.0.0", "created", "modified"))
    assert(n.time.get("1.0.0") == "t1")
  }

  test("dist-tag pointing at a renamed version is retargeted") {
    val d = mkDoc(
      versions = Map("v1.0.0" -> v("v1.0.0")),
      tags = Map("latest" -> "v1.0.0"))
    val n = Normalize.normalizeDoc(d).get
    assert(n.`dist-tags`.get == Map("latest" -> "1.0.0"))
  }

  test("dist-tag whose own value is malformed but cleanable is repaired") {
    val d = mkDoc(
      versions = Map("1.0.0" -> v("1.0.0")),
      tags = Map("latest" -> "=1.0.0"))
    val n = Normalize.normalizeDoc(d).get
    assert(n.`dist-tags`.get == Map("latest" -> "1.0.0"))
  }

  test("uncleanable or still-missing dist-tags are dropped, others kept") {
    val d = mkDoc(
      versions = Map("1.0.0" -> v("1.0.0")),
      tags = Map("latest" -> "0.6", "next" -> "9.9.9", "beta" -> "1.0.0"))
    val n = Normalize.normalizeDoc(d).get
    // "0.6" uncleanable → dropped; "9.9.9" cleanable but missing → dropped
    assert(n.`dist-tags`.get == Map("beta" -> "1.0.0"))
  }

  test("_attachments/directories default to {}, ctime/mtime are deleted") {
    val d = mkDoc(versions = Map(
        "1.0.0" -> v("1.0.0").copy(ctime = Some("vc"), mtime = Some("vm")),
        "2.0.0" -> v("2.0.0").copy(directories = Some(Map("lib" -> "lib")))))
      .copy(ctime = Some("c"), mtime = Some("m"))
    val n = Normalize.normalizeDoc(d).get
    assert(n._attachments.contains(Map.empty))
    assert(n.ctime.isEmpty && n.mtime.isEmpty)
    assert(n.versions.get("1.0.0").directories.contains(Map.empty))
    assert(n.versions.get("1.0.0").ctime.isEmpty && n.versions.get("1.0.0").mtime.isEmpty)
    assert(n.versions.get("2.0.0").directories.contains(Map("lib" -> "lib")))
    // an existing _attachments map is preserved, and defaulting applies
    // even when the doc has no versions at all
    val att = Map("a.tgz" -> Attachment(Some("application/octet-stream"),
      Some(1L), Some("md5-x"), Some(5L), Some(true)))
    val n2 = Normalize.normalizeDoc(mkDoc().copy(_attachments = Some(att))).get
    assert(n2._attachments.contains(att))
    assert(Normalize.normalizeDoc(mkDoc()).get._attachments.contains(Map.empty))
  }

  test("normalization is idempotent on the fixture corpus shapes") {
    val docs = Seq(
      mkDoc(versions = Map("v1.0.0" -> v("v1.0.0"), "01.2.3" -> v("01.2.3")),
        time = Map("v1.0.0" -> "t", "01.2.3" -> "t2", "created" -> "c", "modified" -> "m"),
        tags = Map("latest" -> "v1.0.0", "old" -> "0.6")),
      mkDoc(versions = Map("1.0.0" -> v("1.0.0")), tags = Map("latest" -> "1.0.0")))
    docs.foreach { d =>
      val once = Normalize.normalizeDoc(d)
      assert(once.flatMap(Normalize.normalizeDoc) == once)
    }
  }
}
