package graft.npm

import model._

/** T3 — registry-metadata normalization (SURVEY.md §1.2, §2.5 T3).
  *
  * A pure-function re-expression of what the reference's producer applies
  * per change (reference: node_app/producer.ts:145 via
  * normalize-registry-metadata/index.js:4-96):
  *
  *  1. drop the doc entirely for `_design/` ids, `_deleted: true`, or
  *     `error == "not_found" && reason == "deleted"` (index.js:7-11);
  *  2. semver-clean every key of `versions`; on a rename, move the version
  *     entry, rewrite its `version` field and `_id = <pkg>@<cleaned>`, and
  *     move the matching `time` key (index.js:37-60);
  *  3. repair `dist-tags`: retarget tags whose value was renamed in (2);
  *     for tags pointing at a version that doesn't exist, try cleaning the
  *     tag value itself — drop the tag if it is uncleanable or still
  *     missing from `versions` (index.js:71-93).
  *
  * Pure (PackageDoc → Option[PackageDoc]) so it is unit/property-testable
  * without Spark; the Dataset stage maps it over `Dataset[Change]`.
  */
object Normalize {

  def normalizeDoc(doc: PackageDoc): Option[PackageDoc] = {
    val id = doc._id.getOrElse("")
    if (id.isEmpty || id.startsWith("_design/")) return None
    if (doc._deleted.contains(true)) return None
    if (doc.error.contains("not_found") && doc.reason.contains("deleted")) return None

    doc.versions match {
      case None => Some(doc)
      case Some(versions) =>
        // (2) semver-clean version keys, tracking renames
        var renames = Map.empty[String, String]
        var newVersions = Map.empty[String, VersionDoc]
        var newTime = doc.time.getOrElse(Map.empty)
        versions.foreach { case (k, v) =>
          Semver.clean(k) match {
            case Some(cleaned) if cleaned != k =>
              renames += (k -> cleaned)
              newVersions += (cleaned -> v.copy(
                version = Some(cleaned),
                _id = Some(s"$id@$cleaned")))
              newTime.get(k).foreach { t =>
                newTime = newTime - k + (cleaned -> t)
              }
            case _ =>
              newVersions += (k -> v)
          }
        }
        // (3) dist-tags repair
        val newTags = doc.`dist-tags`.map { tags =>
          tags.flatMap { case (tag, target) =>
            if (renames.contains(target)) Some(tag -> renames(target))
            else if (newVersions.contains(target)) Some(tag -> target)
            else Semver.clean(target) match {
              case Some(cleaned) if newVersions.contains(cleaned) => Some(tag -> cleaned)
              case _ => None // uncleanable or still missing → drop the tag
            }
          }
        }
        Some(doc.copy(
          versions = Some(newVersions),
          time = if (doc.time.isDefined) Some(newTime) else None,
          `dist-tags` = newTags))
    }
  }

  /** Stream/batch stage: normalize each change's doc; changes whose doc is
    * dropped by normalization keep flowing with doc = None (the pipeline's
    * F1 filter then routes them to the DLQ with a reason).
    */
  def normalizeChange(c: Change): Change =
    c.copy(doc = c.doc.flatMap(normalizeDoc))
}
