package graft

/** Per-process staging-directory factory for the live streaming queries
  * (feed + checkpoint dirs under java.io.tmpdir).
  *
  * Every staged dir embeds a per-process nonce (the JVM pid) in its name
  * so the Bench/Verify between-query sweeps can delete ONLY dirs this
  * process created: an mtime/"created after process start" heuristic is
  * not ownership — a concurrent `sbt test` or a second Bench/Verify run
  * staging under the same prefixes would get its live feed/checkpoint
  * dirs recursively deleted mid-query (r12 advisory). The nonce makes
  * ownership exact; a crash leaves at most one process's dirs behind,
  * which the next OS tmp cleanup (or a manual sweep) reclaims.
  */
object TmpDirs {
  /** Name fragment present in every dir this process stages. */
  val nonceTag: String = s"-p${ProcessHandle.current().pid()}-"

  /** Create a staged tmp dir whose name carries this process's nonce.
    * `prefix` must keep starting with one of the swept families
    * ("graft-", "floor-", "streamdemo") so the sweeps' prefix filter
    * still scopes the scan.
    */
  def create(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix + nonceTag).toString

  /** True iff this process created the named tmp entry. */
  def ownedByThisProcess(name: String): Boolean = name.contains(nonceTag)
}
