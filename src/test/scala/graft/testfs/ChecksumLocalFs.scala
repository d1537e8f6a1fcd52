package graft.testfs

import java.net.URI

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** A checksum LocalFileSystem bound to the `localfs://` scheme.
  *
  * The test harness must run `file://` as RawLocalFileSystem (checksum
  * sibling paths explode on the reference's colon-bearing ISO payload
  * filenames), but the RocksDB state store's file manager hard-casts its
  * FileSystem to Hadoop's checksum [[LocalFileSystem]]. Registering this
  * subclass under a second scheme (`spark.hadoop.fs.localfs.impl`) lets
  * RocksDB-backed checkpoints run in the same JVM: IS-A LocalFileSystem
  * for the cast, while `getUri`/`checkPath` accept `localfs:` paths.
  */
class RawLocalFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("localfs:///")
  // RocksDB's file manager hands this FS a mix of localfs: checkpoint
  // paths and file: paths for its local working files (SSTs) — both are
  // the same local disk, so accept both rather than "Wrong FS"-ing
  override def checkPath(path: Path): Unit = {
    val scheme = path.toUri.getScheme
    if (scheme != null && scheme != "localfs" && scheme != "file")
      super.checkPath(path)
  }
}

class ChecksumLocalFs extends LocalFileSystem(new RawLocalFs) {
  override def getUri: URI = URI.create("localfs:///")
  override def checkPath(path: Path): Unit = {
    val scheme = path.toUri.getScheme
    if (scheme != null && scheme != "localfs" && scheme != "file")
      super.checkPath(path)
  }
}
