package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A RawLocalFileSystem wearing a non-`file:` scheme. Registering it as
  * `graftfs:` makes every [[SnapshotTable]] metadata and data IO take the
  * Hadoop-FileSystem code path (`rootIsLocal = false`) while still backed
  * by local disk — the cheapest way to PROVE no java.nio escape remains on
  * scheme'd roots: a stray `Paths.get("graftfs:///…")` would resolve the
  * whole URI as a RELATIVE file name and create a literal `graftfs:`
  * directory under the CWD instead of touching the store root, which the
  * spec asserts never happens. RawLocalFileSystem supports `append()`, so
  * the commit log exercises the native-append branch (the HDFS shape);
  * object stores without append take the documented read-modify-write
  * fallback instead. */
final class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  /** RawLocalFileSystem's status objects load permissions LAZILY via
    * `new java.io.File(path.toUri)`, which rejects any non-`file:` scheme —
    * re-wrap every status with eager default permissions so consumers
    * (Spark's listing, LocatedFileStatus) never trigger that load. */
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, 1, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "graft", "graft", s.getPath)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}
