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
class GraftTestFs extends RawLocalFileSystem {
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

/** [[GraftTestFs]] minus `append()` — the OBJECT-STORE shape (S3A has no
  * native append), forcing the commit-log cache onto the read-modify-write
  * fallback so specs can prove the record ledger survives an interleaved
  * RMW that drops a cache line. */
class GraftNoAppendFs extends GraftTestFs {
  override def getScheme: String = "graftnoap"
  override def getUri: URI = URI.create("graftnoap:///")

  override def append(f: Path, bufferSize: Int,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    throw new UnsupportedOperationException(
      "graftnoap: object-store semantics — no append")
}

/** The full S3 shape: no append AND no atomic create-exclusive — a PUT
  * silently replaces an existing object, so `create(f, overwrite=false)`
  * succeeds even when the file exists. This is the filesystem on which the
  * marker CAS alone cannot arbitrate claims and a registered
  * [[SnapshotTable.ClaimArbiter]] (Iceberg's catalog-CAS role) is the
  * correctness requirement, not an optimization. */
final class GraftS3LikeFs extends GraftNoAppendFs {
  override def getScheme: String = "grafts3"
  override def getUri: URI = URI.create("grafts3:///")

  // PUT semantics: exclusivity is silently ignored on every create path
  // (RawLocalFileSystem checks existence in the non-permission overload)
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
}
