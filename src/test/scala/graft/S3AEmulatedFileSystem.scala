package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Test fixture: a Hadoop FileSystem registered under the `s3a://`
  * scheme, backed by the local disk — the sandbox stand-in for a real
  * S3 endpoint (no hadoop-aws jar and zero egress here). What it
  * proves is the CONTRACT the object-store source claims: every
  * graft path flows through `Path.getFileSystem` on the path's own
  * scheme, so pointing the same code at `s3a://bucket/...` exercises
  * the identical resolve/list/rename/stream machinery a real S3A
  * deployment uses — only the wire protocol behind the FileSystem API
  * differs. Bucket emulation: the URI authority is the bucket name
  * (ignored for storage, as S3A ignores it for pathing) and the URI
  * path maps directly onto the local filesystem.
  */
class S3AEmulatedFileSystem extends RawLocalFileSystem {
  private var emulatedUri: URI = _

  override def getScheme: String = "s3a"

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    emulatedUri = URI.create(
      uri.getScheme + "://" + Option(uri.getAuthority).getOrElse(""))
  }

  override def getUri: URI = if (emulatedUri != null) emulatedUri else super.getUri

  // internal helpers hand back file:/ and scheme-less paths; all map
  // onto the same local storage, so every spelling is "ours"
  override def checkPath(path: Path): Unit = ()

  /** RawLocal's lazy DeprecatedRawLocalFileStatus resolves permissions
    * through `new java.io.File(path.toUri)`, which rejects non-file
    * schemes — exactly what an s3a-qualified status carries. Real S3A
    * has no POSIX permissions either; return eagerly-materialized
    * statuses with a fixed permission, like S3A does.
    */
  private def fixed(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      FsPermission.getFileDefault, "", "", st.getPath)

  override def getFileStatus(f: Path): FileStatus = fixed(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(fixed)
}
