package graft.store

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Test-only `mock3://` filesystem with OBJECT-STORE rename semantics:
  * rename is copy-then-delete (the S3A shape — S3 has no rename primitive),
  * with injectable failure windows at the two points a process can die:
  *
  *  - `before-copy`: rename fails before any byte moved (dst absent,
  *    src intact) — the delete-dst-then-crash window of a marker swap;
  *  - `after-copy` : dst fully copied but src never deleted (both visible)
  *    — the classic S3 crash signature.
  *
  * Everything else delegates to the local filesystem, so the store's
  * correctness protocols (`_SUCCESS`-gated generations, marker-file
  * bookkeeping, staged publishes) run unmodified against it. What this
  * deliberately KEEPS atomic is `create(path, overwrite=false)` — the
  * generation-claim CAS — matching stores with conditional create
  * (S3 If-None-Match PUT, GCS preconditions, ABFS lease): on a store
  * without it, the claim needs an external lock service (Delta's
  * DynamoDB LogStore analog), which is out of scope here.
  */
class NonAtomicRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "mock3"
  override def getUri: URI = NonAtomicRenameFs.uri

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus loads permissions
  // lazily via `new java.io.File(path.toUri)`, which rejects any scheme
  // but file:. Return solid statuses with permissions pre-filled instead —
  // object stores have no POSIX permissions anyway.
  private def solid(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, FsPermission.getDefault,
      "graft", "graft", s.getPath)

  override def getFileStatus(f: Path): FileStatus =
    solid(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(solid)

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    NonAtomicRenameFs.renames.incrementAndGet()
    val failing = NonAtomicRenameFs.shouldFail(src)
    if (failing && NonAtomicRenameFs.failMode == "before-copy") {
      NonAtomicRenameFs.failMode = ""
      return false
    }
    // dst an existing dir -> move src INTO it (FileSystem rename contract);
    // FileUtil.copy implements exactly that case.
    FileUtil.copy(this, src, this, dst, false, getConf)
    if (failing && NonAtomicRenameFs.failMode == "after-copy") {
      NonAtomicRenameFs.failMode = ""
      return false // "process died" between copy and delete: src survives
    }
    delete(src, true)
    true
  }
}

object NonAtomicRenameFs {
  val uri: URI = URI.create("mock3:///")
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
  /** "" | "before-copy" | "after-copy"; one-shot (cleared when it fires). */
  @volatile var failMode: String = ""
  /** Only renames whose source path contains this substring fail — targets
    * a specific marker swap without tripping Spark's committer renames.
    */
  @volatile var failPathContains: String = ""

  private def shouldFail(src: Path): Boolean =
    failMode.nonEmpty && failPathContains.nonEmpty &&
      src.toString.contains(failPathContains) &&
      // committer-internal renames (task/job attempt promotion) share the
      // target's path prefix; the injectable windows model crashes of the
      // STORE protocol's own renames, not the committer's
      !src.toString.contains("_temporary")

  def reset(): Unit = { failMode = ""; failPathContains = ""; renames.set(0) }
}
