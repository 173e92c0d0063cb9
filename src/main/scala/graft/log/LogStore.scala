package graft.log

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/**
 * Storage primitives behind the snapshot-log commit protocol. The whole
 * transactional surface of the table format reduces to these five
 * operations on the `_log/` directory; everything above ([[SnapshotLog]],
 * [[graft.table.GraftTable]]) is storage-agnostic.
 *
 * The commit point is [[tryClaim]]: an atomic create-if-absent of a fully
 * written manifest. Mapping per backend:
 *
 *  - POSIX / HDFS ([[LocalLogStore]]): write a temp file, then
 *    `Files.createLink` — a hard link fails if the target exists (unlike
 *    rename, which silently replaces and would lose a committed write when
 *    two writers race to the same snapshot id).
 *  - S3-style object stores (no hard links, no atomic rename): a
 *    conditional put of the manifest key — `If-None-Match: *` on S3,
 *    `ifGenerationMatch=0` on GCS, `If-None-Match: *` on Azure Blob — has
 *    exactly the claim-or-fail semantics; no temp file or rename needed
 *    because an object put is already all-or-nothing.
 *
 * Readers need only [[list]] + [[read]]; losers of a claim race re-read the
 * head and retry, so no lock service is required on any backend.
 */
trait LogStore {

  /** Atomically create `target` with `bytes` iff it does not exist.
    * Returns false (and writes nothing visible) if it already does. */
  def tryClaim(target: Path, bytes: Array[Byte]): Boolean

  def read(p: Path): Array[Byte]

  /** Immediate children of `dir` (empty if `dir` is not a directory). */
  def list(dir: Path): Seq[Path]

  def exists(p: Path): Boolean

  def delete(p: Path): Unit

  def mkdirs(dir: Path): Unit

  /** Last-modified time of `p` in epoch millis; None if unavailable.
    * Used by orphan GC's age check — goes through the store (not raw
    * java.nio) so an object-store implementation whose Paths aren't local
    * files still ages out orphans instead of silently retaining them
    * forever. The default covers POSIX/HDFS-style stores. */
  def modifiedAtMs(p: Path): Option[Long] =
    scala.util.Try(Files.getLastModifiedTime(p).toMillis).toOption
}

/** POSIX/HDFS implementation: hard-link claim (see [[LogStore]] scaladoc). */
object LocalLogStore extends LogStore {

  def tryClaim(target: Path, bytes: Array[Byte]): Boolean = {
    val tmp = Files.createTempFile(target.getParent, ".commit-", ".tmp")
    try {
      Files.write(tmp, bytes)
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  def read(p: Path): Array[Byte] = Files.readAllBytes(p)

  def list(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Using.resource(Files.list(dir))(_.iterator().asScala.toSeq)

  def exists(p: Path): Boolean = Files.exists(p)

  def delete(p: Path): Unit = { Files.deleteIfExists(p); () }

  def mkdirs(dir: Path): Unit = { Files.createDirectories(dir); () }
}
