package graft.connector

import java.nio.file.Paths

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.log.Snapshot
import graft.table.GraftTable

/**
 * Micro-batch streaming READ of a catalog table —
 * `spark.readStream.table("lake.t")`, the consuming twin of the streaming
 * append sink. Offsets are snapshot ids ("consumed THROUGH version v"),
 * so the checkpointed offset log composes with the table's own history:
 *
 *  - the FIRST batch is the whole table as of stream start (the head
 *    snapshot's dirs — Delta's initial-snapshot semantics);
 *  - every later batch is exactly the dirs APPENDED by the commits in
 *    `(start, end]` — per-batch cost tracks the appends, never the table,
 *    and no driver-side row materialization anywhere (partitions are
 *    file lists; the readers are the scan's own vectorized decoders).
 *
 * Non-append commits (upsert/delete/merge/compact) REFUSE the stream
 * loudly rather than silently re-emitting rewritten rows — rewrite
 * consumers want `spark.readStream.format("graft-changes")`, the
 * commit-granular change feed with typed change rows. Same contract as
 * Delta's streaming source without `skipChangeCommits`. A head with
 * pending MOR deltas refuses at start for the same reason: the initial
 * batch would need chain resolution that later windows could contradict —
 * `compact()` first, or consume the feed.
 */
private[connector] final class GraftAppendStream(
    spark: SparkSession,
    rootPath: String,
    tableName: String,
    readSchema: StructType,
    startHead: Snapshot)
  extends MicroBatchStream {

  require(startHead.deltaDirs.isEmpty,
    s"streaming read of $tableName with ${startHead.deltaDirs.size} pending " +
      "merge-on-read delta commits: the initial snapshot would need chain " +
      "resolution later windows could contradict — compact() first, or " +
      "consume format(\"graft-changes\").")

  private val hadoopConf =
    new SerializableConfiguration(spark.sessionState.newHadoopConf())
  private def gt = new GraftTable(spark, Paths.get(rootPath), tableName)

  private def listFiles(dir: String): Array[FileSlice] = {
    val p = new Path(Paths.get(rootPath).resolve(dir).toString)
    val fs = p.getFileSystem(hadoopConf.value)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => FileSlice(f.getPath.toString, f.getLen))
  }

  override def initialOffset(): Offset = GraftAppendStream.VOffset(0L)
  override def latestOffset(): Offset =
    GraftAppendStream.VOffset(math.max(gt.latestVersion, startHead.snapshotId))
  override def deserializeOffset(json: String): Offset =
    GraftAppendStream.VOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = GraftAppendStream.version(start)
    val to = GraftAppendStream.version(end)
    if (to <= from) return Array.empty
    val dirs: Seq[String] =
      if (from == 0L) {
        // Initial snapshot: everything as of the stream-start head (pinned
        // at scan build — a restart re-plans the identical window even if
        // the table moved meanwhile).
        val pin = math.min(to, startHead.snapshotId)
        val snap = gt.log.get(pin).getOrElse(throw new IllegalStateException(
          s"table $tableName snapshot $pin expired mid-stream; restart the query"))
        require(snap.deltaDirs.isEmpty,
          s"snapshot $pin carries pending deltas the stream cannot resolve")
        snap.dataDirs ++ appendedDirs(pin + 1, to)
      } else appendedDirs(from + 1, to)
    dirs.flatMap { d =>
      val files = listFiles(d)
      if (files.isEmpty) None
      else Some(GraftInputPartition(files, -1): InputPartition)
    }.toArray
  }

  /** The dirs the commits `[from, to]` APPENDED; any other operation in
    * the window refuses the stream loudly (see class doc). */
  private def appendedDirs(from: Long, to: Long): Seq[String] = {
    val log = gt.log
    (from to to).flatMap { v =>
      // The operation gate needs core fields only — no composed snapshot.
      val core = log.getCore(v).getOrElse(throw new IllegalStateException(
        s"table $tableName snapshot $v expired mid-stream; restart the query"))
      require(core.operation == "append" || core.operation == "insert",
        s"streaming read of $tableName hit a '${core.operation}' commit " +
          s"(snapshot $v): rewrites cannot stream as appends — consume " +
          "format(\"graft-changes\") for typed change rows instead")
      // O(delta) attribution from the commit's own detail segment when the
      // log can prove it (round 17 — a poll tick on a 10⁶-dir table must
      // price the appended dirs, not the table); the composed set diff is
      // the fallback for legacy manifests and folds.
      log.commitDirDelta(v) match {
        case Some((added, removed, newDeltas)) if removed.isEmpty =>
          added ++ newDeltas
        case _ =>
          val s = log.get(v).getOrElse(throw new IllegalStateException(
            s"table $tableName snapshot $v expired mid-stream; restart the query"))
          // An expired PARENT is as fatal as an expired window snapshot:
          // with no parent dirs to diff against, the "appended" set would
          // degenerate to the snapshot's full cumulative dataDirs and
          // silently re-emit the whole table as appends.
          val parentDirs = s.parentId match {
            case None => Set.empty[String]
            case Some(pid) =>
              val p = log.get(pid).getOrElse(throw new IllegalStateException(
                s"table $tableName snapshot $pid (parent of $v) expired " +
                  "mid-stream; restart the query"))
              (p.dataDirs ++ p.deltaDirs).toSet
          }
          (s.dataDirs ++ s.deltaDirs).filterNot(parentDirs)
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(
      GraftSparkTable.schemaToPhysical(readSchema,
        org.apache.spark.sql.types.DataType.fromJson(startHead.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).json,
      None, hadoopConf)

  override def toString: String =
    s"graft $tableName append-stream from snapshot ${startHead.snapshotId}"
}

private[connector] object GraftAppendStream {
  case class VOffset(v: Long) extends Offset {
    override def json: String = v.toString
  }
  def version(o: Offset): Long = o match {
    case VOffset(v) => v
    case other => other.json.trim.toLong
  }
}
