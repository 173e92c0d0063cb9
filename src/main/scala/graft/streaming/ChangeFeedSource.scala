package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Paths

import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.StreamBatch
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SQLContext}

import graft.table.GraftTable

/**
 * Structured-Streaming source over a graft table's commit-granular change
 * feed — `spark.readStream.format("graft-changes")` is to [[GraftTable]]
 * what `readStream` on a Delta table with `readChangeFeed` is to Delta:
 * each micro-batch is exactly [[GraftTable.changesBetween]] over the
 * commits that landed since the last batch, so a downstream consumer
 * (materialized aggregate, replica table, alerting query) stays continuous
 * AND incremental — per-batch cost tracks the changes, never the table.
 *
 * Offsets are snapshot ids ("consumed THROUGH version v", inclusive), so
 * the checkpointed offset log composes with the table's own history: a
 * resumed stream replans `(checkpointed, head]` and gets the identical
 * deterministic feed — exactly-once through any idempotent sink. Batch
 * boundaries land on commit boundaries by construction; a single batch may
 * span several commits (each row carries `_commit_version`).
 *
 * Options:
 *  - `path`   (required): table root directory
 *  - `pk`     (required): merge key change rows are identified by
 *  - `name`:  table name (default: the root directory's name)
 *  - `branch`: stream a branch's history instead of main
 *  - `startingVersion`: first batch covers `(startingVersion, head]`.
 *    Default 0 = full retained history replayed as inserts/changes;
 *    `latest` = only commits after the stream first starts. The resolved
 *    value is persisted in the stream's metadata dir, so a checkpointed
 *    restart re-plans its first window identically even under `latest`.
 *
 * The stream's schema is fixed at first start (head schema plus
 * `_change_type`, `_commit_version` — the window-end alignment
 * [[GraftTable.changesBetween]] already performs). Columns added to the
 * table mid-stream surface after a restart; until then they are absent
 * from the fixed schema, matching the file-source contract. A start
 * version whose history has been expired fails the stream loudly rather
 * than fabricating a partial feed — restart with a retained
 * `startingVersion` (or `latest`) and let the consumer recompute, the
 * same contract as [[graft.table.MaterializedAgg.refresh]].
 */
class ChangeFeedSource(
    table: GraftTable,
    pk: String,
    startVersion: Long,
    override val schema: StructType) extends Source {

  override def getOffset: Option[Offset] = {
    val head = table.latestVersion
    if (head <= startVersion) None else Some(ChangeFeedSource.FeedOffset(head))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ChangeFeedSource.version).getOrElse(startVersion)
    val to = ChangeFeedSource.version(end)
    val feed = table.changesBetween(from, to, pk)
    // Project to the stream-lifetime schema: declared order, typed-null
    // pads for columns this window predates, casts for widened columns.
    val aligned = feed.select(schema.fields.map { f =>
      if (feed.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    StreamBatch.asStreamingBatch(aligned)
  }

  override def stop(): Unit = ()
}

object ChangeFeedSource {
  /** "Consumed through snapshot `version`" — totally ordered, json = the id. */
  case class FeedOffset(version: Long) extends Offset {
    override def json: String = version.toString
  }

  private[streaming] def version(o: Offset): Long = o match {
    case FeedOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset from the checkpoint
  }

  def feedSchema(table: GraftTable): StructType =
    StructType(table.schema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
}

/** `format("graft-changes")` registration (also served by the
  * `META-INF/services` entry, so the short name resolves without any
  * session configuration). */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName: String = "graft-changes"

  private def open(sqlContext: SQLContext,
      parameters: Map[String, String]): (GraftTable, String) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changes needs option 'path' = the table's root directory"))
    val pk = parameters.getOrElse("pk", throw new IllegalArgumentException(
      "graft-changes needs option 'pk' = the merge key column"))
    val root = Paths.get(path)
    val name = parameters.getOrElse("name",
      Option(root.getFileName).map(_.toString).getOrElse("table"))
    val base = new GraftTable(sqlContext.sparkSession, root, name)
    (parameters.get("branch").map(base.branch).getOrElse(base), pk)
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (table, _) = open(sqlContext, parameters)
    (shortName, schema.getOrElse(ChangeFeedSource.feedSchema(table)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (table, pk) = open(sqlContext, parameters)
    // Resolve `startingVersion` ONCE per stream and pin it in the stream's
    // metadata dir: under `latest`, a restart that still has to re-run its
    // first batch (offset committed, sink not) must plan the ORIGINAL
    // window, not "latest as of the restart" — re-resolving would silently
    // drop the commits that raced the crash. `metadataPath` arrives as a
    // URI string ("file:/..." locally, hdfs/s3 on a cluster), so the pin
    // goes through Hadoop's FileSystem — java.nio would treat the URI as
    // a RELATIVE path and strand the pin under the driver's cwd, losing
    // it on any restart with a different working directory.
    val pinFile = new org.apache.hadoop.fs.Path(metadataPath, "graft-start-version")
    val fs = pinFile.getFileSystem(
      sqlContext.sparkSession.sessionState.newHadoopConf())
    val start =
      if (fs.exists(pinFile)) {
        val in = fs.open(pinFile)
        try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      } else {
        val v = parameters.get("startingVersion") match {
          case Some("latest") => table.latestVersion
          case Some(s) => s.toLong
          case None => 0L
        }
        val outS = fs.create(pinFile, false)
        try outS.write(v.toString.getBytes(StandardCharsets.UTF_8))
        finally outS.close()
        v
      }
    new ChangeFeedSource(table, pk, start,
      schema.getOrElse(ChangeFeedSource.feedSchema(table)))
  }
}
