package graft.connector

import java.nio.file.Paths
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.read.SupportsPushDownFilters
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.log.Snapshot
import graft.table.GraftTable

/**
 * Group-based (copy-on-write) row-level operations for the v2 catalog —
 * what makes the SQL statements the reference actually emits run through
 * Catalyst against a graft table:
 *
 *   - `UPDATE lake.t SET ... WHERE ...` (reference `api_poc.py:755`)
 *   - the 3-clause conditional CDC MERGE of
 *     `cdc_merger_optimized.py:176-183`
 *     (`WHEN MATCHED AND s.op = 'd' THEN DELETE / WHEN MATCHED THEN
 *     UPDATE SET ... / WHEN NOT MATCHED AND s.op != 'd' THEN INSERT ...`)
 *   - `DELETE FROM lake.t WHERE <any predicate>` — previously only
 *     conjunctions `canDeleteWhere` could translate; untranslatable
 *     conditions now fall back to this rewrite instead of failing
 *     (translatable ones still take the metadata-only
 *     `SupportsDelete.deleteWhere` path via Spark's
 *     OptimizeMetadataOnlyDeleteFromTable — no regression).
 *
 * The GROUP is the `__bucket=k` leaf dir. Spark's rewrite rules
 * (RewriteDeleteFromTable / RewriteUpdateTable / RewriteMergeIntoTable)
 * plan: scan the affected groups through [[newScanBuilder]], compute the
 * full replacement content (carried-over rows included), write it back
 * through [[newWriteBuilder]]; the commit swaps exactly the scanned
 * buckets' dirs for the staged ones ([[GraftTable.replaceGroups]]) and
 * carries every untouched bucket forward verbatim. At 100 TB that is the
 * difference between rewriting the table and rewriting the touched 1/n:
 *
 *   - statically, a bucket-key equality/IN in the condition prunes groups
 *     at plan time (same driver-side hash as the write path);
 *   - dynamically, Spark's runtime group filtering
 *     (RowLevelOperationRuntimeGroupFiltering) runs a matching-rows
 *     subquery first and hands the scan the touched KEY VALUES through
 *     `SupportsRuntimeV2Filtering` — a CDC merge whose batch touches 3 of
 *     4096 buckets scans and rewrites 3 bucket dirs.
 *
 * Scale/shape notes: the replacement write is shuffle-free — each task
 * splits its rows by the same `pmod(xxhash64(key), n)` the write path
 * uses and streams them to per-bucket parquet files, so files-per-bucket
 * equals the tasks that touched it (DELETE/UPDATE read one task per
 * bucket, so ~1; a post-join MERGE may fan wider — compact()/cluster()
 * fold the debt, same story as appends).
 */
final class GraftRowLevelOperation(
    rootPath: String,
    tableName: String,
    head: Snapshot,
    tableSchema: StructType,
    bucketSpec: Option[(String, Int)],
    cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  /** Groups the copy-on-write scan planned, set at planInputPartitions
    * time (the scan runs before the write commits): inner `Some(set)` =
    * exactly these buckets were read, inner `None` = the scan was not
    * bucket-grouped and read every dir. Outer `None` until planned — a
    * commit arriving first refuses loudly rather than guessing. */
  @volatile private[connector] var scannedGroups: Option[Option[Set[Int]]] = None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft $tableName ${cmd.toString.toLowerCase(java.util.Locale.ROOT)} " +
      "(copy-on-write, group=bucket)"

  /** Checks deferred from builder construction to here on purpose: the
    * analyzer builds the operation EAGERLY for every DELETE/UPDATE/MERGE,
    * and translatable DELETEs must still reach the metadata-only
    * `SupportsDelete` path (OptimizeMetadataOnlyDeleteFromTable) without
    * tripping over a refusal meant for the rewrite path. */
  private def requireRewritable(): Unit =
    require(head.deltaDirs.isEmpty,
      s"table $tableName has ${head.deltaDirs.size} pending merge-on-read " +
        "delta commits; a row-level rewrite would strand their images — " +
        "compact() first, or route the batch through upsert/CdcPipeline.")

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    requireRewritable()
    new GraftCowScanBuilder(this, rootPath, tableName, head, tableSchema, bucketSpec)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireRewritable()
    new WriteBuilder {
      override def build(): Write = new GraftReplaceGroupsWrite(
        GraftRowLevelOperation.this, rootPath, tableName, head, info.schema(),
        bucketSpec)
    }
  }
}

/**
 * The copy-on-write scan builder. Unlike [[GraftScanBuilder]], pushed
 * filters are used for GROUP selection ONLY — never as a parquet row-group
 * predicate: a row predicate on a COW scan would drop the non-matching
 * rows of an affected group, and the replacement write — which must carry
 * them over — would silently lose them. Bucket pruning is the one safe
 * translation: it skips whole groups, whose dirs the commit then carries
 * forward verbatim. Everything is returned as residual for Spark to
 * re-evaluate.
 */
final class GraftCowScanBuilder(
    op: GraftRowLevelOperation,
    rootPath: String,
    tableName: String,
    head: Snapshot,
    tableSchema: StructType,
    bucketSpec: Option[(String, Int)])
  extends ScanBuilder with SupportsPushDownFilters {

  private def spark: SparkSession = SparkSession.active
  private var keptBuckets: Option[Set[Int]] = None
  private var pushed: Array[sources.Filter] = Array.empty

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    // Filters reference LOGICAL names; bucket translation needs physical.
    val phys = filters.map(GraftSparkTable.filterToPhysical(_, tableSchema))
    val sets = phys.flatMap(
      GraftSparkTable.bucketsOfFilter(_, bucketSpec, tableSchema, tz))
    keptBuckets = sets.reduceOption(_ intersect _)
    pushed = filters.zip(phys).collect { case (f, pf)
      if GraftSparkTable.bucketsOfFilter(pf, bucketSpec, tableSchema, tz).isDefined => f }
    filters // ALL residual: group selection never substitutes row evaluation
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): org.apache.spark.sql.connector.read.Scan =
    new GraftScan(spark, rootPath, tableName, head,
      graft.table.ColumnIds.logicalSchema(tableSchema), bucketSpec,
      predicate = None, keptBuckets, morKey = None,
      planListener = Some(groups => op.scannedGroups = Some(groups)))
}

/** Per-task result of a staged write: row count + the attempt's files.
  * The driver prunes the staged dir to EXACTLY the committed attempts'
  * files before the commit's footer pass — a zombie attempt (executor
  * died after close, its abort never ran) leaves a complete-looking file
  * the dir listing would otherwise double-count, and a crash mid-write
  * leaves a footer-less partial the pass would choke on. */
private[graft] case class GraftReplaceMessage(rows: Long, files: Seq[String])
  extends WriterCommitMessage

private[graft] object GraftStagedDir {
  /** Delete every parquet file under `stagedAbs` that no COMMITTED task
    * attempt claims (recursive over bucket leaves). */
  def pruneToCommitted(
      stagedAbs: String,
      conf: Configuration,
      messages: Array[WriterCommitMessage]): Unit = {
    val committed: Set[String] = messages.collect {
      case m: GraftReplaceMessage => m.files
    }.flatten.map(new Path(_).toUri.getPath).toSet
    val root = new Path(stagedAbs)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath
      if (f.isFile && p.getName.endsWith(".parquet") &&
          !committed.contains(p.toUri.getPath))
        fs.delete(p, false)
    }
  }
}

/**
 * The replacement write: tasks stream rows into per-bucket parquet files
 * under one staged commit dir; `commit()` swaps the scanned groups' dirs
 * for the staged leaves via [[GraftTable.replaceGroups]] (CAS on the head
 * the scan planned from). No shuffle, no driver data path — the only
 * driver work is the footer pass every commit already does.
 */
final class GraftReplaceGroupsWrite(
    op: GraftRowLevelOperation,
    rootPath: String,
    tableName: String,
    head: Snapshot,
    writeSchema: StructType,
    bucketSpec: Option[(String, Int)])
  extends Write with BatchWrite
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  override def toBatch: BatchWrite = this
  override def description(): String =
    s"graft $tableName replace-groups (${op.command()})"

  // Layout contract on the REPLACEMENT rows, resolved through the
  // catalog's own bucket function (the same v2 machinery SPJ trusts):
  //
  //  - ordering (bucket, key) for every command: rows stream bucket-by-
  //    bucket with each bucket's slice key-sorted, so the staged files get
  //    the write path's tight non-overlapping row-group ranges (the
  //    serving lookups' pruning depends on them) — a per-partition sort,
  //    never a shuffle.
  //  - clustered distribution on bucket(n, key) for MERGE only: its query
  //    ends in a join whose output is shuffled anyway, and clustering
  //    collapses the would-be tasks × buckets file fan-out to ONE sorted
  //    file per bucket (which also keeps the scan's single-file ordering
  //    claim alive). DELETE/UPDATE read one task per bucket and already
  //    write one file each — demanding a distribution there would add a
  //    full shuffle of the survivors for nothing.
  // The query's output schema is LOGICAL; files and the staged commit
  // speak physical. Distribution/ordering expressions resolve against the
  // query output, so they use the key's LOGICAL name.
  private lazy val tableSt: StructType =
    org.apache.spark.sql.types.DataType.fromJson(head.schemaJson)
      .asInstanceOf[StructType]
  private lazy val physWriteSchema: StructType =
    GraftSparkTable.schemaToPhysical(writeSchema, tableSt)
  private def logicalKey(k: String): String =
    graft.table.ColumnIds.logicalFor(tableSt, k)

  private def bucketed: Boolean =
    bucketSpec.exists { case (k, _) =>
      writeSchema.fieldNames.exists(_.equalsIgnoreCase(logicalKey(k))) }

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    bucketSpec match {
      case Some((k, n)) if bucketed &&
          op.command() == RowLevelOperation.Command.MERGE =>
        org.apache.spark.sql.connector.distributions.Distributions.clustered(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(n,
            logicalKey(k))))
      case _ =>
        org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    }

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    bucketSpec match {
      case Some((k, n)) if bucketed =>
        import org.apache.spark.sql.connector.expressions.{Expressions => E, SortDirection}
        val kl = logicalKey(k)
        Array(E.sort(E.bucket(n, kl), SortDirection.ASCENDING),
          E.sort(E.column(kl), SortDirection.ASCENDING))
      case _ => Array.empty
    }

  private val stagedRel =
    s"data/s${head.snapshotId + 1}-rl${UUID.randomUUID().toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val stagedAbs = Paths.get(rootPath).resolve(stagedRel).toString
    new GraftReplaceWriterFactory(stagedAbs, physWriteSchema.json,
      GraftParquetWrite.keyInfo(physWriteSchema, bucketSpec),
      new SerializableConfiguration(
        GraftParquetWrite.conf(SparkSession.active, physWriteSchema)))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val scanned: Option[Set[Int]] = op.scannedGroups.getOrElse(
      throw new IllegalStateException(
        s"row-level write on $tableName committed before its scan planned " +
          "any groups — refusing to guess what to replace"))
    val rows = messages.collect { case m: GraftReplaceMessage => m.rows }.sum
    // Nothing scanned and nothing written: the condition statically/
    // dynamically matched no groups — no snapshot to commit.
    if (scanned.exists(_.isEmpty) && rows == 0L) return
    val spark = SparkSession.active
    GraftStagedDir.pruneToCommitted(
      Paths.get(rootPath).resolve(stagedRel).toString,
      spark.sessionState.newHadoopConf(), messages)
    val gt = new GraftTable(spark, Paths.get(rootPath), tableName)
    gt.replaceGroups(head.snapshotId,
      op.command().toString.toLowerCase(java.util.Locale.ROOT),
      stagedRel, scanned)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(Paths.get(rootPath).resolve(stagedRel).toString)
    val fs = p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }
}

/** The one copy of the executor-side parquet write recipe, shared by the
  * row-level replacement write and the streaming append sink. */
private[connector] object GraftParquetWrite {

  /** ParquetWriteSupport.init asserts these SQL keys are PRESENT in the
    * conf (sessionState.newHadoopConf carries only explicitly-set ones):
    * modern format, micros timestamps, no rebase — the same recipe the
    * table's write path pins (withMicrosFooters) and its readers assume. */
  def conf(spark: SparkSession, writeSchema: StructType): Configuration = {
    val c = new Configuration(spark.sessionState.newHadoopConf())
    c.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, writeSchema.json)
    c.set("spark.sql.parquet.writeLegacyFormat", "false")
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.fieldId.write.enabled", "false")
    c.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    c.set("parquet.write.support.class", classOf[ParquetWriteSupport].getName)
    c.set("parquet.compression", "snappy")
    c
  }

  /** (key col, key type json, n) from the WRITE schema — resolved by name
    * (Spark aligns rows to the table schema, but refusing loudly beats
    * writing rows into the wrong bucket). */
  def keyInfo(writeSchema: StructType,
      bucketSpec: Option[(String, Int)]): Option[(String, String, Int)] =
    bucketSpec.map { case (k, n) =>
      val dt = writeSchema.fields.find(_.name.equalsIgnoreCase(k))
        .map(_.dataType).getOrElse(throw new IllegalStateException(
          s"rows carry no bucket key column '$k' " +
            s"(write schema: ${writeSchema.fieldNames.mkString(", ")})"))
      (k, dt.json, n)
    }
}

/**
 * The streaming append sink (`df.writeStream.toTable("lake.t")` /
 * `.format(...)` through the catalog): each epoch's tasks stream rows to a
 * staged dir (bucket leaves on bucketed tables, the same per-bucket
 * key-split as every other write), and the epoch commit appends it through
 * [[graft.table.GraftTable]]'s shared CAS loop under the batch key
 * `stream-<queryId>-<epochId>` — EXACTLY-ONCE by the same idempotent-
 * batch-key mechanism the CdcPipeline uses: a replayed epoch (restart)
 * stages into a fresh token'd dir, the commit sees the key and returns the
 * committed head, and the replay's dir is the orphan GC's normal diet.
 * Pending MOR chains stay correct for free: the staged dir joins the
 * DELTA chain (sequenced last) exactly like a batch append.
 */
private[connector] final class GraftStreamingAppend(
    rootPath: String,
    tableName: String,
    writeSchema: StructType,
    bucketSpec: Option[(String, Int)],
    queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  // Fresh per (re)start: replayed epochs never write into a committed dir.
  private val token = UUID.randomUUID().toString.take(8)
  private def relFor(epochId: Long) = s"data/st$token-e$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(
      Paths.get(rootPath).resolve(s"data/st$token").toString,
      writeSchema.json, GraftParquetWrite.keyInfo(writeSchema, bucketSpec),
      new SerializableConfiguration(
        GraftParquetWrite.conf(SparkSession.active, writeSchema)))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.collect { case m: GraftReplaceMessage => m.rows }.sum
    if (rows == 0L) return // empty epoch: the offset log alone advances
    val spark = SparkSession.active
    GraftStagedDir.pruneToCommitted(
      Paths.get(rootPath).resolve(relFor(epochId)).toString,
      spark.sessionState.newHadoopConf(), messages)
    val gt = new GraftTable(spark, Paths.get(rootPath), tableName)
    gt.appendStaged(relFor(epochId), writeSchema,
      Some(s"stream-$queryId-$epochId"))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(Paths.get(rootPath).resolve(relFor(epochId)).toString)
    val fs = p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }
}

private[connector] final class GraftStreamingWriterFactory(
    stagedBase: String, // absolute prefix; epoch appended per writer
    writeSchemaJson: String,
    keyInfo: Option[(String, String, Int)],
    conf: SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftReplaceDataWriter(s"$stagedBase-e$epochId", writeSchemaJson,
      keyInfo, conf.value, partitionId, taskId)
}

private[connector] final class GraftReplaceWriterFactory(
    stagedAbs: String,
    writeSchemaJson: String,
    keyInfo: Option[(String, String, Int)], // (key col, key type json, n)
    conf: SerializableConfiguration)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftReplaceDataWriter(stagedAbs, writeSchemaJson, keyInfo, conf.value,
      partitionId, taskId)
}

/**
 * Executor-side parquet writer: one open file per bucket this task's rows
 * hash into (DELETE/UPDATE read one bucket per task, so ~1; see the class
 * doc on MERGE fan-out), written through Spark's own
 * [[ParquetWriteSupport]] — the same encode path `df.write.parquet` uses,
 * so footers, stats and timestamp physical types match every other commit.
 */
private[connector] final class GraftReplaceDataWriter(
    stagedAbs: String,
    writeSchemaJson: String,
    keyInfo: Option[(String, String, Int)],
    conf: Configuration,
    partitionId: Int,
    taskId: Long)
  extends DataWriter[InternalRow] {

  private val st = DataType.fromJson(writeSchemaJson).asInstanceOf[StructType]
  private val key = keyInfo.map { case (k, dtJson, n) =>
    val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(k))
    require(idx >= 0, s"write schema lost bucket key $k")
    (idx, DataType.fromJson(dtJson), n)
  }
  private val writers =
    scala.collection.mutable.HashMap.empty[Int, ParquetOutputWriter]
  private val paths = scala.collection.mutable.ArrayBuffer.empty[String]
  private var rows = 0L
  private var closed = false

  // Spark prepends `__row_operation` to the ReplaceData query output and —
  // when the operation declares no required metadata attributes — hands the
  // RAW rows to a plain BatchWrite (ReplaceDataExec.writingTask applies the
  // row projection only on the metadata path). The offset strips exactly
  // the leading extras: schema field i lives at row ordinal i + offset.
  // Lazily sized from the first row; anything but 0 or 1 extra refuses.
  private var offset = -1
  private lazy val projected =
    org.apache.spark.sql.catalyst.ProjectingInternalRow(st,
      (offset until offset + st.length).toIndexedSeq)

  private def dataRow(row: InternalRow): InternalRow = {
    if (offset < 0) {
      offset = row.numFields - st.length
      require(offset == 0 || offset == 1,
        s"replacement row has ${row.numFields} fields for a ${st.length}-column " +
          s"write schema (${st.fieldNames.mkString(", ")}) — unexpected layout")
    }
    if (offset == 0) row else { projected.project(row); projected }
  }

  private def open(b: Int): ParquetOutputWriter = {
    val leaf = if (b >= 0) s"$stagedAbs/__bucket=$b" else stagedAbs
    val path = s"$leaf/part-$partitionId-$taskId.snappy.parquet"
    paths += path
    new ParquetOutputWriter(path,
      new TaskAttemptContextImpl(conf, new TaskAttemptID()))
  }

  override def write(raw: InternalRow): Unit = {
    val row = dataRow(raw)
    val b = key match {
      case Some((idx, dt, n)) =>
        GraftSparkTable.bucketIdOf(
          if (row.isNullAt(idx)) null else row.get(idx, dt), dt, n)
      case None => -1
    }
    writers.getOrElseUpdate(b, open(b)).write(row)
    rows += 1
  }

  private def closeAll(): Unit = if (!closed) {
    closed = true
    writers.values.foreach(_.close())
  }

  override def commit(): WriterCommitMessage = {
    closeAll()
    GraftReplaceMessage(rows, paths.toSeq)
  }

  override def abort(): Unit = {
    // A failed/speculative attempt MUST remove its own files: a task-level
    // retry that succeeds later leaves the JOB successful, so the driver's
    // whole-dir abort never runs — an orphaned attempt file in the staged
    // dir would be counted by the commit's footer pass as duplicate rows.
    try closeAll() catch { case scala.util.control.NonFatal(_) => () }
    paths.foreach { p =>
      try {
        val hp = new Path(p)
        hp.getFileSystem(conf).delete(hp, false)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  override def close(): Unit = closeAll()
}
