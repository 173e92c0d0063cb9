package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.types._

/**
 * Driver-side point-read path for bucketed tables — the serving tier that
 * makes [[GraftTable.lookupKey]] answer in milliseconds instead of a Spark
 * job. The reference serves point lookups from a resident engine
 * (`OZONE_ARCHITECTURE.md:87` claims "millisecond-latency" via its serving
 * stack); a Spark job per lookup pays scheduler dispatch + per-key codegen
 * (~90 ms measured at sf0.1) that no amount of plan caching removes. A
 * bucket-pruned lookup touches a handful of small files, so the driver
 * reads them itself with Spark's own vectorized parquet reader:
 *
 *  - zero Spark jobs (the scheduler is never involved);
 *  - the SAME decode path as a cluster scan (VectorizedParquetRecordReader),
 *    so values are bit-identical to the distributed read;
 *  - bounded by `graft.lookup.local.maxBytes` (default 64 MB): a bucket
 *    bigger than that — the 100 TB case — falls back to the distributed
 *    scan, which is the right plan there anyway.
 *
 * Per-file metadata (parquet footer, Spark schema, a prepared Hadoop conf)
 * is cached in a small LRU: data files are immutable once committed, so a
 * repeat lookup in the same bucket skips the footer round-trip and pays
 * only the decode. Rows are filtered on the CATALYST value (one field
 * access per row) and only matches convert to external rows.
 */
object LocalPointRead {

  /** Set to "false" to force every lookup through the distributed scan. */
  val EnabledProp = "graft.lookup.local"

  /** Candidate-file byte cap for the driver-side path (default 64 MB). */
  val MaxBytesProp = "graft.lookup.local.maxBytes"

  private def maxBytes: Long =
    sys.props.get(MaxBytesProp).flatMap(_.toLongOption).getOrElse(64L << 20)

  def enabled: Boolean = !sys.props.get(EnabledProp).contains("false")

  /** Flat schemas only: nested types take the distributed path (their
    * row conversion has more edge cases than a serving read should carry). */
  def supports(st: StructType): Boolean = st.fields.forall(f => f.dataType match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  })

  /** Size-capped LRU keyed by immutable identity (path [+ length]); commits
    * never rewrite a data file in place, so entries cannot go stale — the
    * cap only bounds memory on a long-lived service spanning many GCs. */
  private final class Lru[K, V](cap: Int) {
    private val m = new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > cap
    }
    // The miss computation (footer open — real I/O) runs OUTSIDE the
    // monitor: holding the lock across it would serialize every concurrent
    // serving lookup — including hits on other, already-cached files —
    // behind one slow cold read. Two racing misses on the same key may
    // duplicate the work; the first result wins the put and the loser's
    // copy is discarded (both are equivalent: files are immutable).
    def getOrUpdate(k: K)(mk: => V): V = {
      val got = synchronized { m.get(k) }
      if (got != null) got
      else {
        val v = mk
        synchronized {
          val again = m.get(k)
          if (again != null) again else { m.put(k, v); v }
        }
      }
    }
  }

  /** Everything needed to open + decode + remap one data file. */
  private case class FilePlan(
      inputFile: org.apache.parquet.hadoop.util.HadoopInputFile,
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      conf: org.apache.hadoop.conf.Configuration,
      len: Long,
      fileSt: StructType,
      // output column i ← file column remap(i), or -1 → null (a file
      // written before a schema evolution lacks the newer columns)
      converters: Array[Any => Any])

  private val dirCache = new Lru[String, Seq[org.apache.hadoop.fs.FileStatus]](4096)
  private val fileCache = new Lru[String, FilePlan](4096)

  private def listDir(
      d: String, conf: org.apache.hadoop.conf.Configuration) =
    dirCache.getOrUpdate(d) {
      val dp = new org.apache.hadoop.fs.Path(d)
      dp.getFileSystem(conf).listStatus(dp).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
    }

  private def filePlan(
      f: org.apache.hadoop.fs.FileStatus,
      base: org.apache.hadoop.conf.Configuration): FilePlan =
    fileCache.getOrUpdate(f.getPath.toString) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, base)
      val pr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val (footer, json) =
        try (pr.getFooter, pr.getFooter.getFileMetaData.getKeyValueMetaData
          .get("org.apache.spark.sql.parquet.row.metadata"))
        finally pr.close()
      val fileSt = DataType.fromJson(json).asInstanceOf[StructType]
      // The split-based reader initialize reads its schema + converter
      // flags from the conf — prepared once per file (the conf is mutated
      // here only, then shared read-only across lookups).
      val conf = new org.apache.hadoop.conf.Configuration(base)
      conf.set("parquet.read.support.class",
        "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
      conf.set("org.apache.spark.sql.parquet.row.requested_schema", json)
      conf.set("spark.sql.parquet.binaryAsString", "false")
      conf.set("spark.sql.parquet.int96AsTimestamp", "true")
      conf.set("spark.sql.caseSensitive", "false")
      conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      FilePlan(in, footer, conf, f.getLen, fileSt,
        fileSt.fields.map { fld =>
          val c = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToScalaConverter(fld.dataType)
          (v: Any) => c(v)
        })
    }

  /**
   * Read `dirs`' parquet files driver-side, returning the external rows
   * whose `keyCol` equals `value` in `st`'s column order. None = the
   * caller must fall back to the distributed scan (nested schema, byte cap
   * exceeded, feature disabled, or any read error — this path is an
   * optimization, never the only way to an answer).
   */
  def lookupRows(
      spark: SparkSession,
      conf: org.apache.hadoop.conf.Configuration,
      dirs: Seq[String],
      st: StructType,
      keyCol: String,
      value: Any): Option[Seq[Row]] = {
    if (!enabled || !supports(st)) return None
    try {
      val files = dirs.flatMap(listDir(_, conf))
      if (files.map(_.getLen).sum > maxBytes) return None
      val dt = st(keyCol).dataType
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      val catKey = Cast(Literal(value), dt, Some(tz)).eval(null)
      if (catKey == null) return Some(Seq.empty) // `= NULL` matches nothing
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      files.foreach { f =>
        val plan = filePlan(f, conf)
        val keyIdx = plan.fileSt.fieldIndex(keyCol)
        val matches = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        // Rebase modes CORRECTED: every data file was written by this
        // library on Spark 4 (proleptic calendar), so no rebase applies.
        val rdr = new org.apache.spark.sql.execution.datasources.parquet
          .VectorizedParquetRecordReader(
            null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
        try {
          val split = new org.apache.hadoop.mapred.FileSplit(
            f.getPath, 0, plan.len, null.asInstanceOf[Array[String]])
          val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
            plan.conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
          rdr.initialize(split, ctx, Some(plan.inputFile), None, Some(plan.footer))
          while (rdr.nextKeyValue()) {
            val r = rdr.getCurrentValue.asInstanceOf[InternalRow]
            if (!r.isNullAt(keyIdx) && r.get(keyIdx, dt) == catKey) matches += r.copy()
          }
        } finally rdr.close()
        val remap = st.fieldNames.map(n =>
          if (plan.fileSt.fieldNames.contains(n)) plan.fileSt.fieldIndex(n) else -1)
        matches.foreach { m =>
          val vals = st.fields.indices.map { i =>
            val j = remap(i)
            if (j < 0 || m.isNullAt(j)) null
            else plan.converters(j)(m.get(j, plan.fileSt(j).dataType))
          }
          out += Row.fromSeq(vals)
        }
      }
      Some(out.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
