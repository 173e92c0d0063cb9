package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.table.GraftTable

/**
 * The streaming CDC merge pipeline (`cdc_merger_optimized.py:206-218`),
 * re-expressed on Structured Streaming with a file source standing in for
 * Kafka (no Kafka connector ships in this environment; the downstream code
 * is source-agnostic):
 *
 *  - ST1 10s processing-time trigger (`:217`) — configurable, and tests use
 *    `Trigger.AvailableNow` for deterministic completion
 *  - ST2 rate cap: `maxFilesPerTrigger` (the file-source analog of
 *    `maxOffsetsPerTrigger=100000`, `:23,211`)
 *  - ST3 exactly-once: checkpoint + idempotent commit — the merge commit
 *    carries `batchKey = "cdc-<batchId>"`, so a foreachBatch retry of an
 *    already-committed batch is a no-op in the snapshot log
 *  - ST4 `foreachBatch` → keyed merge with Debezium op semantics
 *  - ST5 in-batch dedup (latest per key by ts_ms)
 *  - ST7 backfill: pre-existing files in the directory are read first
 *    (`startingOffsets=earliest` analog)
 *  - ST8 empty-batch short-circuit (`:115-117`)
 *  - ST9 wrapped/flat envelope auto-detect (inside [[Envelope.decode]])
 */
object CdcPipeline {

  /**
   * Most recent micro-batch's phase split — (rows, decodeSec, mergeSec) —
   * populated only when `-Dgraft.cdc.timing=true`. Diagnostic surface: the
   * bench runs one instrumented wave after its timed ones and reports this
   * split, so a regressed official reading is attributable to decode vs
   * merge without a rerun.
   */
  @volatile var lastTiming: Option[(Long, Double, Double)] = None

  /** One micro-batch's trace row: foreachBatch body wall time, GC-time
    * delta over the body, and the merge's ordered named-phase split from
    * [[GraftTable.lastMergePhases]] — COW batches report prepass (where
    * the cached envelope decode materializes) / merge_write / footer /
    * commit; MOR batches report write / commit. */
  final case class BatchTrace(batchId: Long, bodySec: Double, gcSec: Double,
    phases: Option[Seq[(String, Double)]])

  /**
   * Per-micro-batch trace appended for every batch while
   * `-Dgraft.cdc.trace=true`. Unlike [[lastTiming]] this costs nothing
   * extra (no cache-materializing pass): it brackets the foreachBatch body
   * with a wall clock and the JVM's cumulative GC-time counters, and
   * snapshots the merge-phase split the table records anyway. The bench
   * keeps it on for every timed wave, so a slow wave is attributable —
   * externally-timed wave minus bodySec is streaming machinery (source
   * listing, offset log, checkpoint), gcSec says how much of the body was
   * collector pauses, and the phase split names the stage the rest of the
   * body went to.
   */
  @volatile var traces: Vector[BatchTrace] = Vector.empty

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /**
   * Start the stream: JSON-lines envelope files in `inputDir` → decode →
   * flatten → dedup → idempotent keyed merge into `table`.
   */
  /**
   * @param mergeOnRead false = copy-on-write merge per batch (bucketed
   *                    partial rewrite); true = deferred delta append
   *                    (O(batch) ingest) with a compaction every
   *                    `compactEvery` accumulated deltas
   * @param decodeParallelism when > 0 and a micro-batch arrives in fewer
   *                    partitions, the raw lines are repartitioned to this
   *                    width before the JSON decode. AQE is disabled inside
   *                    streaming plans, so a batch that lands as one big
   *                    file (one input split) would otherwise decode on a
   *                    single core — the shuffle moves only the raw text
   *                    bytes of one micro-batch, the decode is the cost
   *                    that must be spread. 0 = trust source partitioning
   *                    (a Kafka-like source already arrives partitioned).
   * @param deltaPartitions when > 0, each merge-on-read delta is written
   *                    as this many files instead of one per batch
   *                    partition — the small-files control for long
   *                    streams (see [[GraftTable.upsertDeferred]]).
   *                    Ignored in copy-on-write mode.
   */
  def start(
      spark: SparkSession,
      inputDir: String,
      rowSchema: StructType,
      table: GraftTable,
      key: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxFilesPerTrigger: Int = 1000,
      mergeOnRead: Boolean = false,
      compactEvery: Int = 16,
      decodeParallelism: Int = 0,
      deltaPartitions: Int = 0): StreamingQuery = {
    val raw = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(inputDir)
    // Wrapped-vs-flat envelope detection runs once, on the first non-empty
    // batch, then sticks for the life of the stream — the format cannot
    // change mid-stream, so re-probing every trigger would spend a driver
    // round-trip per micro-batch on a constant answer.
    var wrappedFmt: Option[Boolean] = None
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val trace = sys.props.get("graft.cdc.trace").contains("true")
        val traceT0 = if (trace) System.nanoTime() else 0L
        val traceGc0 = if (trace) gcMillis() else 0L
        if (trace) GraftTable.lastMergePhases = None // only THIS batch's merge counts
        if (!batch.isEmpty) { // ST8: skip empty micro-batches
          // Stick the format only when the probe saw EVIDENCE (a payload
          // wrapper, or top-level op/after keys): a first batch of junk or
          // blank lines returns None and the next batch re-probes —
          // caching a guess would misparse the whole stream to nulls.
          if (wrappedFmt.isEmpty) wrappedFmt = Envelope.probeWrapped(batch)
          val spread =
            if (decodeParallelism > 0 &&
                batch.rdd.getNumPartitions < decodeParallelism)
              batch.repartition(decodeParallelism)
            else batch
          // The transformed batch is CACHED for the duration of the merge:
          // downstream references it several times (bucket pre-pass,
          // anti-join key set, union side), and each reference would
          // otherwise re-read the source and re-decode the JSON envelopes —
          // the decode, not the merge, dominated the measured pipeline cost.
          // Bounded by the micro-batch size; spills to disk beyond memory.
          // The decode itself is NOT materialized by a separate action: the
          // first job that touches the cache is the merge's own bucket
          // pre-pass, so decode + touched-bucket derivation share one pass.
          val b = Envelope.transformBatch(spread, rowSchema, key,
              wrappedHint = wrappedFmt).drop("ts_ms")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // Opt-in phase instrumentation (-Dgraft.cdc.timing=true): splits
            // the batch into decode vs merge wall time. The explicit count()
            // that separates the phases is an extra cache-materializing pass,
            // so this stays off outside diagnosis runs.
            val timing = sys.props.get("graft.cdc.timing").contains("true")
            val t0 = System.nanoTime()
            val rows = if (timing) b.count() else -1L
            val tDecode = (System.nanoTime() - t0) / 1e9
            val t1 = System.nanoTime()
            if (mergeOnRead) {
              // preDeduped: Envelope.transformBatch ends in latest-per-key
              // dedup, so the deferred append skips its own dedup shuffle.
              val snap = table.upsertDeferred(b, key, opCol = Some("op"),
                batchKey = Some(s"cdc-$batchId"), preDeduped = true,
                deltaPartitions = deltaPartitions)
              if (snap.deltaDirs.size >= compactEvery) table.compact()
            } else {
              // preDeduped: like the MOR branch — transformBatch already
              // ended in latest-per-key dedup, so the merge's own
              // dropDuplicates would re-shuffle every micro-batch for a
              // no-op.
              table.upsert(b, key, opCol = Some("op"),
                batchKey = Some(s"cdc-$batchId"), preDeduped = true)
            }
            if (timing) {
              val tMerge = (System.nanoTime() - t1) / 1e9
              lastTiming = Some((rows, tDecode, tMerge))
              println(f"graft.cdc batch=$batchId rows=$rows decode=$tDecode%.3fs merge=$tMerge%.3fs")
            }
            ()
          } finally b.unpersist(blocking = false)
        }
        if (trace) {
          val wall = (System.nanoTime() - traceT0) / 1e9
          val gcSec = (gcMillis() - traceGc0) / 1e3
          // Synchronized append: the :+ on a @volatile Vector is a
          // read-modify-write, and two traced pipelines in one JVM would
          // silently lose each other's entries. (lastMergePhases remains
          // best-effort under multi-table concurrency — diagnostics only.)
          CdcPipeline.synchronized {
            traces = traces :+ BatchTrace(batchId, wall, gcSec,
              GraftTable.lastMergePhases)
          }
        }
      }
      .start()
  }

  /**
   * [[start]] with the row schema loaded from the reference's pandas-dtype
   * sidecar (`<table>_schema.json`, `csv_to_sql.py:40-44`) instead of a
   * hand-built [[StructType]] — see [[DtypeSidecar]].
   */
  def startFromSidecar(
      spark: SparkSession,
      inputDir: String,
      sidecarPath: java.nio.file.Path,
      table: GraftTable,
      key: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxFilesPerTrigger: Int = 1000,
      mergeOnRead: Boolean = false,
      compactEvery: Int = 16,
      decodeParallelism: Int = 0,
      deltaPartitions: Int = 0): StreamingQuery =
    start(spark, inputDir, DtypeSidecar.load(sidecarPath), table, key,
      checkpointDir, trigger, maxFilesPerTrigger, mergeOnRead, compactEvery,
      decodeParallelism, deltaPartitions)
}
