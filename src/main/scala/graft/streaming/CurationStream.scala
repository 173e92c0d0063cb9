package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.{Curation, Dedup, TextAnalysis}
import graft.table.GraftTable

/**
 * Streaming ingest curation: the LLM-pipeline operators wired into
 * Structured Streaming — the end-to-end shape a training-data intake runs
 * (documents arrive continuously; the corpus must stay deduplicated and
 * quality-filtered without ever re-touching what is already stored):
 *
 *   JSONL doc files → per-batch: quality filter (map-side predicate) →
 *   in-batch exact dedup → near-dup check against the PERSISTED corpus
 *   state (LSH buckets + shingle sets — only candidate rows are read) →
 *   survivors appended to the corpus table AND their signature rows to the
 *   state tables, all under ONE idempotent batch key per micro-batch, so a
 *   foreachBatch retry never double-ingests or double-registers state.
 *
 * Everything per-batch is the operators' documented scale shape: the state
 * probe shuffles narrow longs, the corpus table never rewrites, and the
 * batch is cached once for its multiple uses.
 */
object CurationStream {

  /** (doc_id long, text string) — the intake schema. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /**
   * @param corpus    destination table (created by the caller; may be empty)
   * @param buckets   persisted LSH band-bucket state ([[Dedup.persistDedupState]])
   * @param shingles  persisted shingle-set state (same call)
   * @param minJaccard near-dup threshold against the stored corpus
   * @param maintainEvery run [[GraftTable.compactSmallDirs]] on the corpus
   *   and both state tables every this many batches (0 disables). A
   *   10-second trigger appends ~8.6k commit dirs per table per day, and
   *   every batch's incremental probe reads the ever-more-fragmented
   *   bucket table — minor compaction folds the small-dir debt on a
   *   cadence while leaving graduated dirs untouched, so the table's file
   *   count stays bounded by (maintainEvery + graduated dirs) instead of
   *   growing with batch count.
   * @param maintainMaxRows a dir at most this many rows is fold-eligible
   */
  def start(
      spark: SparkSession,
      inputDir: String,
      corpus: GraftTable,
      buckets: GraftTable,
      shingles: GraftTable,
      checkpointDir: String,
      minJaccard: Double = 0.5,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxFilesPerTrigger: Int = 1000,
      maintainEvery: Int = 16,
      maintainMaxRows: Long = 1L << 20): StreamingQuery = {
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, corpus, buckets, shingles, minJaccard,
          maintainEvery, maintainMaxRows)
        ()
      }
      .start()
  }

  /**
   * One micro-batch of the curation pipeline — public so the
   * partial-failure convergence argument below is TESTABLE (the spec
   * replays a batch against tables where only some of its appends landed,
   * exactly the state a crash between them leaves).
   */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      corpus: GraftTable,
      buckets: GraftTable,
      shingles: GraftTable,
      minJaccard: Double,
      maintainEvery: Int = 16,
      maintainMaxRows: Long = 1L << 20): Unit = {
    if (batch.isEmpty) return
    val key = s"curate-$batchId"
    // Quality gate + in-batch exact dedup, persisted: `exact` is
    // read by the in-batch clustering AND re-read when `clean`
    // materializes — unpersisted it would rescan the batch twice
    // per micro-batch.
    val exact = Dedup.exactDedup(
      batch.filter(TextAnalysis.passesQuality(col("text"))),
      "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Within-batch NEAR-dedup too: two novel near-dups arriving in
    // the same micro-batch must not both enter the corpus — cluster
    // the batch and keep each cluster's canonical (min-id) doc.
    // The clusters frame comes back MATERIALIZED (eager default);
    // a resident stream must release it per batch or the block
    // store grows one cache entry per micro-batch forever.
    val clusters = Dedup.nearDupClusters(exact, "doc_id", "text", minJaccard)
    val clean = clusters
      .filter(col("doc_id") === col("cluster_id"))
      .select("doc_id")
      .join(exact, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dupIds = Dedup.dedupIncremental(clean, "doc_id", "text",
        buckets, shingles, minJaccard)
        .select(col("id_a").as("doc_id")).distinct()
      val fresh = clean.join(dupIds, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // The three appends carry DISTINCT batch keys derived from
        // the same micro-batch id (key / key-buckets / key-shingles),
        // each idempotent on ITS table: a retried micro-batch replays
        // every append it already landed as a no-op and lands only
        // the missing ones. A crash BETWEEN the appends therefore
        // leaves corpus and state momentarily out of sync, and
        // convergence on the retry leans on two facts: (a) the
        // batch's survivor set is recomputed deterministically from
        // the same input files, and (b) `dedupIncremental` flags a
        // batch doc only on an LSH-bucket hit VERIFIED against the
        // shingle state via inner joins — a doc whose corpus append
        // landed but whose state appends did not cannot see itself
        // as a candidate (no bucket row yet), so the retry reaches
        // the same survivor set and completes the missing appends
        // under their original keys. `CurationStreamSpec` replays every
        // crash point and asserts the converged state.
        corpus.append(fresh, batchKey = Some(key))
        buckets.append(
          Dedup.bandBuckets(fresh, "doc_id", "text").toDF("doc_id", "bkey"),
          batchKey = Some(s"$key-buckets"))
        shingles.append(
          Dedup.hashShingleSets(fresh, "doc_id", "text").toDF("doc_id", "sh"),
          batchKey = Some(s"$key-shingles"))
      } finally fresh.unpersist(blocking = false)
    } finally {
      clean.unpersist(blocking = false)
      clusters.unpersist(blocking = false)
      exact.unpersist(blocking = false)
    }
    // State-table maintenance on a cadence: fold the small append
    // dirs this stream has accumulated. Failures are swallowed —
    // a lost CAS race or transient I/O error just means the debt
    // waits for the next cadence tick.
    if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1) {
      Seq(corpus, buckets, shingles).foreach { t =>
        try t.compactSmallDirs(maintainMaxRows)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }
}
