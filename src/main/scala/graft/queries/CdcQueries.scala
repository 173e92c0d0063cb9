package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.Envelope
import Q._

/**
 * Gate entry for the CDC envelope transform + merge (SURVEY.md §2 S6, F1,
 * P7/P8, W1, ST5 batch semantics): the events table is wrapped into
 * Debezium envelopes (insert for every row, a newer update image for even
 * ids, a delete for ids % 97 == 0), pushed through decode → flatten →
 * in-batch dedup → keyed merge into an empty catalog table, and the final
 * table state is oracle-checked against the equivalent SQL over events.
 *
 * Event time rides as epoch-micros longs inside the envelope (as Debezium
 * does) so no precision is lost to JSON timestamp formatting.
 */
object CdcQueries {

  private val rowSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The current row as a Debezium image struct (ts as wall-clock micros).
    * `ts` arrives as TIMESTAMP_NTZ from [[Q.events]]; `wallMicros` extracts
    * the internal micros zone-free (`unix_micros` rejects NTZ, and a cast
    * through TimestampType would shift under a non-UTC session zone). */
  private def img = struct(col("event_id"),
    graft.plans.TimestampMicrosExprs.wallMicros(col("ts")).as("ts_us"),
    col("user_id"), col("event_type"), col("value"), col("props"))

  private val nul = lit(null).cast(rowSchema)

  /** Wrap before/after images into a JSON Debezium envelope line. */
  private def env(before: org.apache.spark.sql.Column, after: org.apache.spark.sql.Column,
      op: String, tsOff: Int) =
    to_json(struct(struct(before.as("before"), after.as("after"),
      lit(op).as("op"), (col("event_id") * 10 + tsOff).as("ts_ms")).as("payload")))
      .as("value")

  /** Target-table schema shared by the CDC gate entries. `ts` is NTZ so the
    * final table state parquet-encodes naive, matching the DuckDB oracle's
    * naive TIMESTAMP (see [[Q.events]]). */
  private val targetSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** decode → flatten → dedup → merge `raw` envelope lines into a fresh table. */
  private def mergeEnvelopes(s: org.apache.spark.sql.SparkSession,
      raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val batch = Envelope.transformBatch(raw, rowSchema, "event_id")
      .select(col("event_id"),
        graft.plans.TimestampMicrosExprs.microsToNtz(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"), col("op"))
    val cat = new graft.catalog.GraftCatalog(s, Files.createTempDirectory("graft-cdc-"))
    val target = cat.createTable("cdc_events", targetSchema)
    // transformBatch ends in the latest-per-key dedup, so the batch holds
    // exactly one row per key — preDeduped skips the merge's own
    // dropDuplicates shuffle (the same contract CdcPipeline passes).
    target.upsert(batch, "event_id", opCol = Some("op"), preDeduped = true)
    target.read()
  }

  /** Staged envelope input per (session, sf dir), generated once per JVM:
    * the entry measures the TRANSFORM + MERGE of a received micro-batch,
    * and the input envelopes are deterministic in the events table — so
    * re-synthesizing + re-writing ~150k JSON lines on every bench wave
    * billed input generation to the operator (it dominated the first
    * measurements of this entry). The first call per JVM still pays it,
    * visible as wave 1 of the bench dispersion. */
  private val rawEnvCache =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  val queries: Map[String, QueryFn] = Map(
    "c_cdc_batch" -> ((s, d) => {
      // Materialize the envelope stream to disk first (as the file-source
      // pipeline would see it) so the transform+merge is measured over real
      // input instead of recomputing the JSON generation on every pass.
      val rawDir = rawEnvCache.getOrElseUpdate(d, {
        val ev = events(s, d)
        val inserts = ev.select(env(nul, img, "c", 0))
        val updates = ev.filter(col("event_id") % 2 === 0)
          .withColumn("value", col("value") + 10)
          .select(env(nul, img, "u", 1))
        val deletes = ev.filter(col("event_id") % 97 === 0)
          .select(env(img, nul, "d", 2))
        val dir = Files.createTempDirectory("graft-cdc-raw-").resolve("events")
        // One file per core: the staged envelopes are re-read (and
        // from_json-decoded) every wave, and text splits pack by bytes +
        // open cost — 8 files capped the decode at 8 tasks on a 32-core
        // session (guide §2.5 input parallelism). Core-count-derived, not a
        // constant, so the driver's lower-core bench rc keeps its shape.
        inserts.unionAll(updates).unionAll(deletes)
          .repartition(s.sparkContext.defaultParallelism)
          .write.mode("overwrite").text(dir.toString)
        dir
      })
      mergeEnvelopes(s, s.read.text(rawDir.toString))
    }),

    // An update whose after image legitimately NULLs a column must land as
    // NULL, not resurrect the insert's value (only the KEY is before/after
    // coalesced — reference `cdc_merger_optimized.py:154-157`). Inserts carry
    // full images; the update for even ids sets props = NULL and bumps value.
    "c_cdc_null_update" -> ((s, d) => {
      val ev = events(s, d).filter(col("event_id") % 5 === 0)
      val inserts = ev.select(env(nul, img, "c", 0))
      val updates = ev.filter(col("event_id") % 2 === 0)
        .withColumn("value", col("value") + 10)
        .withColumn("props", lit(null).cast(StringType))
        .select(env(nul, img, "u", 1))
      mergeEnvelopes(s, inserts.unionAll(updates))
    }))

  val oracles: Map[String, String] = Map(
    "c_cdc_batch" ->
      """SELECT event_id, ts, user_id, event_type,
        |  CASE WHEN event_id % 2 = 0 THEN value + 10 ELSE value END AS value, props
        |FROM events WHERE event_id % 97 <> 0""".stripMargin,
    "c_cdc_null_update" ->
      """SELECT event_id, ts, user_id, event_type,
        |  CASE WHEN event_id % 2 = 0 THEN value + 10 ELSE value END AS value,
        |  CASE WHEN event_id % 2 = 0 THEN NULL ELSE props END AS props
        |FROM events WHERE event_id % 5 = 0""".stripMargin)
}
