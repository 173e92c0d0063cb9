package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Debezium CDC envelope decoding — the native re-expression of the
 * reference's merger front half (`cdc_merger_optimized.py:123-161`):
 *
 *  - envelope schema `{payload: {before, after, op, ts_ms}}` (`:35-52,67-73`)
 *  - wrapped-vs-flat auto-detect by probing one row (`:129-135`)
 *  - after/before flattening (`:137-152`)
 *  - null-safe KEY coalesce `after.id ?? before.id` (`:154-157` — delete
 *    events carry only the before image, and only the key matters for a
 *    delete). Data columns come from the after image ALONE: an update whose
 *    after image legitimately sets a column to NULL must land as NULL, not
 *    silently resurrect the before value.
 *  - in-batch latest-per-key dedup by event timestamp (`:160-161`)
 */
object Envelope {

  /** Row-level payload struct: before/after images + op code + event time. */
  def payloadStruct(row: StructType): StructType = StructType(Seq(
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true)))

  /** Full wrapped envelope: `{payload: {...}}`. */
  def envelopeSchema(row: StructType): StructType =
    StructType(Seq(StructField("payload", payloadStruct(row), nullable = true)))

  /**
   * Wrapped-vs-flat auto-detect (`cdc_merger_optimized.py:129-135`, made
   * robust): the reference probes ONE row, so a single blank or corrupt
   * first line misclassified a wrapped stream as flat — and a stream that
   * CACHES the answer then silently nulled out every later batch. This
   * probes the first 16 non-blank lines for actual EVIDENCE:
   *
   *  - any line with a top-level `payload` key        → `Some(true)`
   *  - else any line with a top-level `op`/`after`    → `Some(false)`
   *  - no decodable evidence at all (all junk/blank)  → `None`
   *
   * `None` tells a caching caller to re-probe on the next batch instead of
   * sticking a guess. Driver-side 16-row collect — constant per trigger.
   */
  def probeWrapped(raw: DataFrame, valueCol: String = "value"): Option[Boolean] = {
    val rows = raw
      .select(col(valueCol).cast("string").as("__v"))
      .filter(length(trim(col("__v"))) > 0)
      .limit(16)
      .select(
        get_json_object(col("__v"), "$.payload").isNotNull.as("w"),
        (get_json_object(col("__v"), "$.op").isNotNull ||
          get_json_object(col("__v"), "$.after").isNotNull ||
          get_json_object(col("__v"), "$.before").isNotNull).as("f"))
      .collect()
    if (rows.exists(r => !r.isNullAt(0) && r.getBoolean(0))) Some(true)
    else if (rows.exists(r => !r.isNullAt(1) && r.getBoolean(1))) Some(false)
    else None
  }

  /** [[probeWrapped]] collapsed to the reference's boolean (undecidable →
    * flat, the reference's own default). */
  def looksWrapped(raw: DataFrame, valueCol: String = "value"): Boolean =
    probeWrapped(raw, valueCol).contains(true)

  /**
   * Parse raw JSON into `before / after / op / ts_ms` columns, handling both
   * wrapped and flat envelopes. `wrappedHint` skips the one-row probe when
   * the caller already knows the shape (a stream detects it on its first
   * batch and reuses the answer — the format cannot change mid-stream).
   */
  /** `beforeKeyOnly = Some(k)` parses the BEFORE image down to just the key
    * field: the merge path reads nothing else from it (deletes carry their
    * key in `before`; every data column comes from `after` alone), and
    * Catalyst's JSON schema pruning does not reach through the two-level
    * projection — so without this the parser materialized a full second row
    * image per event that no consumer ever read. */
  def decode(raw: DataFrame, row: StructType, valueCol: String = "value",
      wrappedHint: Option[Boolean] = None,
      beforeKeyOnly: Option[String] = None): DataFrame = {
    val beforeT = beforeKeyOnly match {
      case Some(k) =>
        val f = row.fields.filter(_.name == k)
        require(f.nonEmpty, s"beforeKeyOnly column $k not in the row schema")
        StructType(f)
      case None => row
    }
    val payload = StructType(Seq(
      StructField("before", beforeT, nullable = true),
      StructField("after", row, nullable = true),
      StructField("op", StringType, nullable = true),
      StructField("ts_ms", LongType, nullable = true)))
    val parsed =
      if (wrappedHint.getOrElse(looksWrapped(raw, valueCol)))
        raw.select(from_json(col(valueCol).cast("string"),
            StructType(Seq(StructField("payload", payload, nullable = true)))).as("__e"))
          .select(col("__e.payload.*"))
      else
        raw.select(from_json(col(valueCol).cast("string"), payload).as("__e"))
          .select(col("__e.*"))
    parsed
  }

  /**
   * Flatten images into row columns. Only the KEY is `coalesce(after.k,
   * before.k)` — delete events (after = null) carry their key from the
   * before image, and the downstream merge deletes by key alone. Every
   * other column is taken from the after image as-is, so an update event
   * whose after image NULLs a column lands as NULL (reference
   * `cdc_merger_optimized.py:154-157` coalesces only the id). `op` and
   * `ts_ms` ride along.
   */
  def flatten(decoded: DataFrame, row: StructType, key: String): DataFrame =
    decoded.select(
      row.fields.toSeq.map { f =>
        // getField, not col(s"after.$name"): a dotted column name would
        // otherwise parse as a deeper nested path and fail analysis.
        if (f.name == key)
          coalesce(col("after").getField(f.name),
            col("before").getField(f.name)).as(f.name)
        else col("after").getField(f.name).as(f.name)
      } ++ Seq(col("op"), col("ts_ms")): _*)

  /** Within-batch arrival-order column (see [[transformBatch]]). */
  private[cdc] val SeqCol = "__seq"

  /** In-batch dedup: latest image per key by `ts_ms`, ties broken by
    * arrival order when [[transformBatch]]'s `__seq` column is present.
    * Arrival order IS source order for a key: Debezium partitions its
    * topic by primary key, so one key's events ride one Kafka partition in
    * emission order, and `monotonically_increasing_id` assigned before any
    * shuffle preserves that order. The previous lexical-`op` tiebreak
    * deterministically resurrected deletes: an UPDATE and DELETE sharing a
    * millisecond (one transaction) ranked 'u' > 'd', so the update image
    * outlived the delete. Callers without the seq column keep the op
    * tiebreak (determinism over nothing). */
  def dedupe(flat: DataFrame, key: String): DataFrame =
    if (flat.columns.contains(SeqCol))
      // The seq column is unique per row, so the winner is computable by a
      // map-side-partial max_by aggregate instead of a window — a hot key's
      // superseded images collapse before the exchange and nothing sorts
      // (Merge.dedupLatestUnique documents the equivalence).
      graft.dml.Merge.dedupLatestUnique(flat, key, "ts_ms", SeqCol)
    else
      graft.dml.Merge.dedupLatest(flat, key, "ts_ms", tieBreak = Some("op"))

  /** decode → flatten → junk filter → dedup: the full batch transform.
    *
    * The junk filter drops rows with a NULL key: an unparseable or blank
    * input line decodes to an all-null row (from_json returns null on
    * corrupt JSON), and without the filter each such line inserted a
    * permanent all-null row — a legitimate CDC event always carries its
    * primary key in the after or before image. */
  def transformBatch(raw: DataFrame, row: StructType, key: String,
      valueCol: String = "value", wrappedHint: Option[Boolean] = None): DataFrame = {
    val flat = flatten(
      decode(raw, row, valueCol, wrappedHint, beforeKeyOnly = Some(key)),
      row, key)
      .filter(col(key).isNotNull)
      .withColumn(SeqCol, monotonically_increasing_id())
    dedupe(flat, key).drop(SeqCol)
  }
}
