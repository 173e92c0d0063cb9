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
   * Wrapped-vs-flat auto-detect (`cdc_merger_optimized.py:129-135`): probe
   * ONE row of the batch for a `payload` key. Driver-side single-row
   * collect, same as the reference; batches are micro-batches so this is a
   * constant cost per trigger.
   */
  def looksWrapped(raw: DataFrame, valueCol: String = "value"): Boolean =
    raw.limit(1)
      .select(get_json_object(col(valueCol), "$.payload").isNotNull.as("w"))
      .collect().headOption.exists(r => !r.isNullAt(0) && r.getBoolean(0))

  /**
   * Parse raw JSON into `before / after / op / ts_ms` columns, handling both
   * wrapped and flat envelopes. `wrappedHint` skips the one-row probe when
   * the caller already knows the shape (a stream detects it on its first
   * batch and reuses the answer — the format cannot change mid-stream).
   */
  def decode(raw: DataFrame, row: StructType, valueCol: String = "value",
      wrappedHint: Option[Boolean] = None): DataFrame = {
    val parsed =
      if (wrappedHint.getOrElse(looksWrapped(raw, valueCol)))
        raw.select(from_json(col(valueCol).cast("string"), envelopeSchema(row)).as("__e"))
          .select(col("__e.payload.*"))
      else
        raw.select(from_json(col(valueCol).cast("string"), payloadStruct(row)).as("__e"))
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
        if (f.name == key)
          coalesce(col(s"after.${f.name}"), col(s"before.${f.name}")).as(f.name)
        else col(s"after.${f.name}").as(f.name)
      } ++ Seq(col("op"), col("ts_ms")): _*)

  /** In-batch dedup: latest image per key by ts_ms (key tiebreak on op for determinism). */
  def dedupe(flat: DataFrame, key: String): DataFrame =
    graft.dml.Merge.dedupLatest(flat, key, "ts_ms", tieBreak = Some("op"))

  /** decode → flatten → dedup: the full batch transform. */
  def transformBatch(raw: DataFrame, row: StructType, key: String,
      valueCol: String = "value", wrappedHint: Option[Boolean] = None): DataFrame =
    dedupe(flatten(decode(raw, row, valueCol, wrappedHint), row, key), key)
}
