package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media (image/audio/video) rides as an opaque
 * `binary` payload column with typed metadata; decode / feature-extract run
 * per-partition in batches. The Spark-side contract — schema, partitioning,
 * batch shape, output schema — is real and tested; the actual codec call is
 * a clearly marked STUB (no image/audio libraries exist in this
 * environment) producing deterministic fake features from the bytes.
 */
object Multimodal {

  /** Canonical media-table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  /**
   * Wrap any (id, string-payload) table as a media table — used by tests and
   * the gate to exercise the plumbing with the documents corpus standing in
   * for real image bytes.
   */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      sourceCol: String, mediaType: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      struct(col(sourceCol).as("source"),
        octet_length(col(payloadCol).cast("binary")).cast("long").as("declared_bytes"))
        .as("meta"))

  /** Output schema of [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("frame_count", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Rows decoded per batch inside a partition (the mapInPandas-batch analog). */
  val decodeBatchSize = 64

  /**
   * ===== STUB decode =====
   * A real deployment calls the codec here (e.g. JNI/FFI image decode) on
   * each batch of payloads. This environment has no media libraries, so the
   * "decode" is a DETERMINISTIC FAKE: n_bytes = payload length, frame_count
   * = 1 + n_bytes/1024, feature = 4 doubles derived from byte positions.
   * Everything around it — per-partition batching, schema, laziness — is the
   * real production shape.
   */
  private def decodeBatch(rows: Seq[Row]): Seq[Row] =
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
      val n = payload.length.toLong
      val feature = (0 until 4).map { i =>
        if (n == 0) 0.0
        else payload(((n - 1) * i / 3).toInt & 0x7FFFFFFF).toDouble
      }.toArray
      Row(id, n, 1L + n / 1024L, feature)
    }

  /**
   * Decode/feature-extract every asset: per-partition, in fixed-size
   * batches, no driver involvement — the distributed shape a real decoder
   * needs (each executor touches only its partitions' payloads).
   */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = featureSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(decodeBatch)
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
