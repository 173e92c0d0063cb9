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

  val queries: Map[String, QueryFn] = Map(
    "c_cdc_batch" -> ((s, d) => {
      val ev = events(s, d)
      val img = struct(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      val nul = lit(null).cast(rowSchema)
      def env(before: org.apache.spark.sql.Column, after: org.apache.spark.sql.Column,
          op: String, tsOff: Int) =
        to_json(struct(struct(before.as("before"), after.as("after"),
          lit(op).as("op"), (col("event_id") * 10 + tsOff).as("ts_ms")).as("payload")))
          .as("value")
      val inserts = ev.select(env(nul, img, "c", 0))
      val updates = ev.filter(col("event_id") % 2 === 0)
        .withColumn("value", col("value") + 10)
        .select(env(nul, img, "u", 1))
      val deletes = ev.filter(col("event_id") % 97 === 0)
        .select(env(img, nul, "d", 2))
      // Materialize the envelope stream to disk first (as the file-source
      // pipeline would see it) so the transform+merge is measured over real
      // input instead of recomputing the JSON generation on every pass.
      val rawDir = Files.createTempDirectory("graft-cdc-raw-").resolve("events")
      inserts.unionAll(updates).unionAll(deletes)
        .write.mode("overwrite").text(rawDir.toString)
      val raw = s.read.text(rawDir.toString)

      val batch = Envelope.transformBatch(raw, rowSchema, "event_id")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"), col("op"))

      val cat = new graft.catalog.GraftCatalog(s, Files.createTempDirectory("graft-cdc-"))
      val target = cat.createTable("cdc_events", StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))))
      target.upsert(batch, "event_id", opCol = Some("op"))
      target.read()
    }))

  val oracles: Map[String, String] = Map(
    "c_cdc_batch" ->
      """SELECT event_id, ts, user_id, event_type,
        |  CASE WHEN event_id % 2 = 0 THEN value + 10 ELSE value END AS value, props
        |FROM events WHERE event_id % 97 <> 0""".stripMargin)
}
