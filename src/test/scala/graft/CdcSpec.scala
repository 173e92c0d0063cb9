package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcPipeline, Envelope}
import graft.table.GraftTable

/** End-to-end streaming CDC: envelope files → decode/flatten/dedup →
  * checkpointed idempotent merge (SURVEY.md §2 ST1-ST9). */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val row = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private def wrapped(id: Long, name: String, amount: Double, op: String, ts: Long,
      beforeOnly: Boolean = false): String = {
    val img = s"""{"id":$id,"name":"$name","amount":$amount}"""
    val (b, a) = if (beforeOnly) (img, "null") else ("null", img)
    s"""{"payload":{"before":$b,"after":$a,"op":"$op","ts_ms":$ts}}"""
  }

  private def flat(id: Long, name: String, amount: Double, op: String, ts: Long): String = {
    val img = s"""{"id":$id,"name":"$name","amount":$amount}"""
    s"""{"before":null,"after":$img,"op":"$op","ts_ms":$ts}"""
  }

  test("streaming pipeline: backfill, rate cap, update/delete/in-batch dedup, checkpoint idempotence") {
    val in = TestSpark.tmpDir("cdc-in-")
    val ckpt = TestSpark.tmpDir("cdc-ckpt-").toString
    val wh = TestSpark.tmpDir("cdc-wh-")
    val t = new GraftTable(spark, wh.resolve("t"), "t")

    // file 1 (pre-existing → backfill, ST7): 5 inserts
    Files.write(in.resolve("f1.json"),
      (1 to 5).map(i => wrapped(i, s"n$i", i * 1.0, "c", i)).mkString("\n").getBytes)
    // file 2: update id 2, delete id 3 (before-image only), insert id 6,
    // and TWO images for id 4 in one batch — latest ts_ms must win (ST5)
    Files.write(in.resolve("f2.json"), Seq(
      wrapped(2, "n2x", 20.0, "u", 100),
      wrapped(3, "n3", 3.0, "d", 101, beforeOnly = true),
      wrapped(6, "n6", 6.0, "c", 102),
      wrapped(4, "n4a", 40.0, "u", 103),
      wrapped(4, "n4b", 44.0, "u", 104)).mkString("\n").getBytes)

    val q = CdcPipeline.start(spark, in.toString, row, t, "id", ckpt,
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = 1) // ST2 rate cap → 2 batches
    q.awaitTermination()

    val got = t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, "n1", 1.0), (2L, "n2x", 20.0), (4L, "n4b", 44.0),
      (5L, "n5", 5.0), (6L, "n6", 6.0)))
    val nCommits = t.log.versions().size
    assert(nCommits == 2, "one merge commit per non-empty micro-batch")

    // ST3 checkpoint: restarting with no new files replays nothing
    val q2 = CdcPipeline.start(spark, in.toString, row, t, "id", ckpt,
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(t.log.versions().size == nCommits)

    // idempotent commit: re-merging an already-seen batchKey is a no-op
    import spark.implicits._
    val replay = Seq((2L, "n2x", 20.0, "u")).toDF("id", "name", "amount", "op")
    t.upsert(replay, "id", opCol = Some("op"), batchKey = Some("cdc-1"))
    assert(t.log.versions().size == nCommits)
  }

  test("merge-on-read streaming mode: delta appends per batch + threshold compaction") {
    val in = TestSpark.tmpDir("cdcm-in-")
    val ckpt = TestSpark.tmpDir("cdcm-ckpt-").toString
    val wh = TestSpark.tmpDir("cdcm-wh-")
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    val t = cat.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.DoubleType))))
    Files.write(in.resolve("f1.json"),
      (1 to 5).map(i => wrapped(i, s"n$i", i * 1.0, "c", i)).mkString("\n").getBytes)
    // TWO images for id 2 in one batch: the deferred append passes
    // preDeduped = true (skipping its own dedup shuffle), so the envelope
    // transform's latest-per-key dedup is the ONLY thing standing between
    // an in-batch duplicate and two same-sequence rows in one delta dir —
    // this pins that contract on the MOR path specifically.
    Files.write(in.resolve("f2.json"), Seq(
      wrapped(2, "n2a", 21.0, "u", 99),
      wrapped(2, "n2x", 20.0, "u", 100),
      wrapped(3, "n3", 3.0, "d", 101, beforeOnly = true)).mkString("\n").getBytes)

    val q = CdcPipeline.start(spark, in.toString, row, t, "id", ckpt,
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = 1,
      mergeOnRead = true, compactEvery = 2)
    q.awaitTermination()

    val got = t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, "n1", 1.0), (2L, "n2x", 20.0), (4L, "n4", 4.0), (5L, "n5", 5.0)))
    // second batch hit the threshold → chain folded
    assert(t.log.latest().get.deltaDirs.isEmpty)
    assert(t.log.latest().get.operation == "compact")
  }

  test("dtype sidecar: pandas dtype map round-trips to the row schema and drives the pipeline") {
    val sidecar = TestSpark.tmpDir("cdc-sc-").resolve("t_schema.json")
    // The reference's csv_to_sql.py export shape: {"col": "<pandas dtype>"}.
    Files.write(sidecar,
      """{"id": "int64", "name": "object", "amount": "float64"}""".getBytes)
    val loaded = graft.cdc.DtypeSidecar.load(sidecar)
    assert(loaded.fieldNames.toSeq == Seq("id", "name", "amount"))
    assert(loaded("id").dataType == LongType)        // int64 → long (pandas default int; a 32-bit map would null ids ≥ 2^31)
    assert(loaded("name").dataType == StringType)    // object → string
    assert(loaded("amount").dataType == DoubleType)  // float* → double
    assert(graft.functions.Coerce.dtypeToSpark("int32") == IntegerType)

    val in = TestSpark.tmpDir("cdc-sc-in-")
    val ckpt = TestSpark.tmpDir("cdc-sc-ckpt-").toString
    val t = new GraftTable(spark, TestSpark.tmpDir("cdc-sc-wh-").resolve("t"), "t")
    Files.write(in.resolve("f1.json"),
      (1 to 3).map(i => wrapped(i, s"n$i", i * 1.0, "c", i)).mkString("\n").getBytes)
    val q = CdcPipeline.startFromSidecar(spark, in.toString, sidecar, t, "id", ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val got = t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, "n1", 1.0), (2L, "n2", 2.0), (3L, "n3", 3.0)))
  }

  test("flat (unwrapped) envelopes auto-detect (ST9)") {
    import spark.implicits._
    val raw = Seq(flat(1, "a", 1.5, "c", 1), flat(1, "b", 2.5, "u", 2)).toDF("value")
    val out = Envelope.transformBatch(raw, row, "id")
      .select("id", "name", "amount", "op").collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "b" && out(0).getDouble(2) == 2.5)
  }

  test("wrapped envelope delete keeps key from before image (P7)") {
    import spark.implicits._
    val raw = Seq(wrapped(9, "gone", 0.0, "d", 5, beforeOnly = true)).toDF("value")
    val out = Envelope.transformBatch(raw, row, "id").collect()
    assert(out.length == 1 && out(0).getLong(0) == 9L)
  }

  test("junk and blank lines are dropped, never inserted as all-null rows") {
    import spark.implicits._
    // from_json yields null on corrupt JSON; the flattened row is then
    // all-null (null key, null op) — without the junk filter each such
    // line permanently appended an all-null row to the table.
    val raw = Seq(
      "", "   ", "not json at all", """{"half": """,
      wrapped(1, "a", 1.0, "c", 1),
      wrapped(2, "b", 2.0, "c", 2)).toDF("value")
    val out = Envelope.transformBatch(raw, row, "id").collect()
    assert(out.length == 2, s"junk must be dropped: ${out.mkString(";")}")
    assert(out.forall(!_.isNullAt(0)))
  }

  test("equal-ts_ms ties resolve by arrival order, not lexical op") {
    import spark.implicits._
    // One source transaction: update and delete share a millisecond; the
    // delete was emitted after the update (per-key events ride one Kafka
    // partition in order). Lexical op ordering ('u' > 'd') used to let the
    // update image resurrect the deleted row.
    val raw = Seq(
      wrapped(7, "x", 1.0, "c", 5),
      wrapped(7, "x2", 2.0, "u", 9),
      wrapped(7, "x2", 2.0, "d", 9, beforeOnly = true)).toDF("value")
    val out = Envelope.transformBatch(raw, row, "id").collect()
    assert(out.length == 1 && out(0).getAs[String]("op") == "d",
      s"the later-arriving delete must win the same-ms tie: ${out.mkString(";")}")
    // Reverse arrival (delete then re-create at the same ms): the
    // re-created row survives — an op-priority rule would break one of
    // the two orders; arrival order gets both right.
    val raw2 = Seq(
      wrapped(8, "y", 1.0, "d", 9, beforeOnly = true),
      wrapped(8, "y2", 2.0, "c", 9)).toDF("value")
    val out2 = Envelope.transformBatch(raw2, row, "id").collect()
    assert(out2.length == 1 && out2(0).getAs[String]("op") == "c")
  }

  test("format probe needs evidence; junk first lines never stick a guess") {
    import spark.implicits._
    val junkFirst = Seq("", "garbage", wrapped(1, "a", 1.0, "c", 1)).toDF("value")
    assert(Envelope.probeWrapped(junkFirst).contains(true),
      "wrapped evidence behind junk lines must still detect")
    val flatS = Seq("junk", flat(1, "a", 1.0, "c", 1)).toDF("value")
    assert(Envelope.probeWrapped(flatS).contains(false))
    val allJunk = Seq("", "junk", "{}").toDF("value")
    assert(Envelope.probeWrapped(allJunk).isEmpty,
      "no evidence → None, so a caching stream re-probes next batch")
  }
}
