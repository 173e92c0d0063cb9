package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

/**
 * Watermarked windowed aggregation and gap sessionization over a
 * deterministic MemoryStream: windows finalize (and sessions close) only
 * when the watermark passes them; late-beyond-watermark rows are dropped.
 */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("windowed counts: append emits only watermark-closed windows; late rows dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = EventWindows.windowedCounts(
      in.toDF().toDF("ts", "event_type"), "ts", "event_type",
      windowDur = "10 seconds", watermarkDelay = "5 seconds")
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("append").start()
    try {
      // window [0,10): 3 clicks, 1 view; then advance watermark past it
      in.addData((ts(1), "click"), (ts(2), "click"), (ts(9), "view"), (ts(3), "click"))
      q.processAllAvailable()
      in.addData((ts(30), "click")) // max event 30s → watermark 25s → [0,10) closes
      q.processAllAvailable()
      // a row at 4s is now far behind the 25s watermark → dropped, not re-emitted
      in.addData((ts(4), "click"))
      q.processAllAvailable()
      val rows = spark.table("win")
        .select("window_start", "event_type", "n_events").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((0L, "click", 3L), (0L, "view", 1L)),
        s"only the closed [0,10) window may be emitted, got $rows")
    } finally q.stop()
  }

  test("windowed counts accept NTZ event time: NTZ in, NTZ bounds out, same counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val in = MemoryStream[(Long, String)]
    val ntz = EventWindows.windowedCounts(
      in.toDF().toDF("us", "event_type")
        .select(graft.plans.TimestampMicrosExprs.microsToNtz(col("us")).as("ts"),
          col("event_type")),
      "ts", "event_type", windowDur = "10 seconds", watermarkDelay = "5 seconds")
    assert(ntz.schema("window_start").dataType ==
      org.apache.spark.sql.types.TimestampNTZType, "NTZ in must give NTZ bounds")
    val q = ntz.writeStream.format("memory").queryName("winntz")
      .outputMode("append").start()
    try {
      in.addData((1000000L, "click"), (2000000L, "click"), (9000000L, "view"))
      q.processAllAvailable()
      in.addData((30000000L, "click")) // watermark 25s → [0,10) closes
      q.processAllAvailable()
      val rows = spark.table("winntz")
        .select("window_start", "event_type", "n_events").collect()
        .map(r => (r.getAs[java.time.LocalDateTime](0).getSecond,
          r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((0, "click", 2L), (0, "view", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("windowed counts NTZ bridge is zone-free across DST transitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Wall-clock NTZ events inside 2024-03-10 02:00-03:00 local time, the
    // hour America/New_York SKIPS at spring-forward — a session-zone cast
    // has no faithful instant for these, so the old cast-based bridge
    // shifted the emitted bounds by an hour. The micros-rebuild bridge must
    // emit exact wall-clock window bounds under any session zone.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val events = Seq(
        ("2024-03-10T02:05:00", "a"), ("2024-03-10T02:14:59", "a"),
        ("2024-03-10T02:15:01", "a"), ("2024-03-10T02:59:00", "b"))
        .toDF("s", "event_type")
        .select(col("s").cast("timestamp_ntz").as("ts"), col("event_type"))
      val rows = EventWindows.windowedCounts(events, "ts", "event_type",
        windowDur = "15 minutes", watermarkDelay = "0 seconds")
        .collect()
        .map(r => (r.getAs[java.time.LocalDateTime]("window_start").toString,
          r.getString(2), r.getLong(3))).toSet
      assert(rows == Set(
        ("2024-03-10T02:00", "a", 2L),
        ("2024-03-10T02:15", "a", 1L),
        ("2024-03-10T02:45", "b", 1L)),
        s"DST-skipped wall-clock windows must round-trip exactly, got $rows")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("streaming sessionize emits exactly the batch sessionizeBatch sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Deterministic pseudo-random event set: 3 users, varied gaps around
    // the 10s threshold (both sides), in-batch duplicates and ties.
    val rnd = new scala.util.Random(7)
    val real = (1 to 3).flatMap { u =>
      var t = 5L + u
      (1 to 15).map { _ =>
        t += (if (rnd.nextBoolean()) rnd.between(1L, 9L) else rnd.between(11L, 40L))
        (u.toLong, ts(t))
      }
    }
    val in = MemoryStream[(Long, Timestamp)]
    val q = EventWindows.sessionize(
      in.toDF().toDF("user_id", "ts"), "ts", "user_id",
      gapSeconds = 10, watermarkDelay = "0 seconds")
      .toDF().writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").start()
    try {
      in.addData(real: _*)
      q.processAllAvailable()
      // Sentinels far past every real session + gap: watermark advances and
      // every real session times out and closes; sentinel sessions stay open.
      val far = real.map(_._2.getTime).max / 1000 + 1000
      in.addData((1L, ts(far)), (2L, ts(far)), (3L, ts(far)))
      q.processAllAvailable()
      in.addData((1L, ts(far + 1000))) // one more batch so timeouts fire
      q.processAllAvailable()
      val streamed = spark.table("sess_eq").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .filter(_._2.getTime < far * 1000L).toSet
      val batch = EventWindows.sessionizeBatch(
        real.toDF("user_id", "ts"), "ts", "user_id", gapSeconds = 10)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(streamed == batch,
        s"closed streaming sessions must equal batch sessions\nstream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("sessionization: in-batch gap split + watermark-timeout close, state removed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val sessions = EventWindows.sessionize(
      in.toDF().toDF("user_id", "ts"), "ts", "user_id",
      gapSeconds = 10, watermarkDelay = "0 seconds")
    val q = sessions.toDF().writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: events at 10s and 14s, then a 36s gap inside the SAME batch
      // → first session closes in-batch; second stays open. (Times start
      // above 0: a row at the initial 0 watermark would be late-dropped.)
      in.addData((1L, ts(10)), (1L, ts(14)), (1L, ts(50)), (2L, ts(15)))
      q.processAllAvailable()
      // advance watermark way past 50s+gap and 15s+gap → open sessions time out
      in.addData((3L, ts(300)))
      q.processAllAvailable()
      in.addData((3L, ts(500))) // one more advance so user 3's own session closes
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getLong(3))).toSet
      assert(rows.contains((1L, 10L, 14L, 2L)), s"in-batch gap split missing: $rows")
      assert(rows.contains((1L, 50L, 50L, 1L)), s"timeout close missing: $rows")
      assert(rows.contains((2L, 15L, 15L, 1L)), s"user 2 timeout close missing: $rows")
    } finally q.stop()
  }
}
