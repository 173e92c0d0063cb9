package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed user session: [start, end] with its event count. */
case class Session(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long)

/** Open-session state carried between micro-batches (top-level: the state
  * encoder's generated code must be able to construct it). */
private[streaming] case class Open(start: Long, last: Long, n: Long)

/**
 * Streaming analytics over event streams — the watermark/windowed-agg and
 * custom-state surface of Structured Streaming, applied to the `events`
 * shape (`user_id`, `event_type`, `ts`). The reference's streaming job is
 * the CDC merger ([[graft.cdc.CdcPipeline]], deliberately watermark-free
 * keyed overwrite); these are the aggregation-side operators a training-data
 * pipeline runs NEXT TO ingest: event-rate rollups and session extraction.
 *
 * Scale shape: windowed counts are a streaming partial aggregation — state
 * per (window, key), bounded by the watermark which expires closed windows;
 * sessionization keeps ONE open session per user in the state store and
 * emits closed sessions on gap timeout. Both shuffle only the grouping key.
 */
object EventWindows {

  /**
   * Tumbling-window counts per key with a late-data bound: events later
   * than `watermarkDelay` behind the max seen event time are dropped, and a
   * window finalizes (append-mode emit, state evicted) when the watermark
   * passes its end.
   */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDur: String,
      watermarkDelay: String): DataFrame = {
    // Streaming watermarks only accept session-TZ TimestampType
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), but the event corpus is
    // wall-clock NTZ — so NTZ input drives the watermark through an LTZ
    // value REBUILT FROM THE RAW MICROS (timestamp_micros ∘ wallMicros),
    // not a cast: a cast re-renders through the session zone, which shifts
    // window bounds under non-UTC zones and is non-injective across DST
    // transitions. Window arithmetic is pure micros math on the internal
    // value, and the emitted bounds go back through wallMicros → NTZ, so
    // the whole round trip is zone-free: NTZ in → identical NTZ out under
    // ANY session zone, DST included.
    import graft.plans.TimestampMicrosExprs.{microsToNtz, wallMicros}
    val ntzIn = events.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    val src =
      if (ntzIn) events.withColumn(tsCol, timestamp_micros(wallMicros(col(tsCol))))
      else events
    def bound(c: org.apache.spark.sql.Column) =
      if (ntzIn) microsToNtz(wallMicros(c)) else c
    src.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(bound(col("window.start")).as("window_start"),
        bound(col("window.end")).as("window_end"), col(keyCol), col("n_events"))
  }

  /**
   * BATCH gap sessionization — the same session semantics as [[sessionize]]
   * expressed with window functions over a static frame: a session breaks
   * where the in-user gap exceeds `gapSeconds`; ids are the running count
   * of breaks. One shuffle on the user key; everything else is per-user
   * sorted-run arithmetic (integer microseconds, so an external engine
   * reproduces boundaries exactly). `StreamingSpec` asserts the streaming
   * operator emits exactly these sessions once the watermark closes them.
   */
  def sessionizeBatch(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(userCol).orderBy(tsCol)
    // Zone-free micros for BOTH timestamp kinds (unix_micros rejects NTZ,
    // and a cast between the kinds re-renders through the session zone —
    // non-constant and non-injective across DST transitions, which would
    // corrupt gap arithmetic for non-UTC sessions). Session bounds
    // (min/max below) stay in the INPUT type, so NTZ in → NTZ out.
    val us = graft.plans.TimestampMicrosExprs.wallMicros(col(tsCol))
    val prev = lag(us, 1).over(byUser)
    val brk = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("__brk", brk)
      .withColumn("__sid", sum(col("__brk"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_start"), col("session_end"), col("n_events"))
  }

  /**
   * Gap-based sessionization via `flatMapGroupsWithState` (event-time
   * timeout): consecutive events of a user belong to one session while
   * gaps stay ≤ `gapSeconds`; a session closes when a larger gap appears
   * in-batch, or when the WATERMARK passes its last event + gap (the
   * timeout path — this is what lets state be dropped at 100 TB instead of
   * accumulating forever). Input rows older than the watermark are dropped
   * by the engine before they reach the state function.
   */
  def sessionize(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      gapSeconds: Long,
      watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    // All gap arithmetic in integer MICROSECONDS, the same unit
    // sessionizeBatch uses (unix_micros) — Timestamp.getTime truncates to
    // milliseconds, and a sub-millisecond event time could then put a gap
    // on the other side of the boundary than the batch twin, breaking the
    // documented stream ≡ batch equivalence.
    val gapUs = gapSeconds * 1000000L
    // Shared floor-based conversion (see Coerce.timestampMicros) — the
    // batch side's unix_micros floors the same way.
    def toUs(ts: Timestamp): Long = graft.functions.Coerce.timestampMicros(ts)
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
      t
    }

    def close(u: Long, s: Open): Session =
      Session(u, toTs(s.start), toTs(s.last), s.n)

    def fn(user: Long, rows: Iterator[(Long, Timestamp)],
        state: GroupState[Open]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(close(user, s))
      } else {
        val incoming = rows.map(r => toUs(r._2)).toArray.sorted
        val closed = scala.collection.mutable.Buffer.empty[Session]
        var cur = state.getOption.orNull
        incoming.foreach { t =>
          cur match {
            case null => cur = Open(t, t, 1)
            case c if t - c.last <= gapUs =>
              // min() on the start: a late-but-within-watermark event from a
              // LATER batch can precede the open session's first event.
              cur = Open(math.min(c.start, t), math.max(c.last, t), c.n + 1)
            case c =>
              closed += close(user, c)
              cur = Open(t, t, 1)
          }
        }
        if (cur != null) {
          state.update(cur)
          // The timeout API is millisecond-granular; round UP so the state
          // never times out before last + gap has truly passed.
          state.setTimeoutTimestamp((cur.last + gapUs + 999L) / 1000L)
        }
        closed.iterator
      }
    }

    events.select(col(userCol).cast("long"), col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermarkDelay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
