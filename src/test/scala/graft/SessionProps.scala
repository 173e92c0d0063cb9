package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.streaming.EventWindows

/**
 * Property test: window-function batch sessionization must equal a
 * sequential per-user fold over sorted events — including gap ties (diff
 * exactly equal to the gap stays in-session), duplicate timestamps, and
 * single-event users.
 */
object SessionProps extends Properties("SessionizeBatch") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val gapSec = 10L

  private val eventGen = for {
    u <- Gen.chooseNum(1L, 4L)
    // Seconds chosen so diffs land below, exactly at, and above the gap.
    t <- Gen.chooseNum(0L, 120L)
  } yield (u, t)

  private def reference(events: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sessions = ts.tail.foldLeft(Vector(Vector(ts.head))) { (acc, t) =>
        if (t - acc.last.last <= gapSec) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      sessions.map(s => (u, s.head, s.last, s.size.toLong))
    }.toSet

  property("equals the sequential fold on random event sets") =
    Prop.forAll(Gen.nonEmptyListOf(eventGen)) { events =>
      val df = events.map { case (u, t) => (u, new Timestamp(t * 1000L)) }
        .toDF("user_id", "ts")
      val got = EventWindows.sessionizeBatch(df, "ts", "user_id", gapSec)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getLong(3))).toSet
      val want = reference(events)
      Prop(got == want) :| s"got=$got want=$want"
    }
}
