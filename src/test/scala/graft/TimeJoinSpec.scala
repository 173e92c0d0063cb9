package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeJoin

/**
 * Time-series join guards: the single-shuffle plan shapes (the 100 TB
 * property — the naive inequality formulations explode to nested-loop
 * pair blowups) plus randomized brute-force equivalence on adversarial
 * data: duplicate timestamps, null keys, null timestamps, empty right
 * sides, and tolerance edges exactly ON the boundary.
 */
class TimeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def fmt(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("asof matches the brute-force argmax on adversarial random data") {
    val rnd = new scala.util.Random(13)
    val lefts = (1 to 400).map { i =>
      val k = if (rnd.nextInt(20) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(8).toLong)
      (i.toLong, k, new Timestamp(1700000000000L + rnd.nextInt(1000) * 1000L))
    }
    val rights = (1 to 200).map { i =>
      val k = if (rnd.nextInt(20) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(8).toLong)
      // Coarse grid on purpose: MANY exact timestamp collisions.
      (i.toLong, k, new Timestamp(1700000000000L + rnd.nextInt(50) * 20000L),
        rnd.nextDouble())
    }
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("rid", "k", "t", "v")
    val got = TimeJoin.asofBackward(l, r, "k", "t", "t",
        rightPayload = Seq("rid", "v"), prefix = "m_", tieBreak = Some("rid"))
      .collect().map(row => (row.getLong(0),
        Option(row.get(4)).map(_.asInstanceOf[Long]))).toMap
    // Brute force: latest right with t <= left.t, highest rid on ties.
    lefts.foreach { case (lid, k, lt) =>
      val expected =
        if (k == null) None
        else rights.filter(r => r._2 != null && r._2 == k && !r._3.after(lt))
          .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._1)
      assert(got(lid) == expected, s"left $lid key $k ts $lt")
    }
  }

  test("asof tolerance boundary is inclusive and inner drops non-matches") {
    val l = Seq((1L, 1L, ts("2024-01-10 00:00:00")),
      (2L, 1L, ts("2024-01-20 00:00:00"))).toDF("lid", "k", "t")
    val r = Seq((10L, 1L, ts("2024-01-08 00:00:00"), "a"))
      .toDF("rid", "k", "t", "v")
    // Exactly 2 days back: inclusive — row 1 matches; row 2 (12 days) not.
    val out = TimeJoin.asofBackward(l, r, "k", "t", "t", Seq("v"),
      prefix = "m_", tolerance = Some(expr("INTERVAL 2 DAYS")), inner = true)
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
    // Outer keeps row 2 with nulls.
    val outer = TimeJoin.asofBackward(l, r, "k", "t", "t", Seq("v"),
      prefix = "m_", tolerance = Some(expr("INTERVAL 2 DAYS")))
    assert(outer.count() == 2)
    assert(outer.filter(col("lid") === 2L && col("m_v").isNull).count() == 1)
  }

  test("asof plans exactly one exchange and no nested-loop join") {
    val e = graft.queries.Q.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "ts", "event_type")
    val df = TimeJoin.asofBackward(
      e, e.filter(col("event_type") === "signup"),
      "user_id", "ts", "ts", Seq("event_id"), prefix = "s_",
      tieBreak = Some("event_id"))
    val p = fmt(df)
    // The formatted AQE explain appends the pre-adaptive "Initial Plan";
    // only the executed final plan's exchanges count.
    val finalOnly = p.split("== Initial Plan ==").head
    val exchanges =
      finalOnly.linesIterator.count(_.matches(""".*\bExchange \(\d+\)""")) +
        finalOnly.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 1, s"asof must shuffle exactly once:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("intervalJoin equals the inequality join and never nested-loops") {
    val rnd = new scala.util.Random(29)
    val points = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(3000) * 1000L))
    }
    val ivs = (1 to 80).map { i =>
      val s = 1700000000000L + rnd.nextInt(3000) * 1000L
      // Spans from zero-width up to ~40 bins wide (binWidth 100s below).
      (i.toLong, rnd.nextInt(5).toLong, new Timestamp(s),
        new Timestamp(s + rnd.nextInt(4000) * 1000L))
    }
    val p = points.toDF("pid", "k", "t")
    val iv = ivs.toDF("ivid", "k", "s", "e")
    val got = TimeJoin.intervalJoin(p, iv, "k", "t", "s", "e",
        binWidthMicros = 100L * 1000 * 1000, Seq("ivid"), prefix = "iv_")
      .select("pid", "iv_ivid").as[(Long, Long)].collect().toSet
    val expected = (for {
      (pid, pk, pt) <- points
      (ivid, ik, s, e) <- ivs
      if pk == ik && !pt.before(s) && !pt.after(e)
    } yield (pid, ivid)).toSet
    assert(got == expected)
    // Plan shape: equi-join (sort-merge or shuffled-hash), no BNL.
    val plan = fmt(TimeJoin.intervalJoin(p, iv, "k", "t", "s", "e",
      100L * 1000 * 1000, Seq("ivid")))
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("intervalJoin emits each qualifying pair exactly once (no bin dups)") {
    // One interval spanning many bins, one point inside it.
    val p = Seq((1L, 1L, ts("2024-01-01 05:00:00"))).toDF("pid", "k", "t")
    val iv = Seq((7L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("ivid", "k", "s", "e")
    val out = TimeJoin.intervalJoin(p, iv, "k", "t", "s", "e",
      binWidthMicros = 3600L * 1000 * 1000, Seq("ivid"))
    assert(out.count() == 1)
  }

  test("intervalJoin refuses a corrupt über-wide interval loudly") {
    val p = Seq((1L, 1L, ts("2024-01-01 05:00:00"))).toDF("pid", "k", "t")
    // end_ts in year 9999 against hour bins: ~70M bins — far past the cap,
    // and past Spark's own sequence element limit. The failure must name
    // the span and the fix, not die inside sequence().
    val iv = Seq((7L, 1L, ts("2024-01-01 00:00:00"), ts("9999-01-01 00:00:00")))
      .toDF("ivid", "k", "s", "e")
    val e = intercept[Exception] {
      TimeJoin.intervalJoin(p, iv, "k", "t", "s", "e",
        binWidthMicros = 3600L * 1000 * 1000, Seq("ivid")).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("intervalJoin") || msg.contains("bins"), s"got: $e")
    // And a wide-but-sane interval under a RAISED cap still works.
    val ok = TimeJoin.intervalJoin(p, iv, "k", "t", "s", "e",
      binWidthMicros = 3600L * 1000 * 1000, Seq("ivid"),
      maxBinsPerInterval = 100_000_000L)
    assert(ok.count() == 1)
  }

  test("time-split asof equals the monolithic sweep, hot key included") {
    val rnd = new scala.util.Random(41)
    // One hot key carries half of both sides; ties and tolerance edges in.
    def keyFor(): java.lang.Long =
      if (rnd.nextBoolean()) 7L else rnd.nextInt(6).toLong
    val lefts = (1 to 600).map { i =>
      (i.toLong, keyFor(), new Timestamp(1700000000000L + rnd.nextInt(2000) * 500L))
    }
    val rights = (1 to 300).map { i =>
      (i.toLong, keyFor(), new Timestamp(1700000000000L + rnd.nextInt(100) * 10000L),
        rnd.nextDouble())
    }
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("rid", "k", "t", "v")
    for (tol <- Seq(None, Some(expr("INTERVAL 1 HOUR")))) {
      val mono = TimeJoin.asofBackward(l, r, "k", "t", "t", Seq("rid", "v"),
        prefix = "m_", tieBreak = Some("rid"), tolerance = tol)
      val split = TimeJoin.asofBackward(l, r, "k", "t", "t", Seq("rid", "v"),
        prefix = "m_", tieBreak = Some("rid"), tolerance = tol, timeSplits = 16)
      assert(split.count() == mono.count())
      assert(split.exceptAll(mono).isEmpty && mono.exceptAll(split).isEmpty,
        s"split != mono for tolerance $tol")
    }
    // The split plan's window partitions by (key, split): the hot key's
    // sweep spreads over many partitions instead of one.
    val plan = TimeJoin.asofBackward(l, r, "k", "t", "t", Seq("v"),
      timeSplits = 16).queryExecution.optimizedPlan.toString
    assert(plan.contains("__s"), s"expected a split column in:\n$plan")
  }

  test("asof with an empty right side keeps all lefts unmatched") {
    val l = Seq((1L, 1L, ts("2024-01-10 00:00:00"))).toDF("lid", "k", "t")
    val r = Seq.empty[(Long, Long, Timestamp, String)].toDF("rid", "k", "t", "v")
    val out = TimeJoin.asofBackward(l, r, "k", "t", "t", Seq("v"))
    assert(out.count() == 1 && out.filter(col("asof_v").isNull).count() == 1)
  }
}
