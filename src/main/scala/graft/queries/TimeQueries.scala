package graft.queries

import org.apache.spark.sql.functions._

import Q._

/**
 * Gate entries for the time-series join tier ([[graft.ops.TimeJoin]]):
 * as-of and point-in-interval joins over the events stream table, each
 * checked against the naive inequality-join formulation in DuckDB (which
 * the Spark plans must MATCH in values while never executing as a
 * nested-loop pair blowup — TimeJoinSpec asserts the plan shapes).
 */
object TimeQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    events(s, d).select("event_id", "user_id", "ts", "event_type")

  val queries: Map[String, QueryFn] = Map(
    // The SAME backward as-of as j_asof, reached as SQL TEXT through the
    // session surface's ASOF JOIN sugar (round 15): the DuckDB-shaped
    // `l ASOF JOIN r ON l.k = r.k AND l.ts >= r.ts [TIEBREAK r.c]
    // [PREFIX 'p_']` FROM-fragment rewrites to a TimeJoin.asofBackward
    // temp view, so the single-shuffle ordered-sweep plan serves plain SQL.
    "t_sql_asof" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        java.nio.file.Files.createTempDirectory("graft-asof-"))
      cat.saveTable("events_t", ev(s, d))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      ev(s, d).filter(col("event_type") === "signup")
        .createOrReplaceTempView("signups_v")
      session.sql(
        "SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id " +
          "FROM events_t ASOF JOIN signups_v " +
          "ON events_t.user_id = signups_v.user_id " +
          "AND events_t.ts >= signups_v.ts " +
          "TIEBREAK signups_v.event_id PREFIX 'signup_' " +
          "ORDER BY event_id")
    }),

    // Explicit LEFT variant of the sugar (round 16): same semantics as the
    // default — unmatched events keep NULL signup columns.
    "t_sql_asof_left" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        java.nio.file.Files.createTempDirectory("graft-asofl-"))
      cat.saveTable("events_t", ev(s, d))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      ev(s, d).filter(col("event_type") === "signup")
        .createOrReplaceTempView("signups_v")
      session.sql(
        "SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id " +
          "FROM events_t ASOF LEFT JOIN signups_v " +
          "ON events_t.user_id = signups_v.user_id " +
          "AND events_t.ts >= signups_v.ts " +
          "TIEBREAK signups_v.event_id PREFIX 'signup_' " +
          "ORDER BY event_id")
    }),

    // INNER variant: events with no at-or-before signup drop.
    "t_sql_asof_inner" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        java.nio.file.Files.createTempDirectory("graft-asofi-"))
      cat.saveTable("events_t", ev(s, d))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      ev(s, d).filter(col("event_type") === "signup")
        .createOrReplaceTempView("signups_v")
      session.sql(
        "SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id " +
          "FROM events_t ASOF INNER JOIN signups_v " +
          "ON events_t.user_id = signups_v.user_id " +
          "AND events_t.ts >= signups_v.ts " +
          "TIEBREAK signups_v.event_id PREFIX 'signup_' " +
          "ORDER BY event_id")
    }),

    // TOLERANCE + INNER through the sugar (round 16): only signups within
    // the last 2 days count and events with no qualifying signup drop —
    // the SQL-text twin of j_asof_tol, so the bounded-lookback shape
    // (tolerance pre-filter before the ordered sweep) serves plain SQL.
    "t_sql_asof_tol" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        java.nio.file.Files.createTempDirectory("graft-asoft-"))
      cat.saveTable("events_t", ev(s, d))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      ev(s, d).filter(col("event_type") === "signup")
        .createOrReplaceTempView("signups_v")
      session.sql(
        "SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id " +
          "FROM events_t ASOF INNER JOIN signups_v " +
          "ON events_t.user_id = signups_v.user_id " +
          "AND events_t.ts >= signups_v.ts " +
          "TOLERANCE INTERVAL 2 DAYS " +
          "TIEBREAK signups_v.event_id PREFIX 'signup_' " +
          "ORDER BY event_id")
    }),

    // The j_interval point-in-interval join as SQL text (round 16): the
    // BETWEEN fragment rewrites to TimeJoin.intervalJoin's binned
    // equi-join — plain SQL never plans the inequality nested loop.
    "t_sql_interval" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        java.nio.file.Files.createTempDirectory("graft-ivj-"))
      cat.saveTable("events_t", ev(s, d))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      val e = ev(s, d)
      e.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
        .createOrReplaceTempView("errors_v")
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("start_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("end_ts"))
        .createOrReplaceTempView("purchases_v")
      session.sql(
        "SELECT event_id, user_id, ts, iv_event_id " +
          "FROM errors_v INTERVAL JOIN purchases_v " +
          "ON errors_v.user_id = purchases_v.user_id " +
          "AND errors_v.ts BETWEEN purchases_v.start_ts AND purchases_v.end_ts " +
          "BINS INTERVAL 1 HOUR ORDER BY event_id, iv_event_id")
    }),

    // Backward as-of: every event annotated with the user's latest signup
    // at-or-before it (ties broken by highest signup event_id).
    "j_asof" -> ((s, d) => {
      val e = ev(s, d)
      graft.ops.TimeJoin.asofBackward(
        e, e.filter(col("event_type") === "signup"),
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("event_id"), prefix = "signup_",
        tieBreak = Some("event_id"))
        .orderBy("event_id")
    }),

    // Tolerance + inner: only signups within the last 2 days count, and
    // events with no qualifying signup drop.
    "j_asof_tol" -> ((s, d) => {
      val e = ev(s, d)
      graft.ops.TimeJoin.asofBackward(
        e, e.filter(col("event_type") === "signup"),
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("event_id"), prefix = "signup_",
        tieBreak = Some("event_id"),
        tolerance = Some(expr("INTERVAL 2 DAYS")), inner = true)
        .orderBy("event_id")
    }),

    // Point-in-interval: error events inside ±1 hour of any purchase by
    // the same user (binned equi-join, 1-hour bins).
    "j_interval" -> ((s, d) => {
      val e = ev(s, d)
      val points = e.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val intervals = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("start_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("end_ts"))
      graft.ops.TimeJoin.intervalJoin(
        points, intervals, key = "user_id", pointTs = "ts",
        startTs = "start_ts", endTs = "end_ts",
        binWidthMicros = 3600L * 1000 * 1000,
        intervalPayload = Seq("event_id"), prefix = "iv_")
        .orderBy("event_id", "iv_event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "t_sql_asof" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         signups AS (SELECT * FROM ev WHERE event_type = 'signup')
         SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id
         FROM (
           SELECT e.event_id, e.user_id, e.ts, e.event_type,
                  l.ts AS signup_ts, l.event_id AS signup_event_id,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY l.ts DESC, l.event_id DESC) AS rn
           FROM ev e LEFT JOIN signups l
             ON e.user_id = l.user_id AND l.ts <= e.ts
         ) WHERE rn = 1 ORDER BY event_id""",
    "t_sql_asof_left" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         signups AS (SELECT * FROM ev WHERE event_type = 'signup')
         SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id
         FROM (
           SELECT e.event_id, e.user_id, e.ts, e.event_type,
                  l.ts AS signup_ts, l.event_id AS signup_event_id,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY l.ts DESC, l.event_id DESC) AS rn
           FROM ev e LEFT JOIN signups l
             ON e.user_id = l.user_id AND l.ts <= e.ts
         ) WHERE rn = 1 ORDER BY event_id""",
    "t_sql_asof_inner" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         signups AS (SELECT * FROM ev WHERE event_type = 'signup')
         SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id
         FROM (
           SELECT e.event_id, e.user_id, e.ts, e.event_type,
                  l.ts AS signup_ts, l.event_id AS signup_event_id,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY l.ts DESC, l.event_id DESC) AS rn
           FROM ev e JOIN signups l
             ON e.user_id = l.user_id AND l.ts <= e.ts
         ) WHERE rn = 1 ORDER BY event_id""",
    "t_sql_asof_tol" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         signups AS (SELECT * FROM ev WHERE event_type = 'signup')
         SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id
         FROM (
           SELECT e.event_id, e.user_id, e.ts, e.event_type,
                  l.ts AS signup_ts, l.event_id AS signup_event_id,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY l.ts DESC, l.event_id DESC) AS rn
           FROM ev e JOIN signups l
             ON e.user_id = l.user_id AND l.ts <= e.ts
            AND l.ts >= e.ts - INTERVAL 2 DAY
         ) WHERE rn = 1 ORDER BY event_id""",
    "t_sql_interval" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'),
         i AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts, i.event_id AS iv_event_id
         FROM p JOIN i ON p.user_id = i.user_id
          AND p.ts >= i.ts - INTERVAL 1 HOUR
          AND p.ts <= i.ts + INTERVAL 1 HOUR
         ORDER BY 1, 4""",
    "j_asof" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         signups AS (SELECT * FROM ev WHERE event_type = 'signup')
         SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id
         FROM (
           SELECT e.event_id, e.user_id, e.ts, e.event_type,
                  l.ts AS signup_ts, l.event_id AS signup_event_id,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY l.ts DESC, l.event_id DESC) AS rn
           FROM ev e LEFT JOIN signups l
             ON e.user_id = l.user_id AND l.ts <= e.ts
         ) WHERE rn = 1 ORDER BY event_id""",
    "j_asof_tol" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         signups AS (SELECT * FROM ev WHERE event_type = 'signup')
         SELECT event_id, user_id, ts, event_type, signup_ts, signup_event_id
         FROM (
           SELECT e.event_id, e.user_id, e.ts, e.event_type,
                  l.ts AS signup_ts, l.event_id AS signup_event_id,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY l.ts DESC, l.event_id DESC) AS rn
           FROM ev e JOIN signups l
             ON e.user_id = l.user_id AND l.ts <= e.ts
            AND l.ts >= e.ts - INTERVAL 2 DAY
         ) WHERE rn = 1 ORDER BY event_id""",
    "j_interval" ->
      """WITH ev AS (SELECT event_id, user_id, ts, event_type FROM events),
         p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'),
         i AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts, i.event_id AS iv_event_id
         FROM p JOIN i ON p.user_id = i.user_id
          AND p.ts >= i.ts - INTERVAL 1 HOUR
          AND p.ts <= i.ts + INTERVAL 1 HOUR
         ORDER BY 1, 4"""
  )
}
