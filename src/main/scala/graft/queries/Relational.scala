package graft.queries

import org.apache.spark.sql.functions._

import Q._

/**
 * Core relational operators over the driver corpus, one gate entry per
 * SURVEY.md §2 item this exercises: A1/A2 (counts + group-by), O1-O4
 * (order/limit/top-k), W1 (row_number latest-per-key), P1/P2 (projection +
 * equality lookup), J-family join shapes, plus the reference's own verify
 * query (`run_verify.bat:3`).
 *
 * Scale notes: dimension sides of joins (customer/nation/region at any SF
 * are tiny relative to facts) are explicitly `broadcast()`; top-k queries
 * use orderBy+limit which Spark plans as TakeOrderedAndProject (no global
 * sort); aggregates are partial-agg friendly (plain groupBy on low-card
 * keys).
 */
object Relational {

  val queries: Map[String, QueryFn] = Map(
    // TPC-H Q1-shaped pricing summary (A2 + decimal-exact sums).
    "q1_pricing_summary" -> ((s, d) =>
      tbl(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // The reference's own smoke query shape (`run_verify.bat:3`).
    "q2_status_counts" -> ((s, d) =>
      tbl(s, d, "orders").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("total_records"))),

    // Fact-to-dim join with an explicit broadcast (small dim side).
    "q3_join_segment" -> ((s, d) =>
      tbl(s, d, "orders")
        .join(broadcast(tbl(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))),

    // Top-k: planned as TakeOrderedAndProject, unique tiebreak for determinism (O1).
    "q4_topk_orders" -> ((s, d) =>
      tbl(s, d, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)),

    // Latest event per user (W1). Same rows as the row_number form the
    // oracle states (QUALIFY row_number() = 1 over ts DESC, event_id DESC):
    // event_id is unique, so the greatest (ts, event_id) struct per user IS
    // that row — computed with a max_by hash aggregate instead of a window
    // because partial (map-side) aggregation collapses each user's events
    // before the exchange and nothing sorts (guide §2.3 "aggregate before
    // you shuffle"; measured 0.19 s window vs 0.10 s max_by at sf0.1, and
    // at scale the window must shuffle EVERY event row). The row_number
    // window form itself stays gated through Merge.dedupLatest
    // (t_upsert_precombine) and exactDedup (d_exact_dedup).
    "q5_latest_per_user" -> ((s, d) => {
      val e = events(s, d)
      val dataCols = e.columns.filterNot(_ == "user_id")
      e.groupBy(col("user_id"))
        .agg(max_by(struct(dataCols.map(col): _*),
          struct(col("ts"), col("event_id"))).as("__r"))
        .select(e.columns.toSeq.map { c =>
          if (c == "user_id") col(c) else col("__r").getField(c).as(c)
        }: _*)
    }),

    // Filter + projection; predicate and columns both push into the scan (P1/P2).
    "q6_filter_project" -> ((s, d) =>
      tbl(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01") &&
          col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * col("l_discount")).as("disc_amount"))),

    "q7_distinct_flags" -> ((s, d) =>
      tbl(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    // Semi-join by subquery (P5 relational shape; broadcast the filter side).
    "q8_semi_join" -> ((s, d) =>
      tbl(s, d, "orders").join(
        broadcast(tbl(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("o_custkey"))),
        Seq("o_custkey"), "left_semi")),

    // 5-way star join rolled up to region (J1 shape at scale: facts shuffle
    // once on the join key chain; all dims broadcast).
    "q9_region_rollup" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val o = tbl(s, d, "orders")
      val c = tbl(s, d, "customer")
      val n = tbl(s, d, "nation")
      val r = tbl(s, d, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
    }),

    // Equality lookup (P2, `lake_cli.py:77-85`).
    "q10_key_lookup" -> ((s, d) =>
      tbl(s, d, "customer").filter(col("c_custkey") === 42)),

    "q11_event_type_stats" -> ((s, d) =>
      events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))),

    // Anti join (the J4 shape as a query): customers with no high-value
    // orders. The filter keeps the result non-vacuous (every customer has
    // SOME order in the corpus, so an unfiltered anti join returns 0 rows
    // and proves nothing).
    "q12_anti_join" -> ((s, d) =>
      tbl(s, d, "customer").join(
        tbl(s, d, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")),

    // Tumbling-window counts — the batch shape of
    // graft.streaming.EventWindows.windowedCounts (hour windows align to
    // the epoch hour in both engines).
    "q13_windowed_counts" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))),

    // Gap sessionization, batch shape (1-day gap): the hash-verified face
    // of the streaming sessionize operator (StreamingSpec proves the
    // streaming path emits exactly these sessions).
    "q14_sessions" -> ((s, d) =>
      graft.streaming.EventWindows.sessionizeBatch(
        events(s, d), "ts", "user_id", gapSeconds = 86400L)),

    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`; both interpolate linearly and the
    // arithmetic is bit-identical — hash-verified, not approximate).
    "x_quantiles" -> ((s, d) =>
      tbl(s, d, "lineitem").groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        expr("percentile(l_extendedprice, 0.5)").as("price_p50"))
        .orderBy("l_returnflag")))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_status_counts" ->
      "SELECT o_orderstatus, count(*) AS total_records FROM orders GROUP BY o_orderstatus",
    "q3_join_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q4_topk_orders" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "q5_latest_per_user" ->
      """SELECT * FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "q6_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS disc_amount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin,
    "q7_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q8_semi_join" ->
      "SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)",
    "q9_region_rollup" ->
      """SELECT r_name, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q10_key_lookup" ->
      "SELECT * FROM customer WHERE c_custkey = 42",
    "q11_event_type_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q12_anti_join" ->
      "SELECT * FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)",
    "q13_windowed_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q14_sessions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM e),
        |f AS (SELECT user_id, ts,
        |        CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > CAST(86400 AS BIGINT)*1000000
        |             THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "x_quantiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.25) AS q25,
         quantile_cont(l_quantity, 0.5) AS q50,
         quantile_cont(l_quantity, 0.75) AS q75,
         quantile_cont(l_extendedprice, 0.5) AS price_p50
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
