package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.catalog.GraftCatalog

/** Serving surface: SQL passthrough (+ sugar), preview, read, view. */
class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshSession(): GraftSession = {
    val cat = new GraftCatalog(spark, TestSpark.tmpDir("api-"))
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val t = cat.saveTable("orders_t", orders.filter(col("o_orderkey") < 500))
    t.append(orders.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 600))
    val s = new GraftSession(cat)
    s.refreshViews()
    s
  }

  test("sql passthrough strips trailing semicolons and sees latest snapshot") {
    val s = freshSession()
    val n = s.sql("SELECT count(*) AS n FROM orders_t;").head().getLong(0)
    assert(n == 600)
  }

  test("VERSION AS OF rewrites to the pinned snapshot") {
    val s = freshSession()
    val n = s.sql("SELECT count(*) AS n FROM orders_t VERSION AS OF 1").head().getLong(0)
    assert(n == 500)
  }

  test("VERSION AS OF on a catalog-QUALIFIED name is left to Spark's catalog") {
    val s = freshSession()
    val wh = s.catalog.warehouse
    val cat = "apiq_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.connector.GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    // The session's sugar must NOT rewrite `cat.orders_t` (its last segment
    // names a session table) — Spark's loadTable(ident, version) owns it.
    val v1 = s.sql(s"SELECT count(*) AS c FROM $cat.orders_t VERSION AS OF 1")
      .head.getLong(0)
    val all = s.sql(s"SELECT count(*) AS c FROM $cat.orders_t").head.getLong(0)
    assert(v1 < all, s"v1=$v1 all=$all")
    // The bare-name sugar still pins session views.
    assert(s.sql("SELECT count(*) AS c FROM orders_t VERSION AS OF 1")
      .head.getLong(0) == v1)
  }

  test("VERSION AS OF inside a string literal is NOT rewritten") {
    val s = freshSession()
    // The literal must survive verbatim while the real sugar still fires.
    val r = s.sql(
      "SELECT 'orders_t VERSION AS OF 1' AS lit, count(*) AS n FROM orders_t VERSION AS OF 1 GROUP BY 1")
      .head()
    assert(r.getString(0) == "orders_t VERSION AS OF 1")
    assert(r.getLong(1) == 500)
  }

  test("literal scanner: escaped quotes, double-quoted strings, line comments") {
    val s = freshSession()
    // Backslash-escaped quote inside a literal must not end the literal.
    val r1 = s.sql("SELECT 'it\\'s orders_t VERSION AS OF 1' AS lit FROM orders_t LIMIT 1").head()
    assert(r1.getString(0) == "it's orders_t VERSION AS OF 1")
    // Double-quoted strings are literals in Spark's default dialect.
    val r2 = s.sql("SELECT \"orders_t VERSION AS OF 1\" AS lit FROM orders_t LIMIT 1").head()
    assert(r2.getString(0) == "orders_t VERSION AS OF 1")
    // An apostrophe in a -- comment must not flip literal state; the real
    // sugar after the comment line must still fire.
    val r3 = s.sql(
      "SELECT count(*) AS n -- don't rewrite 'this'\nFROM orders_t VERSION AS OF 1").head()
    assert(r3.getLong(0) == 500)
  }

  test("literal scanner: block comments protected; non-table names pass through") {
    val s = freshSession()
    // Sugar-shaped text inside /* */ (even nested, as Spark's lexer allows)
    // must not be rewritten; the real sugar outside still fires.
    val r1 = s.sql(
      "SELECT count(*) AS n /* not orders_t VERSION AS OF 1 /* nested 'x */ here */ FROM orders_t VERSION AS OF 1")
      .head()
    assert(r1.getLong(0) == 500)
    // A quote inside a block comment must not flip literal state.
    val r2 = s.sql(
      "SELECT count(*) AS n /* don't */ FROM orders_t VERSION AS OF 1").head()
    assert(r2.getLong(0) == 500)
    // A pattern match on a NON-table name is passed through for Catalyst to
    // judge on the original text: the failure (if any) is Spark's own parse/
    // analysis error, not the catalog's "table does not exist" require — and
    // no temp view is registered as a side effect.
    val e = intercept[Exception] { s.sql("SELECT * FROM nosuch VERSION AS OF 1") }
    assert(!e.isInstanceOf[IllegalArgumentException], s"catalog require leaked: $e")
    assert(!spark.catalog.tableExists("nosuch__v1"))
  }

  test("MERGE INTO sugar: upsert and delete shapes; malformed shapes pass through") {
    val s = freshSession()
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val before = s.sql("SELECT count(*) AS c FROM orders_t").head.getLong(0)
    orders.filter(col("o_orderkey").between(550, 650))
      .withColumn("o_orderpriority", lit("9-M"))
      .createOrReplaceTempView("src_m")
    val res = s.sql("MERGE INTO orders_t USING src_m " +
      "ON orders_t.o_orderkey = src_m.o_orderkey " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(res.columns.toSeq == Seq("table", "operation", "snapshot_id"))
    // 550-599 existed (updated in place), 600-650 are new inserts.
    val after = s.sql("SELECT count(*) AS c FROM orders_t").head.getLong(0)
    assert(after == before + orders.filter(
      col("o_orderkey").between(600, 650)).count())
    assert(s.sql("SELECT count(*) AS c FROM orders_t " +
      "WHERE o_orderpriority = '9-M'").head.getLong(0) ==
      orders.filter(col("o_orderkey").between(550, 650)).count())
    // Reversed ON order resolves the same shared key.
    s.sql("MERGE INTO orders_t USING src_m " +
      "ON src_m.o_orderkey = orders_t.o_orderkey WHEN MATCHED THEN DELETE")
    assert(s.sql("SELECT count(*) AS c FROM orders_t " +
      "WHERE o_orderkey BETWEEN 550 AND 650").head.getLong(0) == 0)
    // A shape outside the two canonical forms routes through the scratch
    // v2 catalog and EXECUTES with Catalyst's real MERGE semantics (a
    // partial SET updates just that column) — never a silent DIFFERENT
    // merge, and no longer a refusal.
    val orig = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    orig.filter(col("o_orderkey") < 100).createOrReplaceTempView("src_p")
    val nSmall = orig.filter(col("o_orderkey") < 100).count()
    val res2 = s.sql("MERGE INTO orders_t t USING src_p s " +
      "ON t.o_orderkey = s.o_orderkey " +
      "WHEN MATCHED THEN UPDATE SET t.o_totalprice = -1")
    assert(res2.head.getString(1) == "merge-catalyst")
    assert(s.sql("SELECT count(*) AS c FROM orders_t WHERE o_totalprice = -1")
      .head.getLong(0) == nSmall)
    // Other columns of the touched rows are untouched by the partial SET.
    assert(s.sql("SELECT count(*) AS c FROM orders_t " +
      "WHERE o_totalprice = -1 AND o_custkey IS NULL").head.getLong(0) == 0)
    // Mismatched ON keys refuse loudly.
    val e2 = intercept[IllegalArgumentException](s.sql(
      "MERGE INTO orders_t USING src_m " +
        "ON orders_t.o_orderkey = src_m.o_custkey " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"))
    assert(e2.getMessage.contains("shared key"))
    // The degenerate self-merge `ON t.a = t.b` must refuse too — a Map of
    // the two sides would collapse the duplicate qualifier and silently
    // run an upsert keyed on b.
    val e3 = intercept[IllegalArgumentException](s.sql(
      "MERGE INTO orders_t USING orders_t " +
        "ON orders_t.o_orderkey = orders_t.o_custkey " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"))
    assert(e3.getMessage.contains("shared key"))
  }

  test("UPDATE and DELETE as SQL text on the session surface") {
    val s = freshSession()
    val table = s.catalog.table("orders_t")
    val before = table.read()
    val n99 = before.filter(col("o_orderkey") % 7 === 0).count()
    // Full expression grammar in SET and WHERE (expr-parsed), commas
    // inside function calls survive the assignment split.
    val res = s.sql("UPDATE orders_t SET o_totalprice = round(o_totalprice, 0) " +
      "+ 0.25, o_orderstatus = upper(concat('u', 'x')) WHERE o_orderkey % 7 = 0")
    assert(res.head.getString(1) == "update")
    val after = table.read()
    assert(after.filter(col("o_orderstatus") === "UX").count() == n99)
    // The rewritten view serves the post-update state.
    assert(s.sql("SELECT count(*) AS n FROM orders_t WHERE o_orderstatus = 'UX'")
      .head.getLong(0) == n99)
    // Unknown SET column refuses loudly.
    val e = intercept[IllegalArgumentException](
      s.sql("UPDATE orders_t SET nope = 1 WHERE o_orderkey = 1"))
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    // A ' where ' INSIDE a string literal must not split the statement.
    s.sql("UPDATE orders_t SET o_orderpriority = 'x where y' WHERE o_orderkey = 5")
    assert(table.read().filter(col("o_orderkey") === 5)
      .select("o_orderpriority").collect().forall(_.getString(0) == "x where y"))
    // A scalar subquery's own WHERE inside SET must not split either.
    s.sql("UPDATE orders_t SET o_custkey = (SELECT max(o_custkey) FROM " +
      "orders_t WHERE o_orderkey < 100) WHERE o_orderkey = 5")
    // Backslash-escaped quotes (Spark's default dialect accepts 'it\'s')
    // must not close the literal early: neither the ' where ' nor the
    // comma in the tail may split the statement.
    s.sql("UPDATE orders_t SET o_orderpriority = 'it\\'s, x where y' " +
      "WHERE o_orderkey = 5")
    assert(table.read().filter(col("o_orderkey") === 5)
      .select("o_orderpriority").collect()
      .forall(_.getString(0) == "it's, x where y"))
    // DELETE FROM ... WHERE with 3VL semantics via the engine verb.
    val keep = after.filter(!(col("o_orderkey") % 3 === 0)).count()
    s.sql("DELETE FROM orders_t WHERE o_orderkey % 3 = 0")
    assert(table.read().count() == keep)
  }

  test("the reference's 3-clause conditional CDC MERGE runs on the session surface") {
    val s = freshSession()
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val table = s.catalog.table("orders_t")
    val before = table.read()
    val cols = before.columns.toSeq
    // updates: price rewrite on 100-150, deletes of 151-200, inserts of
    // shifted keys, and an absent-key delete the conditional INSERT ignores.
    val src = orders.filter(col("o_orderkey").between(100, 150))
      .withColumn("o_totalprice", lit(1.0)).withColumn("op", lit("u"))
      .unionByName(orders.filter(col("o_orderkey").between(151, 200))
        .withColumn("op", lit("d")))
      .unionByName(orders.filter(col("o_orderkey").between(201, 230))
        .withColumn("o_orderkey", col("o_orderkey") + 7000000)
        .withColumn("op", lit("c")))
      .unionByName(orders.filter(col("o_orderkey").between(231, 240))
        .withColumn("o_orderkey", col("o_orderkey") + 9000000)
        .withColumn("op", lit("d")))
    src.createOrReplaceTempView("cdc_src")
    val setSql = cols.filterNot(_ == "o_orderkey")
      .map(c => s"t.$c = s.$c").mkString(", ")
    val res = s.sql(s"""MERGE INTO orders_t t USING cdc_src s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET $setSql
      WHEN NOT MATCHED AND s.op != 'd' THEN INSERT (${cols.mkString(", ")})
        VALUES (${cols.map(c => s"s.$c").mkString(", ")})""")
    assert(res.head.getString(1) == "merge-cdc")
    val after = table.read()
    assert(after.filter(col("o_orderkey").between(151, 200)).count() == 0)
    assert(after.filter(col("o_orderkey").between(100, 150) &&
      col("o_totalprice") === 1.0).count() ==
      before.filter(col("o_orderkey").between(100, 150)).count())
    assert(after.filter(col("o_orderkey") >= 7000000).count() ==
      orders.filter(col("o_orderkey").between(201, 230)).count())
    assert(after.filter(col("o_orderkey") >= 9000000).count() == 0)
    // A SET that covers only a subset of columns is NOT the full-replace
    // shape: it routes through Catalyst (scratch catalog) and executes
    // with the statement's real conditional semantics — idempotent here,
    // since the full-replace merge above already applied the same batch.
    val total = after.count()
    val res2 = s.sql(
      s"""MERGE INTO orders_t t USING cdc_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice
        WHEN NOT MATCHED AND s.op != 'd' THEN INSERT (${cols.mkString(", ")})
          VALUES (${cols.map(c => s"s.$c").mkString(", ")})""")
    assert(res2.head.getString(1) == "merge-catalyst")
    val again = table.read()
    assert(again.count() == total)
    assert(again.filter(col("o_orderkey").between(151, 200)).count() == 0)
    assert(again.filter(col("o_orderkey").between(100, 150) &&
      col("o_totalprice") === 1.0).count() ==
      before.filter(col("o_orderkey").between(100, 150)).count())
  }

  test("ALTER TABLE rename/drop/add as SQL text on the session surface") {
    val s = freshSession()
    s.sql("ALTER TABLE orders_t RENAME COLUMN o_totalprice TO price")
    assert(s.sql("SELECT sum(price) p FROM orders_t").head.getDouble(0) > 0)
    assert(!s.catalog.describe("orders_t").fieldNames.contains("o_totalprice"))
    s.sql("ALTER TABLE orders_t DROP COLUMN o_orderpriority")
    assert(!s.catalog.describe("orders_t").fieldNames.contains("o_orderpriority"))
    s.sql("ALTER TABLE orders_t ADD COLUMNS (note STRING, score DOUBLE)")
    assert(s.sql("SELECT count(*) c FROM orders_t WHERE note IS NULL")
      .head.getLong(0) == s.sql("SELECT count(*) c FROM orders_t").head.getLong(0))
    // DML under the renamed name via SQL text.
    s.sql("UPDATE orders_t SET price = 1.5 WHERE o_orderkey = 7")
    assert(s.sql("SELECT price FROM orders_t WHERE o_orderkey = 7")
      .collect().forall(_.getDouble(0) == 1.5))
  }

  test("ALTER COLUMN TYPE widens metadata-only on the session surface") {
    val s = freshSession()
    val t = s.catalog.table("orders_t")
    // Rebuild the table with a narrow column to widen.
    val narrow = t.read().withColumn("o_custkey", col("o_custkey").cast("int"))
    s.catalog.saveTable("orders_w", narrow)
    s.registerView("orders_w")
    val sum0 = s.sql("SELECT sum(CAST(o_custkey AS BIGINT)) x FROM orders_w")
      .head.getLong(0)
    s.sql("ALTER TABLE orders_w ALTER COLUMN o_custkey TYPE BIGINT")
    assert(s.catalog.describe("orders_w")("o_custkey").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(s.sql("SELECT sum(o_custkey) x FROM orders_w").head.getLong(0) == sum0)
    // Narrowing refuses loudly.
    val e = intercept[IllegalArgumentException](
      s.sql("ALTER TABLE orders_w ALTER COLUMN o_custkey TYPE INT"))
    assert(e.getMessage.contains("widening"))
    // Parameterized target types parse through the sugar (round 16).
    val narrowDec = t.read()
      .withColumn("o_totalprice", col("o_totalprice").cast("decimal(9,2)"))
    s.catalog.saveTable("orders_wd", narrowDec)
    s.registerView("orders_wd")
    s.sql("ALTER TABLE orders_wd ALTER COLUMN o_totalprice TYPE DECIMAL(13, 2)")
    assert(s.catalog.describe("orders_wd")("o_totalprice").dataType ==
      org.apache.spark.sql.types.DecimalType(13, 2))
  }

  test("ASOF JOIN sugar: rewrite, tolerance, tiebreak, literal-protected") {
    val s = freshSession()
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    orders.filter(col("o_orderkey") < 300)
      .select(col("o_custkey"), col("o_orderdate").as("rts"),
        col("o_totalprice").as("rp"))
      .createOrReplaceTempView("rside")
    // Backward as-of: each order annotated with the latest rside row
    // at-or-before its date for the same customer.
    val out = s.sql("SELECT o_orderkey, ref_rts, ref_rp FROM orders_t " +
      "ASOF JOIN rside ON orders_t.o_custkey = rside.o_custkey " +
      "AND orders_t.o_orderdate >= rside.rts PREFIX 'ref_' " +
      "ORDER BY o_orderkey")
    assert(out.columns.toSeq == Seq("o_orderkey", "ref_rts", "ref_rp"))
    assert(out.count() == s.sql("SELECT count(*) c FROM orders_t").head.getLong(0))
    // Values: the max rts at-or-before, per the naive formulation.
    val naive = s.sql(
      """SELECT l.o_orderkey, max(r.rts) AS m FROM orders_t l JOIN rside r
         ON l.o_custkey = r.o_custkey AND r.rts <= l.o_orderdate
         GROUP BY l.o_orderkey""")
    val got = out.filter(col("ref_rts").isNotNull)
      .select(col("o_orderkey"), col("ref_rts").as("m"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // Inside a string literal the fragment must pass through untouched.
    val lit1 = s.sql("SELECT 'a ASOF JOIN b ON a.x = b.x AND a.t >= b.t' AS v")
      .head.getString(0)
    assert(lit1.contains("ASOF JOIN"))
    // Mismatched qualifiers refuse loudly (Spark has no grammar to report).
    val e = intercept[IllegalArgumentException](s.sql(
      "SELECT * FROM orders_t ASOF JOIN rside " +
        "ON orders_t.o_custkey = orders_t.o_custkey " +
        "AND orders_t.o_orderdate >= rside.rts"))
    assert(e.getMessage.contains("shared key"))
  }

  test("ASOF LEFT vs INNER JOIN sugar: unmatched rows kept vs dropped") {
    val s = freshSession()
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    orders.filter(col("o_orderkey") < 300)
      .select(col("o_custkey"), col("o_orderdate").as("rts"))
      .createOrReplaceTempView("rside2")
    def run(variant: String) = s.sql(
      s"SELECT o_orderkey, ref_rts FROM orders_t ASOF $variant JOIN rside2 " +
        "ON orders_t.o_custkey = rside2.o_custkey " +
        "AND orders_t.o_orderdate >= rside2.rts PREFIX 'ref_' ")
    val leftRows = run("LEFT")
    val innerRows = run("INNER")
    val total = s.sql("SELECT count(*) c FROM orders_t").head.getLong(0)
    assert(leftRows.count() == total, "LEFT keeps every left row")
    assert(innerRows.filter(col("ref_rts").isNull).count() == 0,
      "INNER has no unmatched rows")
    assert(innerRows.count() == leftRows.filter(col("ref_rts").isNotNull).count(),
      "INNER = LEFT minus the unmatched rows")
  }

  test("INTERVAL JOIN sugar: binned point-in-interval, BINS + PREFIX, literal-protected") {
    val s = freshSession()
    import spark.implicits._
    Seq((1L, "2024-01-01 10:30:00"), (1L, "2024-01-01 13:00:00"),
      (2L, "2024-01-01 10:30:00"))
      .toDF("k", "pts").withColumn("pts", col("pts").cast("timestamp"))
      .createOrReplaceTempView("pts_v")
    Seq((1L, 100L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (1L, 101L, "2024-01-01 12:00:00", "2024-01-01 12:30:00"),
      (3L, 102L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
      .toDF("k", "iid", "sts", "ets")
      .withColumn("sts", col("sts").cast("timestamp"))
      .withColumn("ets", col("ets").cast("timestamp"))
      .createOrReplaceTempView("ivs_v")
    val out = s.sql("SELECT k, pts, x_iid FROM pts_v INTERVAL JOIN ivs_v " +
      "ON pts_v.k = ivs_v.k AND pts_v.pts BETWEEN ivs_v.sts AND ivs_v.ets " +
      "BINS INTERVAL 30 MINUTES PREFIX 'x_' ORDER BY k, pts")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // Only (k=1, 10:30) falls inside interval 100; 13:00 is outside both,
    // k=2 has no interval, interval 102 has no same-key point.
    assert(out == Seq((1L, 100L)), s"got $out")
    // Inside a string literal the fragment passes through untouched.
    val lit = s.sql("SELECT 'a INTERVAL JOIN b ON a.x = b.x AND " +
      "a.t BETWEEN b.s AND b.e' AS v").head.getString(0)
    assert(lit.contains("INTERVAL JOIN"))
  }

  test("TABLE_CHANGES sugar: full form, defaulted to/pk, literal-protected") {
    val s = freshSession()
    // v1 → v2 appended 100 rows: the feed is 100 inserts.
    val full = s.sql(
      "SELECT count(*) AS n FROM TABLE_CHANGES('orders_t', 1, 2, 'o_orderkey')")
      .head().getLong(0)
    assert(full == 100)
    // `to` defaults to the head, `pk` to the id-like column — and the
    // sugar composes with ordinary SQL around it.
    val defaulted = s.sql(
      "SELECT _change_type, count(*) AS n FROM TABLE_CHANGES('orders_t', 1) GROUP BY 1")
      .head()
    assert(defaulted.getString(0) == "insert" && defaulted.getLong(1) == 100)
    // The pattern spans string literals (its own arguments), so the
    // protection is positional: a match STARTING inside a literal must
    // survive verbatim while a real call in the same query fires.
    val lit = s.sql(
      "SELECT 'TABLE_CHANGES(''orders_t'', 1)' AS lit, count(*) AS n " +
        "FROM TABLE_CHANGES('orders_t', 1, 2, 'o_orderkey') GROUP BY 1").head()
    assert(lit.getString(0) == "TABLE_CHANGES('orders_t', 1)")
    assert(lit.getLong(1) == 100)
    // Unknown table: passed through for Catalyst to report, no view leaked.
    val e = intercept[Exception] { s.sql("SELECT * FROM TABLE_CHANGES('nosuch', 1)") }
    assert(!e.isInstanceOf[IllegalArgumentException], s"catalog require leaked: $e")
    assert(!spark.catalog.tableExists("nosuch__ch_1_1"))
  }

  test("snapshots metadata view is queryable by SQL") {
    val s = freshSession()
    val ops = s.sql("SELECT operation FROM orders_t__snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("overwrite", "append"))
  }

  test("preview, read (projection+filter+limit), and view page") {
    val s = freshSession()
    assert(s.preview("orders_t", 7).count() == 7)
    val r = s.read("orders_t", Seq("o_orderkey", "o_totalprice"),
      Some(("o_orderkey", 42L)))
    assert(r.columns.toSeq == Seq("o_orderkey", "o_totalprice") && r.count() == 1)
    val page = s.view("orders_t", pageSize = 50).collect()
    assert(page.length == 50)
    assert(page.map(_.getLong(0)).toSeq == (550L until 600L).reverse)
    val hit = s.view("orders_t", search = Some("123")).collect()
    assert(hit.length == 1 && hit(0).getLong(0) == 123L)
  }
}
