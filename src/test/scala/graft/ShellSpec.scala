package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.catalog.GraftCatalog

/** The terminal shell's command dispatch (`lake_shell.py` twin), driven
  * without a TTY via Shell.exec. */
class ShellSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val session: GraftSession = {
    val cat = new GraftCatalog(spark, TestSpark.tmpDir("shell-"))
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    cat.saveTable("orders_s", orders.filter(col("o_orderkey") < 200))
    val s = new GraftSession(cat)
    s.refreshViews()
    s
  }
  private def run(line: String): String =
    Shell.exec(session, line).getOrElse(fail(s"'$line' exited the shell"))

  test("tokenizer: quotes group, k=v survives, whitespace splits") {
    assert(Shell.tokens("""insert t id 1 name="two words" role=dev""") ==
      Seq("insert", "t", "id", "1", "name=two words", "role=dev"))
    assert(Shell.tokens("  a   'b c'  ") == Seq("a", "b c"))
    assert(Shell.tokens("") == Nil)
  }

  test("tables / describe / select") {
    assert(run("tables").linesIterator.contains("orders_s"))
    val d = run("describe orders_s")
    assert(d.contains("o_orderkey") && d.contains("bigint"), d)
    val s = run("select orders_s 5")
    assert(s.contains("o_orderkey") && s.contains("(5 rows)"), s)
  }

  test("insert / get / update / delete round-trip with typed coercion") {
    assert(run("""insert orders_s o_orderkey 900001 o_orderstatus=O o_totalprice=12.5""")
      .contains("inserted"))
    val g1 = run("get orders_s o_orderkey 900001")
    assert(g1.contains("900001") && g1.contains("12.5"), g1)
    assert(run("update orders_s o_orderkey 900001 o_totalprice=99.25")
      .contains("updated"))
    val g2 = run("get orders_s o_orderkey 900001")
    assert(g2.contains("99.25"), g2)
    // ...and SQL sees the new snapshot through the refreshed view.
    val q = run("sql SELECT o_totalprice AS p FROM orders_s WHERE o_orderkey = 900001")
    assert(q.contains("99.25"), q)
    assert(run("delete orders_s o_orderkey 900001").contains("deleted"))
    assert(run("get orders_s o_orderkey 900001").contains("(0 rows)"))
  }

  test("history / travel reach the snapshot log") {
    val h = run("history orders_s")
    assert(h.contains("operation") && h.contains("overwrite"), h)
    val t = run("travel orders_s 1")
    assert(t.contains("o_orderkey"), t)
  }

  test("load_csv ingests through the catalog path") {
    val csv = TestSpark.tmpDir("shell-csv-").resolve("in.csv")
    java.nio.file.Files.writeString(csv, "id,name\n1,alpha\n2,beta\n")
    val out = run(s"load_csv $csv shell_csv_t replace")
    assert(out.contains("records=2"), out)
    assert(run("select shell_csv_t").contains("alpha"))
  }

  test("rollback / expire / cluster lifecycle verbs") {
    val cat = session.catalog
    val ev = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .select("event_id", "user_id", "value")
    cat.saveTable("events_s", ev)
    session.refreshViews()
    val v1 = cat.table("events_s").latestVersion
    assert(run("insert events_s event_id 900001 user_id=5").contains("inserted"))
    assert(run(s"rollback events_s $v1").contains(s"rolled events_s back to snapshot $v1"))
    assert(run("get events_s event_id 900001").contains("(0 rows)"))
    val cl = run("cluster events_s event_id,user_id 4")
    assert(cl.contains("clustered events_s by event_id,user_id"), cl)
    val ex = run("expire events_s 1")
    assert(ex.matches("expired \\d+ snapshot\\(s\\) of events_s .*"), ex)
    // post-expiry the head still reads; select goes through the refreshed view
    assert(run("select events_s 3").contains("(3 rows)"))
  }

  test("governed-writes verbs: branch/publish/tag/read/stats/constraint") {
    assert(run("branch orders_s wap").contains("created branch wap"))
    assert(run("branch orders_s").linesIterator.contains("wap"))
    // stage on the branch via the library, then the WAP verbs
    session.catalog.table("orders_s").branch("wap").upsert(
      spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
        .filter(col("o_orderkey") < 200)
        .withColumn("o_orderpriority", lit("AUD")), "o_orderkey")
    assert(run("read orders_s branch wap 3").contains("AUD"))
    assert(!run("select orders_s 3").contains("AUD")) // main isolated
    assert(run("publish orders_s wap").contains("published branch wap"))
    assert(run("select orders_s 3").contains("AUD"))
    assert(run("tag orders_s rel").contains("tagged orders_s"))
    assert(run("tag orders_s").contains("rel ->"))
    assert(run("read orders_s tag rel 2").contains("o_orderkey"))
    val st = run("stats orders_s o_orderkey")
    assert(st.contains("o_orderkey_min") &&
      (st.contains("metadata-only") || st.contains("scan fallback")), st)
    assert(run("constraint orders_s").contains("(none)"))
    assert(run("constraint orders_s 'o_totalprice >= 0'")
      .contains("set CHECK constraint"))
    assert(run("constraint orders_s").contains("o_totalprice >= 0"))
    run("drop_tag orders_s rel")
    assert(!run("tag orders_s").contains("rel ->"))
    run("drop_branch orders_s wap")
    assert(run("branch orders_s").trim.isEmpty)
  }

  test("change-feed and materialized-view verbs") {
    val ch = run("changes orders_s o_orderkey 0")
    assert(ch.contains("_change_type") && ch.contains("_commit_version"), ch.take(300))
    assert(run("mv orders_s").contains("no materialized views"))
    assert(run("mv_create orders_s bystat o_orderkey o_orderstatus o_custkey")
      .contains("created materialized view bystat"))
    assert(run("mv orders_s").linesIterator.contains("bystat"))
    session.catalog.table("orders_s").append(
      spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
        .filter(col("o_orderkey") >= 200 && col("o_orderkey") < 260))
    assert(run("mv_refresh orders_s bystat").contains("refreshed bystat"))
    val view = run("mv orders_s bystat")
    assert(view.contains("cnt") && view.contains("reflects orders_s v"), view)
  }

  test("bloom / point index verbs") {
    val b = run("bloom orders_s o_custkey")
    assert(b.contains("bloom-indexed") && b.contains("o_custkey"), b)
    assert(run("bloom orders_s o_custkey") == "bloom-indexed 0 dir(s) of orders_s on o_custkey")
    val k = session.catalog.table("orders_s").read()
      .select("o_custkey").head.getLong(0)
    val p = run(s"point orders_s o_custkey $k")
    assert(p.contains("o_custkey"), p)
    val want = session.catalog.table("orders_s").read()
      .filter(col("o_custkey") === k).count()
    assert(p.contains(s"($want rows)"), p)
  }

  test("time-series join and quantiles verbs") {
    import spark.implicits._
    val cat = session.catalog
    cat.saveTable("px_s", Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), 11.0))
      .toDF("sym", "ts", "px"))
    cat.saveTable("trd_s", Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:12"), 100),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:25"), 200))
      .toDF("sym", "ts", "qty"))
    val a = run("asof trd_s px_s sym ts ts")
    assert(a.contains("asof_px") && a.contains("10.0") && a.contains("11.0"), a)
    cat.saveTable("sess_s", Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:15"), "a"))
      .toDF("sym", "s", "e", "tag"))
    val iv = run("interval_join trd_s sess_s sym ts s e 10")
    assert(iv.contains("iv_tag") && iv.contains("(1 rows)"), iv)
    val q = run("quantiles orders_s o_totalprice o_orderstatus")
    assert(q.contains("q25") && q.contains("q75") && q.contains("o_orderstatus"), q)
    val q2 = run("quantiles orders_s o_totalprice 0.5")
    assert(q2.contains("q50") && q2.contains("(1 rows)"), q2)
    assert(run("asof trd_s px_s sym").startsWith("error:"))
  }

  test("sql verb reaches the v2 catalog's row-level operations") {
    // The shell's main registers the warehouse as `lake`; the spec's shared
    // session needs its own uniquely-named catalog (catalog instances
    // cache their FIRST conf by name).
    val wh = session.catalog.warehouse
    val cat = "lakesh_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.connector.GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    session.catalog.table("orders_s") // ensure exists
    val out = run(s"sql UPDATE $cat.orders_s SET o_totalprice = 0.5 " +
      "WHERE o_orderkey = 3")
    assert(!out.startsWith("error:"), out)
    val check = run(s"sql SELECT o_totalprice FROM $cat.orders_s " +
      "WHERE o_orderkey = 3")
    assert(check.contains("0.5"), check)
  }

  test("errors come back as text, never exceptions; unknown commands hint help") {
    assert(run("sql SELEKT nope").startsWith("error:"))
    assert(run("get no_such_table id 1").startsWith("error:"))
    // A typo'd set column must refuse loudly, not commit a no-op rewrite.
    val e = run("update orders_s o_orderkey 1 o_totalpryce=9")
    assert(e.startsWith("error:") && e.contains("unknown columns"), e)
    assert(run("frobnicate").contains("unknown command"))
    assert(run("describe").startsWith("error:"))
    assert(Shell.exec(session, "exit").isEmpty)
    assert(run("") == "")
  }
}
