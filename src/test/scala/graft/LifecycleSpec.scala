package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.GraftTable

/**
 * Table lifecycle + layout operations: rollback, explicit snapshot expiry
 * with immediate storage reclaim, and range / Z-order clustering.
 *
 * The correctness gates (`t_rollback`, `t_expire`, `t_cluster_range`,
 * `t_zorder_range`) hash-check the VALUES against the DuckDB oracle; this
 * spec asserts the parts a value check cannot see — physical file deletes,
 * dir-level pruning, layout metadata, and interplay with bucketing/MOR.
 */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  test("rollback is metadata-only, preserves layout summary, and serves lookups") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-rb-").resolve("t"), "t")
    t.overwriteBucketed(orders, "o_orderkey", 4)
    val v1 = t.log.latest().get
    t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 500), "o_orderkey")
    val snap = t.rollback(v1.snapshotId)
    assert(snap.operation == "rollback")
    assert(snap.summary.get("rollback_of").contains(v1.snapshotId.toString))
    // content == v1, layout survives: bucket spec intact, lookup still pruned
    assert(snap.dataDirs == v1.dataDirs && snap.dirStats == v1.dirStats)
    assert(t.bucketSpec.contains(("o_orderkey", 4)))
    val row = t.lookupKeyRows(7L)
    assert(row.nonEmpty && row.head.getAs[Double]("o_totalprice") ==
      orders.filter(col("o_orderkey") === 7).head.getAs[Double]("o_totalprice"))
    // history is preserved — the upserted version is still travel-able
    assert(t.readAsOf(v1.snapshotId + 1)
      .filter(col("o_orderkey") === 2).head.getAs[Double]("o_totalprice") ==
      orders.filter(col("o_orderkey") === 2).head.getAs[Double]("o_totalprice") + 500)
  }

  test("rollback to the current head is a no-op") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-rb2-").resolve("t"), "t")
    val v1 = t.overwrite(orders.limit(10))
    assert(t.rollback(v1.snapshotId).snapshotId == v1.snapshotId)
    assert(t.latestVersion == v1.snapshotId)
  }

  test("expireSnapshots reclaims superseded dirs immediately; retained reads survive") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-exp-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") <= 500))
    val v1 = t.log.latest().get
    t.overwrite(orders) // full replace — v1's dir becomes unreferenced by head
    val v1Dir = t.root.resolve(v1.dataDirs.head)
    assert(Files.isDirectory(v1Dir))
    val n = t.expireSnapshots(1)
    assert(n == 1)
    assert(!Files.exists(v1Dir), s"expired dir must be deleted: $v1Dir")
    // manifest gone too: time travel throws, OrLatest falls back
    intercept[NoSuchElementException](t.readAsOf(v1.snapshotId))
    assert(t.readAsOfOrLatest(v1.snapshotId).count() == orders.count())
    assert(t.read().count() == orders.count())
  }

  test("expiry after rollback keeps the re-referenced dirs alive") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-exprb-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") <= 500))
    val v1 = t.log.latest().get
    t.overwrite(orders)
    t.rollback(v1.snapshotId)
    // keep only the rollback head: v1's dir is referenced BY the head, the
    // full-replace dir is the garbage
    assert(t.expireSnapshots(1) == 2)
    assert(Files.isDirectory(t.root.resolve(v1.dataDirs.head)))
    assert(t.read().count() ==
      orders.filter(col("o_orderkey") <= 500).count())
  }

  test("rollback to an expired snapshot fails cleanly") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-rbexp-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") <= 500))
    val v1 = t.log.latest().get
    t.overwrite(orders)
    t.expireSnapshots(1) // v1 manifest + dir reclaimed
    // The target is re-read inside rollback's locked retry loop, so the
    // answer is "snapshot expired" — never a head referencing deleted dirs.
    intercept[NoSuchElementException](t.rollback(v1.snapshotId))
    assert(t.read().count() == orders.count())
  }

  test("expire racing rollback never leaves the head pointing at deleted dirs") {
    // The maintenance mutex serializes expire's list→compute→delete span
    // against rollback's read-target→CAS span. Without it, this
    // interleaving breaks: expire lists {v1,v2} and computes v1's dir dead;
    // rollback commits v3 re-referencing v1's dir; expire deletes it —
    // head v3 now reads deleted data. Race both ways a few times and
    // assert the invariant: every dir the surviving head references exists.
    val small = orders.filter(col("o_orderkey") <= 500)
    for (i <- 1 to 6) {
      val t = new GraftTable(spark,
        TestSpark.tmpDir(s"lc-race$i-").resolve("t"), "t")
      t.overwrite(small)
      val v1 = t.log.latest().get
      t.overwrite(orders)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val rb = pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            try { t.rollback(v1.snapshotId); "rolled-back" }
            catch { case _: NoSuchElementException => "expired-first" }
        })
        val ex = pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = t.expireSnapshots(1)
        })
        val outcome = rb.get(); ex.get()
        val head = t.log.latest().get
        (head.dataDirs ++ head.deltaDirs).foreach { d =>
          assert(Files.isDirectory(t.root.resolve(d)),
            s"[$outcome] head ${head.snapshotId} references deleted dir $d")
        }
        val n = t.read().count()
        assert(n == small.count() || n == orders.count())
      } finally pool.shutdown()
    }
  }

  test("age-based expiry drops pre-cutoff snapshots but never the head") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-age-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") <= 300))
    t.overwrite(orders.filter(col("o_orderkey") <= 600))
    val v2 = t.log.latest().get
    // cutoff right after v2: both snapshots pre-date it, but the head stays
    val afterAll = java.time.Instant.parse(v2.committedAt).plusMillis(1).toString
    assert(t.expireSnapshotsOlderThan(afterAll) == 1)
    assert(t.log.versions() == Seq(v2.snapshotId))
    assert(t.read().count() ==
      orders.filter(col("o_orderkey") <= 600).count())
    // a cutoff before everything expires nothing
    assert(t.expireSnapshotsOlderThan("2000-01-01T00:00:00Z") == 0)
  }

  test("expireSnapshots with nothing to expire returns 0") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-exp0-").resolve("t"), "t")
    t.overwrite(orders.limit(10))
    assert(t.expireSnapshots(5) == 0)
  }

  test("range clustering: window read plans only matching dirs, values match full filter") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-cl-").resolve("t"), "t")
    // scrambled insert order — clustering must impose the range layout
    t.overwrite(orders.orderBy(xxhash64(col("o_orderkey"))))
    val snap = t.cluster(Seq("o_orderkey"), 8)
    assert(snap.operation == "cluster")
    assert(snap.summary.get("cluster_columns").contains("o_orderkey"))
    assert(snap.dataDirs.size >= 2 && snap.dataDirs.size <= 8)
    assert(snap.dataDirs.forall(d => snap.dirStats.contains(d)),
      s"every clustered dir must carry stats: ${snap.dirStats.keySet}")
    val lo = 1000L; val hi = 2000L
    val pruned = t.readRange("o_orderkey", lo, hi)
    val dirsRead = pruned.inputFiles.map(f =>
      f.split('/').takeRight(2).head).distinct
    assert(dirsRead.length < snap.dataDirs.size,
      s"window must prune dirs: read ${dirsRead.length} of ${snap.dataDirs.size}")
    assert(pruned.collect().map(_.getLong(0)).toSet ==
      orders.filter(col("o_orderkey").between(lo, hi))
        .collect().map(_.getLong(0)).toSet)
  }

  test("z-order clustering prunes on BOTH dimensions") {
    val ev = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-z-").resolve("t"), "t")
    t.overwrite(ev)
    val snap = t.cluster(Seq("event_id", "user_id"), 16)
    val total = snap.dataDirs.size
    assert(total >= 4, s"expected a multi-dir layout, got $total")
    def dirsRead(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split('/').takeRight(2).head).distinct.length
    // narrow window on EACH dimension must plan a strict subset of dirs
    val byEvent = t.readRange("event_id", 100L, 180L)
    val byUser = t.readRange("user_id", 2L, 4L)
    assert(dirsRead(byEvent) < total,
      s"event_id window read ${dirsRead(byEvent)}/$total dirs")
    assert(dirsRead(byUser) < total,
      s"user_id window read ${dirsRead(byUser)}/$total dirs")
    // and both remain exact
    assert(byEvent.count() ==
      ev.filter(col("event_id").between(100, 180)).count())
    assert(byUser.count() ==
      ev.filter(col("user_id").between(2, 4)).count())
    // 2-D box: prunes at least as hard as either single-column window,
    // stays exact
    val box = t.readBox(Seq("event_id" -> (100L, 180L), "user_id" -> (2L, 4L)))
    assert(dirsRead(box) <= math.min(dirsRead(byEvent), dirsRead(byUser)),
      s"box read ${dirsRead(box)} dirs, single-dim reads " +
        s"${dirsRead(byEvent)}/${dirsRead(byUser)}")
    assert(box.count() == ev.filter(
      col("event_id").between(100, 180) && col("user_id").between(2, 4)).count())
  }

  test("rollback retries through concurrent appends; expiry never strands the head") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-race-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") < 100)) // v1
    t.append(orders.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // three appends race one rollback-to-v1: every commit must land exactly
    // once (append re-derives on conflict, rollback's CAS retries), whatever
    // the interleaving
    val fs = (0 until 3).map { i =>
      Future { t.append(orders.filter(col("o_orderkey") >= 200 + i * 50 &&
        col("o_orderkey") < 250 + i * 50)); () }
    } :+ Future { t.rollback(1L); () }
    Await.result(Future.sequence(fs), 5.minutes)
    pool.shutdown()
    assert(t.log.versions() == (1L to 6L),
      s"expected 6 contiguous commits, got ${t.log.versions()}")
    // the one invariant that survives every interleaving: the head's
    // records summary equals what a full read actually returns
    val head = t.log.latest().get
    assert(t.read().count() == head.summary("records").toLong)
    // explicit expiry down to the head alone keeps it fully readable
    t.expireSnapshots(1)
    assert(t.log.versions() == Seq(head.snapshotId))
    assert(t.read().count() == head.summary("records").toLong)
  }

  test("z-order on a timestamp dimension quantizes via epoch; strings refuse loudly") {
    val ev = Q_events()
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-zts-").resolve("t"), "t")
    t.overwrite(ev)
    val snap = t.cluster(Seq("ts", "event_id"), 8)
    assert(snap.dataDirs.size >= 2)
    // the time dimension prunes: a narrow ts window plans a dir subset
    val tsVals = ev.select(min("ts"), max("ts")).head()
    val lo = tsVals.getAs[java.time.LocalDateTime](0)
    val hi = lo.plusHours(2)
    val w = t.readRange("ts", lo, hi)
    val dirsRead = w.inputFiles.map(_.split('/').takeRight(2).head).distinct.length
    assert(dirsRead < snap.dataDirs.size,
      s"ts window read $dirsRead of ${snap.dataDirs.size} dirs")
    assert(w.count() == ev.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi)).count())
    // a string column in a MULTI-column cluster is a loud client error
    val t2 = new GraftTable(spark, TestSpark.tmpDir("lc-zs-").resolve("t"), "t")
    t2.overwrite(ev)
    val e = intercept[IllegalArgumentException](t2.cluster(Seq("event_type", "event_id"), 4))
    assert(e.getMessage.contains("event_type"), e.getMessage)
  }

  private def Q_events() =
    graft.queries.Q.events(spark, TestSpark.sf0001)

  test("cluster folds pending MOR deltas first") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lc-mor-").resolve("t"), "t")
    t.overwriteBucketed(orders, "o_orderkey", 4)
    t.upsertDeferred(orders.filter(col("o_orderkey") <= 100)
      .withColumn("o_totalprice", lit(1.0)), "o_orderkey")
    val snap = t.cluster(Seq("o_orderkey"), 4)
    assert(snap.deltaDirs.isEmpty, "clustering must fold the delta chain")
    val got = t.read().filter(col("o_orderkey") === 50).collect()
    assert(got.length == 1 && got.head.getAs[Double]("o_totalprice") == 1.0)
    assert(t.read().count() == orders.count())
  }
}
