package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.{LogStore, SnapshotLog}
import graft.table.GraftTable

/**
 * Object-store-shaped [[LogStore]]: no hard links, no renames — the claim
 * is a bare conditional put (`putIfAbsent`), exactly the primitive S3
 * (`If-None-Match: *`) / GCS (`ifGenerationMatch=0`) expose. Running the
 * commit protocol through it proves the trait boundary carries the whole
 * transactional surface.
 */
class MemoryLogStore extends LogStore {
  import java.nio.file.Path
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  // Object stores report a last-modified time per object; without this
  // override the trait's filesystem default always returns None here and
  // orphan-detail GC silently never fires (the exact failure the hook
  // exists to prevent on non-local stores).
  private val mtimes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def tryClaim(target: Path, bytes: Array[Byte]): Boolean = {
    val won = objects.putIfAbsent(target.toString, bytes) == null
    if (won) mtimes.put(target.toString, System.currentTimeMillis())
    won
  }

  override def modifiedAtMs(p: Path): Option[Long] =
    Option(mtimes.get(p.toString)).map(_.longValue)

  def read(p: Path): Array[Byte] =
    Option(objects.get(p.toString))
      .getOrElse(throw new java.nio.file.NoSuchFileException(p.toString))

  def list(dir: Path): Seq[Path] = {
    val prefix = dir.toString + "/"
    import scala.jdk.CollectionConverters._
    objects.keySet.asScala.toSeq
      .filter(k => k.startsWith(prefix) && !k.drop(prefix.length).contains('/'))
      .map(java.nio.file.Paths.get(_))
  }

  def exists(p: Path): Boolean = objects.containsKey(p.toString)

  def delete(p: Path): Unit = { objects.remove(p.toString); () }

  def mkdirs(dir: Path): Unit = () // object stores have no directories
}

/**
 * Commit-protocol safety: concurrent writers race to the same snapshot id;
 * the hard-link claim makes losers retry under the new head instead of
 * silently overwriting (the lost-write failure a plain rename allows).
 */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet timestamp conf: scoped to table writes, restored after failures and concurrency") {
    val key = "spark.sql.parquet.outputTimestampType"
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    assert(spark.conf.get(key, "INT96") == "INT96", "precondition: session default")
    val t = new GraftTable(spark, TestSpark.tmpDir("conf-").resolve("t"), "t")
    t.overwrite(orders.limit(10))
    assert(spark.conf.get(key, "INT96") == "INT96", "restored after a write")
    // Restored even when the write FAILS (finally path): a column whose
    // type parquet cannot write (CalendarInterval) aborts inside df.write.
    intercept[Throwable] {
      t.append(orders.limit(1).withColumn("bad",
        expr("make_interval(0, 0, 0, 0, 0, 0, 1)")))
    }
    assert(spark.conf.get(key, "INT96") == "INT96", "restored after a failed write")
    // Concurrent appends from many threads: whatever the interleaving of
    // save/set/restore windows, the conf must settle back to the default.
    val threads = (1 to 4).map { i =>
      new Thread(() => t.append(orders.limit(5).withColumn("thread", lit(i))))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(spark.conf.get(key, "INT96") == "INT96", "restored after concurrent writes")
    assert(t.read().count() == 10 + 4 * 5)
    // A deliberate non-INT96 application choice is respected, not replaced.
    spark.conf.set(key, "TIMESTAMP_MILLIS")
    try {
      t.append(orders.limit(1))
      assert(spark.conf.get(key) == "TIMESTAMP_MILLIS", "explicit choice kept")
    } finally spark.conf.unset(key)
  }

  test("batch-key window: idempotent within retention, expires beyond it — one manifest read") {
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val small = orders.filter(col("o_orderkey") < 50)
    val t = new GraftTable(spark, TestSpark.tmpDir("bk-").resolve("t"), "t",
      retainVersions = 4)
    t.overwrite(small)
    t.append(small.limit(1), batchKey = Some("b1"))
    val after = t.log.versions().size
    // replaying a seen batchKey is a no-op (the window carries it forward)
    t.append(small.limit(1), batchKey = Some("b1"))
    assert(t.log.versions().size == after)
    assert(t.log.contains("b1"))
    // push b1 beyond the retention window: it expires, same as when contains()
    // re-read every retained manifest
    (0 until 4).foreach(i => t.append(small.limit(1), batchKey = Some(s"fill$i")))
    assert(!t.log.contains("b1"))
    assert(t.log.contains("fill3"))
  }

  test("pre-window manifests: first windowed commit seeds from retained batchKeys") {
    // Simulate an upgrade from the scan-every-manifest log format: strip
    // recentBatchKeys from every committed manifest, then land one commit
    // that carries a batchKey. The new head's window must include the
    // pre-upgrade keys — otherwise a checkpointed stream replaying its last
    // pre-upgrade batch after that commit would apply it twice.
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val small = orders.filter(col("o_orderkey") < 50)
    val root = TestSpark.tmpDir("mig-").resolve("t")
    val t = new GraftTable(spark, root, "t")
    t.overwrite(small)
    t.append(small.limit(1), batchKey = Some("old1"))
    t.append(small.limit(1), batchKey = Some("old2"))
    val logDir = root.resolve("_log")
    // Patch only the MANIFEST cores (v*.json — always JSON): detail
    // documents are binary (GDT2 carries a CRC trailer with non-UTF-8
    // bytes) and a String round-trip would corrupt them.
    val paths = java.nio.file.Files.list(logDir)
    try paths.filter(_.getFileName.toString.startsWith("v")).forEach { p =>
      val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .replaceAll(""","recentBatchKeys":\[[^\]]*\]""", ""","recentBatchKeys":[]""")
      java.nio.file.Files.write(p, s.getBytes("UTF-8"))
    } finally paths.close()
    assert(t.log.latest().get.recentBatchKeys.isEmpty)
    assert(t.log.contains("old1"), "empty-window fallback must still scan")
    t.append(small.limit(1), batchKey = Some("new1"))
    val head = t.log.latest().get
    assert(head.recentBatchKeys.toSet == Set("old1", "old2", "new1"),
      s"window must be seeded from retained manifests, got ${head.recentBatchKeys}")
    assert(t.log.contains("old1") && t.log.contains("old2") && t.log.contains("new1"))
    // idempotent replay of a pre-upgrade batch stays a no-op post-seed
    val nVersions = t.log.versions().size
    t.append(small.limit(1), batchKey = Some("old2"))
    assert(t.log.versions().size == nVersions)
  }

  test("commit protocol through a conditional-put object store: races, idempotence, retention") {
    val store = new MemoryLogStore
    val log = new SnapshotLog(TestSpark.tmpDir("objstore-").resolve("t"),
      retainVersions = 4, store = store)
    // 8 writers race full-replace commits through bare putIfAbsent claims
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 8).map { i =>
      Future { log.commit("overwrite", "{}", Seq.empty, Map("w" -> i.toString)) }
    }
    val snaps = Await.result(Future.sequence(futures), 2.minutes)
    pool.shutdown()
    // every writer landed, ids are contiguous, no commit was lost
    assert(snaps.map(_.snapshotId).sorted == (1L to 8L))
    assert(log.versions() == (5L to 8L), s"retention should keep 4: ${log.versions()}")
    // batchKey idempotence works through the same store
    val s9 = log.commit("append", "{}", Seq.empty, batchKey = Some("bk1"))
    assert(log.commit("append", "{}", Seq.empty, batchKey = Some("bk1"))
      .snapshotId == s9.snapshotId)
    assert(log.contains("bk1") && !log.contains("bk2"))
    // compare-and-swap rejects a stale parent
    intercept[graft.log.CommitConflictException] {
      log.commitExpecting(Some(1L), "upsert", "{}", Seq.empty)
    }
  }

  test("orphan detail files age out through the store's own mtime on an object store") {
    val store = new MemoryLogStore
    val root = TestSpark.tmpDir("objgc-").resolve("t")
    val log = new SnapshotLog(root, retainVersions = 2, gcGraceMs = 0, store = store)
    // a crashed writer's leftover: a detail file no manifest references
    val orphan = root.resolve("_log").resolve(f"d${99L}%016d-deadbeef.json")
    assert(store.tryClaim(orphan, "{}".getBytes))
    // the sweep's age check is STRICT (mtime < now - grace); with grace 0 a
    // sweep landing in the orphan's own claim millisecond would keep it —
    // let the clock tick past before committing
    Thread.sleep(5)
    // commits past retention trigger expiry + (grace 0) the orphan sweep
    (1 to 4).foreach(i => log.commit("append", "{}", Seq.empty, Map("i" -> i.toString)))
    assert(!store.exists(orphan),
      "orphan detail must be GC'd via store.modifiedAtMs, not java.nio mtime")
    // live split manifests keep their details readable
    assert(log.latest().isDefined)
  }

  test("a failed detail-file claim fails the attempt, never publishes a torn manifest") {
    // Store that rejects the first N detail-file claims (d<id>-<uuid>.json):
    // a transient conditional-put failure or a crashed writer's leftover at
    // the same name. The manifest referencing that detail must NOT land.
    class FlakyDetailStore(failFirst: Int) extends MemoryLogStore {
      val detailFailures = new java.util.concurrent.atomic.AtomicInteger(0)
      override def tryClaim(target: java.nio.file.Path, bytes: Array[Byte]): Boolean = {
        val isDetail = target.getFileName.toString.matches("d\\d{16}-[0-9a-f]{8}\\.json")
        if (isDetail && detailFailures.get() < failFirst) {
          detailFailures.incrementAndGet(); false
        } else super.tryClaim(target, bytes)
      }
    }
    // Transient failure: the commit loop retries with a fresh detail name
    // and succeeds; every published manifest's detail is readable.
    val flaky = new FlakyDetailStore(failFirst = 2)
    val log = new SnapshotLog(TestSpark.tmpDir("flaky-").resolve("t"), store = flaky)
    val s = log.commit("overwrite", "{}", Seq("data/s1"), Map("records" -> "1"))
    assert(flaky.detailFailures.get() == 2, "the detail claim must gate the manifest")
    assert(log.latest().get.snapshotId == s.snapshotId)
    assert(log.latest().get.dataDirs == Seq("data/s1"), "detail must be readable")
    // Permanent failure: the commit surfaces an error and the head is
    // UNCHANGED — no manifest pointing at an absent detail file.
    val dead = new FlakyDetailStore(failFirst = Int.MaxValue)
    val log2 = new SnapshotLog(TestSpark.tmpDir("dead-").resolve("t"), store = dead)
    intercept[IllegalStateException] {
      log2.commit("overwrite", "{}", Seq("data/s1"))
    }
    assert(log2.latest().isEmpty, "no torn manifest may be published")
  }

  test("8 concurrent appends: no lost commits, contiguous ids, correct total") {
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val t = new GraftTable(spark, TestSpark.tmpDir("conc-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") < 100))

    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 8).map { i =>
      Future {
        t.append(orders.filter(col("o_orderkey") >= 100 + i * 10 &&
          col("o_orderkey") < 110 + i * 10))
      }
    }
    Await.result(Future.sequence(futures), 5.minutes)
    pool.shutdown()

    val versions = t.log.versions()
    assert(versions == (1L to 9L), s"expected 9 contiguous commits, got $versions")
    // every appended range landed exactly once
    val expected = orders.filter(col("o_orderkey") < 180).count()
    assert(t.read().count() == expected)
    // parent chain is a single line: each commit's parent is its predecessor
    val snaps = t.log.snapshots().sortBy(_.snapshotId)
    snaps.sliding(2).foreach {
      case Seq(p, c) => assert(c.parentId.contains(p.snapshotId))
      case _ =>
    }
  }

  test("serving lookups stay correct against concurrent appends + minor compactions") {
    // The driver-side serving read derives everything from ONE head
    // snapshot and data files are immutable once committed, so a lookup
    // racing appends and compactSmallDirs must always return a row that
    // was true of SOME committed snapshot — never an error, never a torn
    // read mixing two snapshots' images of the key.
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("conc-srv-").resolve("t"), "t")
    val init = (0L until 64L).map(k => (k, 0L)).toDF("id", "rev")
    t.overwriteBucketed(init, "id", 4)

    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = Future {
      (1L to 6L).foreach { rev =>
        // upsert rewrites every key's rev; maintenance folds small dirs
        t.upsert((0L until 64L).map(k => (k, rev)).toDF("id", "rev"), "id")
        t.compactSmallDirs(maxRows = 1L << 20)
      }
      stop.set(true)
    }
    val readers = (0 until 3).map { r =>
      Future {
        var reads = 0
        while (!stop.get()) {
          val key = (r * 7L + reads) % 64L
          val rows = t.lookupKeyRows(key)
          assert(rows.size == 1, s"key $key must have exactly one image: $rows")
          val rev = rows.head.getAs[Long]("rev")
          assert(rev >= 0L && rev <= 6L, s"rev $rev out of committed range")
          reads += 1
        }
        reads
      }
    }
    Await.result(writer, 5.minutes)
    val counts = Await.result(Future.sequence(readers), 5.minutes)
    pool.shutdown()
    assert(counts.forall(_ > 0), s"readers must have exercised the race: $counts")
    assert(t.lookupKeyRows(5L).head.getAs[Long]("rev") == 6L)
  }

  // ---- compact() append-only rebase (commitRebasing) -------------------
  // Deterministic protocol-level cases: the "rewrite output" is the planned
  // head's own dir list (a no-op compact), so each case interleaves real
  // commits between plan and CAS without racing threads.

  test("rebase: interleaved appends are carried forward verbatim onto the rewrite") {
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("rebase-").resolve("t"), "t")
    t.overwrite((0L until 50L).map(k => (k, "base")).toDF("id", "v"))
    val planned = t.log.latest().get
    val out = planned.dataDirs.map(d => d -> planned.dirRecords(d))
    t.append((100L until 110L).map(k => (k, "a1")).toDF("id", "v"))
    t.append((200L until 205L).map(k => (k, "a2")).toDF("id", "v"))
    val head = t.log.latest().get
    val snap = t.commitRebasing(planned, "compact", planned.schemaJson,
      out, Map.empty, Map.empty, None)
    assert(snap.snapshotId == head.snapshotId + 1)
    assert(snap.parentId.contains(head.snapshotId),
      "the rebased commit must extend the NEW head, not the planned one")
    val extras = head.dataDirs.filterNot(planned.dataDirs.toSet)
    assert(extras.nonEmpty && extras.forall(snap.dataDirs.contains),
      s"interleaved append dirs must ride the rebased commit: $extras")
    assert(snap.summary("records").toLong == 65L)
    assert(t.read().count() == 65L)
  }

  test("rebase: an interleaved MOR delta commit stays pending over the compacted base") {
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("rebase-mor-").resolve("t"), "t")
    t.overwrite((0L until 40L).map(k => (k, "base")).toDF("id", "v"))
    val planned = t.log.latest().get
    val out = planned.dataDirs.map(d => d -> planned.dirRecords(d))
    t.upsertDeferred((0L until 5L).map(k => (k, "upd")).toDF("id", "v"), "id")
    val head = t.log.latest().get
    val snap = t.commitRebasing(planned, "compact", planned.schemaJson,
      out, Map.empty, Map.empty, None)
    assert(snap.deltaDirs == head.deltaDirs,
      "the interleaved delta must carry forward as the pending chain")
    assert(snap.summary("mor_key") == "id")
    assert(snap.summary("pending_deltas") == "1")
    // Resolution over the rebased head: base at seq 0, carried delta above
    // it — exactly the rank order the rows had before the compact.
    val rows = t.read().filter(col("id") < 5L).select("v").collect()
    assert(rows.length == 5 && rows.forall(_.getString(0) == "upd"))
    assert(t.read().count() == 40L)
  }

  test("rebase (chain-preserving): minor-compaction shape keeps the FULL pending chain") {
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("rebase-mc-").resolve("t"), "t")
    t.overwriteBucketed((0L until 40L).map(k => (k, "base")).toDF("id", "v"), "id", 2)
    t.upsertDeferred((0L until 5L).map(k => (k, "upd")).toDF("id", "v"), "id")
    val planned = t.log.latest().get
    t.append((100L until 103L).map(k => (k, "app")).toDF("id", "v")) // joins chain
    val head = t.log.latest().get
    assert(head.deltaDirs.size > planned.deltaDirs.size,
      "the append must have joined the chain")
    val out = planned.dataDirs.map(d => d -> planned.dirRecords(d))
    val snap = t.commitRebasing(planned, "compact_minor", planned.schemaJson,
      out, Map.empty, Map.empty, None, keepPendingDeltas = true)
    // Minor compaction never resolves the chain: planned's OWN pending
    // delta AND the interleaved append-joined dirs all stay pending.
    assert(snap.deltaDirs == head.deltaDirs)
    assert(snap.summary("pending_deltas") == head.deltaDirs.size.toString)
    assert(snap.summary("records").toLong == 40L)
    val r = t.read()
    assert(r.count() == 43L)
    assert(r.filter(col("id") < 5L).select("v").collect()
      .forall(_.getString(0) == "upd"))
  }

  test("compactSmallDirs folds under a pending chain and recomputes totals") {
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("mc-fold-").resolve("t"), "t")
    t.overwriteBucketed((0L until 40L).map(k => (k, "base")).toDF("id", "v"), "id", 2)
    t.upsertDeferred((0L until 5L).map(k => (k, "upd")).toDF("id", "v"), "id")
    t.upsertDeferred((0L until 3L).map(k => (k, "upd2")).toDF("id", "v"), "id")
    val chainBefore = t.log.latest().get.deltaDirs
    val snap = t.compactSmallDirs(maxRows = 1L << 20)
    assert(snap.isDefined && snap.get.operation == "compact_minor")
    assert(snap.get.deltaDirs == chainBefore, "minor fold must not touch the chain")
    assert(snap.get.summary("mor_key") == "id")
    assert(snap.get.dataDirs.size <= 2, "small bucket dirs folded")
    val r = t.read()
    assert(r.count() == 40L)
    assert(r.filter(col("id") < 3L).select("v").collect()
      .forall(_.getString(0) == "upd2"))
  }

  test("rebase: a non-append interleaving (rewrite) refuses — the output is stale") {
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("rebase-no-").resolve("t"), "t")
    t.overwrite((0L until 30L).map(k => (k, "base")).toDF("id", "v"))
    val planned = t.log.latest().get
    val out = planned.dataDirs.map(d => d -> planned.dirRecords(d))
    // COW upsert REPLACES the data dirs the rewrite consumed.
    t.upsert((0L until 3L).map(k => (k, "cow")).toDF("id", "v"), "id")
    assertThrows[graft.log.CommitConflictException] {
      t.commitRebasing(planned, "compact", planned.schemaJson,
        out, Map.empty, Map.empty, None)
    }
  }

  test("rebase: an interleaved schema evolution refuses — the rewrite's schema is stale") {
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("rebase-ev-").resolve("t"), "t")
    t.overwrite((0L until 30L).map(k => (k, "base")).toDF("id", "v"))
    val planned = t.log.latest().get
    val out = planned.dataDirs.map(d => d -> planned.dirRecords(d))
    t.append((100L until 103L).map(k => (k, "a", 7L)).toDF("id", "v", "extra"))
    assertThrows[graft.log.CommitConflictException] {
      t.commitRebasing(planned, "compact", planned.schemaJson,
        out, Map.empty, Map.empty, None)
    }
  }

  test("compact lands under racing appenders: append-only rebase, zero lost rows") {
    import spark.implicits._
    val t = new GraftTable(spark, TestSpark.tmpDir("rebase-race-").resolve("t"), "t")
    val base = (0L until 60000L).map(k => (k, s"v$k")).toDF("id", "v")
    t.overwriteBucketed(base, "id", 8)
    (1 to 4).foreach { i =>
      t.upsertDeferred((0L until 4000L).map(k => (k * 8, s"u$i")).toDF("id", "v"), "id")
    }
    val planned = t.log.latest().get.snapshotId
    // The appender starts on compact's FIRST Spark job — after compact read
    // its head, seconds before its commit — so its batches interleave
    // between plan and CAS and the rebase path is genuinely exercised.
    val started = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        started.countDown()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pool = Executors.newFixedThreadPool(1)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val compactF = Future { t.compact() }
      assert(started.await(120, java.util.concurrent.TimeUnit.SECONDS))
      val t2 = new GraftTable(spark, t.root, "t")
      var appended = 0L
      while (!compactF.isCompleted) {
        val lo = 1000000L + appended
        t2.append((lo until lo + 100L).map(k => (k, "app")).toDF("id", "v"))
        appended += 100L
      }
      val compactSnap = Await.result(compactF, 5.minutes)
      pool.shutdown()
      assert(compactSnap.operation == "compact")
      // The RESOLVED chain is folded; interleaved appends joined the chain
      // (deltas were pending when they landed) and legitimately carry
      // forward as the new pending suffix — disjoint from what was folded.
      val foldedChain = t.log.get(planned).get.deltaDirs.toSet
      assert(compactSnap.deltaDirs.forall(d => !foldedChain.contains(d)),
        "compact must fold every chain dir it resolved")
      assert(compactSnap.parentId.exists(_ > planned),
        "at least one append must have interleaved (rebase exercised)")
      val fin = new GraftTable(spark, t.root, "t")
      assert(fin.read().count() == 60000L + appended, "zero lost rows")
      val r = fin.read().filter(col("id") === 0L).select("v").collect()
      assert(r.map(_.getString(0)).toSeq == Seq("u4"),
        "compacted resolution must keep the chain's final image")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
