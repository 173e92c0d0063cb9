package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.GraftTable

/** Manifest-level min/max data skipping (readRange + dirStats). */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  test("range read prunes append dirs by manifest min/max; results match a full filter") {
    val t = new GraftTable(spark, TestSpark.tmpDir("stats-").resolve("t"), "t")
    // three appends with disjoint key ranges — the time-series commit shape
    t.overwrite(orders.filter(col("o_orderkey") < 500))
    t.append(orders.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1000))
    t.append(orders.filter(col("o_orderkey") >= 1000))
    val head = t.log.latest().get
    assert(head.dataDirs.size == 3)
    assert(head.dirStats.size == 3, s"every dir must carry stats: ${head.dirStats.keySet}")
    assert(head.dirStats(head.dataDirs.head).contains("o_orderkey:min"))

    // a window inside the middle segment reads ONLY that dir's files
    val pruned = t.readRange("o_orderkey", 600L, 900L)
    val midDir = head.dataDirs(1)
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(_.contains(midDir.stripPrefix("data/"))),
      s"expected only $midDir, scanned ${pruned.inputFiles.toSeq}")
    val full = t.read().filter(col("o_orderkey") >= 600 && col("o_orderkey") <= 900)
    assert(pruned.collect().toSet == full.collect().toSet)

    // string column pruning: o_orderpriority spans all dirs → no skipping,
    // but results stay correct
    val s = t.readRange("o_orderpriority", "1-URGENT", "1-URGENT")
    assert(s.collect().toSet ==
      t.read().filter(col("o_orderpriority") === "1-URGENT").collect().toSet)

    // a window outside every dir reads nothing
    assert(t.readRange("o_orderkey", -100L, -1L).count() == 0)
  }

  test("stats survive bucketed partial rewrites and dirs without stats stay readable") {
    val t = new GraftTable(spark, TestSpark.tmpDir("stats-b-").resolve("t"), "t")
    t.overwriteBucketed(orders.filter(col("o_orderkey") < 3000), "o_orderkey", 4)
    val before = t.log.latest().get
    assert(before.dirStats.nonEmpty)
    // keyed upsert rewrites touched buckets; stats map follows the dirs
    val up = orders.filter(col("o_orderkey") === 42)
      .withColumn("o_comment", lit("changed"))
    t.upsert(up, "o_orderkey")
    val after = t.log.latest().get
    assert(after.dirStats.keySet == after.dataDirs.toSet,
      "every live dir must have stats after a partial rewrite")

    // simulate a pre-stats manifest: strip dirStats → readRange still
    // correct (skipping is an optimization, absence means read-everything)
    val logDir = t.root.resolve("_log")
    val paths = java.nio.file.Files.list(logDir)
    try paths.forEach { p =>
      // Detail documents (binary since round 17): strip stats via the
      // codec. Manifests stay JSON and carry no stats to strip.
      if (p.getFileName.toString.startsWith("d")) {
        val d = graft.log.SnapshotLog.parseDetailBytes(
          java.nio.file.Files.readAllBytes(p))
        java.nio.file.Files.write(p, graft.log.SnapshotLog.writeDetailBytes(
          d.copy(dirStats = Map.empty)))
      }
    } finally paths.close()
    // Out-of-band manifest surgery breaks the claim-once immutability the
    // head cache leans on — re-open the table like a fresh process would.
    // The caches are process-wide since round 17 (detail entries are
    // mtime-guarded, but the untouched MANIFEST's head slot still serves
    // the pre-surgery composition), so "fresh process" means clearing them.
    graft.log.SnapshotLog.clearSharedCaches()
    val t2 = new GraftTable(spark, t.root, "t")
    val head2 = t2.log.latest().get
    assert(head2.dirStats.isEmpty)
    val r = t2.readRange("o_orderkey", 100L, 200L)
    assert(r.collect().toSet ==
      t2.read().filter(col("o_orderkey") >= 100 && col("o_orderkey") <= 200).collect().toSet)
  }

  test("range read with pending MOR deltas resolves through the delta chain") {
    val t = new GraftTable(spark, TestSpark.tmpDir("stats-mor-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") < 1000))
    // deferred upsert: newer image for key 500 sits in an unresolved delta —
    // a stats-pruned raw-dir read would return the stale base row
    val up = orders.filter(col("o_orderkey") === 500)
      .withColumn("o_comment", lit("mor-updated"))
    t.upsertDeferred(up, "o_orderkey")
    val r = t.readRange("o_orderkey", 400L, 600L).collect()
    assert(r.length ==
      orders.filter(col("o_orderkey") >= 400 && col("o_orderkey") <= 600).count())
    val row500 = r.find(_.getAs[Long]("o_orderkey") == 500L).get
    assert(row500.getAs[String]("o_comment") == "mor-updated",
      "range read must see the delta image, not the stale base row")

    // Base-dir pruning stays ACTIVE under pending deltas (a pruned base dir
    // can hold no final in-window image: delta images always outrank base
    // and every delta dir is read) — a disjoint later base segment must not
    // be scanned for a window inside the first segment. Segments are laid
    // down BEFORE the delta: an append under pending deltas joins the delta
    // chain by design, so base dirs only exist pre-delta.
    val t2 = new GraftTable(spark, TestSpark.tmpDir("stats-mor2-").resolve("t"), "t")
    t2.overwrite(orders.filter(col("o_orderkey") < 1000))
    t2.append(orders.filter(col("o_orderkey") >= 1000))
    val dirsBefore = t2.log.latest().get.dataDirs
    t2.upsertDeferred(up, "o_orderkey")
    val pruned = t2.readRange("o_orderkey", 400L, 600L)
    val head = t2.log.latest().get
    assert(head.deltaDirs.nonEmpty, "the delta must still be pending")
    val lateDir = dirsBefore.last.stripPrefix("data/")
    assert(!pruned.inputFiles.exists(_.contains(lateDir)),
      s"out-of-window base dir $lateDir must be pruned under MOR")
    assert(head.deltaDirs.forall(d =>
      pruned.inputFiles.exists(_.contains(d.stripPrefix("data/")))),
      "every delta dir must be read under MOR pruning")
    val r2 = pruned.collect()
    assert(r2.length == r.length &&
      r2.find(_.getAs[Long]("o_orderkey") == 500L).get
        .getAs[String]("o_comment") == "mor-updated")
  }

  test("TIMESTAMP_NTZ range read prunes and coerces date-only string bounds") {
    // o_orderdate loads as TIMESTAMP_NTZ (parquet timestamp[ms] without
    // isAdjustedToUTC — the pandas/arrow default), so this exercises the
    // NTZ stats domain end to end: write → footer harvest → statBound →
    // prune → filter, with bounds arriving as serving-style strings.
    val t = new GraftTable(spark, TestSpark.tmpDir("stats-ntz-").resolve("t"), "t")
    assert(orders.schema("o_orderdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val cut = orders.select(min("o_orderdate")).head().getAs[java.time.LocalDateTime](0)
      .plusDays(30)
    t.overwrite(orders.filter(col("o_orderdate") <= lit(cut)))
    t.append(orders.filter(col("o_orderdate") > lit(cut)))
    val head = t.log.latest().get
    assert(head.dataDirs.forall(d =>
      head.dirStats.get(d).exists(_.contains("o_orderdate:min"))),
      s"every dir must carry NTZ stats, got ${head.dirStats}")
    val lo = graft.functions.Coerce.coerce("1970-01-01", orders.schema("o_orderdate").dataType)
    val hi = graft.functions.Coerce.coerce(cut.toString, orders.schema("o_orderdate").dataType)
    assert(lo.isInstanceOf[java.time.LocalDateTime] && hi == cut)
    val got = t.readRange("o_orderdate", lo, hi)
    // the early window lives entirely in the first dir — the second must prune
    assert(got.inputFiles.forall(_.contains(head.dataDirs.head.stripPrefix("data/"))),
      s"late dir must be pruned: ${got.inputFiles.toSeq}")
    assert(got.count() == orders.filter(col("o_orderdate") <= lit(cut)).count())
  }

  test("timestamp range read is correct (prunes only when micros stats exist)") {
    val t = new GraftTable(spark, TestSpark.tmpDir("stats-ts-").resolve("t"), "t")
    // Q.events now emits NTZ (gate parity); cast back to session-TZ
    // TimestampType so THIS test keeps covering the LTZ path — the one
    // whose footers the scoped outputTimestampType pin exists for.
    val ev = graft.queries.Q.events(spark, TestSpark.sf0001)
      .withColumn("ts", col("ts").cast("timestamp"))
    val cut = ev.select(min("ts")).head().getTimestamp(0)
    t.overwrite(ev.filter(col("ts") <= cut))
    t.append(ev.filter(col("ts") > cut))
    // The pruning must not be inert: with outputTimestampType pinned to
    // TIMESTAMP_MICROS the footers carry usable INT64 stats, so every dir's
    // manifest entry must record a ts min/max (INT96 output would leave
    // these absent and silently disable timestamp skipping).
    val head = t.log.latest().get
    assert(head.dataDirs.forall(d => head.dirStats.get(d).exists(_.contains("ts:min"))),
      s"every dir must carry ts stats, got ${head.dirStats}")
    val got = t.readRange("ts", new java.sql.Timestamp(0), cut)
    assert(got.collect().toSet == ev.filter(col("ts") <= cut).collect().toSet)
  }
}
