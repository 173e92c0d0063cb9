package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.GraftTable

/**
 * Per-dir bloom skipping index ([[GraftTable.buildBloomIndex]] /
 * [[GraftTable.readPoint]]). The `t_bloom_point` gate hash-checks one
 * equality read against DuckDB; this spec asserts what a value check
 * cannot see — the index actually PRUNES (readPoint plans a strict dir
 * subset), never lies (uncovered dirs are always read; pruned answers
 * equal unpruned on every probed key), refresh covers new dirs without
 * re-reading covered ones, and pending MOR deltas resolve on top of the
 * pruned base.
 */
class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def fresh(prefix: String) =
    new GraftTable(spark, TestSpark.tmpDir(prefix).resolve("t"), "t",
      gcGraceMs = 0L)

  private def dirsScanned(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.map(f => f.split('/').takeRight(2).head).toSet

  test("point read equals the full filter and plans a strict dir subset") {
    val t = fresh("bloom-")
    // four dirs, each a disjoint custkey slice → a point probe should
    // touch ~one dir once the index is built
    (0 until 4).foreach { i =>
      val slice = orders.filter(col("o_custkey") % 4 === i)
      if (i == 0) t.overwrite(slice) else t.append(slice)
    }
    val indexed = t.buildBloomIndex("o_custkey")
    assert(indexed === 4)
    assert(t.bloomIndexedColumns === Seq("o_custkey"))

    val keys = orders.select("o_custkey").distinct().limit(8)
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      val pruned = t.readPoint("o_custkey", k)
      val full = t.read().filter(col("o_custkey") === k)
      assert(pruned.orderBy("o_orderkey").collect().toSeq ===
        full.orderBy("o_orderkey").collect().toSeq, s"key $k diverged")
      // o_custkey is not the layout key, so min/max stats cannot prune the
      // interleaved slices — any pruning here is the bloom's
      assert(dirsScanned(pruned).size < dirsScanned(full).size,
        s"key $k: expected bloom pruning, scanned ${dirsScanned(pruned)}")
    }
  }

  test("uncovered dirs are always read; refresh covers them incrementally") {
    val t = fresh("bloom-refresh-")
    t.overwrite(orders.filter(col("o_custkey") % 2 === 0))
    assert(t.buildBloomIndex("o_custkey") === 1)
    // new dir lands AFTER the build — uncovered, must still be read
    t.append(orders.filter(col("o_custkey") % 2 === 1))
    val k = orders.filter(col("o_custkey") % 2 === 1)
      .select("o_custkey").head.getLong(0)
    val got = t.readPoint("o_custkey", k)
    assert(got.count() ===
      t.read().filter(col("o_custkey") === k).count())
    // refresh indexes ONLY the new dir; covered dirs are not re-read
    assert(t.refreshBloomIndex("o_custkey") === 1)
    assert(t.refreshBloomIndex("o_custkey") === 0) // idempotent
    val after = t.readPoint("o_custkey", k)
    assert(after.orderBy("o_orderkey").collect().toSeq ===
      got.orderBy("o_orderkey").collect().toSeq)
  }

  test("a probe for an absent value scans no data dirs at all") {
    val t = fresh("bloom-absent-")
    t.overwrite(orders.filter(col("o_custkey") % 4 === 1))
    t.append(orders.filter(col("o_custkey") % 4 === 2))
    t.buildBloomIndex("o_custkey")
    // custkey ≡ 0 mod 4 exists in the corpus but not in this table; with
    // every dir bloomed the read should plan zero files (fpp permitting —
    // at two dirs and 1% fpp a false positive here is ~never)
    val absent = orders.filter(col("o_custkey") % 4 === 0)
      .select("o_custkey").head.getLong(0)
    val got = t.readPoint("o_custkey", absent)
    assert(got.count() === 0)
    assert(got.inputFiles.isEmpty,
      s"expected full prune, scanned ${got.inputFiles.toSeq}")
  }

  test("serving readPointRows equals the distributed read, jobs-free steady-state") {
    val t = fresh("bloom-serve-")
    (0 until 4).foreach { i =>
      val slice = orders.filter(col("o_custkey") % 4 === i)
      if (i == 0) t.overwrite(slice) else t.append(slice)
    }
    t.buildBloomIndex("o_custkey")
    val keys = orders.select("o_custkey").distinct().limit(6)
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      val rows = t.readPointRows("o_custkey", k)
      val want = t.readPoint("o_custkey", k).collect().toSeq
      assert(rows.sortBy(_.getLong(0)) === want.sortBy(_.getLong(0)), s"key $k")
      // rows come back schema'd (serving contract — getAs by name works)
      assert(rows.head.getAs[Long]("o_custkey") === k)
    }
    // absent value: in-memory bloom veto, empty without touching data
    assert(t.readPointRows("o_custkey", -42L).isEmpty)
    // steady state is jobs-free (suites run sequentially in the forked
    // test JVM, so the app-wide job counter is ours): the earlier calls
    // above warmed the bloom-sidecar cache and the footer caches, so this
    // call must not plan any Spark job at all
    def jobCount(): Int = {
      Thread.sleep(500) // let the async status listener drain
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    }
    val before = jobCount()
    t.readPointRows("o_custkey", keys.head)
    assert(jobCount() === before,
      "serving point read must launch no Spark jobs")
  }

  test("pending MOR deltas resolve on top of the bloom-pruned base") {
    val t = fresh("bloom-mor-")
    t.overwriteBucketed(orders.filter(col("o_orderkey") <= 1000), "o_orderkey", 4)
    t.buildBloomIndex("o_custkey")
    val k = orders.filter(col("o_orderkey") <= 1000)
      .select("o_custkey").head.getLong(0)
    val before = t.readPoint("o_custkey", k).count()
    // deferred upsert: move one NEW order onto custkey k, retag an
    // existing order of k away — both only visible through delta resolution
    val moved = orders.filter(col("o_orderkey") > 1000).limit(1)
      .withColumn("o_custkey", lit(k))
    val away = t.read().filter(col("o_custkey") === k).limit(1)
      .withColumn("o_custkey", lit(-1L))
    t.upsertDeferred(moved.unionByName(away), "o_orderkey")
    val got = t.readPoint("o_custkey", k)
    val want = t.read().filter(col("o_custkey") === k)
    assert(got.orderBy("o_orderkey").collect().toSeq ===
      want.orderBy("o_orderkey").collect().toSeq)
    assert(got.count() === before) // one in, one out
  }
}
