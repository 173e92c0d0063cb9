package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{GraftTable, MaterializedAgg}

/**
 * Change feed + incremental materialized aggregates. The gates
 * (`t_changes_feed`, `t_changes_mor`, `t_mv_refresh`) hash-check specific
 * change sets against DuckDB; this spec asserts the structural properties a
 * value check cannot see — replaying the feed reconstructs the table across
 * MIXED histories (COW and MOR), layout-only commits emit nothing, expired
 * windows fail loudly, and the incremental view always equals a full
 * recompute.
 */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  private def fresh(prefix: String, retain: Int = 100) =
    new GraftTable(spark, TestSpark.tmpDir(prefix).resolve("t"), "t",
      retainVersions = retain, gcGraceMs = 0L)

  /** Fold the per-commit feed onto `start`: remove update_pre/delete keys,
    * add insert/update_post images — the consumer-side replay contract. */
  private def replay(t: GraftTable, from: Long, to: Long, pk: String,
      start: DataFrame): DataFrame =
    (from + 1 to to).foldLeft(start) { (state, v) =>
      val ch = t.changesBetween(v - 1, v, pk)
      val out = ch.filter(col("_change_type").isin("update_pre", "delete"))
        .select(col(pk)).distinct()
      val in = ch.filter(col("_change_type").isin("insert", "update_post"))
        .drop("_change_type", "_commit_version")
      state.join(out, Seq(pk), "left_anti")
        .unionByName(in, allowMissingColumns = true)
    }

  private def rowsOf(df: DataFrame): Set[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).toSet
  }

  test("replaying the feed reconstructs a mixed COW history") {
    val t = fresh("cf-cow-")
    val k = col("o_orderkey")
    t.overwrite(orders.filter(k <= 600)) // v1
    t.append(orders.filter(k > 600 && k <= 900)) // v2
    t.upsert(orders.filter(k <= 900 && k % 3 === 0)
      .withColumn("o_orderpriority", lit("X")), "o_orderkey") // v3
    t.compact() // v4 — layout only
    t.deleteKeys(orders.filter(k % 10 === 0).select("o_orderkey"), "o_orderkey") // v5
    val got = replay(t, 1, t.latestVersion, "o_orderkey", t.readAsOf(1))
    assert(rowsOf(got) == rowsOf(t.read()))
    assert(t.read().count() > 0)
  }

  test("replaying the feed reconstructs a MOR history with tombstones") {
    val t = fresh("cf-mor-")
    val k = col("o_orderkey")
    t.overwriteBucketed(orders.filter(k <= 800), "o_orderkey", 4) // v1
    t.upsertDeferred(orders.filter(k <= 1000 && k % 4 === 0)
      .withColumn("o_totalprice", lit(1.0)), "o_orderkey") // v2: upd + ins
    t.upsertDeferred(orders.filter(k % 20 === 0)
      .withColumn("__a", lit("d")), "o_orderkey", opCol = Some("__a")) // v3: deletes
    // v4: an append landing ON the pending chain — it rides the chain and
    // supersedes same-key images (keys ≤ 800 collide with the base; the
    // rest are new), so the feed must classify it as a keyed batch
    t.append(orders.filter(k >= 700 && k < 1100)
      .withColumn("o_orderpriority", lit("LATE")))
    t.compact() // v5 — folds the chain, emits nothing
    val got = replay(t, 1, t.latestVersion, "o_orderkey", t.readAsOf(1))
    assert(rowsOf(got) == rowsOf(t.read()))
  }

  test("compact and cluster emit zero changes; feed across them still works") {
    val t = fresh("cf-layout-")
    t.overwrite(orders.limit(400))
    t.append(orders.filter(col("o_orderkey") > 1199 && col("o_orderkey") <= 1299))
    t.compact()
    t.cluster(Seq("o_orderkey"), 4)
    val v = t.latestVersion
    assert(t.changesBetween(v - 2, v, "o_orderkey").count() == 0)
    // the cross-layout window (before compact → head) carries the append
    assert(t.changesBetween(1, v, "o_orderkey")
      .filter(col("_change_type") === "insert").count() == 100)
  }

  test("feed across expired history throws; bad windows throw") {
    val t = fresh("cf-exp-", retain = 2)
    t.overwrite(orders.limit(50))
    for (i <- 1 to 4) t.append(orders.filter(col("o_orderkey") === i))
    intercept[IllegalStateException] { t.changesBetween(1, t.latestVersion, "o_orderkey").count() }
    intercept[NoSuchElementException] { t.changesBetween(1, 99, "o_orderkey") }
    // pk must match the MOR merge key on delta commits
    val m = fresh("cf-pk-")
    m.overwrite(orders.limit(50))
    m.upsertDeferred(orders.limit(10), "o_orderkey")
    intercept[IllegalArgumentException] { m.changesSince(1, "o_custkey") }
  }

  test("MOR feed pre-image scan is bucket-pruned to the delta keys' buckets") {
    val t = fresh("cf-prune-")
    t.overwriteBucketed(orders, "o_orderkey", 8) // v1: 8 bucket dirs
    t.upsertDeferred(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_totalprice", lit(1.0)), "o_orderkey") // v2: one key
    val ch = t.changesSince(1, "o_orderkey")
    // the parent (v1) base files in the plan must be ONLY the key's bucket
    val baseBuckets = ch.inputFiles.filter(_.contains("/data/s1-"))
      .flatMap(f => "__bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1)))
      .toSet
    assert(baseBuckets.size == 1, s"expected one pruned bucket, got " +
      s"$baseBuckets from ${ch.inputFiles.mkString("\n")}")
    // and the pruned feed still answers exactly
    assert(ch.filter(col("_change_type") === "update_pre").count() == 1)
    assert(ch.filter(col("_change_type") === "update_post")
      .head.getDouble(3) == 1.0)
  }

  test("feed works on a branch handle (log-driven end to end)") {
    val t = fresh("cf-branch-")
    t.overwrite(orders.limit(100))
    t.createBranch("b")
    val b = t.branch("b")
    b.append(orders.filter(col("o_orderkey") > 1199 && col("o_orderkey") <= 1219))
    val ch = b.changesSince(1, "o_orderkey")
    assert(ch.count() == 20 &&
      ch.select("_change_type").distinct().head.getString(0) == "insert")
    assert(t.changesSince(1, "o_orderkey").count() == 0) // main saw nothing
  }

  // ------------------------------------------------ materialized aggregate

  private def mvOn(t: GraftTable): MaterializedAgg =
    new MaterializedAgg(t, "m", "o_orderkey", Seq("o_orderstatus"),
      Seq("o_custkey"))

  private def recomputed(t: GraftTable): DataFrame =
    t.read().groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), sum(col("o_custkey")).as("o_custkey_sum"))

  test("incremental refresh equals full recompute across mixed ops") {
    val t = fresh("mv-eq-")
    val k = col("o_orderkey")
    t.overwrite(orders.filter(k <= 700))
    val mv = mvOn(t)
    mv.create()
    t.append(orders.filter(k > 700 && k <= 1100))
    mv.refresh() // insert-only window
    assert(rowsOf(mv.read()) == rowsOf(recomputed(t)))
    t.upsert(orders.filter(k <= 1100 && k % 3 === 0)
      .withColumn("o_custkey", col("o_custkey") + 1000), "o_orderkey")
    t.deleteKeys(orders.filter(k % 7 === 0).select("o_orderkey"), "o_orderkey")
    mv.refresh() // mixed multi-commit window
    assert(rowsOf(mv.read()) == rowsOf(recomputed(t)))
    assert(mv.refreshedVersion == t.latestVersion)
  }

  test("MOR windows and status-moving updates maintain the right groups") {
    val t = fresh("mv-mor-")
    val k = col("o_orderkey")
    t.overwriteBucketed(orders.filter(k <= 900), "o_orderkey", 4)
    val mv = mvOn(t)
    mv.create()
    // updates that MOVE rows between groups (status flip) — the fold must
    // subtract from the old group and add to the new one
    t.upsertDeferred(orders.filter(k <= 900 && k % 5 === 0)
      .withColumn("o_orderstatus", lit("Z")), "o_orderkey")
    t.upsertDeferred(orders.filter(k % 30 === 0).withColumn("__a", lit("d")),
      "o_orderkey", opCol = Some("__a"))
    mv.refresh()
    assert(rowsOf(mv.read()) == rowsOf(recomputed(t)))
    assert(mv.read().filter(col("o_orderstatus") === "Z").head.getLong(1) > 0)
  }

  test("a group whose count reaches zero is dropped from the view") {
    import spark.implicits._
    val t = fresh("mv-zero-")
    t.overwrite(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("o_orderkey", "o_orderstatus", "o_custkey"))
    val mv = mvOn(t)
    mv.create()
    t.deleteKeys(Seq(3L).toDF("o_orderkey"), "o_orderkey")
    mv.refresh()
    assert(mv.read().filter(col("o_orderstatus") === "b").count() == 0)
    assert(mv.read().filter(col("o_orderstatus") === "a").head.getLong(1) == 2L)
  }

  test("NULL group values are maintained as their own group") {
    import spark.implicits._
    val t = fresh("mv-null-")
    t.overwrite(Seq((1L, Option("a"), 1L), (2L, Option.empty[String], 2L),
      (3L, Option.empty[String], 3L)).toDF("o_orderkey", "o_orderstatus", "o_custkey"))
    val mv = mvOn(t)
    mv.create()
    t.append(Seq((4L, Option.empty[String], 4L))
      .toDF("o_orderkey", "o_orderstatus", "o_custkey"))
    t.deleteKeys(Seq(2L).toDF("o_orderkey"), "o_orderkey")
    mv.refresh()
    val nullRow = mv.read().filter(col("o_orderstatus").isNull).head
    assert(nullRow.getLong(1) == 2L && nullRow.getLong(2) == 7L)
    assert(rowsOf(mv.read()) == rowsOf(recomputed(t)))
  }

  test("refresh is idempotent and crash-safe; expiry falls back to recompute") {
    val t = fresh("mv-idem-", retain = 2)
    t.overwrite(orders.limit(200))
    val mv = mvOn(t)
    mv.create()
    t.append(orders.filter(col("o_orderkey") > 1400))
    val s1 = mv.refresh()
    val s2 = mv.refresh() // no base movement → no-op, same snapshot
    assert(s1.snapshotId == s2.snapshotId)
    // burn through retention so the incremental window is gone
    for (i <- 1 to 4) t.append(orders.filter(col("o_orderkey") === i))
    t.expireSnapshots(1)
    val s3 = mv.refresh() // falls back to full recompute, still exact
    assert(s3.operation == "overwrite")
    assert(rowsOf(mv.read()) == rowsOf(recomputed(t)))
  }

  test("continuous aggregate: streaming ticks are exactly-once end to end") {
    import spark.implicits._
    // The foreachBatch body of a continuously-maintained aggregate is pure
    // composition: idempotent ingest (batchKey) + crash-idempotent refresh
    // (mv_base_version rides the view's own commit). Whatever prefix of
    // the tick survived a crash, the replay converges — no new machinery.
    val t = fresh("mv-stream-")
    t.overwrite(Seq((0L, "a", 0L)).toDF("o_orderkey", "o_orderstatus", "o_custkey"))
    val mv = mvOn(t)
    mv.create()
    def tick(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      t.append(batch, batchKey = Some(s"cagg-$id")); mv.refresh(); ()
    }
    val b0 = Seq((1L, "a", 5L), (2L, "b", 7L))
      .toDF("o_orderkey", "o_orderstatus", "o_custkey")
    tick(b0, 0)
    val want = rowsOf(recomputed(t))
    tick(b0, 0) // full replay after everything committed — both halves no-op
    assert(rowsOf(mv.read()) == want)
    // crash BETWEEN ingest and refresh: the append committed, refresh lost
    val b1 = Seq((3L, "b", 9L)).toDF("o_orderkey", "o_orderstatus", "o_custkey")
    t.append(b1, batchKey = Some("cagg-1")) // first attempt died here
    tick(b1, 1) // the streaming retry
    assert(rowsOf(mv.read()) == rowsOf(recomputed(t)))
    assert(mv.read().filter(col("o_orderstatus") === "b").head.getLong(1) == 2L)
  }

  test("views reopen by name from the persisted spec") {
    val t = fresh("mv-spec-")
    t.overwrite(orders.limit(100))
    val mv = new MaterializedAgg(t, "by_status", "o_orderkey",
      Seq("o_orderstatus"), Seq("o_custkey"))
    mv.create()
    t.append(orders.filter(col("o_orderkey") > 1300 && col("o_orderkey") <= 1349))
    val reopened = MaterializedAgg.of(t, "by_status")
    reopened.refresh()
    assert(rowsOf(reopened.read()) == rowsOf(recomputed(t)))
    assert(MaterializedAgg.list(t) == Seq("by_status"))
    intercept[NoSuchElementException] { MaterializedAgg.of(t, "nope") }
  }
}
