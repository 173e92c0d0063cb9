package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.GraftTable

/**
 * The `graft-changes` Structured-Streaming source ([[graft.streaming.ChangeFeedSource]]).
 * The `t_feed_stream` gate hash-checks one streamed change set against
 * DuckDB; this spec asserts what a value check cannot see: batches land on
 * commit boundaries and stay incremental (no window is ever re-planned),
 * a checkpointed restart resumes without duplicating or dropping commits
 * even under `startingVersion=latest`, and replaying the stream through a
 * real sink reconstructs the table.
 */
class ChangeFeedStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def fresh(prefix: String) =
    new GraftTable(spark, TestSpark.tmpDir(prefix).resolve("t"), "t",
      gcGraceMs = 0L)

  private def feedStream(t: GraftTable, startingVersion: String): DataFrame =
    spark.readStream.format("graft-changes")
      .option("path", t.root.toString)
      .option("pk", "o_orderkey")
      .option("startingVersion", startingVersion)
      .load()

  private def sortedRows(df: DataFrame) =
    df.orderBy("_commit_version", "_change_type", "o_orderkey").collect().toSeq

  test("micro-batches follow commits incrementally and match the batch feed") {
    val t = fresh("feed-stream-")
    t.overwrite(orders.filter(col("o_orderkey") <= 1000)) // v1
    val sink = s"feed_inc_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = feedStream(t, startingVersion = "1").writeStream
      .format("memory").queryName(sink).start()
    try {
      q.processAllAvailable() // head == start → empty batch set
      assert(spark.table(sink).count() === 0)

      t.append(orders.filter(col("o_orderkey") > 1000 && col("o_orderkey") <= 1200)) // v2
      q.processAllAvailable()
      val afterV2 = spark.table(sink).collect().length
      assert(sortedRows(spark.table(sink)) ===
        sortedRows(t.changesBetween(1, 2, "o_orderkey")))

      t.upsert(orders.filter(col("o_orderkey") % 400 === 0)
        .withColumn("o_orderstatus", lit("X")), "o_orderkey") // v3
      t.deleteKeys(orders.filter(col("o_orderkey") % 500 === 0)
        .select("o_orderkey"), "o_orderkey") // v4
      q.processAllAvailable()
      // the second tick appended exactly (2, 4] — nothing was re-planned
      assert(sortedRows(spark.table(sink)) ===
        sortedRows(t.changesBetween(1, 4, "o_orderkey")))
      assert(spark.table(sink).count() > afterV2)
      // every streamed row carries its commit; boundaries are commit ids
      assert(spark.table(sink).select("_commit_version").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L, 4L))
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }

  test("checkpointed restart resumes after the stopped offset, no dup no drop") {
    val t = fresh("feed-restart-")
    t.overwrite(orders.filter(col("o_orderkey") <= 1000)) // v1
    val ckpt = TestSpark.tmpDir("feed-ckpt-").toString
    val outDir = TestSpark.tmpDir("feed-out-").resolve("rows").toString

    def run(): Unit = {
      val q = feedStream(t, startingVersion = "latest").writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    run() // pins `latest` = v1; consumes nothing
    // The pin must live INSIDE the checkpoint (metadataPath arrives as a
    // "file:/..." URI — resolved via java.nio it would strand under the
    // driver's cwd and a restart elsewhere would lose it).
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(ckpt, "sources", "0", "graft-start-version")),
      s"start-version pin not in checkpoint $ckpt")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get("file:")),
      "URI-shaped junk dir created under the working directory")
    t.append(orders.filter(col("o_orderkey") > 1000 && col("o_orderkey") <= 1200)) // v2
    t.append(orders.filter(col("o_orderkey") > 1200 && col("o_orderkey") <= 1300)) // v3
    run() // consumes (1, 3]
    t.append(orders.filter(col("o_orderkey") > 1300 && col("o_orderkey") <= 1350)) // v4
    run() // consumes (3, 4]

    val got = spark.read.parquet(outDir)
    // `latest` pinned at FIRST start (head == v1): everything after v1,
    // exactly once, across two restarts
    assert(sortedRows(got) === sortedRows(t.changesBetween(1, 4, "o_orderkey")))
  }

  test("startingVersion=latest skips retained history before the stream") {
    val t = fresh("feed-latest-")
    t.overwrite(orders.filter(col("o_orderkey") <= 500)) // v1
    t.append(orders.filter(col("o_orderkey") > 500 && col("o_orderkey") <= 600)) // v2
    val sink = s"feed_latest_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = feedStream(t, startingVersion = "latest").writeStream
      .format("memory").queryName(sink).start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 0) // history before start invisible
      t.append(orders.filter(col("o_orderkey") > 600 && col("o_orderkey") <= 650)) // v3
      q.processAllAvailable()
      assert(sortedRows(spark.table(sink)) ===
        sortedRows(t.changesBetween(2, 3, "o_orderkey")))
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }

  test("foreachBatch replay through the stream reconstructs the table") {
    val t = fresh("feed-replay-")
    t.overwrite(orders.filter(col("o_orderkey") <= 800)) // v1
    val replicaRoot = TestSpark.tmpDir("feed-replica-").resolve("r")
    val replica = new GraftTable(spark, replicaRoot, "r", gcGraceMs = 0L)
    replica.overwrite(t.read()) // seed at the stream's start version

    val q = feedStream(t, startingVersion = "1").writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // signed replay: upsert post-images, delete deleted keys —
        // batchKey makes a retried micro-batch idempotent
        val dels = batch.filter(col("_change_type") === "delete")
          .select("o_orderkey")
        val ups = batch.filter(col("_change_type").isin("insert", "update_post"))
          .drop("_change_type", "_commit_version")
        if (!ups.isEmpty) replica.upsert(ups, "o_orderkey",
          batchKey = Some(s"replay-up-$id"))
        if (!dels.isEmpty) replica.deleteKeys(dels, "o_orderkey")
        ()
      }.start()
    try {
      t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1), "o_orderkey") // v2
      q.processAllAvailable()
      t.deleteKeys(orders.filter(col("o_orderkey") % 7 === 0)
        .select("o_orderkey"), "o_orderkey") // v3
      q.processAllAvailable()
      val want = t.read().orderBy("o_orderkey").collect().toSeq
      val have = replica.read().orderBy("o_orderkey").collect().toSeq
      assert(have === want)
    } finally q.stop()
  }

  test("maintainStream keeps a materialized aggregate continuously fresh") {
    import graft.table.MaterializedAgg
    // decimal sums: incremental folds and one-pass recomputes must agree
    // bit-for-bit (double addition is order-sensitive)
    val o = orders.withColumn("price_d",
      col("o_totalprice").cast("decimal(18,2)"))
    val t = fresh("feed-mv-")
    t.overwrite(o.filter(col("o_orderkey") <= 600)) // v1
    val mv = new MaterializedAgg(t, "by_status", "o_orderkey",
      Seq("o_orderstatus"), Seq("price_d"))
    mv.create()
    val ckpt = TestSpark.tmpDir("mv-ckpt-").toString

    def viewRows() = mv.read()
      .select(col("o_orderstatus"), col("cnt"),
        col("price_d_sum").cast("decimal(28,2)"))
      .orderBy("o_orderstatus").collect().toSeq
    def expectRows() = t.read().groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("price_d").cast("decimal(28,2)").as("price_d_sum"))
      .orderBy("o_orderstatus").collect().toSeq

    val q = mv.maintainStream(ckpt)
    try {
      t.append(o.filter(col("o_orderkey") > 600 && col("o_orderkey") <= 800)) // v2
      q.processAllAvailable()
      assert(viewRows() === expectRows())
      assert(mv.refreshedVersion === 2)
      t.upsert(o.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("Z")), "o_orderkey") // v3
      t.deleteKeys(o.filter(col("o_orderkey") % 9 === 0)
        .select("o_orderkey"), "o_orderkey") // v4
      q.processAllAvailable()
      assert(viewRows() === expectRows())
      assert(mv.refreshedVersion === 4)
    } finally q.stop()

    // restart after more commits: picks up from the reflected version
    t.append(o.filter(col("o_orderkey") > 800 && col("o_orderkey") <= 900)) // v5
    val q2 = mv.maintainStream(ckpt)
    try {
      q2.processAllAvailable()
      assert(viewRows() === expectRows())
      assert(mv.refreshedVersion === 5)
    } finally q2.stop()
  }

  test("source schema is the head schema plus the two feed columns") {
    val t = fresh("feed-schema-")
    t.overwrite(orders.limit(10))
    val df = feedStream(t, startingVersion = "0")
    assert(df.schema.fieldNames.toSeq ===
      t.schema.fieldNames.toSeq ++ Seq("_change_type", "_commit_version"))
    assert(df.isStreaming)
  }
}
