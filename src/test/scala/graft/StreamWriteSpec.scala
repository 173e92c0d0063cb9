package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ConnectorQueries
import graft.table.GraftTable

/**
 * The v2 streaming append sink: `df.writeStream.toTable("lake.t")` —
 * epoch-staged executor parquet writes committed through the table's
 * idempotent batch keys ([[graft.connector.GraftStreamingAppend]]).
 * Exactly-once is the same mechanism CdcPipeline relies on: one batch key
 * per epoch, replays return the committed head.
 */
class StreamWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshCat(): (String, java.nio.file.Path) = {
    val cat = ConnectorQueries.tempCatalog(spark)
    (cat, java.nio.file.Paths.get(
      spark.conf.get(s"spark.sql.catalog.$cat.warehouse")))
  }

  test("writeStream.toTable appends micro-batches into a bucketed table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ev (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    val in = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sw-").toString
    val q = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt)
      .toTable(s"$cat.ev")
    try {
      in.addData((1L, "a"), (2L, "b"), (3L, "c"))
      q.processAllAvailable()
      assert(spark.table(s"$cat.ev").count() == 3)
      in.addData((4L, "d"), (5L, "e"))
      q.processAllAvailable()
      val got = spark.table(s"$cat.ev").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
      // Bucketed layout held: every data dir is a bucket leaf, so keyed
      // reads stay pruned and SPJ claims stay valid.
      val t = new GraftTable(spark, wh.resolve("ev"), "ev")
      val head = t.log.latest().get
      assert(head.dataDirs.forall(_.contains("__bucket=")),
        head.dataDirs.mkString(", "))
      assert(head.operation == "append")
      // Epoch commits carry idempotent batch keys.
      assert(head.batchKey.exists(_.startsWith("stream-")), head.batchKey)
      // A keyed lookup through the pruned serving path sees streamed rows.
      assert(t.lookupKeyRows(4L).map(_.getString(1)) == Seq("d"))
    } finally q.stop()
  }

  test("streamed bucket files are key-sorted (the scan's ordering claim holds)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.srt (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(2, id))")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sw4-").toString)
      .toTable(s"$cat.srt")
    try {
      // Deliberately reverse-ordered batch: without the write's required
      // (bucket, key) ordering the file would land in arrival order and
      // the single-file-bucket ordering report would be a LIE under an
      // elided sort-merge-join sort.
      in.addData((20L to 1L by -1).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val t = new GraftTable(spark, wh.resolve("srt"), "srt")
    val dirs = t.log.latest().get.dataDirs
    assert(dirs.nonEmpty && dirs.forall(_.contains("__bucket=")))
    dirs.foreach { rel =>
      val files = Option(wh.resolve("srt").resolve(rel).toFile.listFiles())
        .map(_.filter(_.getName.endsWith(".parquet"))).getOrElse(Array.empty)
      files.foreach { f =>
        val ids = spark.read.parquet(f.toString)
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(ids == ids.sorted, s"$rel/${f.getName} not key-sorted: $ids")
      }
    }
  }

  test("restart with the same checkpoint does not duplicate committed epochs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ev2 (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(2, id))")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sw2-").toString
    val in = MemoryStream[(Long, String)]
    val q1 = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt).toTable(s"$cat.ev2")
    try {
      in.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.table(s"$cat.ev2").count() == 2)
    // Second run, same checkpoint: committed offsets are not re-run, new
    // data lands once.
    val q2 = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt).toTable(s"$cat.ev2")
    try {
      in.addData((3L, "c"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.table(s"$cat.ev2").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("staged-dir prune keeps only committed attempts' files") {
    // A zombie attempt's complete-looking file and a mid-write partial
    // both sit in the staged dir; only the committed attempt's survives.
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-")
    val leaf = dir.resolve("__bucket=0")
    java.nio.file.Files.createDirectories(leaf)
    val good = leaf.resolve("part-0-1.snappy.parquet")
    val zombie = leaf.resolve("part-0-7.snappy.parquet")
    val partial = leaf.resolve("part-1-9.snappy.parquet")
    Seq(good, zombie, partial).foreach(p =>
      java.nio.file.Files.write(p, Array[Byte](1, 2, 3)))
    graft.connector.GraftStagedDir.pruneToCommitted(dir.toString,
      spark.sessionState.newHadoopConf(),
      Array(graft.connector.GraftReplaceMessage(3L, Seq(good.toString))))
    assert(java.nio.file.Files.exists(good))
    assert(!java.nio.file.Files.exists(zombie))
    assert(!java.nio.file.Files.exists(partial))
  }

  test("readStream.table streams the initial snapshot then appends only") {
    import spark.implicits._
    val (cat, wh) = freshCat()
    val t0 = new graft.catalog.GraftCatalog(spark, wh).materialized("rs")
    t0.overwriteBucketed(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id", 2)
    val q = spark.readStream.table(s"$cat.rs")
      .writeStream.format("memory").queryName("rs_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-rs-").toString)
      .start()
    try {
      q.processAllAvailable()
      // Initial snapshot: the whole table as of stream start.
      assert(spark.table("rs_sink").count() == 2)
      // Appends stream incrementally.
      t0.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"))
      q.processAllAvailable()
      val got = spark.table("rs_sink").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      // A rewrite commit refuses the stream loudly instead of silently
      // re-emitting rewritten rows.
      t0.upsert(Seq((1L, "A")).toDF("id", "v"), "id")
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(x: Throwable): String =
        if (x == null) "" else x.getMessage + " | " + msgs(x.getCause)
      assert(msgs(e).contains("graft-changes") || msgs(e).contains("upsert"),
        msgs(e).take(300))
    } finally q.stop()
  }

  test("expired parent mid-stream fails loudly instead of re-emitting the table") {
    import spark.implicits._
    val (cat, wh) = freshCat()
    val t = new graft.catalog.GraftCatalog(spark, wh).materialized("exp")
    t.overwriteBucketed(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id", 2) // v1
    val ckpt = TestSpark.tmpDir("graft-exp-ckpt-").toString
    val outDir = TestSpark.tmpDir("graft-exp-out-").resolve("rows").toString
    def run(): Unit = {
      val q = spark.readStream.table(s"$cat.exp").writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // initial snapshot (v1); checkpointed offset = 1
    t.append(Seq((3L, "c")).toDF("id", "v")) // v2
    t.append(Seq((4L, "d")).toDF("id", "v")) // v3
    t.append(Seq((5L, "e")).toDF("id", "v")) // v4
    // Retention expires v1 — v2's PARENT — while v2..v4 stay in the window.
    // With no parent dirs to diff against, the "appended" set would
    // degenerate to v2's full cumulative dataDirs and silently re-emit the
    // whole table as appends; the source must throw instead.
    assert(t.expireSnapshots(3) == 1)
    val e = intercept[Exception] { run() }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + " | " + msgs(x.getCause)
    assert(msgs(e).contains("expired mid-stream"), msgs(e).take(400))
    assert(spark.read.parquet(outDir).count() == 2,
      "nothing beyond the initial snapshot may have been emitted")
  }

  test("streaming read-write loop: readStream.table into writeStream.toTable") {
    import spark.implicits._
    val (cat, wh) = freshCat()
    val c = new graft.catalog.GraftCatalog(spark, wh)
    val src = c.materialized("loop_src")
    src.overwriteBucketed(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"), "id", 2)
    spark.sql(s"CREATE TABLE $cat.loop_dst (id BIGINT, x DOUBLE) " +
      "PARTITIONED BY (bucket(2, id))")
    val q = spark.readStream.table(s"$cat.loop_src")
      .withColumn("x", col("x") * 2)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-loop-").toString)
      .toTable(s"$cat.loop_dst")
    try {
      q.processAllAvailable()
      src.append(Seq((3L, 30.0)).toDF("id", "x"))
      q.processAllAvailable()
      val got = spark.table(s"$cat.loop_dst").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((1L, 20.0), (2L, 40.0), (3L, 60.0)))
    } finally q.stop()
  }

  test("complete output mode refuses loudly (append-only sink)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.agg (v STRING, n BIGINT)")
    val in = MemoryStream[(Long, String)]
    val counts = in.toDF().toDF("id", "v").groupBy("v")
      .agg(count(lit(1)).as("n"))
    val e = intercept[Exception] {
      val q = counts.writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-sw3-").toString)
        .outputMode("complete").toTable(s"$cat.agg")
      try { in.addData((1L, "a")); q.processAllAvailable() } finally q.stop()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("append mode only") ||
      msgs(e).toLowerCase.contains("complete"), msgs(e).take(300))
  }
}
