package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Diagnostic main for the end-to-end CDC merge-on-read wave (the one
 * weak bench number in round 9: 21.4k rows/s end-to-end while the bare
 * table-level deferred append does 127k). Replicates the bench's MOR
 * wave loop with `-Dgraft.mor.diag=true` phase instrumentation so the
 * per-batch body cost is attributable to a NAMED stage:
 * dedup (cache materialize + in-batch dedup), write (align + delta
 * parquet), commit (manifest) — plus body-minus-phases = everything
 * else in the foreachBatch body (isEmpty probe, repartition planning).
 */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional context pollution (-Dgraft.morprobe.pollute=true): run the
    // bench's heavy headline/curation entries first, same as the real bench
    // ordering, to test whether their leftover cached blocks are what slows
    // the MOR section down.
    if (sys.props.get("graft.morprobe.pollute").contains("true") ||
        sys.env.get("MORPROBE_POLLUTE").contains("true")) {
      for (q <- Seq("d_minhash_pairs", "e_cosine_topk", "d_cluster_cc",
          "x_line_dedup"); _ <- 0 until 3)
        SparkEntry.queries(q)(spark, sfDir).count()
      println("polluted: cached RDDs = " +
        spark.sparkContext.getPersistentRDDs.size)
    }

    import org.apache.spark.sql.types._
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val ev = graft.queries.Q.events(spark, sfDir)
    val img = struct(col("event_id"),
      graft.plans.TimestampMicrosExprs.wallMicros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    def envOf(rows: org.apache.spark.sql.DataFrame, op: String, tsOff: Int) =
      rows.select(to_json(struct(struct(lit(null).cast(rowSchema).as("before"),
        img.as("after"), lit(op).as("op"),
        (col("event_id") * 10 + tsOff).as("ts_ms")).as("payload")))
        .as("value"))
    val inDir = Files.createTempDirectory("morprobe-").resolve("in")
    envOf(ev, "c", 0).repartition(8).write.mode("overwrite").text(inDir.toString)
    val cat = new graft.catalog.GraftCatalog(spark,
      Files.createTempDirectory("morprobe-wh-"))
    val target = cat.createTable("cdc_bench", rowSchema,
      bucketBy = Some(("event_id", 16)))
    val ckpt = Files.createTempDirectory("morprobe-ckpt-").toString
    val q = graft.cdc.CdcPipeline.start(spark, inDir.toString, rowSchema, target,
      "event_id", ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      maxFilesPerTrigger = 8, mergeOnRead = true,
      decodeParallelism = cpus.toInt)
    sys.props("graft.cdc.trace") = "true"
    sys.props("graft.mor.diag") = "true"
    graft.cdc.CdcPipeline.traces = Vector.empty
    try {
      q.processAllAvailable()
      val nWave = ev.count()
      def oneWave(i: Int): Double = {
        val stage = Files.createTempDirectory(s"morprobe-stage-$i-")
        envOf(ev.withColumn("value", col("value") + 10 + i), "u", i + 1)
          .repartition(1).write.mode("overwrite").text(stage.toString)
        val part = {
          val parts = java.nio.file.Files.list(stage)
          try parts.filter(p => p.getFileName.toString.startsWith("part-"))
            .findFirst().get()
          finally parts.close()
        }
        val t0 = System.nanoTime()
        java.nio.file.Files.move(part, inDir.resolve(s"wave$i.json"))
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      oneWave(7) // update-shaped warm-up, as in the bench
      val waves = (0 until 5).map(oneWave)
      println(s"rows=$nWave")
      println(waves.map(w => f"$w%.3f").mkString("waves: ", " ", ""))
      graft.cdc.CdcPipeline.traces.foreach { t =>
        val ph = t.phases.map(_.map { case (n, s) => f"$n=$s%.3f" }.mkString(" "))
          .getOrElse("-")
        println(f"batch=${t.batchId} body=${t.bodySec}%.3f gc=${t.gcSec}%.3f $ph")
      }
      println(f"throughput=${nWave / (waves.sorted.apply(2))}%.0f rows/s")
    } finally {
      q.stop()
      sys.props.remove("graft.cdc.trace")
      sys.props.remove("graft.mor.diag")
    }
    spark.stop()
  }
}
