package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named SparkEntry queries to files —
  * the optimization rounds' evidence trail (`plans/r18/<name>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> [name1,name2,...]
  * (no names = the Bench headline + curation sets). Session config matches
  * Bench so the captured plan is the plan the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val defaults = Seq(
      "q1_pricing_summary", "q4_topk_orders", "q5_latest_per_user",
      "q8_semi_join", "q9_region_rollup",
      "d_minhash_pairs", "e_cosine_topk", "x_quality",
      "d_cluster_cc", "x_decontam", "x_chunks", "x_split", "x_repetition",
      "x_line_dedup", "x_url_canon", "x_pack", "x_oov",
      "d_dup_spans", "x_dsir_topk", "x_lm_topk", "j_asof", "j_interval")
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else defaults
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    def write(file: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$file.txt"), txt)
      println(s"[plandump] wrote $file")
    }
    // The CDC/upsert gate entries execute their DML eagerly and return the
    // final table read, so their MERGE plan shape is not visible from the
    // registry DataFrame. "cdcshapes" captures the shapes directly: the
    // envelope transform's dedup (window vs max_by) and the first-batch
    // merge with and without the empty-target fast path. Both variants are
    // produced by the CURRENT code (the flag selects the old shape), so the
    // before/after diff is exactly the change under claim.
    if (names.contains("cdcshapes")) {
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.functions._
      val rowSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts_us", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      val ev = graft.queries.Q.events(spark, sfDir)
      val img = struct(col("event_id"),
        graft.plans.TimestampMicrosExprs.wallMicros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      val raw = ev.select(to_json(struct(struct(
        lit(null).cast(rowSchema).as("before"), img.as("after"),
        lit("c").as("op"), (col("event_id") * 10).as("ts_ms")).as("payload")))
        .as("value"))
      val flat = graft.cdc.Envelope.flatten(
        graft.cdc.Envelope.decode(raw, rowSchema, wrappedHint = Some(true)),
        rowSchema, "event_id")
        .filter(col("event_id").isNotNull)
        .withColumn("__seq", monotonically_increasing_id())
      write("c_cdc_dedup_before",
        graft.dml.Merge.dedupLatest(flat, "event_id", "ts_ms", Some("__seq")))
      write("c_cdc_dedup_after",
        graft.dml.Merge.dedupLatestUnique(flat, "event_id", "ts_ms", "__seq"))
      val batch = graft.cdc.Envelope.transformBatch(raw, rowSchema, "event_id")
      val target = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(rowSchema.fields))
      write("c_cdc_merge_before", graft.dml.Merge.merge(target, batch,
        "event_id", opCol = Some("op"), broadcastUpdates = true,
        preDeduped = true, targetEmpty = false))
      write("c_cdc_merge_after", graft.dml.Merge.merge(target, batch,
        "event_id", opCol = Some("op"), broadcastUpdates = true,
        preDeduped = true, targetEmpty = true))
    }
    names.filterNot(_ == "cdcshapes").foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
