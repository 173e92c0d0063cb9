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
    names.foreach { name =>
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
