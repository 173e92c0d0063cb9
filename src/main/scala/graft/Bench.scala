package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/**
 * Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
 * prints ONE JSON line. Failures are reported explicitly per query (-1
 * timing + an `errors` entry) instead of masquerading as timings.
 *
 * Also reports `merge_rows_per_sec`: a 10%-of-table CDC-style upsert into a
 * bucketed table — the apples-to-apples number against the reference's
 * ~50k rows/sec merger claim (`OZONE_ARCHITECTURE.md:75`).
 */
object Bench {

  /** Headline subset: analytics, engine DML, CDC, LLM ops. */
  private val headline = Seq(
    "q1_pricing_summary", "q4_topk_orders", "q5_latest_per_user",
    "q8_semi_join", "q9_region_rollup",
    "t_upsert_bucketed", "c_cdc_batch",
    "d_minhash_pairs", "e_cosine_topk", "x_quality")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up the session (codegen, parquet footer caches, JIT) so the
    // first timed query isn't charged with one-time startup cost.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }
      name -> (if (errors.contains(name)) -1.0 else (System.nanoTime() - t0) / 1e9)
    }

    // CDC-merge throughput at the reference's batch size (~100k rows per
    // trigger, `cdc_merger_optimized.py:23`): keyed upsert into a bucketed
    // table of the full lineitem (600k rows at sf0.1).
    val mergeThroughput =
      try {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .withColumn("li_id", col("l_orderkey") * 10 + col("l_linenumber"))
        val t = new GraftTable(spark,
          Files.createTempDirectory("bench-wh-").resolve("t"), "t")
        t.overwriteBucketed(li, "li_id", 32)
        val batch = li.filter(col("l_orderkey") % 6 === 0)
          .withColumn("l_quantity", col("l_quantity") + 1)
        val nBatch = batch.count()
        val t0 = System.nanoTime()
        t.upsert(batch, "li_id")
        nBatch / ((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable => errors("merge_throughput") = e.toString.take(200); -1.0 }

    def jnum(d: Double): String = if (d.isNaN || d.isInfinite) "-1" else f"$d%.3f"
    val qs = results.map { case (k, v) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s"\"$k\":\"${v.replace("\\", "\\\\").replace("\"", "\\\"")}\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"errors":$errJson,"merge_rows_per_sec":${jnum(mergeThroughput)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
