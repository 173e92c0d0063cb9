package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.GraftTable

/**
 * Serving point-lookup latency diagnostic, mirroring Bench's lookup
 * section (same table shape, same warm-up discipline). Prints four wave
 * series in ms:
 *
 *  - `cold`: first lookup per timed bucket (pays footer + metadata)
 *  - `warm`: same keys again (footer/dir caches hot) — the code floor
 *  - `nofilter`: warm, stats predicate off — what the predicate costs
 *  - `freshcold`: ten never-touched buckets late in JVM life — per-bucket
 *    cold cost with JIT warm (flat series = I/O+metadata, decaying = JIT)
 *
 * Set `-Dgraft.lookup.debug=true` for per-phase breakdowns (listDir /
 * filePlan / readConf / init / decode) from [[graft.table.LocalPointRead]].
 */
object LookupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("li_id", col("l_orderkey") * 10 + col("l_linenumber"))
    val t = new GraftTable(spark,
      Files.createTempDirectory("probe-lkp-").resolve("t"), "t")
    t.overwriteBucketed(li, "li_id", 32)
    val keys = li.select("li_id").orderBy("li_id").limit(400)
      .collect().map(_.getLong(0))
    val timedKeys = Seq(keys(100), keys(200), keys(300))
    def bucketOf(k: Long): Int = graft.plans.BucketHash.bucketId(
      k, org.apache.spark.sql.types.LongType, 32, "UTC")
    val timedBuckets = timedKeys.map(bucketOf).toSet
    val warmKeys = keys.iterator.filterNot(timedKeys.contains)
      .filter(k => !timedBuckets.contains(bucketOf(k))).take(3).toSeq
    warmKeys.foreach(k => t.lookupKeyRows(k))
    def wave(k: Long): Double = {
      val t0 = System.nanoTime()
      val n = t.lookupKeyRows(k).size
      val ms = (System.nanoTime() - t0) / 1e6
      require(n > 0, s"lookup key $k must exist")
      ms
    }
    def fmt(ws: Seq[Double]): String = ws.map(m => f"$m%.1f").mkString(",")
    val cold = timedKeys.map(wave)
    val warm = timedKeys.map(wave)
    sys.props(graft.table.LocalPointRead.StatsFilterProp) = "false"
    val nofilter = timedKeys.map(wave)
    sys.props.remove(graft.table.LocalPointRead.StatsFilterProp)
    val seen = scala.collection.mutable.Set.empty[Int] ++=
      (timedKeys ++ warmKeys).map(bucketOf)
    val freshKeys = keys.filter { k =>
      val b = bucketOf(k)
      if (seen.contains(b)) false else { seen += b; true }
    }.take(10)
    val freshCold = freshKeys.map(wave).toSeq
    println(s"PROBE cold=${fmt(cold)} warm=${fmt(warm)} " +
      s"nofilter=${fmt(nofilter)} freshcold=${fmt(freshCold)}")
    spark.stop()
  }
}
