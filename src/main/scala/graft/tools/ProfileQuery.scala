package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Drill-down profiler for one SparkEntry query: runs it `waves` times
  * (count() action, matching the bench methodology) and prints per-stage
  * task-time / shuffle-bytes aggregates for the LAST wave, so the hot stage
  * of a warm execution is visible without the UI.
  *
  * Usage: runMain graft.tools.ProfileQuery <name> [waves]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val waves = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, tasks: Int, taskTimeMs: Long, shufReadMB: Double,
        shufWriteMB: Double, inputMB: Double, gcMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = sc.stageInfo
          val m = i.taskMetrics
          stages.add(St(
            i.name.linesIterator.next().take(120), i.numTasks,
            m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6,
            m.jvmGCTime))
        }
    })

    val fn = graft.SparkEntry.queries(name)
    (0 until waves).foreach { w =>
      if (w == waves - 1) { stages.clear(); record = true }
      spark.sparkContext.setJobDescription(s"$name wave $w")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name wave $w: $dt%.3f s (rows=$n)")
    }
    record = false
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    println(f"[profile] last-wave stages (${stages.size()}):")
    stages.asScala.toSeq.sortBy(-_.taskTimeMs).foreach { s =>
      println(f"  taskTime=${s.taskTimeMs}%6d ms  gc=${s.gcMs}%4d  tasks=${s.tasks}%3d  " +
        f"in=${s.inputMB}%8.2f MB  sr=${s.shufReadMB}%8.2f MB  sw=${s.shufWriteMB}%8.2f MB  ${s.name}")
    }
    spark.stop()
  }
}
