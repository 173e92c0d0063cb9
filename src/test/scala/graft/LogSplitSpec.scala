package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.GraftTable

/** Split-manifest format: O(1) manifest documents + O(dirs) side detail
  * files, legacy inline manifests still readable, side files expired with
  * their manifests. */
class LogSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  private def manifestSizes(t: GraftTable): Seq[Long] = {
    val paths = Files.list(t.root.resolve("_log"))
    try {
      import scala.jdk.CollectionConverters._
      paths.iterator().asScala.toSeq
        .filter(_.getFileName.toString.matches("v\\d{16}\\.json"))
        .map(Files.size(_))
    } finally paths.close()
  }

  test("manifest byte size stays O(1) as appended dirs accumulate") {
    val t = new GraftTable(spark, TestSpark.tmpDir("split-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") < 100))
    (1 to 4).foreach(i => t.append(orders
      .filter(col("o_orderkey") >= i * 100 && col("o_orderkey") < (i + 1) * 100)))
    val early = manifestSizes(t).max
    (5 to 30).foreach(i => t.append(orders
      .filter(col("o_orderkey") >= i * 100 && col("o_orderkey") < (i + 1) * 100)))
    val late = manifestSizes(t).max
    val head = t.log.latest().get
    assert(head.dataDirs.size == 31, s"expected 31 dirs, got ${head.dataDirs.size}")
    // 31 dirs vs 5: the manifest document must not have grown with them
    // (recentBatchKeys is empty here; only jitter like id digits differs).
    assert(late <= early * 3 / 2,
      s"manifest grew with dir count: $early -> $late bytes")
    // and the detail content is still fully served through the manifest
    // (empty appends legitimately carry no stats entry)
    assert(head.dirStats.nonEmpty &&
      head.dirStats.keySet.subsetOf(head.dataDirs.toSet))
    assert(t.read().count() == orders.filter(col("o_orderkey") < 3100).count())
  }

  test("legacy inline manifests (pre-split) read back unchanged") {
    val t = new GraftTable(spark, TestSpark.tmpDir("legacy-").resolve("t"), "t")
    t.overwrite(orders.filter(col("o_orderkey") < 500))
    val head = t.log.latest().get
    // rewrite the split manifest as the old single-document format
    import org.json4s.DefaultFormats
    import org.json4s.jackson.Serialization
    implicit val fmts: DefaultFormats.type = DefaultFormats
    val logDir = t.root.resolve("_log")
    val paths = Files.list(logDir)
    val (manifest, detail) =
      try {
        import scala.jdk.CollectionConverters._
        val all = paths.iterator().asScala.toSeq
        (all.find(_.getFileName.toString.matches("v\\d{16}\\.json")).get,
          all.find(_.getFileName.toString.startsWith("d")).get)
      } finally paths.close()
    Files.write(manifest, Serialization.write(head).getBytes("UTF-8"))
    Files.delete(detail)
    val reread = t.log.latest().get
    assert(reread == head, "inline manifest must inflate to the same snapshot")
    assert(t.read().count() == orders.filter(col("o_orderkey") < 500).count())
  }

  test("expired manifests take their detail files with them") {
    val t = new GraftTable(spark, TestSpark.tmpDir("split-gc-").resolve("t"),
      "t", retainVersions = 3, gcGraceMs = 0L)
    (0 to 7).foreach(i => t.overwrite(orders.filter(col("o_orderkey") % 8 === i)))
    val paths = Files.list(t.root.resolve("_log"))
    val names =
      try {
        import scala.jdk.CollectionConverters._
        paths.iterator().asScala.toSeq.map(_.getFileName.toString)
      } finally paths.close()
    val manifests = names.filter(_.matches("v\\d{16}\\.json"))
    val details = names.filter(_.matches("d\\d{16}-[0-9a-f]{8}\\.json"))
    assert(manifests.size == 3, s"retention: $manifests")
    assert(details.size == 3, s"side files must expire with manifests: $details")
  }
}
