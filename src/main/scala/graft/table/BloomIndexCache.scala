package graft.table

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/**
 * Driver-side cache of a table's bloom sidecar, for the SERVING point-read
 * path ([[GraftTable.readPointRows]]): the distributed probe job is the
 * right shape for a query, but a serving endpoint wants zero jobs per
 * call. Loading pays ONE small job per sidecar VERSION (keyed by the
 * sidecar's file listing — names, sizes, mtimes — so a
 * [[GraftTable.refreshBloomIndex]] append invalidates naturally); every
 * probe after that is an in-memory `mightContainLong`.
 *
 * Budget-gated like every serving path: a sidecar bigger than the byte
 * budget is not cached (callers keep the distributed probe), bounding
 * driver heap to a few cached sidecars of at most `budget` bytes each.
 */
private[table] object BloomIndexCache {
  private val MaxEntries = 8
  private val cache = new java.util.LinkedHashMap[
      String, Map[String, BloomFilter]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, Map[String, BloomFilter]]): Boolean =
      size() > MaxEntries
  }

  def bloomsFor(spark: SparkSession, sidecar: Path,
      budgetBytes: Long): Option[Map[String, BloomFilter]] = {
    if (!Files.isDirectory(sidecar)) return None
    val listing = {
      val s = Files.list(sidecar)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, Files.size(p),
          Files.getLastModifiedTime(p).toMillis))
        .toSeq.sortBy(_._1)
      finally s.close()
    }
    if (listing.isEmpty || listing.map(_._2).sum > budgetBytes) return None
    val key = sidecar.toAbsolutePath.toString + "@" +
      listing.map { case (n, sz, mt) => s"$n:$sz:$mt" }.mkString("|").hashCode
    cache.synchronized(Option(cache.get(key))) match {
      case Some(m) => Some(m)
      case None =>
        // one small job; the sidecar is O(dirs) narrow rows
        val loaded = spark.read.parquet(sidecar.toString)
          .select("dir", "bloom").collect()
          .map(r => r.getString(0) -> BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))))
          .toMap
        cache.synchronized(cache.put(key, loaded))
        Some(loaded)
    }
  }
}
