package graft

// Isolated A/B of the cold-open compose costs at the 10^6-dir regime:
// parse (parallel shard load) vs the three merge passes, and sequential
// vs concurrent execution of the two map merges. Pure data-structure
// timing — no Spark, no probe noise. Run:
//   sbt "Test/runMain graft.ComposeBench"
object ComposeBench {
  def main(args: Array[String]): Unit = {
    import graft.log.{SnapshotDetail, SnapshotLog}
    val n = 1000000
    val k = 16
    val per = (n + k - 1) / k
    val dirs = (0 until n).map(i => s"data/f$i/__bucket=${i % 1024}")
    val shards = dirs.grouped(per).map { slice =>
      SnapshotDetail(slice,
        dirRecords = slice.map(_ -> 1000L).toMap,
        dirStats = slice.map(d => d -> Map(
          "event_id:min" -> "9000000000", "event_id:max" -> "9000000999")).toMap)
    }.toSeq
    val shardBytes = shards.map(d => SnapshotLog.writeDetailBytes(d))
    println(f"n=$n shards=$k bytes=${shardBytes.map(_.length.toLong).sum / 1e6}%.0f MB")
    def ms(body: => Unit): Double = {
      val s0 = System.nanoTime(); body; (System.nanoTime() - s0) / 1e6
    }
    val removed = Set.empty[String]
    def merged[V](parts: Seq[Map[String, V]]): Map[String, V] = {
      val b = scala.collection.immutable.HashMap.newBuilder[String, V]
      parts.foreach(_.foreach(kv => if (!removed(kv._1)) b += kv))
      b.result()
    }
    for (rep <- 1 to 4) {
      // parse: sequential vs parallel over shards
      val seqParse = ms { shardBytes.foreach(SnapshotLog.parseDetailBytes) }
      var segs: Seq[SnapshotDetail] = null
      val parParse = ms {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
        try segs = shardBytes.map(b => pool.submit(
          new java.util.concurrent.Callable[SnapshotDetail] {
            override def call() = SnapshotLog.parseDetailBytes(b)
          })).map(_.get())
        finally pool.shutdown()
      }
      // the OLD compose: eager HashMap rebuilds (what readManifest did
      // before round 17 — kept as the A/B reference)
      val mergedMs = ms {
        merged(segs.map(_.dirRecords)); merged(segs.map(_.dirStats))
      }
      // the NEW compose: arraycopy dir concat + O(1) layered maps
      var recsL: Map[String, Long] = null
      val layerMs = ms {
        val partsD = segs.map(_.dataDirs)
        val total = partsD.iterator.map(_.size).sum
        val arr = new Array[String](total)
        var off = 0
        partsD.foreach { s => s.copyToArray(arr, off); off += s.size }
        recsL = new graft.log.ConcatDirMap[Long](
          segs.map(_.dirRecords).toIndexedSeq)
        new graft.log.ConcatDirMap[Map[String, String]](
          segs.map(_.dirStats).toIndexedSeq)
      }
      // first point `get` forces the combined index once per instance
      val forceMs = ms { recsL.get(dirs(n / 2)) }
      val warmGetMs = ms { var i = 0; while (i < 1000) { recsL(dirs(i)); i += 1 } }
      val iterMs = ms { recsL.values.sum }
      println(f"rep=$rep parseSeq=$seqParse%.0f parsePar=$parParse%.0f | " +
        f"oldMerges=$mergedMs%.0f newLayered=$layerMs%.0f " +
        f"indexForce=$forceMs%.0f warmGet1k=$warmGetMs%.2f iterSum=$iterMs%.0f ms")
    }
  }
}
