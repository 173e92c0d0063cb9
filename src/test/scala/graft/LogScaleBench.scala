package graft

// Metadata-only timing at the 10^6-dir regime: commit-with-hint and the
// post-commit head re-read, with no Spark write in the way (the probe's
// append row folds a ~0.5 s constant parquet write into its number).
// Run: sbt "Test/runMain graft.LogScaleBench"
object LogScaleBench {
  def main(args: Array[String]): Unit = {
    import graft.log.{DirDelta, SnapshotLog}
    val root = java.nio.file.Files.createTempDirectory("logscale-").resolve("t")
    val log = new SnapshotLog(root)
    val n = 1000000
    val dirs = (0 until n).map(i => s"data/f$i/__bucket=${i % 1024}")
    val recs = dirs.map(_ -> 1000L).toMap
    val stats = dirs.map(d => d -> Map(
      "event_id:min" -> "9000000000", "event_id:max" -> "9000000999")).toMap
    def ms(tag: String)(body: => Unit): Unit = {
      val s0 = System.nanoTime(); body
      println(f"$tag%-24s ${(System.nanoTime() - s0) / 1e6}%.1f ms")
    }
    ms("seed commit (fold)") {
      log.commit("create", "{}", dirs, dirRecords = recs, dirStats = stats)
    }
    // Fresh instance = the probe's resident: cold compose once, then
    // hinted appends + head re-reads.
    val l2 = new SnapshotLog(root)
    SnapshotLog.clearSharedCaches() // cold = fresh-process, not fresh-instance
    ms("cold latest") { l2.latest() }
    // The v2 catalog's per-statement shape: a brand-new SnapshotLog per
    // query, served by the process-wide caches (round 17).
    ms("fresh-instance latest") { new SnapshotLog(root).latest() }
    ms("fresh-instance latest 2") { new SnapshotLog(root).latest() }
    for (i <- 1 to 5) {
      val head = l2.latest().get
      val add = Seq(s"data/extra$i/__bucket=${i % 1024}")
      ms(s"append commit $i") {
        l2.commitExpecting(Some(head.snapshotId), "append", "{}",
          head.dataDirs ++ add, head.summary, None,
          head.dirRecords ++ add.map(_ -> 1L), Seq.empty,
          head.dirStats ++ add.map(_ -> Map("event_id:min" -> "1",
            "event_id:max" -> "2")),
          deltaHint = Some(DirDelta(add)))
      }
      ms(s"head re-read $i") { l2.latest() }
    }
    // Resident-bytes pricing of the process-wide caches at the 10⁶-dir
    // regime (SURVEY cache-ceiling line): GC-settled used-heap diff
    // between cleared and populated shared caches. The absolute ceiling
    // is then (maxShared{Segment,Head}Dirs / measured dirs) × this
    // figure; the eviction test (LogSplitSpec) proves the clear-all +
    // re-fill behavior at the cap.
    def usedHeap(): Long = {
      val rt = Runtime.getRuntime
      (1 to 4).foreach { _ => System.gc(); Thread.sleep(150L) }
      rt.totalMemory - rt.freeMemory
    }
    SnapshotLog.clearSharedCaches()
    val base = usedHeap()
    new SnapshotLog(root).latest()
    val populated = usedHeap()
    SnapshotLog.clearSharedCaches()
    val cleared = usedHeap()
    println(f"shared-cache resident at ${n / 1000000}M dirs: " +
      f"populate=${(populated - base) / 1e6}%.1f MB " +
      f"freed-on-clear=${(populated - cleared) / 1e6}%.1f MB")
  }
}
