package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.log.{DirDelta, SnapshotLog}

/**
 * Property tests for the snapshot-log compose paths: after EVERY commit in
 * a random sequence of shapes (append / partial rewrite / MOR delta join /
 * compact-style fold / rollback re-add), a WARM log instance — whose reads
 * flow through the incremental head-change compose, the one-slot tip
 * cache, the segment cache, and the segmented/sharded encoders — must see
 * byte-for-byte the same snapshot a FRESH instance composes from disk via
 * the full segment fold. This machine-checks the compose algebra
 * (parent.filterNot(newlyRemoved) ++ ownAdded ≡ full fold) across
 * interleavings the unit cases don't enumerate, including chains that
 * cross the fold/segment-cap boundary and hinted/unhinted encoders mixed.
 */
object LogComposeProps extends Properties("SnapshotLog.compose") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private sealed trait Op
  private case class Append(n: Int, hinted: Boolean) extends Op
  private case class Rewrite(dropEvery: Int, n: Int) extends Op
  private case class MorDelta(n: Int) extends Op
  private case object Fold extends Op
  private case object RollbackReAdd extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.zip(Gen.chooseNum(1, 4), Gen.oneOf(true, false))
      .map { case (n, h) => Append(n, h) },
    3 -> Gen.zip(Gen.chooseNum(2, 5), Gen.chooseNum(0, 3))
      .map { case (d, n) => Rewrite(d, n) },
    2 -> Gen.chooseNum(1, 2).map(MorDelta(_)),
    1 -> Gen.const(Fold),
    1 -> Gen.const(RollbackReAdd))

  property("warm incremental reads equal fresh full composes, every step") =
    Prop.forAll(Gen.listOfN(14, opGen)) { ops =>
      val root = TestSpark.tmpDir("logprops-").resolve("t")
      val warm = new SnapshotLog(root)
      var nextId = 0
      def fresh(k: Int): Seq[String] = {
        val out = (nextId until nextId + k)
          .map(i => f"data/g$i%05d/__bucket=${i % 4}")
        nextId += k
        out
      }
      val dirs0 = fresh(6)
      warm.commit("create", "{}", dirs0,
        dirRecords = dirs0.map(_ -> 2L).toMap,
        dirStats = dirs0.map(d => d -> Map("k:min" -> "0")).toMap)
      warm.latest().get.dataDirsByBucket // materialize for the index carry
      var removedEver = List.empty[String]
      val checks = ops.map { op =>
        val head = warm.latest().get
        op match {
          case Append(n, hinted) =>
            val add = fresh(n)
            warm.commitExpecting(Some(head.snapshotId), "append", "{}",
              head.dataDirs ++ add,
              dirRecords = head.dirRecords ++ add.map(_ -> 2L),
              dirStats = head.dirStats ++ add.map(d => d -> Map("k:min" -> "1")),
              deltaDirs = head.deltaDirs,
              deltaHint = if (hinted) Some(DirDelta(add)) else None)
          case Rewrite(dropEvery, n) =>
            val gone = head.dataDirs.zipWithIndex
              .collect { case (d, i) if i % dropEvery == 0 => d }
              .take(head.dataDirs.size - 1) // never drop every dir
            removedEver = gone.toList ++ removedEver
            val add = fresh(n)
            val kept = head.dataDirs.filterNot(gone.toSet)
            warm.commitExpecting(Some(head.snapshotId), "upsert", "{}",
              kept ++ add,
              dirRecords = (head.dirRecords -- gone) ++ add.map(_ -> 3L),
              dirStats = (head.dirStats -- gone) ++
                add.map(d => d -> Map("k:min" -> "2")),
              deltaDirs = head.deltaDirs)
          case MorDelta(n) =>
            warm.commitExpecting(Some(head.snapshotId), "upsert-deferred",
              "{}", head.dataDirs, dirRecords = head.dirRecords,
              dirStats = head.dirStats,
              deltaDirs = head.deltaDirs ++ (0 until n)
                .map(i => s"data/delta-${head.snapshotId}-$i"),
              deltaHint = Some(DirDelta(Seq.empty)))
          case Fold =>
            // compact shape: all-new dirs, delta chain resolved
            val add = fresh(2)
            removedEver = head.dataDirs.toList ++ removedEver
            warm.commitExpecting(Some(head.snapshotId), "compact", "{}", add,
              dirRecords = add.map(_ -> 9L).toMap,
              dirStats = add.map(d => d -> Map("k:min" -> "3")).toMap)
          case RollbackReAdd =>
            removedEver.headOption match {
              case None => // nothing ever removed: no-op append
                val add = fresh(1)
                warm.commitExpecting(Some(head.snapshotId), "append", "{}",
                  head.dataDirs ++ add,
                  dirRecords = head.dirRecords ++ add.map(_ -> 2L),
                  deltaDirs = head.deltaDirs)
              case Some(re) =>
                removedEver = removedEver.tail
                warm.commitExpecting(Some(head.snapshotId), "rollback", "{}",
                  (head.dataDirs :+ re).distinct,
                  dirRecords = head.dirRecords + (re -> 2L),
                  dirStats = head.dirStats,
                  deltaDirs = head.deltaDirs)
            }
        }
        val w = warm.latest().get
        // Shared parse caches would otherwise hand the fresh instance the
        // warm composition itself — clear so "fresh full compose" means it.
        SnapshotLog.clearSharedCaches()
        val f = new SnapshotLog(root).latest().get
        val ok = w.dataDirs == f.dataDirs &&
          w.dirRecords == f.dirRecords && w.dirStats == f.dirStats &&
          w.deltaDirs == f.deltaDirs &&
          w.dataDirsByBucket == f.dataDirsByBucket
        if (!ok) println(s"MISMATCH after $op:\n warm=$w\n fresh=$f")
        ok
      }
      checks.forall(identity) :| s"ops=$ops"
    }
}
