package graft.table

import org.scalatest.funsuite.AnyFunSuite

/** Freezes the r18 post-commit pre-warm gate: warming footer/listing
  * caches after a commit is justified only when something is actually
  * point-SERVING from the table — an interleaved bench A/B showed
  * unconditional warming costing 10-17% of pure-ingest CDC throughput,
  * while a writer-only pipeline gains nothing from warm footers. The
  * gate is "a point lookup touched this root within
  * [[GraftTable.PrewarmServeWindowMs]]", tracked process-wide by
  * normalized table root so serving and ingest instances over the same
  * root see each other. */
class PrewarmGateSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("pre-warm gate: a table qualifies only after a recent point lookup") {
    import spark.implicits._
    val root = graft.TestSpark.tmpDir("pwg-").resolve("t")
    val t = new GraftTable(spark, root, "t")
    val key = root.toAbsolutePath.normalize.toString

    // A freshly written, never-served table must NOT qualify: its commits
    // run prewarm-free (the pure-ingest case the gate exists for).
    t.upsert(Seq((1, "a"), (2, "b")).toDF("id", "v"), "id")
    assert(!GraftTable.recentlyServed(key),
      "writer-only table must not be marked served")

    // Any of the serving entry points marks the root; a SEPARATE instance
    // over the same root (the ingest writer) then sees it.
    assert(t.lookupKeyRows(1).size == 1)
    assert(GraftTable.recentlyServed(key))
    val writer = new GraftTable(spark, root, "t")
    t.upsert(Seq((3, "c")).toDF("id", "v"), "id")
    assert(GraftTable.recentlyServed(
      writer.root.toAbsolutePath.normalize.toString))

    // The mark expires: a stale timestamp outside the window no longer
    // qualifies — long-idle tables drop back to prewarm-free commits.
    GraftTable.servedTables.put(key,
      System.currentTimeMillis() - GraftTable.PrewarmServeWindowMs - 1)
    assert(!GraftTable.recentlyServed(key), "stale serving mark must expire")
  }
}
