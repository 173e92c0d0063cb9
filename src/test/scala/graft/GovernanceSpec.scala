package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.CommitConflictException
import graft.table.GraftTable

/**
 * Governed writes: branches + write-audit-publish, tags, metadata-only
 * aggregates, and CHECK-constraint expectations with quarantine.
 *
 * The gates (`t_branch_wap`, `t_tag_read`, `t_meta_stats`,
 * `t_expect_split`) hash-check end-state VALUES against DuckDB; this spec
 * asserts what a value check cannot see — isolation between branch and
 * main, tag pinning through retention and expiry, the zero-data-I/O claim
 * of metadata stats (proved by deleting the data), fast-forward publish
 * semantics, and batch-idempotent quarantining.
 */
class GovernanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  private def fresh(prefix: String, retain: Int = 100, graceMs: Long = 0L) =
    new GraftTable(spark, TestSpark.tmpDir(prefix).resolve("t"), "t",
      retainVersions = retain, gcGraceMs = graceMs)

  // ------------------------------------------------------------- branches

  test("branch writes are invisible on main and vice versa until publish") {
    val t = fresh("gov-iso-")
    t.overwrite(orders.limit(100))
    t.createBranch("stage")
    val b = t.branch("stage")
    b.append(orders.limit(150).filter(col("o_orderkey") > 100))
    assert(t.read().count() == 100) // main untouched by the branch append
    // a main-side append is equally invisible on the branch
    t.append(orders.filter(col("o_orderkey") === 1)
      .withColumn("o_orderpriority", lit("MAIN-ONLY")))
    assert(b.read().filter(col("o_orderpriority") === "MAIN-ONLY").count() == 0)
  }

  test("publish is atomic fast-forward; main advancing makes it non-FF") {
    val t = fresh("gov-ff-")
    t.overwrite(orders.limit(100))
    t.createBranch("wap")
    t.branch("wap").upsert(
      orders.limit(100).withColumn("o_orderpriority", lit("AUDITED")),
      "o_orderkey")
    // main moved after branching → publish must refuse (silently dropping
    // the main commit is exactly the bug WAP exists to prevent)
    t.append(orders.filter(col("o_orderkey") === 9999))
    intercept[CommitConflictException] { t.publishBranch("wap") }
    assert(t.read().filter(col("o_orderpriority") === "AUDITED").count() == 0)
    // force is an explicit overwrite, recorded as such
    val snap = t.publishBranch("wap", force = true)
    assert(snap.operation == "publish")
    assert(snap.summary.get("publish_forced").contains("true"))
    assert(t.read().count() == 100 &&
      t.read().filter(col("o_orderpriority") === "AUDITED").count() == 100)
  }

  test("createBranch twice fails; branch of empty table fails") {
    val t = fresh("gov-dup-")
    t.overwrite(orders.limit(10))
    t.createBranch("b1")
    intercept[IllegalArgumentException] { t.createBranch("b1") }
    val empty = fresh("gov-empty-")
    intercept[IllegalArgumentException] { empty.createBranch("b") }
  }

  test("main expiry never reclaims dirs a live branch still reads") {
    val t = fresh("gov-bexp-")
    t.overwrite(orders.limit(200))
    t.createBranch("keep") // branch v1 references main v1's dir
    t.overwrite(orders.limit(50)) // main supersedes v1
    assert(t.expireSnapshots(1) == 1) // drops main v1
    // the dropped manifest's dir is still referenced by the branch → alive
    assert(t.branch("keep").read().count() == 200)
    assert(t.read().count() == 50)
  }

  test("dropBranch orphans its exclusive dirs; grace-gated sweep reclaims") {
    val t = fresh("gov-bdrop-")
    t.overwrite(orders.limit(100))
    t.createBranch("tmp")
    val b = t.branch("tmp")
    b.overwrite(orders.limit(30)) // branch-exclusive dir
    val bDir = t.root.resolve(b.log.latest().get.dataDirs.head)
    assert(Files.isDirectory(bDir))
    t.dropBranch("tmp")
    assert(t.branches().isEmpty)
    t.log.gcOrphanDataDirs() // gcGraceMs = 0 → immediate
    assert(!Files.exists(bDir))
    assert(t.read().count() == 100) // main's own dir untouched
  }

  test("branch carries pending MOR deltas; branch reads resolve them") {
    val t = fresh("gov-bmor-")
    val base = orders.filter(col("o_orderkey") <= 1000)
    t.overwriteBucketed(base, "o_orderkey", 4)
    val upd = base.filter(col("o_orderkey") <= 100)
      .withColumn("o_totalprice", lit(1.0))
    val nUpd = upd.count()
    t.upsertDeferred(upd, "o_orderkey")
    t.createBranch("mor")
    val b = t.branch("mor")
    assert(b.log.latest().get.deltaDirs.nonEmpty)
    assert(nUpd > 0 &&
      b.read().filter(col("o_totalprice") === 1.0).count() == nUpd)
    // branch-side compaction folds the chain without touching main's head
    b.compact()
    assert(b.log.latest().get.deltaDirs.isEmpty)
    assert(t.log.latest().get.deltaDirs.nonEmpty)
  }

  // ----------------------------------------------------------------- tags

  test("tag pins its manifest through retention and expiry; readTag exact") {
    val t = fresh("gov-tag-", retain = 3)
    t.overwrite(orders.limit(40))
    val tagged = t.createTag("release")
    for (i <- 1 to 6) t.overwrite(orders.limit(40 + i))
    // retention keeps only 3 manifests — plus the pinned tag
    assert(t.log.versions().contains(tagged))
    assert(t.readTag("release").count() == 40)
    // explicit expiry with reclaim also spares the tag and its data
    t.expireSnapshots(1)
    assert(t.readTag("release").count() == 40)
    assert(t.read().count() == 46)
  }

  test("tags are immutable: re-tagging needs dropTag; unknown tag throws") {
    val t = fresh("gov-tag2-")
    t.overwrite(orders.limit(10))
    t.createTag("v1")
    intercept[IllegalArgumentException] { t.createTag("v1") }
    t.append(orders.filter(col("o_orderkey") === 1))
    t.dropTag("v1")
    val id = t.createTag("v1") // retarget after drop = explicit two-step
    assert(id == t.latestVersion)
    intercept[NoSuchElementException] { t.readTag("nope") }
  }

  // ------------------------------------------- metadata-only aggregates

  test("statsFromMetadata answers with the data files DELETED (zero I/O)") {
    val t = fresh("gov-meta-")
    t.append(orders.filter(col("o_orderkey") <= 500))
    t.append(orders.filter(col("o_orderkey") > 500))
    val expect = orders.agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"),
      min("o_orderdate"), max("o_orderdate")).head
    // destroy every data file; only the manifest remains
    val dataRoot = t.root.resolve("data")
    Files.walk(dataRoot).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    val Some((cnt, stats)) =
      t.statsFromMetadata(Seq("o_orderkey", "o_orderdate")): @unchecked
    assert(cnt == expect.getLong(0))
    assert(stats(0)._2 == expect.get(1) && stats(0)._3 == expect.get(2))
    assert(stats(1)._2 == expect.get(3) && stats(1)._3 == expect.get(4))
    // the scan path would throw — proves the answer came from metadata
    intercept[Exception] { t.read().count() }
  }

  test("metadata stats decline under pending deltas; statsSummary falls back") {
    val t = fresh("gov-meta2-")
    t.overwriteBucketed(orders.limit(1000), "o_orderkey", 4)
    assert(t.statsFromMetadata(Seq("o_orderkey")).isDefined)
    t.upsertDeferred(orders.limit(1000).filter(col("o_orderkey") <= 10)
      .withColumn("o_totalprice", lit(9.9)), "o_orderkey")
    assert(t.statsFromMetadata(Seq("o_orderkey")).isEmpty)
    // fallback scan gives the resolved answer with the same schema
    val row = t.statsSummary(Seq("o_orderkey")).head
    assert(row.getLong(row.fieldIndex("cnt")) == 1000L)
  }

  test("metadata stats decline for string columns (stat truncation risk)") {
    val t = fresh("gov-meta3-")
    t.append(orders.limit(100))
    assert(t.statsFromMetadata(Seq("o_orderstatus")).isEmpty)
    assert(t.statsFromMetadata(Seq.empty).isDefined) // count-only still fine
  }

  // ------------------------------------------------------- expectations

  test("CHECK is ANSI: NULL passes; violating rows carry the rule") {
    import spark.implicits._
    val t = fresh("gov-check-")
    t.overwrite(Seq((1L, 10.0)).toDF("id", "v")) // seed schema
    t.setCheckConstraint("v <= 100.0")
    val batch = Seq((2L, Some(50.0)), (3L, None), (4L, Some(500.0)))
      .toDF("id", "v")
    val (_, n) = t.appendExpect(batch)
    assert(n == 1) // only the 500.0 row — the NULL row PASSES (ANSI CHECK)
    assert(t.read().count() == 3)
    val q = t.quarantineTable.read()
    assert(q.count() == 1)
    assert(q.head.getAs[String]("__rule") == "v <= 100.0")
    assert(q.head.getAs[Long]("id") == 4L)
  }

  test("constraint resolution fails at DDL time for unknown columns") {
    val t = fresh("gov-check2-")
    t.overwrite(orders.limit(10))
    intercept[Exception] { t.setCheckConstraint("no_such_col > 0") }
  }

  test("idempotent batch replay quarantines nothing twice") {
    import spark.implicits._
    val t = fresh("gov-check3-")
    t.overwrite(Seq((1L, 10.0)).toDF("id", "v"))
    t.setCheckConstraint("v <= 100.0")
    val batch = Seq((2L, 50.0), (4L, 500.0)).toDF("id", "v")
    val (_, n1) = t.appendExpect(batch, batchKey = Some("b-1"))
    val (_, n2) = t.appendExpect(batch, batchKey = Some("b-1")) // replay
    assert(n1 == 1 && n2 == 0)
    assert(t.quarantineTable.read().count() == 1)
    assert(t.read().count() == 2)
  }

  test("branch verbs require the main handle") {
    val t = fresh("gov-main-")
    t.overwrite(orders.limit(10))
    t.createBranch("b")
    val b = t.branch("b")
    intercept[IllegalArgumentException] { b.createBranch("c") }
    intercept[IllegalArgumentException] { b.publishBranch("b") }
    intercept[IllegalArgumentException] { b.createTag("x") }
  }
}
