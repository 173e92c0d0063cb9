package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.catalog.GraftCatalog
import graft.cdc.CdcPipeline
import graft.search.Search

/**
 * The reference's full user journey (SURVEY §3) as ONE integration flow —
 * the "a user of the reference could switch" proof: CSV upload → SQL
 * serving → CDC stream into a versioned table → keyword search → time
 * travel → snapshot diff → keyed CRUD, all against the same catalog.
 */
class JourneySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("upload → query → CDC stream → search → time travel → diff → CRUD") {
    import spark.implicits._
    val cat = new GraftCatalog(spark, TestSpark.tmpDir("journey-wh-"))
    val session = new GraftSession(cat)

    // 1. Batch CSV ingest (§3.3): products table with inference.
    val csvDir = TestSpark.tmpDir("journey-csv-")
    Files.write(csvDir.resolve("products.csv"),
      ("product_id,name,price\n" +
        (1 to 50).map(i => s"$i,product_$i,${i * 1.5}").mkString("\n")).getBytes)
    cat.ingestCsv(csvDir.resolve("products.csv").toString, "products", mode = "replace")
    session.refreshViews()

    // 2. Interactive SQL (§3.1) — the postman example's shape.
    val top = session.sql(
      "SELECT * FROM products WHERE price > 50 ORDER BY price DESC").collect()
    assert(top.nonEmpty && top.head.getAs[Double]("price") == 75.0)

    // 3. CDC pipeline (§3.2): Debezium envelopes stream-merged into a
    //    bucketed versioned table.
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("sku", StringType),
      StructField("qty", LongType)))
    val orders = cat.createTable("cdc_orders", rowSchema, bucketBy = Some(("id", 4)))
    val inDir = TestSpark.tmpDir("journey-cdc-in-")
    def env(id: Long, sku: String, qty: Long, op: String, ts: Long): String = {
      val img = s"""{"id":$id,"sku":"$sku","qty":$qty}"""
      val (b, a) = if (op == "d") (img, "null") else ("null", img)
      s"""{"payload":{"before":$b,"after":$a,"op":"$op","ts_ms":$ts}}"""
    }
    Files.write(inDir.resolve("b1.json"),
      (1L to 20L).map(i => env(i, s"sku$i", i, "c", i)).mkString("\n").getBytes)
    Files.write(inDir.resolve("b2.json"), Seq(
      env(2, "sku2-restock", 99, "u", 100),
      env(3, "sku3", 0, "d", 101),
      env(21, "sku21", 21, "c", 102)).mkString("\n").getBytes)
    val q = CdcPipeline.start(spark, inDir.toString, rowSchema, orders, "id",
      TestSpark.tmpDir("journey-ckpt-").toString,
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    q.awaitTermination()
    assert(orders.read().count() == 20) // 20 inserts + 1 insert - 1 delete
    assert(orders.lookupKey(2L).head().getAs[Long]("qty") == 99L)

    // 4. Two-tier keyword search over the merged table.
    val hits = Search.searchRanked(orders.read(), "id", "sku", "sku21")
    assert(hits.collect().map(_.getAs[Long]("id")).toSeq == Seq(21L))
    assert(Search.likeFallback(orders.read(), "id", "7").count() == 1) // digit → id

    // 5. Time travel + history: the pre-b2 state is still queryable.
    // (version 1 is the empty CREATE commit; version 2 is batch 1's merge)
    val v1 = orders.log.versions()(1)
    assert(orders.readAsOf(v1).count() == 20)
    assert(orders.readAsOf(v1).filter(col("id") === 3).count() == 1,
      "deleted row must still exist in the old snapshot")
    assert(orders.history.count() == orders.log.versions().size)

    // 6. Snapshot diff: v2 vs v1 classifies the CDC batch's effect.
    val d = orders.diff(orders.latestVersion, v1, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(2L) == "MODIFIED" && d(3L) == "DELETED" && d(21L) == "NEW" &&
      d(1L) == "UNCHANGED")

    // 7. Keyed CRUD (the dashboard edit surface).
    orders.insertRow(Map("id" -> "42", "sku" -> "sku42", "qty" -> "7"))
    orders.updateWhere(col("id") === 42, Map("qty" -> lit(8L)))
    assert(orders.lookupKey(42L).head().getAs[Long]("qty") == 8L)
    orders.deleteWhere(col("id") === 42)
    assert(orders.lookupKey(42L).isEmpty)
  }
}
