package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ConnectorQueries

/**
 * Property-style hardening for the v2 in-scan MOR resolver: for RANDOM
 * delta chains (updates, tombstones, re-inserts of deleted keys,
 * overlapping key ranges, several chain lengths and bucket counts) the
 * catalog read must equal `GraftTable.read()` row-for-row — the window
 * algebra and the per-bucket hash merge are two implementations of one
 * contract, and any divergence is a correctness bug by definition.
 */
class SpjProps extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("random delta chains: v2 scan == table read, every seed") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(2000)
      .cache()
    o.count()
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val (cat, wh) = {
        val c = ConnectorQueries.tempCatalog(spark)
        (c, java.nio.file.Paths.get(
          spark.conf.get(s"spark.sql.catalog.$c.warehouse")))
      }
      val n = 1 + rnd.nextInt(8)
      val t = new graft.catalog.GraftCatalog(spark, wh).materialized("p")
      t.overwriteBucketed(o, "o_orderkey", n)
      val chainLen = 1 + rnd.nextInt(4)
      for (_ <- 1 to chainLen) {
        val lo = rnd.nextInt(1800)
        val hi = lo + 1 + rnd.nextInt(400)
        rnd.nextInt(3) match {
          case 0 => // update image
            t.upsertDeferred(o.filter(col("o_orderkey").between(lo, hi))
              .withColumn("o_totalprice", lit(rnd.nextInt(1000).toDouble)),
              "o_orderkey")
          case 1 => // tombstones
            t.upsertDeferred(o.filter(col("o_orderkey").between(lo, hi))
              .withColumn("op", lit("d")), "o_orderkey", opCol = Some("op"))
          case 2 => // mixed: delete low half, update high half
            val mid = (lo + hi) / 2
            t.upsertDeferred(
              o.filter(col("o_orderkey").between(lo, hi))
                .withColumn("op",
                  when(col("o_orderkey") <= mid, lit("d")).otherwise(lit("u")))
                .withColumn("o_totalprice", lit(-1.0)),
              "o_orderkey", opCol = Some("op"))
        }
      }
      val viaV2 = spark.table(s"$cat.p")
      val viaTable = t.read()
      val d1 = viaV2.exceptAll(viaTable).count()
      val d2 = viaTable.exceptAll(viaV2).count()
      assert(d1 == 0 && d2 == 0,
        s"seed=$seed buckets=$n chain=$chainLen: v2-only=$d1 table-only=$d2")
      // And the pruned point path agrees under the same chain.
      val k = 100L + rnd.nextInt(1800)
      val v2Rows = viaV2.filter(col("o_orderkey") === k)
        .collect().map(_.toSeq).toSet
      val tRows = viaTable.filter(col("o_orderkey") === k)
        .collect().map(_.toSeq).toSet
      assert(v2Rows == tRows, s"seed=$seed key=$k")
    }
  }
}
