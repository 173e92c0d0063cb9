package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{GraftTable, LocalPointRead}

/** Driver-side serving lookup ([[LocalPointRead]]) vs the distributed scan:
  * both paths must return identical rows for every column type the corpus
  * exercises (long/int/double/string/date/timestamp), across schema
  * evolution, and the fallback must engage when the local path is off. */
class LocalReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  private def distributed(t: GraftTable, key: Long) = {
    sys.props(LocalPointRead.EnabledProp) = "false"
    try t.lookupKey(key).collect().map(_.toSeq).toSet
    finally sys.props.remove(LocalPointRead.EnabledProp)
  }

  test("local lookup equals the distributed scan on orders (incl. date col)") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lkp-").resolve("t"), "t")
    t.overwriteBucketed(orders, "o_orderkey", 8)
    val keys = orders.select("o_orderkey").limit(20).collect().map(_.getLong(0))
    keys.foreach { k =>
      val local = t.lookupKey(k).collect().map(_.toSeq).toSet
      assert(local.nonEmpty, s"key $k must exist")
      assert(local == distributed(t, k), s"paths disagree for key $k")
      assert(t.lookupKeyRows(k).map(_.toSeq).toSet == local,
        s"serving rows call disagrees for key $k")
    }
    // a missing key returns empty on both paths
    assert(t.lookupKey(-1L).collect().isEmpty)
    assert(t.lookupKeyRows(-1L).isEmpty)
  }

  test("local lookup handles timestamp columns and schema evolution") {
    // Both timestamp kinds through the serving path: `ts` is NTZ (what
    // Q.events now emits), `ts_ltz` the session-TZ flavor.
    val ev = graft.queries.Q.events(spark, TestSpark.sf0001)
      .withColumn("ts_ltz", col("ts").cast("timestamp"))
    val t = new GraftTable(spark, TestSpark.tmpDir("lkp-ev-").resolve("t"), "t")
    t.overwriteBucketed(ev, "event_id", 4)
    // evolve: new column appears only in post-evolution files
    t.append(ev.limit(5).withColumn("event_id", col("event_id") + 1000000)
      .withColumn("extra", lit(7L)))
    // Regression: the evolved column must be NULLABLE in the table schema —
    // with the incoming batch's nullable=false carried into the union, the
    // serving path's LocalRelation read the null padding back as 0.
    assert(t.schema("extra").nullable, "evolved columns are nullable by construction")
    val preEvo = t.lookupKey(3L).collect()
    assert(preEvo.length == 1 && preEvo.head.isNullAt(preEvo.head.fieldIndex("extra")),
      "pre-evolution file rows must be padded with a typed null")
    assert(preEvo.head.getAs[java.time.LocalDateTime]("ts") != null)
    assert(preEvo.head.getAs[java.sql.Timestamp]("ts_ltz") != null)
    val postEvo = t.lookupKey(1000003L).collect()
    assert(postEvo.length == 1 && postEvo.head.getAs[Long]("extra") == 7L)
    assert(t.lookupKey(3L).collect().map(_.toSeq).toSet == distributed(t, 3L))
  }

  test("byte cap forces the distributed fallback; results identical") {
    val t = new GraftTable(spark, TestSpark.tmpDir("lkp-cap-").resolve("t"), "t")
    t.overwriteBucketed(orders, "o_orderkey", 4)
    val k = orders.select("o_orderkey").head().getLong(0)
    val viaLocal = t.lookupKeyRows(k).map(_.toSeq).toSet
    sys.props(LocalPointRead.MaxBytesProp) = "1" // every bucket exceeds 1 byte
    try {
      val viaSpark = t.lookupKeyRows(k).map(_.toSeq).toSet
      assert(viaSpark == viaLocal && viaSpark.nonEmpty)
    } finally sys.props.remove(LocalPointRead.MaxBytesProp)
  }

  test("nested schemas fall back to the distributed path") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("id", LongType),
      StructField("vec", ArrayType(FloatType))))
    assert(!LocalPointRead.supports(st))
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val t = new GraftTable(spark, TestSpark.tmpDir("lkp-emb-").resolve("t"), "t")
    t.overwriteBucketed(emb, "vec_id", 4)
    val got = t.lookupKey(1L).collect() // must not throw; distributed path
    assert(got.length == 1 &&
      got.head.getSeq[Float](got.head.fieldIndex("embedding")).nonEmpty)
  }
}
