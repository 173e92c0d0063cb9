package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.table.GraftTable

/**
 * Property-based range-read algebra: for ANY split of a table into append
 * commits and ANY [lo, hi] window, the stat-pruned `readRange` must equal
 * the unpruned full-scan filter — pruning is an optimization, never a
 * semantics change. Exercises the long and TIMESTAMP_NTZ stat domains
 * (the two the manifest harvest records for the generated schema) across
 * randomized segment boundaries, including empty windows, windows past
 * either end, and bounds falling exactly on segment edges.
 */
object RangeProps extends Properties("RangeRead") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each case commits + scans a real table

  // keys 0..29 with a deterministic NTZ timestamp derived from the key
  private def baseRows: Seq[(Long, java.time.LocalDateTime, String)] =
    (0L until 30L).map { k =>
      (k, java.time.LocalDateTime.of(2026, 1, 1, 0, 0).plusHours(k), s"p$k")
    }

  // one or two split points → 1-3 append segments in random order
  private val splitsGen: Gen[List[Long]] =
    Gen.listOfN(2, Gen.chooseNum(1L, 29L)).map(_.distinct.sorted)

  private val windowGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(-5L, 35L)
    b <- Gen.chooseNum(-5L, 35L)
  } yield (math.min(a, b), math.max(a, b))

  private def freshTable(splits: List[Long]): GraftTable = {
    val t = new GraftTable(spark, TestSpark.tmpDir("range-prop-").resolve("t"), "t")
    val df = baseRows.toDF("id", "ts", "payload")
    val bounds = (Long.MinValue +: splits :+ Long.MaxValue).sliding(2).toSeq
    bounds.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val seg = df.filter(col("id") >= lo && col("id") < hi)
      if (i == 0) t.overwrite(seg) else t.append(seg)
    }
    t
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  property("long window: pruned read == full filter") =
    Prop.forAll(splitsGen, windowGen) { case (splits, (lo, hi)) =>
      val t = freshTable(splits)
      val expected = baseRows.collect { case (k, _, _) if k >= lo && k <= hi => k }.toSet
      ids(t.readRange("id", lo, hi)) == expected &&
        ids(t.read().filter(col("id") >= lo && col("id") <= hi)) == expected
    }

  property("NTZ window: pruned read == full filter (bounds from key hours)") =
    Prop.forAll(splitsGen, windowGen) { case (splits, (lo, hi)) =>
      val t = freshTable(splits)
      val t0 = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      val (loTs, hiTs) = (t0.plusHours(lo), t0.plusHours(hi))
      val expected = baseRows.collect { case (k, _, _) if k >= lo && k <= hi => k }.toSet
      ids(t.readRange("ts", loTs, hiTs)) == expected
    }
}
