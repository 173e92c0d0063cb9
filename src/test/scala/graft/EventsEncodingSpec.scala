package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * `Q.events` must normalize `ts` to the same TIMESTAMP_NTZ wall-clock
 * value whatever physical timestamp encoding the corpus generation used —
 * the driver has shipped events.parquet as int64 NANOS (rounds 1-7) and as
 * TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 8+), and the round-8
 * switch silently failed seven gate entries because the loader assumed one
 * encoding. This spec pins the two Spark-writable encodings (NTZ, LTZ)
 * and asserts both load to identical NTZ micros; the nanos path keeps its
 * coverage indirectly (same `ts div 1000` branch the early rounds ran).
 */
class EventsEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wallMicros = Seq(
    1640995200000000L, // 2022-01-01 00:00:00
    1656633600123456L, // mid-year, sub-second micros
    1672531199999999L) // year boundary minus 1µs

  private def writeEvents(dir: String, tsType: DataType): Unit = {
    val rows = wallMicros.zipWithIndex.map { case (us, i) =>
      val ts: Any = tsType match {
        case TimestampNTZType =>
          java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
        case TimestampType =>
          val t = new Timestamp(us / 1000L); t.setNanos((us % 1000000L).toInt * 1000); t
        case other => fail(s"unexpected ts type $other")
      }
      Row(i.toLong, ts, i.toLong % 7, s"type_$i", i.toDouble, "{}")
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedMicros(dir: String): Seq[(Long, Long)] = {
    val ev = graft.queries.Q.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampNTZType,
      "Q.events must emit TIMESTAMP_NTZ regardless of the stored encoding")
    ev.select(col("event_id"),
        graft.plans.TimestampMicrosExprs.wallMicros(col("ts")))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("NTZ-encoded events load unchanged; LTZ-encoded load to the same wall-clock") {
    val ntzDir = TestSpark.tmpDir("graft-ev-ntz-").toString
    val ltzDir = TestSpark.tmpDir("graft-ev-ltz-").toString
    writeEvents(ntzDir, TimestampNTZType)
    writeEvents(ltzDir, TimestampType) // session TZ is UTC → same wall-clock

    val expected = wallMicros.indices.map(i => (i.toLong, wallMicros(i)))
    assert(loadedMicros(ntzDir) === expected)
    assert(loadedMicros(ltzDir) === expected)
  }
}
