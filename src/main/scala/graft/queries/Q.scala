package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}

import graft.table.GraftTable

/**
 * Shared helpers for the driver-graded query registry (`graft.SparkEntry`).
 *
 * Float discipline: the correctness gate compares doubles BIT-FOR-BIT
 * against a DuckDB oracle. Per-row IEEE-754 arithmetic (`a*b`, `a+b`) is
 * deterministic across engines, but the accumulation ORDER of a double SUM
 * is not (Spark sums per-partition). So every aggregate over a double column
 * routes through exact decimal arithmetic — [[dsum]] — and the matching
 * oracle SQL does the same (`CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`),
 * making both sides exact and therefore identical.
 */
object Q {

  type QueryFn = (SparkSession, String) => DataFrame

  def tbl(s: SparkSession, sfDir: String, name: String): DataFrame =
    s.read.parquet(s"$sfDir/$name.parquet")

  /** Order-independent exact sum of a double column (see class doc). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /**
   * `events.parquet` stores TIMESTAMP(NANOS), which Spark's TimestampType
   * (µs) cannot hold — read the raw int64 nanos (`nanosAsLong`) and floor to
   * micros, exactly matching DuckDB's ns→µs truncation on the oracle side.
   *
   * The result `ts` is TIMESTAMP_NTZ, not session-TZ TimestampType: the
   * corpus column is wall-clock (parquet isAdjustedToUTC=false) and DuckDB
   * reads it as naive TIMESTAMP, so every gate entry that materializes `ts`
   * must write it back as naive too — an LTZ `ts` parquet-encodes as
   * adjusted-to-UTC micros, which DuckDB types as TIMESTAMP WITH TIME ZONE
   * and the driver's schema compare rejects (the round-5 7-entry
   * regression). The NTZ value is built straight from the micros
   * ([[graft.plans.TimestampMicrosExprs.microsToNtz]]) — zone-free, no
   * session-TZ dependence and no session conf mutated beyond the
   * `nanosAsLong` read flag this file needs to open the NANOS column at all.
   */
  def events(s: SparkSession, sfDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts",
        graft.plans.TimestampMicrosExprs.microsToNtz(expr("ts div 1000")))
  }

  /** A fresh single-use [[GraftTable]] in a temp warehouse dir. */
  def tempTable(s: SparkSession, name: String = "t"): GraftTable = {
    val wh: Path = Files.createTempDirectory("graft-wh-")
    wh.toFile.deleteOnExit()
    new GraftTable(s, wh.resolve(name), name)
  }
}
