package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TimestampMicrosExprs.wallMicros

/**
 * Time-series joins the relational operator set lacks, built as
 * SINGLE-SHUFFLE plans — the property that decides whether they survive
 * 100 TB. The naive formulations are inequality joins, which Spark can
 * only execute as broadcast-nested-loop (O(|L|·|R|) per key); both
 * operators here reduce to one hash exchange plus per-partition
 * sequential work.
 *
 *  - [[asofBackward]]: the union-window formulation — tag both inputs,
 *    union, ONE window over (key, time) carrying the running latest right
 *    row forward (`last(_, ignoreNulls)` over rows-unbounded-preceding).
 *    Cost: one shuffle of |L|+|R| rows on the key, one per-key in-memory
 *    sweep. No per-pair work ever materializes, so a key with a million
 *    events costs a million rows, not a trillion pairs.
 *  - [[intervalJoin]]: point-in-interval equi-join via time binning —
 *    intervals explode into the fixed-width bins they cover, points land
 *    in exactly one bin, the join runs on (key, bin) and re-checks exact
 *    bounds. Each qualifying pair is emitted exactly ONCE (the point's
 *    single bin), so no dedup pass. The explode factor is
 *    span/binWidth — pick binWidth near the typical span so the blowup
 *    is a small constant while each bin's candidate set stays tiny.
 *
 * Skew note (100 TB): the plain sweep serializes a single hot KEY into
 * one task. [[asofBackward]]'s `timeSplits > 1` engages the remedy —
 * time-range sub-partitioning with boundary carry-over: each (key,
 * range) sweeps in its own task, seeded by the key's winning right image
 * from earlier ranges (a tiny keys × splits side computation), exactly
 * reproducing the monolithic result. intervalJoin's (key, bin)
 * clustering already splits a hot key across its time bins, which is the
 * built-in salt.
 */
object TimeJoin {

  /**
   * Backward as-of join (kdb `aj` / pandas `merge_asof` semantics): for
   * every left row, the single LATEST right row of the same `key` with
   * `right.rightTs <= left.leftTs` (inclusive). Unmatched left rows keep
   * NULL right columns (left-outer; `inner = true` drops them).
   *
   * @param rightPayload right columns carried onto the match, emitted as
   *                     `prefix<name>`; `rightTs` is always carried.
   * @param tieBreak     right column ordering equal-timestamp candidates —
   *                     the LARGEST value wins, making ties deterministic
   *                     (pass the right side's unique id).
   * @param tolerance    max lookback: a candidate older than
   *                     `leftTs - tolerance` does not match. Equivalent to
   *                     restricting candidates before the argmax, since
   *                     the latest candidate is out of tolerance iff all
   *                     are.
   */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      prefix: String = "asof_",
      tieBreak: Option[String] = None,
      tolerance: Option[Column] = None,
      inner: Boolean = false,
      timeSplits: Int = 1): DataFrame = {
    val payload = (rightTs +: rightPayload.filterNot(_ == rightTs))
    val tieCol = tieBreak.map(col).getOrElse(lit(null))
    // A NULL-timestamp right can never match (SQL: `r.ts <= l.ts` is never
    // TRUE); dropped here so the nulls-first window order can't smuggle
    // one in as "earliest".
    val r2 = right.filter(col(rightTs).isNotNull).select(
      col(key).as("__k"),
      col(rightTs).as("__t"),
      struct(payload.map(col): _*).as("__r"),
      lit(0).as("__src"),
      tieCol.as("__tie"))
    val l2 = left.select(
      col(key).as("__k"),
      col(leftTs).as("__t"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(1).as("__src"),
      lit(null).cast(r2.schema("__tie").dataType).as("__tie"))
      .withColumn("__r", lit(null).cast(r2.schema("__r").dataType))
    val r2l = r2.withColumn("__l", lit(null).cast(l2.schema("__l").dataType))
    // Rights sort before lefts at the same instant (src 0 < 1), so an
    // equal-timestamp right IS visible — the inclusive <= contract. Among
    // equal-timestamp rights the largest tieBreak sorts last and wins.
    val swept =
      if (timeSplits <= 1) {
        val u = l2.unionByName(r2l, allowMissingColumns = false)
        val w = Window.partitionBy("__k")
          .orderBy(col("__t").asc, col("__src").asc, col("__tie").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("__m", last("__r", ignoreNulls = true).over(w))
      } else {
        // HOT-KEY path: the running sweep serializes each key into one
        // task, so a key holding 10% of a 100 TB corpus is a straggler by
        // construction. Splitting TIME into fixed ranges parallelizes the
        // key timeSplits-ways: each (key, split) sweeps independently,
        // seeded with the key's winning right image from all EARLIER
        // splits (computed over the tiny per-(key, split) winner set — at
        // most keys × splits rows). A seed's timestamp is strictly below
        // its split's range, so it sorts first and any in-split right
        // supersedes it, reproducing the monolithic sweep exactly.
        import graft.plans.TimestampMicrosExprs.wallMicros
        val bounds = l2.select(wallMicros(col("__t")).as("m"))
          .unionByName(r2.select(wallMicros(col("__t")).as("m")))
          .agg(min("m"), max("m")).head()
        if (bounds.isNullAt(0)) {
          // No timestamped rows at all: the mono plan handles it.
          val u = l2.unionByName(r2l, allowMissingColumns = false)
          val w = Window.partitionBy("__k")
            .orderBy(col("__t").asc, col("__src").asc, col("__tie").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          u.withColumn("__m", last("__r", ignoreNulls = true).over(w))
        } else {
          val mn = bounds.getLong(0)
          val width = math.max(1L, (bounds.getLong(1) - mn) / timeSplits + 1)
          def splitId(c: Column): Column =
            floor((wallMicros(c) - mn) / width).cast("int")
          val l3 = l2.withColumn("__s", splitId(col("__t")))
          val r3 = r2l.withColumn("__s", splitId(col("__t")))
          // Winner per (key, split) among rights: argmax by (ts, tie) —
          // the same cut the sweep's ordering makes.
          val winners = r3.groupBy("__k", "__s").agg(
            max_by(struct(col("__t"), col("__tie"), col("__r")),
              struct(col("__t"), col("__tie"))).as("__w"))
          // Carry-in per (key, split): the last winner over EARLIER
          // splits, materialized for every split a left row occupies
          // (splits with no rights still need their carry).
          val domain = l3.select("__k", "__s").distinct()
            .unionByName(winners.select("__k", "__s")).distinct()
          val carry = domain.join(winners, Seq("__k", "__s"), "left")
            .withColumn("__c", last(col("__w"), ignoreNulls = true).over(
              Window.partitionBy("__k").orderBy("__s")
                .rowsBetween(Window.unboundedPreceding, -1)))
            .filter(col("__c").isNotNull)
          val seeds = carry.select(
            col("__k"),
            col("__c").getField("__t").as("__t"),
            col("__c").getField("__r").as("__r"),
            lit(0).as("__src"),
            col("__c").getField("__tie").as("__tie"),
            lit(null).cast(l2.schema("__l").dataType).as("__l"),
            col("__s"))
          val u = l3.unionByName(r3, allowMissingColumns = false)
            .unionByName(seeds, allowMissingColumns = false)
          val w = Window.partitionBy("__k", "__s")
            .orderBy(col("__t").asc, col("__src").asc, col("__tie").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          u.withColumn("__m", last("__r", ignoreNulls = true).over(w))
        }
      }
    val matched = tolerance match {
      case Some(tol) =>
        // NULL-safe: a NULL __m stays NULL through the comparison.
        swept.withColumn("__m",
          when(col("__m")(rightTs) >= col("__t") - tol, col("__m")))
      case None => swept
    }
    // SQL join semantics: a NULL key matches nothing (the window would
    // happily group NULL keys together).
    val nullKeyed = matched.withColumn("__m",
      when(col("__k").isNull, lit(null).cast(r2.schema("__r").dataType))
        .otherwise(col("__m")))
    val lefts =
      if (inner) nullKeyed.filter(col("__src") === 1 && col("__m").isNotNull)
      else nullKeyed.filter(col("__src") === 1)
    val leftCols = left.columns.map(c => col("__l")(c).as(c))
    val rightCols = payload.map(c => col("__m")(c).as(prefix + c))
    lefts.select(leftCols ++ rightCols: _*)
  }

  /**
   * Point-in-interval join: rows of `points` paired with every row of
   * `intervals` of the same `key` whose `[startTs, endTs]` (inclusive)
   * contains `pointTs`. Timestamp columns may be TIMESTAMP or
   * TIMESTAMP_NTZ; binning runs on their wall-clock micros.
   *
   * @param binWidthMicros bin granularity. Correct for ANY positive value
   *                       within the per-interval bin cap below; choose
   *                       near the typical interval span (explode factor
   *                       ≈ span/binWidth + 1, candidate precision
   *                       ≈ binWidth).
   * @param prefix         interval columns are emitted as `prefix<name>`.
   * @param maxBinsPerInterval per-interval explode cap. One corrupt wide
   *                       interval (an end_ts of year 9999 against hour
   *                       bins) would otherwise blow past Spark's sequence
   *                       element limit and fail the whole job with an
   *                       opaque error — instead the row fails LOUDLY with
   *                       its own span in the message, naming the fix
   *                       (filter the corrupt row or widen the bins).
   */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointTs: String,
      startTs: String,
      endTs: String,
      binWidthMicros: Long,
      intervalPayload: Seq[String],
      prefix: String = "iv_",
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val p2 = points.select(
      struct(points.columns.map(col): _*).as("__p"),
      col(key).as("__k"),
      wallMicros(col(pointTs)).as("__tp"))
      .withColumn("__bin", floor(col("__tp") / binWidthMicros))
    val i2 = intervals.select(
      struct(intervals.columns.map(col): _*).as("__i"),
      col(key).as("__k"),
      wallMicros(col(startTs)).as("__ts"),
      wallMicros(col(endTs)).as("__te"))
      .filter(col("__ts") <= col("__te"))
      .withColumn("__b0", floor(col("__ts") / binWidthMicros))
      .withColumn("__b1", floor(col("__te") / binWidthMicros))
      .withColumn("__bin", explode(
        when(col("__b1") - col("__b0") < maxBinsPerInterval,
          sequence(col("__b0"), col("__b1")))
          .otherwise(raise_error(concat(
            lit("intervalJoin: interval spans "),
            (col("__b1") - col("__b0") + 1).cast("string"),
            lit(s" bins of $binWidthMicros micros (cap $maxBinsPerInterval)" +
              "; filter the corrupt interval or widen binWidthMicros")))
            .cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)))))
      .drop("__b0", "__b1")
    val joined = p2.join(i2, Seq("__k", "__bin"))
      .filter(col("__tp") >= col("__ts") && col("__tp") <= col("__te"))
    val pointCols = points.columns.map(c => col("__p")(c).as(c))
    val ivCols = intervalPayload.map(c => col("__i")(c).as(prefix + c))
    joined.select(pointCols ++ ivCols: _*)
  }
}
