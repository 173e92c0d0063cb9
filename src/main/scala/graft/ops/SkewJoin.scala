package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted joins for skewed keys — the standard counter to a shuffle join
 * where a handful of hot keys concentrate a partition's worth of rows on
 * one task. AQE's skew-join split handles sort-merge cases after the fact;
 * explicit salting is the plan-level tool when the skew is known (and the
 * only option when the small side is too big to broadcast but small enough
 * to replicate `salts` times).
 *
 * Mechanics: every big-side row gets a deterministic salt in
 * `[0, salts)` hashed from its FULL row content (not the join key — hot
 * KEYS are exactly the rows that must spread), and the small side is
 * replicated once per salt value. Joining on (key, salt) then splits each
 * hot key's rows across up to `salts` tasks while preserving inner/left
 * join semantics exactly: each big row carries one salt, so it meets each
 * matching small row exactly once.
 *
 * Content-hash salting keeps the plan deterministic under task retries
 * (a `rand()` salt re-rolls on retry and can duplicate or drop matches
 * under speculative execution). The trade: byte-identical duplicate rows
 * share a salt and stay together — dedup first if that is the skew.
 */
object SkewJoin {

  /**
   * Inner or left join of `big` against `small` on `key`, with the big
   * side salted across `salts` sub-keys. `small` is replicated `salts`
   * times — size the factor so `salts × |small|` stays shuffle-friendly.
   */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salt count must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting preserves inner/left semantics only, got $joinType")
    val bigCols = big.columns.map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigCols: _*), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
