package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-selection importance weighting in the DSIR style ("Data Selection
 * for Language Models via Importance Resampling", Xie et al., NeurIPS
 * 2023): score every raw document by how much more likely its features are
 * under a TARGET distribution (a trusted high-quality corpus) than under
 * the raw corpus itself, then keep the top-weighted documents.
 *
 * Features are the hashed bag of unigrams + bigrams; both feature
 * distributions are unigram/bigram multinomials with add-one smoothing
 * over the joint vocabulary:
 *
 *   log w(d) = Σ_f  c_d(f) · [ ln (c_tgt(f)+1)/(T+V)  −  ln (c_raw(f)+1)/(R+V) ]
 *
 * where c_d(f) is the feature's multiplicity in the document, T/R the
 * total feature occurrences in target/raw, V the joint distinct-feature
 * count.
 *
 * Scale shape: features are 64-bit xxhash64 values from the moment they
 * leave the document (the paper's feature hashing, minus the modulo —
 * bucketing to fewer dimensions only loses resolution here, since the
 * counts are sparse maps, not dense vectors), so every shuffle in the
 * pipeline moves 8-byte keys with map-side partial aggregation — document
 * text never shuffles. The per-feature log-ratio table is vocabulary-sized;
 * the doc-scoring join shuffles (docId, featureHash) pairs once.
 */
object Importance {

  /** Unigram + bigram feature stream of a text column (normalized tokens;
    * documents shorter than two tokens contribute their whole token stream
    * as the single bigram — the shingle family's fallback, so the feature
    * set is never empty). */
  private[ops] def features(text: Column): Column =
    concat(Dedup.tokens(text), Dedup.wordShingles(text, 2))

  /** (id, 64-bit feature hash) with multiplicity — the document side. */
  private def docFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"),
      explode(features(col(textCol))).as("__fs"))
      .select(col("__id"), xxhash64(col("__fs")).as("__f"))

  /**
   * Per-feature log importance ratios ln(p_target/p_raw) with add-one
   * smoothing, as (__f, __lr). The raw and target feature-count tables are
   * joined full-outer so a feature seen only on one side still scores
   * (its other-side count smooths to 1/(N+V)).
   */
  def logRatios(raw: DataFrame, target: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame) =
      df.select(explode(features(col(textCol))).as("__fs"))
        .select(xxhash64(col("__fs")).as("__f"))
        .groupBy("__f").agg(count(lit(1)).as("__c"))
    val joined = counts(raw).withColumnRenamed("__c", "__cr")
      .join(counts(target).withColumnRenamed("__c", "__ct"), Seq("__f"), "full_outer")
      .select(col("__f"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
    // Totals and vocabulary size in ONE scalar row, broadcast onto the
    // vocabulary-sized ratio table (the repo's scalar-metric join shape).
    val totals = joined.agg(sum("__cr").as("__R"), sum("__ct").as("__T"),
      count(lit(1)).as("__V"))
    joined.crossJoin(broadcast(totals))
      .select(col("__f"),
        (log((col("__ct") + 1).cast("double") / (col("__T") + col("__V")).cast("double"))
          - log((col("__cr") + 1).cast("double") / (col("__R") + col("__V")).cast("double")))
          .as("__lr"))
  }

  /** Per-document DSIR log weight: Σ multiplicity × feature log-ratio.
    * Documents with no feature in the ratio table cannot exist (raw docs
    * contributed their own features), so the inner join is total. */
  def dsirLogWeights(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String): DataFrame =
    docFeatures(raw, idCol, textCol)
      .join(logRatios(raw, target, textCol), "__f")
      .groupBy(col("__id").as(idCol)).agg(sum("__lr").as("dsir_log_weight"))

  /**
   * Top-k raw documents by DSIR weight as (id, rank) — the resampling
   * step's selection, with the float weight kept INSIDE the plan (it
   * orders, rounded to 6 decimals so cross-engine ulp noise cannot flip
   * the order, but never leaves — rank and id are exactly comparable
   * across engines). Deterministic tie-break: rounded weight desc, id asc.
   * Plans as TakeOrderedAndProject (orderBy+limit), never a global sort;
   * the rank window runs over the k collected rows only.
   */
  def dsirTopK(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = dsirLogWeights(raw, target, idCol, textCol)
      .select(col(idCol), round(col("dsir_log_weight"), 6).as("__wr"))
    val top = w.orderBy(col("__wr").desc, col(idCol)).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("__wr").desc, col(idCol))))
      .select(col(idCol), col("rank"))
  }
}
