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
 *
 * A scale-probe caveat so the measured numbers aren't misread: the
 * ratio-table join BROADCASTS while the vocabulary sits under
 * `spark.sql.autoBroadcastJoinThreshold` and becomes a shuffle join once
 * it crosses (SCALE_r10.json's x_dsir shuffle-bytes exponent of 2.37 —
 * 0.27 MB at f1 vs 62 MB at f10 — is exactly that one-time transition,
 * not quadratic growth). Past the transition the shuffle is linear in
 * corpus feature count, all 8-byte keys: the correct 100 TB plan.
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
    // The in-plan assertion turns the empty-corpus case (V = 0, denominator
    // 0) into a clear error instead of an ANSI divide-by-zero from the
    // middle of the plan.
    val totals = joined.agg(sum("__cr").as("__R"), sum("__ct").as("__T"),
        count(lit(1)).as("__V"))
      .select(col("__R"), col("__T"),
        when(assert_true(col("__V") > 0,
            lit("importance weighting requires non-empty corpora " +
              "(no features found in raw/target)")).isNull,
          col("__V")).as("__V"))
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

  /** (prev-token, bigram-string) pairs of a text column — the unit the
    * bigram LM conditions on. Documents with fewer than two tokens have
    * no bigrams (empty arrays zip to empty; NO whole-text fallback here —
    * an LM score over zero events is undefined, and such docs simply drop
    * out). Constant number of tokenize passes per row: prevs by one
    * slice, bigrams by the codegen'd single-pass shingle expression — a
    * per-element lambda over the tokens subtree would be O(m²) ([[
    * graft.plans.WordShinglesExpr]]). */
  private[ops] def bigramPairs(text: Column): Column = {
    val t = Dedup.tokens(text)
    val prevs = slice(t, lit(1), size(t) - 1)
    val bigs = when(size(t) < 2, array().cast("array<string>"))
      .otherwise(graft.plans.WordShinglesExpr.shingles(t, 2))
    arrays_zip(prevs.as("prev"), bigs.as("big"))
  }

  /**
   * Bigram-LM fluency scores under a REFERENCE corpus — the CCNet-style
   * perplexity filter (Wenzek et al., LREC 2020), with an exactly-
   * recomputable add-one-smoothed bigram model standing in for KenLM:
   *
   *   logP(d) = Σ_{i≥1} ln (c_ref(w_{i-1} w_i) + 1) / (c_ref(w_{i-1}) + V)
   *
   * where V is the reference's distinct-unigram count. Returns
   * (id, n_bigrams, lm_log_prob, mean_log_prob); documents with fewer
   * than two tokens are absent (no bigram events to score).
   *
   * Scale shape mirrors [[dsirLogWeights]]: every join key is a 64-bit
   * xxhash64 (bigram and prev-unigram hashed at extraction), the
   * reference count tables aggregate with map-side partials, the scalar
   * vocabulary size broadcasts, and one groupBy on the doc id closes.
   */
  def bigramLmScores(
      raw: DataFrame, reference: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docSide = raw.select(col(idCol).as("__id"),
        explode(bigramPairs(col(textCol))).as("__p"))
      .select(col("__id"), xxhash64(col("__p.prev")).as("__hu"),
        xxhash64(col("__p.big")).as("__hb"))
    val uniCnt = reference
      .select(explode(Dedup.tokens(col(textCol))).as("__w"))
      .select(xxhash64(col("__w")).as("__hu"))
      .groupBy("__hu").agg(count(lit(1)).as("__cu"))
    val bigCnt = reference
      .select(explode(bigramPairs(col(textCol))).as("__p"))
      .select(xxhash64(col("__p.big")).as("__hb"))
      .groupBy("__hb").agg(count(lit(1)).as("__cb"))
    // Same empty-reference guard as [[logRatios]]: a clear error beats an
    // ANSI divide-by-zero when the reference corpus has no tokens.
    val vocab = uniCnt.agg(count(lit(1)).as("__V"))
      .select(when(assert_true(col("__V") > 0,
          lit("bigram LM requires a non-empty reference corpus")).isNull,
        col("__V")).as("__V"))
    docSide.join(bigCnt, Seq("__hb"), "left").join(uniCnt, Seq("__hu"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("__id"),
        log((coalesce(col("__cb"), lit(0L)) + 1).cast("double")
          / (coalesce(col("__cu"), lit(0L)) + col("__V")).cast("double")).as("__lp"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("__lp").as("lm_log_prob"))
      .withColumn("mean_log_prob", col("lm_log_prob") / col("n_bigrams"))
  }

  /** Top-k most-fluent documents under the reference bigram LM as
    * (id, rank) — mean per-bigram log-prob ordering, same cross-engine
    * discipline as [[dsirTopK]] (rounded float orders, never leaves). */
  def bigramLmTopK(
      raw: DataFrame, reference: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = bigramLmScores(raw, reference, idCol, textCol)
      .select(col(idCol), round(col("mean_log_prob"), 6).as("__wr"))
    val top = w.orderBy(col("__wr").desc, col(idCol)).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("__wr").desc, col(idCol))))
      .select(col(idCol), col("rank"))
  }

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
