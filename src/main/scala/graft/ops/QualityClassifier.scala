package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering — the fasttext-style classifier step of the
 * GPT-3/LLaMA curation recipes (train a linear classifier to distinguish a
 * trusted corpus from raw crawl, keep documents the model scores as
 * trusted-like): logistic regression over hashed unigram+bigram counts,
 * trained by full-batch gradient descent INSIDE the engine.
 *
 * Scale shape: the per-document feature table (id, bucket, count) is built
 * once (feature strings hashed to `numBuckets` 64-bit buckets at
 * extraction — only 8-byte keys shuffle), repartitioned by document id and
 * cached; each GD iteration is then margin (map-side broadcast-weights
 * lookup + in-partition sum), residual (in-partition join with the cached
 * labels) and gradient (one groupBy-bucket shuffle of (bucket, x·r)
 * partials). The model itself is at most `numBuckets` weights — kilobytes —
 * collected and re-broadcast each iteration exactly like KMeans centroids
 * ([[KMeans.fit]]), which also cuts the iterative plan lineage.
 */
object QualityClassifier {

  /** bucket → weight; bucket -1 is the intercept. */
  final case class LrModel(weights: Map[Long, Double]) {
    def intercept: Double = weights.getOrElse(-1L, 0.0)
  }

  /** Hashed feature buckets of one text column: unigrams + bigrams →
    * pmod(xxhash64, numBuckets), length-normalized (per-doc bucket counts
    * divided by the doc's total feature count, the fasttext mean-of-
    * embeddings convention — raw counts make margins scale with document
    * length and full-batch GD oscillate), plus two meta features: the
    * constant intercept bucket -1 and the reciprocal document length
    * bucket -2 (= 1/total features). The length reciprocal is what lets a
    * LINEAR model express count thresholds: `count(w) ≥ k` is exactly
    * `x_w − k·x_len ≥ 0` in this space — without it, any length-dependent
    * class boundary is unlearnable from normalized frequencies alone. */
  private def docBuckets(
      docs: DataFrame, idCol: String, textCol: String, numBuckets: Int): DataFrame = {
    val counts = docs.select(col(idCol).as("__id"),
        explode(Importance.features(col(textCol))).as("__fs"))
      .select(col("__id"), pmod(xxhash64(col("__fs")), lit(numBuckets.toLong)).as("__b"))
      .groupBy("__id", "__b").agg(count(lit(1)).cast("double").as("__c"))
    val tots = counts.groupBy("__id").agg(sum("__c").as("__t"))
    counts.join(tots, "__id")
      .select(col("__id"), col("__b"), (col("__c") / col("__t")).as("__x"))
      .unionByName(tots.select(col("__id"), lit(-1L).as("__b"), lit(1.0).as("__x")))
      .unionByName(tots.select(col("__id"), lit(-2L).as("__b"),
        (lit(1.0) / col("__t")).as("__x")))
  }

  private def weightsDf(spark: SparkSession, w: Map[Long, Double]): DataFrame = {
    import spark.implicits._
    w.toSeq.toDF("__b", "__w")
  }

  /**
   * Full-batch logistic regression: w ← w − lr·(Σ x·(σ(w·x) − y)/n + l2·w).
   * `labelCol` must be 0.0/1.0. Deterministic up to floating-point sum
   * order (the gate emits margin-robust booleans, not raw probabilities).
   */
  def fit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      numBuckets: Int = 1 << 15,
      iters: Int = 30,
      lr: Double = 4.0,
      l2: Double = 1e-6,
      minDf: Int = 5): LrModel = {
    val spark = docs.sparkSession
    // Features seen in fewer than `minDf` training documents are dropped
    // BEFORE training: Adagrad's per-coordinate normalization lets a
    // once-seen bucket move as fast as a stopword bucket, and the model
    // memorizes document-specific n-grams instead of the class signal
    // (observed: train accuracy 0.95, held-out 0.50 — pure memorization).
    // Score-time features outside the trained space read weight 0 through
    // the left join, so the spaces stay consistent.
    // Feature table and labels cached ONCE, pre-partitioned by doc id so
    // the per-iteration margin groupBy and residual join replan with no
    // exchange; released before returning.
    val all = docBuckets(docs, idCol, textCol, numBuckets)
    val kept = all.groupBy("__b").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf || col("__b").isin(-1L, -2L)).select("__b")
    val feats = all.join(kept, "__b")
      .repartition(col("__id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = docs.select(col(idCol).as("__id"),
        col(labelCol).cast("double").as("__y"))
      .repartition(col("__id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = labels.count().toDouble
      require(n > 0, "empty training set")
      // Adagrad per-coordinate steps: with length-normalized features the
      // raw gradient of a vocabulary bucket is O(1/m²) of the intercept's,
      // so plain GD moves only the intercept (observed: every probability
      // converging to the base rate). Dividing each step by the root of
      // the accumulated squared gradient equalizes the scales; both the
      // weight map and the accumulator live on the driver (vocabulary-
      // sized, like KMeans centroids).
      var w = Map.empty[Long, Double]
      val gsq = scala.collection.mutable.Map.empty[Long, Double]
      for (_ <- 1 to iters) {
        val wDf = weightsDf(spark, if (w.isEmpty) Map(-1L -> 0.0) else w)
        val margins = feats.join(broadcast(wDf), Seq("__b"), "left")
          .groupBy("__id")
          .agg(sum(col("__x") * coalesce(col("__w"), lit(0.0))).as("__m"))
        val resid = margins.join(labels, "__id")
          .select(col("__id"),
            (lit(1.0) / (lit(1.0) + exp(-col("__m"))) - col("__y")).as("__r"))
        val grad = feats.join(resid, "__id")
          .groupBy("__b").agg((sum(col("__x") * col("__r")) / n).as("__g"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1))
        w = grad.map { case (b, g0) =>
          val old = w.getOrElse(b, 0.0)
          val g = g0 + l2 * old
          val acc = gsq.getOrElse(b, 0.0) + g * g
          gsq(b) = acc
          b -> (old - lr * g / math.sqrt(acc + 1e-12))
        }.toMap
      }
      LrModel(w)
    } finally {
      feats.unpersist(blocking = false)
      labels.unpersist(blocking = false)
    }
  }

  /** Per-document trusted-class probability under a fitted model:
    * (id, quality_prob). Map-side except one groupBy on the doc id; the
    * model broadcasts. */
  def score(
      docs: DataFrame, idCol: String, textCol: String, model: LrModel,
      numBuckets: Int = 1 << 15): DataFrame = {
    val wDf = weightsDf(docs.sparkSession,
      if (model.weights.isEmpty) Map(-1L -> 0.0) else model.weights)
    docBuckets(docs, idCol, textCol, numBuckets)
      .join(broadcast(wDf), Seq("__b"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(sum(col("__x") * coalesce(col("__w"), lit(0.0))).as("__m"))
      .withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-col("__m"))))
      .drop("__m")
  }

  /**
   * Train-and-evaluate in one call — the gate shape: label by `labelExpr`
   * (the trusted class), train on the deterministic md5 hash-split train
   * slice, score the held-out test slice, and emit ONE row of exactly-
   * reproducible integers (slice and class sizes from the md5 split) plus
   * margin-robust quality booleans:
   *
   *  - acc_ok: held-out accuracy ≥ `minAccuracy` at the 0.5 cutoff
   *  - sep_ok: mean positive-class probability exceeds mean negative-class
   *    probability by ≥ 0.1 on the held-out slice
   *
   * Probabilities themselves never leave the plan (floating-point sums are
   * order-sensitive; booleans with margins are not).
   */
  def trainEval(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelExpr: Column,
      numBuckets: Int = 1 << 15,
      iters: Int = 30,
      lr: Double = 4.0,
      l2: Double = 1e-6,
      minAccuracy: Double = 0.75): DataFrame = {
    val labeled = docs.withColumn("__y", labelExpr.cast("double"))
      .withColumn("__split", Curation.hashSplit(textCol))
    val train = labeled.filter(col("__split") === "train")
    val test = labeled.filter(col("__split") =!= "train")
    val model = fit(train, idCol, textCol, "__y", numBuckets, iters, lr, l2)
    val scored = score(test, idCol, textCol, model, numBuckets)
      .join(test.select(col(idCol), col("__y")), idCol)
    scored.agg(
        count(lit(1)).as("n_test"),
        sum(col("__y")).cast("long").as("n_pos_test"),
        avg(when((col("quality_prob") >= 0.5) === (col("__y") === 1.0), 1.0)
          .otherwise(0.0)).as("__acc"),
        avg(when(col("__y") === 1.0, col("quality_prob"))).as("__pp"),
        avg(when(col("__y") === 0.0, col("quality_prob"))).as("__pn"))
      .crossJoin(broadcast(
        train.agg(count(lit(1)).as("n_train"),
          sum(col("__y")).cast("long").as("n_pos_train"))))
      .select(col("n_train"), col("n_pos_train"), col("n_test"), col("n_pos_test"),
        (col("__acc") >= minAccuracy).as("acc_ok"),
        (col("__pp") >= col("__pn") + 0.1).as("sep_ok"))
  }
}
