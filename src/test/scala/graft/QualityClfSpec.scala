package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QualityClassifier

/** In-engine logistic-regression quality classifier: learnability on
  * planted tasks, probability sanity, and the rare-feature guard. */
class QualityClfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 docs: half contain the marker token 'goodword', half don't; filler
  // varies so the corpus isn't two exact texts.
  private def corpus = (0 until 40).map { i =>
    val filler = s"filler${i % 7} common words here body text ${i % 5}"
    val marked = i % 2 == 0
    (i.toLong, if (marked) s"$filler goodword extra tail" else s"$filler plain tail",
      if (marked) 1.0 else 0.0)
  }.toDF("doc_id", "text", "y")

  test("fit learns a single-marker task to high training accuracy") {
    val m = QualityClassifier.fit(corpus, "doc_id", "text", "y",
      numBuckets = 256, iters = 40, lr = 4.0, minDf = 2)
    val scored = QualityClassifier.score(corpus, "doc_id", "text", m, numBuckets = 256)
      .join(corpus.select($"doc_id", $"y"), "doc_id")
    val acc = scored.agg(avg(when(($"quality_prob" >= 0.5) === ($"y" === 1.0), 1.0)
      .otherwise(0.0))).head.getDouble(0)
    assert(acc >= 0.95, s"marker task must be learnable, got $acc")
  }

  test("scores are probabilities and separate the classes") {
    val m = QualityClassifier.fit(corpus, "doc_id", "text", "y",
      numBuckets = 256, iters = 40, lr = 4.0, minDf = 2)
    val s = QualityClassifier.score(corpus, "doc_id", "text", m, numBuckets = 256)
      .join(corpus.select($"doc_id", $"y"), "doc_id")
    val r = s.agg(min("quality_prob"), max("quality_prob"),
      avg(when($"y" === 1.0, $"quality_prob")),
      avg(when($"y" === 0.0, $"quality_prob"))).head
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
    assert(r.getDouble(2) > r.getDouble(3) + 0.2, s"classes must separate: $r")
  }

  test("minDf drops one-document features from the model") {
    val m = QualityClassifier.fit(corpus, "doc_id", "text", "y",
      numBuckets = 1 << 15, iters = 5, lr = 1.0, minDf = 2)
    // 'filler3 common' appears in several docs; a bucket only one doc uses
    // (e.g. the bigram 'goodword extra' appears in all marked docs — use a
    // genuinely unique token instead). Plant one:
    val withUnique = corpus.unionByName(
      Seq((999L, "onlyonceword solitary text body", 0.0)).toDF("doc_id", "text", "y"))
    val m2 = QualityClassifier.fit(withUnique, "doc_id", "text", "y",
      numBuckets = 1 << 15, iters = 5, lr = 1.0, minDf = 2)
    val b = spark.range(1)
      .select(pmod(xxhash64(lit("onlyonceword")), lit((1L << 15)))).head.getLong(0)
    assert(!m2.weights.contains(b), "a df=1 feature must not enter the model")
    assert(m.weights.contains(-1L) && m2.weights.contains(-2L),
      "intercept and length meta-features always survive")
  }

  test("trainEval emits reproducible split integers and quality booleans") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val lbl = size(filter(graft.ops.Dedup.tokens(col("text")), t => t === "the")) >= 2
    val r = QualityClassifier.trainEval(docs, "doc_id", "text", lbl,
      numBuckets = 256, iters = 20, lr = 8.0, l2 = 1e-4).head
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == docs.count())
    assert(r.getAs[Long]("n_pos_train") <= r.getAs[Long]("n_train"))
    // At sf0.001 (50 docs) the probe task is below the learnability
    // floor — the quality booleans are exercised at gate scale (sf0.01+,
    // green in x_quality_clf); here assert only that they evaluate.
    assert(!r.isNullAt(r.fieldIndex("acc_ok")) && !r.isNullAt(r.fieldIndex("sep_ok")))
  }
}
