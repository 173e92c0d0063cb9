package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Dedup, Similarity, TextAnalysis}

/**
 * Degenerate-input behavior across the pipeline operators: empty corpus,
 * single document, empty text. At 100 TB these aren't corner cases — some
 * partition, some ingest batch, some filtered subset WILL be empty, and an
 * operator that throws there kills the whole job.
 */
class EdgeCaseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("empty corpus: dedup, clustering, packing, sampling, oov all yield zero rows") {
    assert(Dedup.exactDedup(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.nearDupPairs(emptyDocs, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.nearDupClusters(emptyDocs, "doc_id", "text", 0.5).count() == 0)
    assert(Curation.packSequences(emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.stratifiedSample(emptyDocs, "doc_id", "doc_id", "text", 0.5).count() == 0)
    assert(TextAnalysis.oovStats(emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.weightedMix(emptyDocs, "doc_id", "doc_id", "text",
      weights = Map.empty).count() == 0)
  }

  test("empty/null corpora: the span and scoring family degrade cleanly") {
    assert(Dedup.dupSpans(emptyDocs, "doc_id", "text", 8).count() == 0)
    assert(Dedup.stripDupSpans(emptyDocs, "doc_id", "text", 8).count() == 0)
    val one = Seq((1L, "one real document body here")).toDF("doc_id", "text")
    assert(Curation.contaminationSpans(one, emptyDocs, "doc_id", "text").count() == 0)
    // stripContamination with an empty benchmark is the identity on the
    // normalized token stream.
    assert(Curation.stripContamination(one, emptyDocs, "doc_id", "text")
      .head.getString(1) == "one real document body here")
    // Two null-text docs share a fingerprintable nothing — no spans.
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.dupSpans(nulls, "doc_id", "text", 8).count() == 0)
    // Empty DSIR target is well-defined (smoothing over the raw vocab);
    // an empty LM reference raises the clear in-plan error.
    assert(graft.ops.Importance.dsirTopK(one, emptyDocs, "doc_id", "text", 5).count() == 1)
    val e = intercept[Exception] {
      graft.ops.Importance.bigramLmTopK(one, emptyDocs, "doc_id", "text", 5).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-empty reference")), s"got: ${msgs(e)}")
  }

  test("empty corpus: bloom builds an empty sketch that flags nothing") {
    val bloom = Dedup.corpusBloom(emptyDocs, "text", expectedItems = 100)
    val batch = Seq((1L, "anything at all")).toDF("doc_id", "text")
    val flagged = Dedup.bloomFlag(batch, "doc_id", "text", bloom)
      .select("maybe_dup").as[Boolean].collect()
    assert(flagged.toSeq == Seq(false))
  }

  test("single document: no pairs, own cluster, one sequence") {
    val one = Seq((7L, "just one lonely document here")).toDF("doc_id", "text")
    assert(Dedup.nearDupPairs(one, "doc_id", "text", 0.5).count() == 0)
    val cc = Dedup.nearDupClusters(one, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toSeq
    assert(cc == Seq((7L, 7L)))
    val packed = Curation.packSequences(one, "doc_id", "text", budget = 2, shards = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(packed == Seq((7L, 3L, 0L, 0L, 5L))) // 5 tokens > budget: own seq
  }

  test("empty texts: tokenize to one empty token and flow through without error") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real words here")).toDF("doc_id", "text")
    // Empty and whitespace-only texts normalize identically → exact dups.
    assert(Dedup.exactDedup(docs, "doc_id", "text").count() == 2)
    val packed = Curation.packSequences(docs, "doc_id", "text", budget = 4, shards = 1)
    assert(packed.count() == 3 &&
      packed.agg(sum("n_tokens")).head.getLong(0) == 5L) // 1 + 1 + 3
    val oov = TextAnalysis.oovStats(docs, "doc_id", "text", topK = 2)
    assert(oov.count() == 3)
    assert(TextAnalysis.qualityMetrics(docs, "doc_id", "text").count() == 3)
  }

  test("null texts: no pairs among null-text docs, singleton clusters") {
    // xxhash64 of a null shingle array is the (non-null) seed constant, so
    // without the explicit filter every null-text doc would share one
    // collapse fingerprint and the intra-group expansion would pair them —
    // where the un-collapsed LSH path and exactJaccardPairs emit nothing.
    val docs = Seq((1L, null), (2L, null), (3L, "real words here again ok"),
      (4L, "real words here again yes")).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.3)
      .as[(Long, Long)].collect().toSeq
    assert(!pairs.exists(p => p._1 == 1L || p._1 == 2L || p._2 == 1L || p._2 == 2L),
      s"null-text docs must pair with nothing: $pairs")
    // ...but nearDupClusters still labels EVERY input doc — the null-text
    // docs as their own singletons (clusterDocs-parity contract).
    val cc = Dedup.nearDupClusters(docs, "doc_id", "text", 0.3)
      .as[(Long, Long)].collect().toMap
    assert(cc.keySet == Set(1L, 2L, 3L, 4L), s"one label per doc: $cc")
    assert(cc(1L) == 1L && cc(2L) == 2L, s"null-text docs are singletons: $cc")
  }

  test("non-integral id columns are rejected loudly, not silently collapsed") {
    // The collapse operators key internal joins on the id cast to long; a
    // string UUID would cast to NULL and merge unrelated docs. The guard
    // turns that silent wrongness into an upfront error.
    val docs = Seq(("a-1", "some text here"), ("b-2", "other text there"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](
      Dedup.nearDupPairs(docs, "doc_id", "text", 0.5))
    assert(e1.getMessage.contains("integral id"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Dedup.nearDupClusters(docs, "doc_id", "text", 0.5))
    assert(e2.getMessage.contains("integral id"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Curation.packSequences(docs, "doc_id", "text"))
    assert(e3.getMessage.contains("integral id"), e3.getMessage)
    val vecs = Seq(("a-1", Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e4 = intercept[IllegalArgumentException](
      Similarity.cosineDupPairsLsh(vecs, "vec_id", "embedding", 0.9))
    assert(e4.getMessage.contains("integral id"), e4.getMessage)
    // The EXACT paths keep accepting any orderable id type.
    assert(Dedup.exactDedup(docs, "doc_id", "text").count() == 2)
    // ...and exact-integral decimals (how Spark surfaces parquet uint64)
    // pass the guard: scale-0, precision <= 18 casts to long losslessly.
    val dec = Seq((1L, "alpha text here"), (2L, "beta text there"))
      .toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id").cast(DecimalType(18, 0)))
    assert(Dedup.nearDupPairs(dec, "doc_id", "text", 0.9).count() == 0)
  }
}
