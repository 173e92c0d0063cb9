package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Dedup, TextAnalysis}

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
}
