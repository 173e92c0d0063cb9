package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.streaming.CurationStream
import graft.table.GraftTable

/** Streaming ingest curation end-to-end: quality gate, in-batch exact +
  * near dedup, incremental near-dedup against the persisted corpus state,
  * and state growth so later waves see earlier waves' ingests. */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ~20-token base texts; variants share >50% of 3-gram shingles.
  private val baseA = "the quick brown fox jumps over the lazy dog near the old stone bridge every single morning in spring"
  private val baseStored = "data pipelines shuffle partition bucket merge commit snapshot manifest footer statistics pruning broadcast join skew salt spill memory executor"
  private def nearOf(t: String, tail: String) =
    t.split(" ").dropRight(1).mkString(" ") + " " + tail

  private def jl(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  test("curation stream: filter, dedup in-batch and vs corpus, grow state across waves") {
    val wh = TestSpark.tmpDir("curation-wh-")
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    val corpus = cat.materialized("corpus")
    // Seed corpus with one stored doc + its dedup state.
    val seed = Seq((1000L, baseStored)).toDF("doc_id", "text")
    corpus.overwrite(seed)
    val (buckets, shingles) =
      Dedup.persistDedupState(cat, "corpus_state", seed, "doc_id", "text")

    val in = TestSpark.tmpDir("curation-in-")
    val ckpt = TestSpark.tmpDir("curation-ckpt-").toString

    // Wave 1: A good+novel; B low quality (3 tokens); C near-dup of the
    // STORED doc; D/E exact dups of each other; F/G near-dups of each
    // other (both novel).
    Files.write(in.resolve("w1.json"), Seq(
      jl(1, baseA),
      jl(2, "too short text"),
      jl(3, nearOf(baseStored, "driver")),
      jl(4, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      jl(5, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      jl(6, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
      jl(7, nearOf("one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty", "final"))
    ).mkString("\n").getBytes)

    val q = CurationStream.start(spark, in.toString, corpus, buckets, shingles,
      ckpt, minJaccard = 0.5, trigger = Trigger.AvailableNow())
    q.awaitTermination()

    val after1 = corpus.read().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after1 == Set(1000L, 1L, 4L, 6L),
      s"wave 1 must keep A, D(min), F(min): $after1")

    // Wave 2: H near-dup of doc 6 (ingested in wave 1 — catches it only if
    // the state grew); I novel.
    Files.write(in.resolve("w2.json"), Seq(
      jl(8, nearOf("one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty", "closing")),
      jl(9, "completely different subject matter entirely about cooking pasta sauces tomatoes basil garlic olive oil parmesan oregano salt")
    ).mkString("\n").getBytes)

    val q2 = CurationStream.start(spark, in.toString, corpus, buckets, shingles,
      ckpt, minJaccard = 0.5, trigger = Trigger.AvailableNow())
    q2.awaitTermination()

    val after2 = corpus.read().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1000L, 1L, 4L, 6L, 9L),
      s"wave 2 must reject the near-dup of the wave-1 ingest: $after2")

    // Idempotence: replaying the stream from the same checkpoint ingests
    // nothing new.
    val q3 = CurationStream.start(spark, in.toString, corpus, buckets, shingles,
      ckpt, minJaccard = 0.5, trigger = Trigger.AvailableNow())
    q3.awaitTermination()
    assert(corpus.read().count() == 5)
  }

  test("a retried micro-batch converges from every crash point between its appends") {
    import graft.streaming.CurationStream
    // Two novel docs that pass quality and don't dedup against each other.
    def batchDf = Seq(
      (10L, (0 until 20).map(t => s"crashdoc one tok$t").mkString(" ")),
      (11L, (0 until 20).map(t => s"crashdoc two word$t").mkString(" "))
    ).toDF("doc_id", "text")

    def freshTables(tag: String) = {
      val cat = new graft.catalog.GraftCatalog(spark, TestSpark.tmpDir(s"crash-$tag-"))
      val corpus = cat.materialized("corpus")
      corpus.overwrite(Seq((1000L, baseStored)).toDF("doc_id", "text"))
      val (b, s) = Dedup.persistDedupState(cat, "cstate",
        Seq((1000L, baseStored)).toDF("doc_id", "text"), "doc_id", "text",
        numBuckets = 8)
      (corpus, b, s)
    }
    def stateOf(t: GraftTable, cols: Seq[String]) =
      t.read().select(cols.head, cols.tail: _*).collect()
        .map(_.toSeq.toString).sorted.toSeq

    // Reference: the batch processed once, no crash.
    val (c0, b0, s0) = freshTables("ref")
    CurationStream.processBatch(batchDf, 0L, c0, b0, s0, minJaccard = 0.5)
    val wantCorpus = stateOf(c0, Seq("doc_id"))
    val wantBuckets = stateOf(b0, Seq("doc_id", "bkey"))
    val wantShingles = stateOf(s0, Seq("doc_id", "sh"))
    assert(wantCorpus.size == 3, s"both docs + seed ingest: $wantCorpus")

    // The survivor set the pipeline would compute for this batch (both
    // docs are novel and clean), appended manually with the SAME batch
    // keys processBatch uses — each prefix is a crash point's table state.
    val crashPoints: Seq[(String, (GraftTable, GraftTable, GraftTable) => Unit)] = Seq(
      "before any append" -> ((_, _, _) => ()),
      "after corpus append" -> ((c, _, _) =>
        { c.append(batchDf, batchKey = Some("curate-0")); () }),
      "after corpus + buckets appends" -> ((c, b, _) => {
        c.append(batchDf, batchKey = Some("curate-0"))
        b.append(Dedup.bandBuckets(batchDf, "doc_id", "text").toDF("doc_id", "bkey"),
          batchKey = Some("curate-0-buckets"))
        ()
      }))
    crashPoints.foreach { case (label, landPrefix) =>
      val (c, b, s) = freshTables(label.take(8).replaceAll("\\W", ""))
      landPrefix(c, b, s)
      // The retry: Structured Streaming re-invokes foreachBatch with the
      // same batch id and (by source replay) the same rows.
      CurationStream.processBatch(batchDf, 0L, c, b, s, minJaccard = 0.5)
      assert(stateOf(c, Seq("doc_id")) == wantCorpus,
        s"corpus diverged after crash $label")
      assert(stateOf(b, Seq("doc_id", "bkey")) == wantBuckets,
        s"bucket state diverged after crash $label")
      assert(stateOf(s, Seq("doc_id", "sh")) == wantShingles,
        s"shingle state diverged after crash $label")
      // ...and the converged state still rejects a near-dup of the batch.
      CurationStream.processBatch(
        Seq((99L, (0 until 19).map(t => s"crashdoc one tok$t").mkString(" ") + " tail"))
          .toDF("doc_id", "text"), 1L, c, b, s, minJaccard = 0.5)
      assert(!c.read().select("doc_id").collect().map(_.getLong(0)).contains(99L),
        s"near-dup must be rejected after crash $label")
    }
  }

  test("maintenance cadence bounds the state tables' dir count across many batches") {
    val wh = TestSpark.tmpDir("curation-mnt-wh-")
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    val corpus = cat.materialized("corpus")
    val seed = Seq((1000L, baseStored)).toDF("doc_id", "text")
    corpus.overwrite(seed)
    val (buckets, shingles) = Dedup.persistDedupState(
      cat, "corpus_state", seed, "doc_id", "text", numBuckets = 8)

    val in = TestSpark.tmpDir("curation-mnt-in-")
    val ckpt = TestSpark.tmpDir("curation-mnt-ckpt-").toString
    // Nine single-file micro-batches of two fully-distinct docs each
    // (disjoint token streams — nothing dedups against anything).
    val nBatches = 9
    for (b <- 0 until nBatches) {
      val docs = Seq(0, 1).map { j =>
        val id = 100L + b * 2 + j
        jl(id, (0 until 20).map(t => s"w${b}x${j}t$t").mkString(" "))
      }
      Files.write(in.resolve(f"mb$b%02d.json"), docs.mkString("\n").getBytes)
    }
    // maxFilesPerTrigger=1 → one file per micro-batch, nine batches;
    // maintenance fires inside batches 2, 5 and 8.
    val q = CurationStream.start(spark, in.toString, corpus, buckets, shingles,
      ckpt, minJaccard = 0.5, trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger = 1, maintainEvery = 3)
    q.awaitTermination()

    assert(corpus.read().count() == 1 + nBatches * 2, "every doc ingested")
    // The final batch (8) appended then folded: every small dir collapses
    // into one commit — one dir for the unbucketed corpus, one leaf per
    // bucket for the bucketed state tables. Without maintenance the counts
    // would be ~nBatches (corpus) and ~nBatches×8 (state leaves).
    val corpusDirs = corpus.log.latest().get.dataDirs.size
    val bucketDirs = buckets.log.latest().get.dataDirs.size
    val shingleDirs = shingles.log.latest().get.dataDirs.size
    assert(corpusDirs <= 2, s"corpus dirs not folded: $corpusDirs")
    assert(bucketDirs <= 8, s"bucket-state leaves not folded: $bucketDirs")
    assert(shingleDirs <= 8, s"shingle-state leaves not folded: $shingleDirs")
    // The folded state still rejects near-dups of folded-in docs.
    Files.write(in.resolve("mb99.json"), Seq(
      jl(999L, (0 until 19).map(t => s"w0x0t$t").mkString(" ") + " tail")
    ).mkString("\n").getBytes)
    val q2 = CurationStream.start(spark, in.toString, corpus, buckets, shingles,
      ckpt, minJaccard = 0.5, trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger = 1, maintainEvery = 3)
    q2.awaitTermination()
    val ids = corpus.read().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(999L), "near-dup of a folded-in doc must be rejected")
  }
}
