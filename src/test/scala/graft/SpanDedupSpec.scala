package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Importance}

/** Duplicate n-gram span detection / stripping and DSIR importance
  * weighting — semantic unit tests on hand-built corpora where the
  * expected spans and rankings are known exactly. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 12-token boilerplate run shared verbatim by docs 1 and 2, embedded at
  // different offsets; doc 3 is disjoint.
  private val boiler = "the quick brown fox jumps over the lazy dog every single day"
  private def corpus = Seq(
    (1L, s"alpha beta $boiler gamma delta"),
    (2L, s"$boiler epsilon zeta eta theta iota kappa"),
    (3L, "one two three four five six seven eight nine ten eleven twelve")
  ).toDF("doc_id", "text")

  test("dupSpans: shared run becomes one merged span at each doc's offset") {
    val spans = Dedup.dupSpans(corpus, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Doc 1: boiler occupies tokens [2, 14) -> five 8-windows starting at
    // 2..6 merge to [2, 14). Doc 2: tokens [0, 12) -> windows 0..4 -> [0, 12).
    assert(spans == Set((1L, 2L, 14L), (2L, 0L, 12L)))
  }

  test("dupSpans: n_windows counts the merged windows per span") {
    val r = Dedup.dupSpans(corpus, "doc_id", "text", n = 8)
      .filter($"doc_id" === 1L).head
    assert(r.getAs[Long]("n_windows") == 5L)
  }

  test("dupSpans: intra-document repetition alone is not cross-doc duplication") {
    val selfRep = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "totally different words in this second document here now")
    ).toDF("doc_id", "text")
    assert(Dedup.dupSpans(selfRep, "doc_id", "text", n = 3).count() == 0)
  }

  test("dupSpans: short duplicated doc flags its whole-stream fallback window") {
    val short = Seq(
      (1L, "tiny shared doc"), (2L, "tiny shared doc"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(short, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Fallback window at pos 0, end clamped to the 3-token stream.
    assert(spans == Set((1L, 0L, 3L), (2L, 0L, 3L)))
  }

  test("stripDupSpans keeps the min-id copy and strips the others") {
    val out = Dedup.stripDupSpans(corpus, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Doc 1 (keeper of every shared window) keeps its normalized stream.
    assert(out(1L) == s"alpha beta $boiler gamma delta")
    // Doc 2 loses the boilerplate span, keeps its own tail.
    assert(out(2L) == "epsilon zeta eta theta iota kappa")
    // Untouched doc: normalized token stream unchanged.
    assert(out(3L) == "one two three four five six seven eight nine ten eleven twelve")
  }

  test("stripDupSpans: a fully-duplicated copy strips to the empty string") {
    val dup = Seq(
      (1L, "exact copy of this very doc with many tokens inside"),
      (2L, "exact copy of this very doc with many tokens inside")).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(dup, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).nonEmpty && out(2L) == "")
  }

  test("contaminationSpans localizes the benchmark overlap inside the doc") {
    val corpus = Seq(
      (1L, s"intro words here $boiler closing remarks follow"),
      (2L, "completely unrelated content with no benchmark overlap at all")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, boiler)).toDF("doc_id", "text")
    val spans = graft.ops.Curation.contaminationSpans(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // boiler (12 tokens) sits at tokens [3, 15): 5-windows 3..10 merge.
    assert(spans == Set((1L, 3L, 15L)))
  }

  test("stripContamination removes the quoted span, keeps the rest") {
    val corpus = Seq((1L, s"intro words here $boiler closing remarks follow"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, boiler)).toDF("doc_id", "text")
    val out = graft.ops.Curation.stripContamination(corpus, bench, "doc_id", "text", n = 5)
      .head.getString(1)
    assert(out == "intro words here closing remarks follow")
  }

  test("incremental span state: re-ingested docs flag, appended state extends") {
    val wh = java.nio.file.Files.createTempDirectory("graft-spanstate-spec-")
    wh.toFile.deleteOnExit()
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    val state = Dedup.persistSpanState(cat, "spans_spec", corpus, "doc_id", "text")
    // Doc 1 re-ingested verbatim → full-stream span [0, 16); a reversed
    // doc shares no 8-token run.
    val batch = Seq(
      (101L, s"alpha beta $boiler gamma delta"),
      (102L, corpus.filter($"doc_id" === 3L).head.getString(1)
        .split(" ").reverse.mkString(" "))).toDF("doc_id", "text")
    val spans = Dedup.dupSpansIncremental(batch, "doc_id", "text", state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((101L, 0L, 16L)))
    // Append the reversed doc's windows; re-probing now flags it fully.
    Dedup.appendSpanState(state, batch.filter($"doc_id" === 102L), "doc_id", "text")
    val spans2 = Dedup.dupSpansIncremental(batch, "doc_id", "text", state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans2 == Set((101L, 0L, 16L), (102L, 0L, 12L)))
  }

  test("bigram LM ranks reference-like prose above unseen-vocabulary docs") {
    val raw = Seq(
      (1L, "the cat sat on the mat and the dog sat too"),
      (2L, "the cat sat on the mat quietly today"),
      (3L, "zq wv xk jh qp zzkw vvnm hjkl qwer")
    ).toDF("doc_id", "text")
    val ref = raw.filter($"doc_id" === 1L)
    val scores = Importance.bigramLmScores(raw, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_log_prob")).toMap
    assert(scores(2L) > scores(3L), s"reference-like doc must score higher: $scores")
    val top = Importance.bigramLmTopK(raw, ref, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).map(_._1)
    assert(top.head == 1L, s"the reference doc itself is most fluent: ${top.toSeq}")
  }

  test("bigram LM: sub-2-token docs have no score rows") {
    val raw = Seq((1L, "single"), (2L, "two tokens here")).toDF("doc_id", "text")
    val ids = Importance.bigramLmScores(raw, raw, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("dsir: target-vocabulary docs outweigh disjoint-vocabulary docs") {
    val raw = Seq(
      (1L, "physics energy quantum field theory lattice gauge symmetry"),
      (2L, "physics energy quantum mechanics wave function collapse model"),
      (3L, "recipe butter sugar flour eggs vanilla oven baking tray"),
      (4L, "football score goal referee penalty match league season")
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" <= 1L)
    val w = Importance.dsirLogWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Doc 2 shares unigrams with the target; docs 3/4 share none.
    assert(w(2L) > w(3L) && w(2L) > w(4L))
    // The target doc itself scores highest of all.
    assert(w(1L) > w(2L))
  }

  test("dsirTopK: rank order follows the weights with id tie-break") {
    val raw = Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "xx yy zz ww")
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" === 1L)
    val top = Importance.dsirTopK(raw, target, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // Docs 1 and 2 are identical -> identical weights -> id tie-break.
    assert(top.sortBy(_._2).map(_._1).toSeq == Seq(1L, 2L, 3L))
  }
}
