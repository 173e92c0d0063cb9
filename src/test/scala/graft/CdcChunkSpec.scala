package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

/**
 * Content-defined chunking properties the x_cdc_chunks reconstruction gate
 * cannot see: size bounds, boundary re-alignment after an insertion (the
 * reason CDC exists — fixed windows shift wholesale, gear boundaries
 * don't), determinism, and the chunk-dedup audit's response to a
 * near-duplicate corpus.
 */
class CdcChunkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Deterministic pseudo-text: LCG-picked words, no real randomness (the
  // assertions below are exact once observed, never flaky).
  private val words = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike")
  private def pseudoText(seed: Long, nWords: Int): String = {
    var x = seed
    (0 until nWords).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      words(math.floorMod(x >>> 33, words.length.toLong).toInt)
    }.mkString(" ")
  }

  private val minS = 16; private val avgS = 64; private val maxS = 256

  private def chunksOf(text: String): Seq[String] = {
    import spark.implicits._
    Curation.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", minS, avgS, maxS)
      .orderBy("chunk_id").collect().map(_.getString(2)).toSeq
  }

  test("chunks reconstruct the text; sizes respect min/max; deterministic") {
    val text = pseudoText(7L, 900)
    val cs = chunksOf(text)
    assert(cs.mkString("") == text)
    assert(cs.size > 5, s"expected several chunks, got ${cs.size}")
    assert(cs.forall(_.length <= maxS))
    // Only the final chunk (the unterminated tail) may undershoot minSize.
    assert(cs.dropRight(1).forall(_.length >= minS))
    assert(chunksOf(text) == cs) // same boundaries every run
    // Low-entropy text never fires a hash boundary — maxSize must cut it.
    val flat = chunksOf("a" * 2000)
    assert(flat.mkString("") == "a" * 2000 && flat.forall(_.length <= maxS))
  }

  test("an insertion re-aligns boundaries; fixed-size windows shift wholesale") {
    val base = pseudoText(11L, 1200)
    val edited = base.substring(0, base.length / 2) +
      " INSERTED SPAN OF NEW MATERIAL " + base.substring(base.length / 2)
    val a = chunksOf(base)
    val b = chunksOf(edited)
    // Multiset intersection: near-identical docs must share most chunks —
    // the prefix is bit-identical and the suffix re-aligns within ~one
    // chunk of the edit (gear state forgets after 64 chars).
    val shared = a.groupBy(identity).map { case (c, g) =>
      math.min(g.size, b.count(_ == c)) }.sum
    assert(shared >= (a.size * 7) / 10,
      s"CDC chunks shared $shared of ${a.size} after a mid-doc insertion")
    // Contrast: fixed-size windows at the same granularity share (almost)
    // nothing past the edit point — the failure mode CDC exists to fix.
    def fixed(s: String) = s.grouped(avgS).toSeq
    val fa = fixed(base); val fb = fixed(edited)
    val fshared = fa.groupBy(identity).map { case (c, g) =>
      math.min(g.size, fb.count(_ == c)) }.sum
    assert(fshared < shared,
      s"fixed-size sharing ($fshared) should trail CDC sharing ($shared)")
  }

  test("chunkDupStats: near-duplicate corpus dedups, unique corpus does not") {
    import spark.implicits._
    val base = pseudoText(23L, 1500)
    val nearDup = (0L until 8L).map { i =>
      (i, base.substring(0, 200 * i.toInt) + s" EDIT$i " +
        base.substring(200 * i.toInt))
    }
    val dup = Curation.chunkDupStats(nearDup.toDF("doc_id", "text"),
      "doc_id", "text", minS, avgS, maxS).head()
    assert(dup.getAs[Double]("dedup_ratio") < 0.5,
      s"8 near-copies should dedup below 0.5, got ${dup.getAs[Double]("dedup_ratio")}")
    assert(dup.getAs[Long]("n_distinct_chunks") < dup.getAs[Long]("n_chunks"))
    val uniq = Curation.chunkDupStats(
      (0L until 8L).map(i => (i, pseudoText(100 + i, 800))).toDF("doc_id", "text"),
      "doc_id", "text", minS, avgS, maxS).head()
    assert(uniq.getAs[Double]("dedup_ratio") > 0.9,
      s"independent docs should barely dedup, got ${uniq.getAs[Double]("dedup_ratio")}")
  }
}
