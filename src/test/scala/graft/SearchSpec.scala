package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.search.Search

/** Two-tier search semantics (ES AND-match + phrase boost / LIKE fallback). */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

  test("AND-match requires every term; phrase hit boosts to 10.0; top-size respected") {
    val res = Search.searchRanked(docs, "doc_id", "text", "merge batch", size = 50)
    val rows = res.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val text = r.getAs[String]("text").toLowerCase
      assert(text.split(" ").contains("merge") && text.split(" ").contains("batch"))
      val expected = if (text.contains("merge batch")) 10.0 else 1.0
      assert(r.getAs[Double]("score") == expected)
    }
    // phrase hits sort above non-phrase hits
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sortBy(-_.toDouble))
  }

  test("digit query routes to id equality; text query scans all string columns") {
    val byId = Search.likeFallback(docs, "doc_id", "42").collect()
    assert(byId.length == 1 && byId(0).getLong(0) == 42L)
    val byKw = Search.likeFallback(docs, "doc_id", "src3").collect()
    assert(byKw.nonEmpty && byKw.forall(_.getAs[String]("source") == "src3"))
  }

  test("inverted index: one posting per distinct (token, doc); doc-freq sane") {
    val idx = Search.buildIndex(docs, "doc_id", "text")
    assert(idx.count() == idx.distinct().count())
    val df = Search.docFreq(idx)
    val total = docs.count()
    assert(df.filter($"n_docs" > total).count() == 0)
    val hits = Search.fetchByIds(docs, "doc_id", Seq("1", "2"))
    assert(hits.count() == 2)
  }

  test("posting intersection runs rarest term first; unknown terms sort first") {
    val idx = Search.buildIndex(docs, "doc_id", "text")
    val freq = Search.docFreq(idx).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("n_docs")).toMap
    // pick one common and one rare real token, plus a term not in the index
    val byFreq = freq.toSeq.sortBy(_._2)
    val (rare, common) = (byFreq.head._1, byFreq.last._1)
    val ordered = Search.rareFirst(idx, Seq(common, rare, "zz_not_a_token"))
    assert(ordered == Seq("zz_not_a_token", rare, common))
    val counts = ordered.map(t => freq.getOrElse(t, 0L))
    assert(counts == counts.sorted)
    // the reordering must not change AND-match results
    val viaIdx = Search.searchViaIndex(docs, idx, "doc_id", "text", "merge batch")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val scan = Search.searchRanked(docs, "doc_id", "text", "merge batch")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIdx == scan)
  }

  test("multi-column index AND-matches terms split across columns (cross_fields)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "alpha beta", "milan", "x"),   // 'alpha' in text, 'milan' in city
      (2L, "alpha milan", "paris", "x"),  // both terms in text alone
      (3L, "alpha beta", "paris", "x"),   // no 'milan' anywhere
      (4L, "gamma", "milan", "x"),        // no 'alpha' anywhere
      (5L, "alpha milan zeta", null, "x")) // NULL column must not erase postings
      .toDF("id", "text", "city", "etc")
    val cols = Search.stringCols(rows)
    assert(cols == Seq("text", "city", "etc"))
    val idx = Search.buildIndex(rows, "id", cols)
    val hits = Search.searchViaIndex(rows, idx, "id", cols, "alpha milan", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L, 5L), s"cross-column AND must hit 1, 2 and 5 (NULL city on 5 must not erase its text postings), got $hits")
    // the single-column index misses the cross-column row — the gap the
    // multi-column tier closes
    val single = Search.buildIndex(rows, "id", "text")
    val singleHits = Search.searchViaIndex(rows, single, "id", "text", "alpha milan", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(singleHits == Set(2L, 5L))
    // persisted multi-column index: same answer via bucket-pruned lookups
    val cat = new graft.catalog.GraftCatalog(spark, TestSpark.tmpDir("idx-mc-"))
    val pidx = Search.persistIndex(cat, "mc_idx", rows, "id", cols, 8, overwrite = false)
    val pHits = Search.searchPersistedIndex(rows, pidx, "id", cols, "alpha milan", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pHits == Set(1L, 2L, 5L))
    // phrase boost spans columns: exact phrase inside a single column
    val scored = Search.searchViaIndex(rows, idx, "id", cols, "alpha milan", 50)
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(2L) == 10.0 && scored(5L) == 10.0 && scored(1L) == 1.0)
  }
}
