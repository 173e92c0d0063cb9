package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

/** Unit tests for the corpus-curation operators over the driver corpus. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

  test("chunking: chunks tile the token stream with the declared overlap") {
    val window = 32
    val overlap = 4
    val stride = window - overlap
    val chunks = Curation.chunkTokens(docs, "doc_id", "text", window, overlap)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getInt(2), r.getString(3)))
    val toks = docs.select(col("doc_id"), graft.functions.Tokenize.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, "chunk ids dense from 0")
      // Every chunk is the exact token slice, all ≤ window, last covers the tail.
      sorted.foreach { case (_, ci, n, text) =>
        val want = toks(id).slice(ci * stride, ci * stride + window)
        assert(text == want.mkString(" ") && n == want.size && n <= window)
      }
      assert(sorted.last._2 * stride + sorted.last._3 == toks(id).size, "tail covered")
      // A doc under `window` tokens yields exactly one chunk.
      if (toks(id).size <= window) assert(sorted.length == 1)
    }
  }

  test("chunking boundaries: exhaustive token counts 1..80 across window shapes") {
    for ((window, overlap) <- Seq((32, 4), (8, 0), (5, 4))) {
      val stride = window - overlap
      val d = (1 to 80).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val got = graft.ops.Curation.chunkTokens(d, "doc_id", "text", window, overlap)
        .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getInt(2), r.getString(3)))
        .groupBy(_._1)
      (1 to 80).foreach { n =>
        val toks = (1 to n).map(i => s"t$i")
        // Reference: greedy fixed-stride tiling; last chunk covers the tail.
        val expect = Iterator.from(0).map(i => toks.slice(i * stride, i * stride + window))
          .takeWhile(_.nonEmpty).zipWithIndex
          .map { case (c, i) => (i, c.size, c.mkString(" ")) }.toVector
        val want = if (n <= window) expect.take(1)
          else expect.filter { case (i, sz, _) => i == 0 || sz > overlap }
        val g = got(n.toLong).sortBy(_._2).map(t => (t._2, t._3, t._4)).toVector
        assert(g == want, s"n=$n window=$window overlap=$overlap")
      }
    }
  }

  test("hash split: total, deterministic, all three splits present, ~80/10/10") {
    val split = Curation.withSplit(docs, "text").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(split.size == docs.count())
    val frac = split.values.groupBy(identity).view.mapValues(_.size.toDouble / split.size)
    assert(frac("train") > 0.6 && frac("val") > 0.01 && frac("test") > 0.01)
    val again = Curation.withSplit(docs, "text").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(again == split, "split assignment must be deterministic")
  }

  test("hash sampling: deterministic, monotone in the fraction, exact at the poles") {
    val n = docs.count()
    assert(docs.filter(Curation.sampleByHash("text", 0)).count() == 0)
    assert(docs.filter(Curation.sampleByHash("text", 0x10000)).count() == n)
    val q1 = docs.filter(Curation.sampleByHash("text", 0x4000))
    val q3 = docs.filter(Curation.sampleByHash("text", 0xC000))
    val (c1, c3) = (q1.count(), q3.count())
    assert(c1 > 0 && c1 < c3 && c3 < n)
    // A kept doc at 25% stays kept at 75% (nested samples).
    assert(q1.join(q3, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("per-group cap: at most k per group, deterministic membership") {
    val capped = Curation.capPerGroup(docs, "lang", "doc_id", "text", 10)
    val sizes = capped.groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 10) && sizes.nonEmpty)
    val again = Curation.capPerGroup(docs, "lang", "doc_id", "text", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("redaction: urls, emails and phones are each caught and counted") {
    val d = Seq((1L, "see https://x.io/a?b=1 mail a.b@c.org call 555-123-4567 end"),
      (2L, "clean text with no pii at all")).toDF("doc_id", "text")
    val got = Curation.redactionReport(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L)._1 == "see <URL> mail <EMAIL> call <PHONE> end")
    assert(got(1L)._2 == 1 && got(1L)._3 == 1 && got(1L)._4 == 1)
    assert(got(2L) == (("clean text with no pii at all", 0, 0, 0)))
  }

  test("decontamination: hit docs share 5-grams with the benchmark; output is disjoint") {
    val bench = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val hits = Curation.contaminationHits(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(hits.nonEmpty, "corpus must contain planted near-dups crossing the split")
    assert(hits.keys.forall(_ % 5 != 0))
    assert(hits.values.forall(_ > 0))
    val clean = Curation.decontaminate(corpus, bench, "doc_id", "text")
    assert(clean.count() == corpus.count() - hits.size)
    assert(clean.filter(col("doc_id").isin(hits.keys.toSeq: _*)).count() == 0)
  }

  test("line dedup: boilerplate lines drop everywhere, order survives, empty docs vanish") {
    import spark.implicits._
    // "nav" appears in 3 docs (> maxDocFreq=2) → boilerplate; "rare" lines
    // are unique; doc 4 is ALL boilerplate and must disappear; doc 1's
    // surviving lines must keep their original relative order.
    val docs = Seq(
      (1L, "alpha\nnav\nbeta"),
      (2L, "nav\ngamma"),
      (3L, "delta\nnav"),
      (4L, "nav")).toDF("doc_id", "text")
    val out = Curation.dropRepeatedLines(docs, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> ("alpha\nbeta", 2L),
      2L -> ("gamma", 1L),
      3L -> ("delta", 1L)), s"got $out")
    // at maxDocFreq=4 ("nav" is in exactly 4 docs) nothing is boilerplate
    val intact = Curation.dropRepeatedLines(docs, "doc_id", "text", maxDocFreq = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(intact(1L) == "alpha\nnav\nbeta" && intact(4L) == "nav")
    // a line repeated WITHIN one doc counts that doc once toward the
    // frequency, and both copies survive in order
    val twice = Seq((1L, "x\nx\ny"), (2L, "z")).toDF("doc_id", "text")
    val kept = Curation.dropRepeatedLines(twice, "doc_id", "text", maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == "x\nx\ny", s"got $kept")
    // blank lines (paragraph separators) are exempt from the boilerplate
    // cap even when every document contains one, and NULL text passes
    // through as an empty document instead of vanishing
    val para = Seq((1L, "a\n\nb"), (2L, "\nc"), (3L, "d\n"), (4L, null))
      .toDF("doc_id", "text")
    val out2 = Curation.dropRepeatedLines(para, "doc_id", "text", maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // blank lines survive but do NOT count as kept content: the NULL doc is
    // an empty shell with n_lines_kept = 0, filterable downstream
    assert(out2 == Map(
      1L -> ("a\n\nb", 2L), 2L -> ("\nc", 1L),
      3L -> ("d\n", 1L), 4L -> ("", 0L)), s"got $out2")
  }
  test("url canonicalization: ports, trackers, fragments, sorting, domains") {
    val cases = Seq(
      // messy -> canonical
      ("HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&z=1&a=2#frag",
        "https://www.example.com/A/B?a=2&z=1"),
      ("http://Host.ORG:8080/path", "http://host.org:8080/path"), // non-default port kept
      ("https://site.com", "https://site.com/"),                  // empty path -> /
      ("https://site.com/p?utm_campaign=a&gclid=b", "https://site.com/p"), // all trackers
      ("https://site.com/P?b=2&a=1&a=0", "https://site.com/P?a=0&a=1&b=2"),
      ("site.com/relative/path?utm_source=x", "site.com/relative/path?utm_source=x"))
    val got = cases.map(_._1).toDF("u")
      .select(Curation.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
    val domains = Seq(
      "https://www.example.co.uk/x" -> "example.co.uk",
      "https://a.b.site.com/x" -> "site.com",
      "http://localhost/x" -> "localhost",
      "deep.sub.gov.uk" -> "sub.gov.uk",
      // ccTLD national second levels (extended set): three labels kept
      "https://b.a.ne.jp/x" -> "a.ne.jp",
      "https://www.radio.or.at/x" -> "radio.or.at",
      "http://shop.example.id.au/x" -> "example.id.au",
      "https://www.ministry.go.kr/x" -> "ministry.go.kr",
      // the extended set applies ONLY under a two-letter ccTLD: go.com is
      // a registrable site, not a public suffix
      "https://foo.go.com/x" -> "go.com")
    val gd = domains.map(_._1).toDF("u")
      .select(Curation.registeredDomain(col("u"))).as[String].collect().toSeq
    assert(gd == domains.map(_._2), s"got $gd")
  }

  test("packSequences: greedy fill, oversized doc isolation, shard reset, partition invariance") {
    // Shard 0 (ids 0,8,16,24): token counts 3,3,3,10 under budget 8 →
    // 0 and 8 pack into seq 0 (offsets 0 and 3), 16 fits too (offset 6
    // would exceed: 6+3>8, so 16 opens seq 1), and the oversized 24
    // (10 tokens > budget) still gets its OWN seq 2 at offset 0.
    // Shard 1 (ids 1,9): counters must reset — seq 0 again; 5+4 > 8 so
    // id 9 opens shard 1's seq 1.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      0L -> words(3), 8L -> words(3), 16L -> words(3), 24L -> words(10),
      1L -> words(5), 9L -> words(4)).toDF("doc_id", "text")
    val got = Curation.packSequences(docs, "doc_id", "text", budget = 8, shards = 8)
      .select("doc_id", "shard", "seq_id", "seq_offset", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (0L, 0L, 0L, 0L, 3L), (8L, 0L, 0L, 3L, 3L), (16L, 0L, 1L, 0L, 3L),
      (24L, 0L, 2L, 0L, 10L),
      (1L, 1L, 0L, 0L, 5L), (9L, 1L, 1L, 0L, 4L))
    assert(got == expected, s"got $got")
    // Partition invariance: a differently-partitioned input packs identically
    // (the op repartitions by shard internally).
    val scrambled = Curation.packSequences(docs.repartition(7, col("text")),
        "doc_id", "text", budget = 8, shards = 8)
      .select("doc_id", "shard", "seq_id", "seq_offset", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(scrambled == got)
  }

  test("stratifiedSample: exact ceil quota per group, frac edge cases") {
    val docs = (0 until 30).map(i => (i.toLong, s"doc number $i", if (i < 21) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val kept = Curation.stratifiedSample(docs, "lang", "doc_id", "text", 0.25)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept == Map("en" -> 6L, "de" -> 3L), s"got $kept") // ceil(21*.25)=6, ceil(9*.25)=3
    assert(Curation.stratifiedSample(docs, "lang", "doc_id", "text", 1.0).count() == 30)
    assert(Curation.stratifiedSample(docs, "lang", "doc_id", "text", 0.0).count() == 0)
    // Determinism: same sample row-for-row on re-evaluation.
    val a = Curation.stratifiedSample(docs, "lang", "doc_id", "text", 0.4)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.stratifiedSample(docs.repartition(5), "lang", "doc_id", "text", 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("weightedMix: epoch copies, fractional slices, zero and default weights") {
    val docs = (0 until 20).map(i =>
      (i.toLong, s"mix doc $i", if (i < 8) "en" else if (i < 16) "de" else "fr"))
      .toDF("doc_id", "text", "lang")
    val mix = Curation.weightedMix(docs, "lang", "doc_id", "text",
      weights = Map("en" -> 2.5, "de" -> 0.5, "fr" -> 0.0))
    val byLang = mix.groupBy("lang").count().as[(String, Long)].collect().toMap
    // en: 8 docs × 2 full epochs + ceil(8·0.5)=4 fractional = 20;
    // de: ceil(8·0.5)=4; fr: weight 0 → absent.
    assert(byLang == Map("en" -> 20L, "de" -> 4L), s"got $byLang")
    val enEpochs = mix.filter($"lang" === "en").groupBy("epoch").count()
      .as[(Long, Long)].collect().toMap
    assert(enEpochs == Map(0L -> 8L, 1L -> 8L, 2L -> 4L))
    // Unlisted group takes the default weight (1.0 → exactly one epoch 0).
    val dflt = Curation.weightedMix(docs, "lang", "doc_id", "text",
      weights = Map("en" -> 1.0))
    assert(dflt.count() == 20 &&
      dflt.agg(max("epoch")).head.getLong(0) == 0L)
    // Determinism under re-partitioning.
    val a = mix.select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    val b = Curation.weightedMix(docs.repartition(7), "lang", "doc_id", "text",
        weights = Map("en" -> 2.5, "de" -> 0.5, "fr" -> 0.0))
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("bloom membership: zero false negatives, novel texts mostly pass") {
    val corpus = (0 until 400).map(i => (i.toLong, s"corpus document body $i"))
      .toDF("doc_id", "text")
    val bloom = graft.ops.Dedup.corpusBloom(corpus, "text",
      expectedItems = 1000, fpp = 0.01)
    val batch = (0 until 400).map { i =>
      if (i % 2 == 0) (i + 1000L, s"corpus document body $i") // true dup
      else (i + 1000L, s"novel text payload $i")
    }.toDF("bid", "btext")
    val flagged = graft.ops.Dedup.bloomFlag(batch, "bid", "btext", bloom)
      .select(col("bid"), col("maybe_dup")).as[(Long, Boolean)].collect()
    val dupIds = flagged.filter(r => (r._1 - 1000) % 2 == 0)
    assert(dupIds.forall(_._2), "Bloom must never miss a true duplicate")
    val novel = flagged.filter(r => (r._1 - 1000) % 2 == 1)
    val falsePos = novel.count(_._2)
    assert(falsePos <= 20, s"false positives $falsePos / ${novel.length} exceeds the sized bound")
  }
}

