package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Cluster, Dedup, Multimodal, Similarity, TextAnalysis}

/** Unit tests for the LLM-data-pipeline operators over the driver corpus. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
  private def embs = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  test("exact dedup: copies collapse to the smallest id; clean docs survive") {
    val withDups = docs.unionByName(
      docs.filter($"doc_id" % 10 === 0).withColumn("doc_id", $"doc_id" + 10000))
    val kept = Dedup.exactDedup(withDups, "doc_id", "text")
    assert(kept.count() == docs.count())
    assert(kept.filter($"doc_id" >= 10000).count() == 0)
    val groups = Dedup.exactDupGroups(withDups, "doc_id", "text")
    assert(groups.count() == docs.filter($"doc_id" % 10 === 0).count())
    assert(groups.agg(max("dup_count")).head.getLong(0) == 2L)
  }

  test("minhash-LSH + exact verify equals the exact Jaccard answer") {
    val exact = Dedup.exactJaccardPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.nearDupPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus must contain planted near-dups")
    assert(lsh == exact, s"LSH recall must be total on this corpus: ${exact -- lsh} missed")
  }

  test("scoped near-dup calls share caches across calls and release together") {
    // The repeated-same-corpus policy: a scope keeps the collapse/LSH
    // intermediates persisted so sibling calls (pairs then clusters, or
    // bench waves) hit them via plan-equal cache reuse; one release()
    // returns the persistent-RDD set to its starting size.
    def cachedCount: Int = spark.sparkContext.getPersistentRDDs.size
    // Every unpersist in the codebase is blocking=false, so earlier tests'
    // releases can land asynchronously DURING this one and shift the
    // global count under the assertions. Settle first: wait until the
    // count holds still, then compare settled readings only.
    def settledCount(): Int = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var prev = cachedCount
      var stable = 0
      while (stable < 5 && System.nanoTime() < deadline) {
        Thread.sleep(200L)
        val c = cachedCount
        if (c == prev) stable += 1 else { stable = 0; prev = c }
      }
      prev
    }
    // A corpus slice no other test touches: plan-equality is the cache
    // key, so a shared corpus would hit entries leaked by lazy-mode tests
    // and the growth assertions below would see a polluted baseline.
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val before = settledCount()
    val scope = new graft.ops.CacheScope
    Dedup.nearDupPairs(corpus, "doc_id", "text", 0.5, scope = scope).count()
    val afterFirst = settledCount()
    assert(afterFirst > before, "scope mode must persist the intermediates")
    // A plan-equal second call must NOT add cache entries — CacheManager
    // reuses the first call's. (The pairs path only; the clusters sibling
    // below runs CC, whose localCheckpoint blocks are freed by the
    // ContextCleaner only after a GC — nondeterministic timing that a
    // count equality here would race against.)
    Dedup.nearDupPairs(corpus, "doc_id", "text", 0.5, scope = scope).count()
    val afterReuse = settledCount()
    assert(afterReuse <= afterFirst,
      s"plan-equal scoped calls must reuse cache entries: $afterFirst after first, $afterReuse after reuse")
    Dedup.nearDupClusters(corpus, "doc_id", "text", 0.5, scope = scope).count()
    scope.release()
    // GC nudges the ContextCleaner to collect the now-unreferenced CC
    // checkpoint blocks along with the released scope caches.
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (cachedCount > before && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(250L)
    }
    val afterRelease = cachedCount
    assert(afterRelease <= before,
      s"scope release leaked: $before before, $afterRelease after release")
  }

  test("eager nearDupPairs releases every internal cache once the result is unpersisted") {
    // The eager mode's whole point: repeated bounded-corpus calls must not
    // accumulate member/rep/candidate caches for the SparkContext's life.
    // After the caller releases the returned frame, the persistent-RDD set
    // must be back to where it started (unpersists are async — poll).
    def cachedCount: Int = spark.sparkContext.getPersistentRDDs.size
    val before = cachedCount
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.5, eager = true)
    pairs.count() // served from the result cache
    pairs.unpersist(blocking = true)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (cachedCount > before && System.nanoTime() < deadline)
      Thread.sleep(100L)
    assert(cachedCount <= before,
      s"internal caches leaked: $before before, $cachedCount after release")
  }

  test("hot-group corpus: collapsed LSH equals exact, candidate join never sees the copies") {
    import spark.implicits._
    // 120 byte-identical copies of one boilerplate text (the hot set that
    // would otherwise put 120 rows in every one of its band buckets →
    // ~120²/2 × 16 candidate pairs), plus a small near-dup family and
    // unrelated docs. Whitespace variants of the boilerplate land in the
    // SAME group (identical shingle sets after tokenization).
    val boiler = "subscribe to our newsletter for updates and offers every week"
    val hot = (0 until 118).map(i => (i.toLong, boiler)) ++
      Seq(118L -> s"  $boiler", 119L -> boiler.replace(" ", "  "))
    val family = Seq(
      200L -> "the quick brown fox jumps over the lazy dog today",
      201L -> "the quick brown fox jumps over the lazy dog tonight")
    val clean = (300 until 320).map(i =>
      (i.toLong, s"completely unrelated document number $i with its own words $i"))
    val corpus = (hot ++ family ++ clean).toDF("doc_id", "text")
    val exact = Dedup.exactJaccardPairs(corpus, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toSet
    assert(exact.size >= 120 * 119 / 2, "hot group must dominate the exact answer")
    assert(lsh == exact, s"missed ${exact.diff(lsh).size}, extra ${lsh.diff(exact).size}")
    // The collapse key must see exactly 23 groups (1 hot + 2 family +
    // 20 clean) — in particular the two whitespace VARIANTS of the
    // boilerplate (ids 118/119) must fingerprint into the hot group, since
    // their shingle sets are identical after tokenization. That is what
    // bounds every band bucket by the distinct-set count instead of the
    // raw row count.
    val fps = corpus.select(col("doc_id"),
      Dedup.shingleSetFp(col("text")).as("fp"))
    assert(fps.select("fp").distinct().count() == 23L)
    val hotFps = fps.filter(col("doc_id") < 120).select("fp").distinct()
    assert(hotFps.count() == 1L,
      "whitespace variants must share the boilerplate's shingle-set fingerprint")
    // Rep-level clustering must label identically to CC over the expanded
    // pair list — without ever materializing the 120²/2 hot-group pairs.
    val viaPairs = Cluster.clusterDocs(corpus, "doc_id",
        Dedup.nearDupPairs(corpus, "doc_id", "text", 0.5))
      .as[(Long, Long)].collect().toSet
    val viaReps = Dedup.nearDupClusters(corpus, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toSet
    assert(viaReps == viaPairs)
  }

  test("incremental dedup: batch vs persisted state equals batch vs corpus exact Jaccard") {
    val cat = new graft.catalog.GraftCatalog(spark, TestSpark.tmpDir("dedupstate-"))
    val (bt, st) = Dedup.persistDedupState(cat, "sigs", docs, "doc_id", "text")
    val batch = docs.filter($"doc_id" % 10 === 0).withColumn("doc_id", $"doc_id" + 20000)
    val got = Dedup.dedupIncremental(batch, "doc_id", "text", bt, st, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // Reference: exact cross Jaccard between batch and corpus, computed
    // without LSH (full shingle intersection — feasible at this scale).
    val nsh = Dedup.hashShingleSets(batch, "doc_id", "text").toDF("na_id", "sh")
    val osh = Dedup.hashShingleSets(docs, "doc_id", "text").toDF("nb_id", "sh")
    val nsz = nsh.groupBy("na_id").count().withColumnRenamed("count", "na")
    val osz = osh.groupBy("nb_id").count().withColumnRenamed("count", "nb")
    val want = nsh.join(osh, "sh").groupBy("na_id", "nb_id").count()
      .join(nsz, "na_id").join(osz, "nb_id")
      .filter($"count".cast("double") / ($"na" + $"nb" - $"count") >= 0.5)
      .select("na_id", "nb_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"incremental must equal exact cross Jaccard; " +
      s"missed=${want -- got} spurious=${got -- want}")
    // Every re-ingested copy must match its source doc (jaccard 1).
    batch.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(got.contains((id, id - 20000)), s"copy $id must match its source")
    }
    // A genuinely new document must not be flagged.
    val fresh = Seq((30000L, "completely unrelated fresh content zyx wvu tsr qpo nml kji"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupIncremental(fresh, "doc_id", "text", bt, st, 0.5).count() == 0)
    // The bucket-pruned serving path gives the same answer as the batch path.
    val few = batch.limit(5)
    val pruned = Dedup.checkDocs(few, "doc_id", "text", bt, st, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.dedupIncremental(few, "doc_id", "text", bt, st, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == full && pruned.nonEmpty)
    assert(Dedup.checkDocs(fresh, "doc_id", "text", bt, st, 0.5).count() == 0)
  }

  test("near-dup clustering: pair chains collapse transitively; singletons keep own id") {
    // A~B and B~C but never A~C at the pair threshold: the cluster must
    // still merge all three (near-duplication is not transitive pairwise).
    val d = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Cluster.clusterDocs(d, "doc_id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    val kept = Cluster.dedupByCluster(d, "doc_id", edges)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }

  test("clustering refuses a suspiciously dense edge frame (unverified candidates)") {
    val d = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    // An all-pairs frame — the shape a caller gets by wiring raw candidate
    // buckets (or a cross join) into clustering without the verify step.
    val dense = d.select(col("doc_id").as("id_a"))
      .crossJoin(d.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val e = intercept[IllegalArgumentException] {
      Cluster.clusterDocs(d, "doc_id", dense, maxEdges = 3L).collect()
    }
    assert(e.getMessage.contains("distinct edges"))
    // maxEdges = 0 disables the cap for a genuinely dense graph.
    assert(Cluster.clusterDocs(d, "doc_id", dense, maxEdges = 0L).count() == 4)
  }

  test("clustering over the corpus pair graph matches its own edge closure") {
    val edges = Dedup.exactJaccardPairs(docs, "doc_id", "text", 0.5)
    val clusters = Cluster.clusterDocs(docs, "doc_id", edges)
    // Every edge endpoint pair shares a cluster; cluster ids are members.
    val cl = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    edges.select("id_a", "id_b").collect().foreach { r =>
      assert(cl(r.getLong(0)) == cl(r.getLong(1)))
    }
    assert(cl.values.toSet.subsetOf(cl.keySet))
  }

  test("top n-grams: descending counts, deterministic tie-break, k rows") {
    val top = graft.ops.TextAnalysis.topNgrams(docs, "text", n = 2, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.length == 20)
    assert(top.sliding(2).forall { case Array((ga, ca), (gb, cb)) =>
      ca > cb || (ca == cb && ga < gb) })
  }

  test("heavy hitters: sketch filter is lossless vs the exact aggregate") {
    import spark.implicits._
    // The CMS pass may only PRUNE sub-minCount grams: the answer must be
    // bit-identical to the brute exact computation restricted to minCount.
    val hh = graft.ops.TextAnalysis.heavyHitters(docs, "text",
      n = 3, k = 1000, minCount = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = graft.ops.TextAnalysis.topNgrams(docs, "text", n = 3, k = Int.MaxValue)
      .filter(col("n_occurrences") >= 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.nonEmpty, "corpus must contain >=3-count trigrams for this test")
    assert(hh.toSeq == exact.toSeq.take(1000))
    // A tight sketch must actually prune: with minCount above every true
    // count, nothing survives (overshoot would need eps*N >= minCount).
    assert(graft.ops.TextAnalysis.heavyHitters(docs, "text",
      n = 3, k = 10, minCount = Long.MaxValue).isEmpty)
    // Empty corpus yields an empty, correctly-shaped frame.
    val empty = graft.ops.TextAnalysis.heavyHitters(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text")
    assert(empty.columns.toSeq == Seq("ngram", "n_occurrences") && empty.isEmpty)
  }

  test("tf-idf top terms: rare terms outrank common; everywhere-terms weigh zero") {
    import spark.implicits._
    // Hand-computable: "the" appears in all 3 docs (idf = ln 1 = 0), so any
    // term missing from one doc must outrank it however often "the" repeats.
    val corpus = Seq(
      (1L, "the the the apple apple banana"),
      (2L, "the banana banana cherry"),
      (3L, "the cherry date date date")).toDF("doc_id", "text")
    val top = graft.ops.TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(top.length == 6) // 2 per doc
    val byDoc = top.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // doc 1: apple (tf 2, df 1) beats banana (tf 1, df 2); "the" never places.
    assert(byDoc(1L) == Seq("apple", "banana"))
    // doc 3: date (tf 3, df 1) beats cherry (tf 1, df 2).
    assert(byDoc(3L) == Seq("date", "cherry"))
    assert(!top.exists(_._3 == "the"), "idf-0 terms must lose to any df<N term")
    // tf/df carried through: apple in doc 1 is (tf=2, df=1).
    assert(top.find(t => t._1 == 1L && t._3 == "apple").exists(t => t._4 == 2L && t._5 == 1L))
  }

  test("simhash pairs are near-dups (subset of exact Jaccard at a lower bar)") {
    val sim = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactLoose = Dedup.exactJaccardPairs(docs, "doc_id", "text", 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert(sim.subsetOf(exactLoose), s"false positives: ${sim -- exactLoose}")
  }

  test("hot-embedding corpus: collapsed cosine LSH equals exact; zero-vector dups stay out") {
    import spark.implicits._
    // 80 byte-identical copies of one vector (duplicate docs → duplicate
    // embeddings), a near-dup pair, spread-out singles, and a pair of
    // IDENTICAL ZERO vectors whose self-cosine is NaN — the un-collapsed
    // join excludes them (NaN >= t is false), so the collapse must too.
    val hot = (0 until 80).map(i => (i.toLong, Array(1.0f, 2.0f, 3.0f, 4.0f)))
    val near = Seq(200L -> Array(1.0f, 2.0f, 3.0f, 4.1f))
    val singles = (300 until 320).map(i =>
      (i.toLong, Array(math.cos(i).toFloat * 5, math.sin(i).toFloat * 5,
        math.cos(i * 7).toFloat * 3, math.sin(i * 3).toFloat)))
    val zeros = Seq(400L -> Array(0.0f, 0.0f, 0.0f, 0.0f),
      401L -> Array(0.0f, 0.0f, 0.0f, 0.0f))
    val corpus = (hot ++ near ++ singles ++ zeros).toDF("vec_id", "embedding")
    val exact = Similarity.cosineDupPairs(corpus, "vec_id", "embedding",
        minCosine = 0.99, maxRows = 0)
      .as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineDupPairsLsh(corpus, "vec_id", "embedding",
        minCosine = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(exact.size >= 80 * 79 / 2, "hot group must dominate the exact answer")
    assert(!exact.exists(p => p._1 >= 400L), "zero-vector pairs must not qualify")
    assert(lsh == exact, s"missed ${exact.diff(lsh).size}, extra ${lsh.diff(exact).size}")
  }

  test("cosine top-k: ranks dense 1..k, self excluded, cosine within [-1,1]") {
    val res = Similarity.cosineTopK(embs, embs.filter($"vec_id" < 5), "vec_id", "embedding", 3)
    val rows = res.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("ANN top-k: valid shape and true-cosine ordering within each query") {
    val res = Similarity.annTopK(embs, embs.filter($"vec_id" < 5), "vec_id", "embedding",
      k = 3, nPlanes = 6).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("IVF top-k: valid shape, self excluded, descending true-cosine per query") {
    val res = Similarity.ivfTopK(embs, embs.filter($"vec_id" < 5), "vec_id", "embedding",
      k = 3, nCells = 16, nProbe = 4).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(0) != r.getLong(2)))
    res.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("persisted IVF layout returns exactly what the recomputed IVF returns") {
    val q = embs.filter($"vec_id" < 5)
    val recomputed = Similarity.ivfTopK(embs, q, "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val cat = new graft.catalog.GraftCatalog(spark, TestSpark.tmpDir("ivf-"))
    val (cells, cents) = Similarity.persistIvf(cat, "ivf", embs, "vec_id", "embedding", nCells = 8)
    val persisted = Similarity.ivfTopKPersisted(cells, cents, q, "vec_id", "embedding",
      k = 3, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(persisted == recomputed)
    // and the probe read is bucket-pruned: fewer buckets than the table has
    val probed = cells.lookupKeys(Seq(0, 1)).inputFiles
      .flatMap(f => "__bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).toSet
    assert(probed.size <= 2, s"2 cells must read at most 2 buckets, got $probed")
  }

  test("IVF centroids are kmeans-refined: balanced cells where first-N seeding skews") {
    // Two well-separated clusters in 8-d with CONTIGUOUS ids per cluster,
    // so "first N vectors by id" seeds would both come from cluster A.
    val dim = 8
    def vec(base: Int, jitterId: Int): Seq[Float] = {
      val a = Array.fill(dim)(0f)
      a(base) += 10f
      a(jitterId % dim) += 0.1f * ((jitterId % 5) + 1)
      a.toSeq
    }
    val rows = (0 until 10).map(i => (i.toLong, vec(0, i))) ++
      (10 until 20).map(i => (i.toLong, vec(4, i)))
    val df = rows.toDF("vec_id", "embedding")
    // The failure mode this test pins: with first-N seeds (vectors of ids
    // 0 and 1 — both cluster A), brute-force cosine assignment collapses
    // all of cluster B plus most of A into one Voronoi cell.
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val seeds = rows.take(2).map(_._2)
    val firstNOcc = rows.groupBy(r =>
      seeds.indices.maxBy(s => cos(r._2, seeds(s)))).map(_._2.size)
    assert(firstNOcc.max >= 15,
      s"first-N seeding must skew this corpus (else the test proves nothing), got $firstNOcc")
    // kmeans-refined seeding must spread the centroids to the two density
    // modes: cell occupancy balanced within 2x.
    val cat = new graft.catalog.GraftCatalog(spark, TestSpark.tmpDir("ivf-bal-"))
    val (cells, _) = Similarity.persistIvf(cat, "ivfbal", df, "vec_id", "embedding",
      nCells = 2)
    val occ = cells.read().groupBy("cell").count().collect().map(_.getLong(1))
    assert(occ.length == 2 && occ.max <= 2L * occ.min,
      s"kmeans-seeded cells must be balanced, got ${occ.toSeq}")
  }

  test("profile: nulls, distincts and ranges per column; approx mode close to exact") {
    val d = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, Some("a")))
      .toDF("id", "v")
    val p = graft.ops.Profile.profile(d, exact = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5), r.getString(6)))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("v") == ((4L, 1L, 2L, "a", "c")))
    val approx = graft.ops.Profile.profile(docs, exact = false)
      .filter($"column" === "doc_id").head.getLong(4)
    val exact = docs.count()
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"$approx vs $exact")
  }

  test("text analysis: counts, quality, language-ID and fingerprints are deterministic") {
    val df = Seq((1L, "the quick brown fox jumps over a lazy dog"),
      (2L, "der hund ist nicht ein katze und zu")).toDF("id", "text")
    val q = TextAnalysis.qualityMetrics(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getInt(1) == 41) // n_chars
    assert(q(1L).getLong(2) == 9L) // n_tokens
    val lang = df.select($"id", TextAnalysis.langId($"text").as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(1L) == "en" && lang(2L) == "de")
    val fp = docs.select(TextAnalysis.fingerprint($"text").as("f"))
    assert(fp.distinct().count() == docs.count(), "distinct texts → distinct fingerprints")
  }

  test("oov stats: hand-computed coverage; vocabulary joins broadcast") {
    val d = Seq((1L, "the cat sat"), (2L, "the dog sat"), (3L, "zzz qqq www"))
      .toDF("doc_id", "text")
    // Counts: the:2 sat:2 cat/dog/zzz/qqq/www:1 → top-2 vocab (count desc,
    // word asc) = {sat, the}.
    val stats = TextAnalysis.oovStats(d, "doc_id", "text", topK = 2)
    val got = stats.as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((3L, 1L, 1.0 / 3)), // cat is OOV
      2L -> ((3L, 1L, 1.0 / 3)), // dog is OOV
      3L -> ((3L, 3L, 1.0))))
    assert(stats.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the top-k vocabulary must broadcast — the token stream never shuffles for the join")
  }

  test("repetition metrics: hand-computed counts, degenerate docs fail, short docs vacuous") {
    val df = Seq(
      (1L, "a b a b a b"), // looping text: 2-grams [ab,ba,ab,ba,ab] → 5 total, 2 distinct, top 3
      (2L, "one two three four five"), // clean: all n-grams unique
      (3L, "solo"), // 1 token: no n-grams at all
      (4L, "")) // empty
      .toDF("id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(2) == 5L && m(1L).getLong(3) == 2L, "bigram totals/distincts")
    assert(m(1L).getLong(4) == 3L, "top bigram 'a b' occurs 3 times")
    assert(m(1L).getLong(5) == 4L && m(1L).getLong(6) == 2L, "trigram totals/distincts")
    assert(!m(1L).getBoolean(7), "looping text must fail the repetition filter")
    assert(m(2L).getLong(2) == 4L && m(2L).getLong(3) == 4L)
    assert(m(2L).getBoolean(7), "unique-n-gram text passes")
    assert(m(3L).getLong(2) == 0L && m(3L).getLong(4) == 0L && m(3L).getBoolean(7),
      "sub-n docs have zero n-grams and pass vacuously")
    assert(m(4L).getLong(2) == 0L)
  }

  test("exact-quadratic oracles refuse an over-cap corpus unless overridden") {
    val e1 = intercept[IllegalArgumentException] {
      Dedup.exactJaccardPairs(docs, "doc_id", "text", 0.5, maxRows = 3).count()
    }
    assert(e1.getMessage.contains("maxRows"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.cosineDupPairs(embs, "vec_id", "embedding", 0.9, maxRows = 3).count()
    }
    assert(e2.getMessage.contains("maxRows"))
    // explicit override (0 = disabled) still runs the oracle
    assert(Similarity.cosineDupPairs(embs.limit(5), "vec_id", "embedding",
      -1.0, maxRows = 0).count() == 5L * 4 / 2)
  }

  test("multimodal: media wrap + batched stub decode keep ids and byte counts") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "source")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "meta"))
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == docs.count())
    val expected = docs.select(col("doc_id").as("did"), length(col("text")).as("tlen"))
    val joined = feats.join(expected, col("media_id") === col("did"))
      .filter(col("n_bytes") =!= col("tlen")) // corpus text is ASCII
    assert(joined.count() == 0)
  }

  test("multimodal: real JDK image decode — gradient pixels, resize box, broken-payload fallback") {
    // A non-constant gradient: the operator's means/thumbnail must match a
    // reference computed directly with ImageIO in this test.
    def gradientPng(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 255 / math.max(1, w - 1)) << 16) |
          ((y * 255 / math.max(1, h - 1)) << 8) | 0x40)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val png = gradientPng(20, 10)
    val rows = Seq(
      (1L, png),
      (2L, "not an image at all".getBytes("UTF-8")),
      (3L, Multimodal.constantPng(5, 4, 10, 20, 30)))
    val media = Multimodal.asMediaTable(
      rows.toDF("id", "bytes").withColumn("src", lit("t")), "id", "bytes", "src")
    val out = Multimodal.decodeImages(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // Gradient: dims recovered; exact means from the reference pixels.
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val px = ref.getRGB(0, 0, 20, 10, null, 0, 20)
    val meanR = px.map(p => (p >> 16) & 0xFF).sum / px.length.toDouble
    val g1 = out(1L)
    assert(g1.getBoolean(2) && g1.getInt(3) == 20 && g1.getInt(4) == 10)
    assert(g1.getSeq[Double](6).head == meanR, "exact mean over gradient pixels")
    assert(g1.getSeq[Double](7).size == 64, "8x8 luma thumbnail")
    // Broken payload: fallback row, not a crash.
    val g2 = out(2L)
    assert(!g2.getBoolean(2) && g2.getInt(3) == 0 && g2.getSeq[Double](6).isEmpty)
    // Constant image: exact channel means.
    assert(out(3L).getSeq[Double](6).toSeq == Seq(10.0, 20.0, 30.0))
    // Resize: gradient lands in the target box and stays decodable; the
    // broken payload passes through with decoded=false and NULL bytes.
    val rz = Multimodal.decodeImages(Multimodal.resizeImages(media, 6, 5))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rz(1L).getBoolean(2) && rz(1L).getInt(3) == 6 && rz(1L).getInt(4) == 5)
    assert(!rz(2L).getBoolean(2))
    assert(rz(3L).getSeq[Double](6).toSeq == Seq(10.0, 20.0, 30.0),
      "constant survives bilinear resize exactly")
  }

  test("multimodal: real WAV decode and TIFF frame sampling with reference values") {
    // Ramp PCM (0, 7, 14, ...): RMS/peak computed against the same samples
    // here, so the operator's container parse + sample fold is checked on
    // NON-degenerate audio (the gate's square wave is the analytic case).
    val n = 480
    val samples = (0 until n).map(i => (i * 7 % 3000).toShort)
    val pcm = new Array[Byte](n * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rows = Seq((1L, bos.toByteArray), (2L, "junk".getBytes("UTF-8")))
    val media = Multimodal.asMediaTable(
      rows.toDF("id", "bytes").withColumn("src", lit("t")), "id", "bytes", "src",
      mediaType = "audio")
    val out = Multimodal.decodeAudio(media).collect().map(r => r.getLong(0) -> r).toMap
    val a1 = out(1L)
    assert(a1.getBoolean(2) && a1.getDouble(3) == 16000.0 && a1.getInt(4) == 1)
    assert(a1.getLong(5) == n && a1.getDouble(6) == n / 16000.0)
    val refRms = math.sqrt(samples.map(s => s.toDouble * s).sum / n)
    assert(a1.getDouble(7) == refRms && a1.getDouble(8) == samples.max.toDouble)
    assert(!out(2L).getBoolean(2), "junk payload must fall back, not crash")

    // Frame sampling: 5 frames, stride 2 -> indexes 0,2,4; each sampled
    // frame's standalone PNG re-decodes to the frame's own color.
    val colors = Seq((10, 0, 0), (0, 20, 0), (0, 0, 30), (40, 0, 0), (0, 50, 0))
    val tiff = Multimodal.multiFrameTiff(3, 2, colors)
    val fmedia = Multimodal.asMediaTable(
      Seq((9L, tiff)).toDF("id", "bytes").withColumn("src", lit("t")),
      "id", "bytes", "src", mediaType = "video")
    val frames = Multimodal.sampleFrames(fmedia, stride = 2).collect()
      .map(r => r.getInt(1) -> r).toMap
    assert(frames.keySet == Set(0, 2, 4))
    assert(frames(2).getSeq[Double](5).toSeq == Seq(0.0, 0.0, 30.0))
    val png2 = frames(2).getAs[Array[Byte]]("payload")
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png2))
    assert(img2.getWidth == 3 && img2.getHeight == 2 &&
      (img2.getRGB(1, 1) & 0xFFFFFF) == 30, "sampled frame PNG must round-trip")
  }

  test("multimodal: real AVI video decode — gradient pixels, MJPEG frames, bomb and junk fallback") {
    import graft.ops.Riff
    // Gradient DIB frames: decode must reproduce the exact painted pixels
    // (raw BGR24 — no codec loss anywhere).
    val (w, h) = (7, 5)
    def gradient(seed: Int): Array[Int] =
      Array.tabulate(w * h)(i => 0xFF000000 |
        (((i * 3 + seed) % 256) << 16) | (((i * 5 + seed) % 256) << 8) | ((i * 7 + seed) % 256))
    val frames = Seq(gradient(1), gradient(2), gradient(3))
    val avi = Riff.writeUncompressedAvi(w, h, fps = 25, frames)
    val parsed = Riff.parseAvi(avi, Multimodal.maxFramePixels)
    assert(parsed.width == w && parsed.height == h && parsed.nFrames == 3)
    assert(parsed.fps == 25.0)
    (0 until 3).foreach { f =>
      assert(Riff.decodeFrame(parsed, f, Multimodal.maxFramePixels).argb.toSeq ==
        frames(f).toSeq, s"frame $f must round-trip bit-exactly")
    }
    // MJPEG ('00dc') frames decode through the JDK JPEG reader: dims exact,
    // means near the painted constant (JPEG is lossy).
    val jpegImg = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) jpegImg.setRGB(x, y, 0x808080)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jpegImg, "jpg", jb)
    val mjpeg = Riff.writeAvi(8, 6, 10, "MJPG", Seq(("dc", jb.toByteArray)))
    val rows = Seq((1L, avi), (2L, mjpeg), (3L, "not a video".getBytes("UTF-8")),
      (4L, Riff.writeAvi(40000, 40000, 10, "DIB ", Seq(("db", new Array[Byte](8))))))
    val media = Multimodal.asMediaTable(
      rows.toDF("id", "bytes").withColumn("src", lit("t")), "id", "bytes", "src",
      mediaType = "video")
    val out = Multimodal.decodeVideo(media).collect().map(r => r.getLong(0) -> r).toMap
    val v1 = out(1L)
    assert(v1.getBoolean(2) && v1.getInt(3) == w && v1.getInt(4) == h &&
      v1.getLong(5) == 3L && v1.getDouble(6) == 25.0)
    val refMean = frames.flatten.map(p => (p >> 16) & 0xFF).sum /
      (frames.size * w * h).toDouble
    assert(v1.getSeq[Double](8).head == refMean, "exact mean over gradient frames")
    val v2 = out(2L)
    assert(v2.getBoolean(2) && v2.getInt(3) == 8 && v2.getInt(4) == 6)
    assert(math.abs(v2.getSeq[Double](8).head - 128.0) < 4.0,
      s"MJPEG mean near the painted gray, got ${v2.getSeq[Double](8)}")
    assert(!out(3L).getBoolean(2), "junk payload falls back")
    assert(!out(4L).getBoolean(2), "over-cap geometry refused from the header")
    // Frame sampling matches the image sampler's shape and strides.
    val fr = Multimodal.sampleVideoFrames(media, 2).collect()
      .filter(_.getLong(0) == 1L).map(r => r.getInt(1)).toSet
    assert(fr == Set(0, 2))
  }

  test("multimodal: AVI parser hostile-input corners — MJPEG bomb, top-down DIB, stream selection") {
    import graft.ops.Riff
    // An MJPEG 'dc' chunk whose EMBEDDED image header declares huge dims:
    // the strf geometry passes the cap, so the frame's own header must be
    // checked before pixel allocation (a raw ImageIO.read here would OOM).
    val bombPng = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      val ihdr = java.nio.ByteBuffer.allocate(17)
      ihdr.put("IHDR".getBytes("US-ASCII")).putInt(50000).putInt(50000)
      ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      val crc = new java.util.zip.CRC32(); crc.update(ihdr.array())
      bos.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
      bos.write(ihdr.array())
      bos.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      bos.toByteArray
    }
    val bombAvi = Riff.writeAvi(2, 2, 10, "MJPG", Seq(("dc", bombPng)))
    val parsedBomb = Riff.parseAvi(bombAvi, Multimodal.maxFramePixels)
    val e = intercept[IllegalArgumentException] {
      Riff.decodeFrame(parsedBomb, 0, Multimodal.maxFramePixels)
    }
    assert(e.getMessage.contains("pixel cap"))
    // ...and through the operator it is a decoded=false frame row, not a crash.
    val bm = Multimodal.asMediaTable(
      Seq((1L, bombAvi)).toDF("id", "bytes").withColumn("src", lit("t")),
      "id", "bytes", "src", mediaType = "video")
    val br = Multimodal.sampleVideoFrames(bm, 1).collect()
    assert(br.length == 1 && !br.head.getBoolean(2))

    // Top-down DIB (negative biHeight): rows must NOT be flipped. Build a
    // bottom-up container, then patch biHeight negative and re-order rows.
    val px = Array.tabulate(4 * 2)(i => 0xFF000000 | (i << 16)) // row0: 0..3, row1: 4..7
    val base = Riff.writeUncompressedAvi(4, 2, 10, Seq(px))
    val parsedUp = Riff.parseAvi(base, Multimodal.maxFramePixels)
    assert(Riff.decodeFrame(parsedUp, 0, Multimodal.maxFramePixels).argb.toSeq == px.toSeq)
    // Patch: find the strf's biHeight (follows biWidth=4 after biSize=40) and
    // negate it; swap the two 12-byte-padded rows in the 00db chunk so the
    // file stores top-down data.
    val td = base.clone()
    val bb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val strfAt = { // locate "strf" tag
      var i = 0
      while (!(td(i) == 's' && td(i + 1) == 't' && td(i + 2) == 'r' && td(i + 3) == 'f')) i += 1
      i
    }
    bb.putInt(strfAt + 8 + 8, -2) // biHeight := -2 (top-down)
    val dbAt = {
      var i = 0
      while (!(td(i) == '0' && td(i + 1) == '0' && td(i + 2) == 'd' && td(i + 3) == 'b')) i += 1
      i
    }
    val stride = 12 // (4*3+3)&~3
    val row = new Array[Byte](stride)
    System.arraycopy(td, dbAt + 8, row, 0, stride)
    System.arraycopy(td, dbAt + 8 + stride, td, dbAt + 8, stride)
    System.arraycopy(row, 0, td, dbAt + 8 + stride, stride)
    val parsedTd = Riff.parseAvi(td, Multimodal.maxFramePixels)
    assert(parsedTd.topDown, "patched header must parse as top-down")
    assert(Riff.decodeFrame(parsedTd, 0, Multimodal.maxFramePixels).argb.toSeq == px.toSeq,
      "top-down rows must decode in the same logical order")
  }

  test("multimodal: perceptual dedup collapses the same picture across container formats") {
    // One gradient image encoded as PNG, BMP and TIFF — three byte-distinct
    // payloads (byte-level dedup sees three documents) that decode to the
    // same pixels and must land in ONE feature group; a visibly different
    // image stays its own group.
    val img = new java.awt.image.BufferedImage(9, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 9)
      img.setRGB(x, y, (x * 28 << 16) | (y * 36 << 8) | 0x20)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val (png, bmp, tiff) = (enc("png"), enc("bmp"), enc("tiff"))
    assert(png.toSeq != bmp.toSeq && bmp.toSeq != tiff.toSeq,
      "the three containers must be byte-distinct")
    val other = Multimodal.constantPng(9, 7, 200, 10, 10)
    val media = Multimodal.asMediaTable(
      Seq((1L, png), (2L, bmp), (3L, tiff), (4L, other))
        .toDF("id", "bytes").withColumn("src", lit("t")), "id", "bytes", "src")
    val groups = Multimodal.dedupImagesByThumb(media).collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_dups")).toMap
    assert(groups == Map(1L -> 3L, 4L -> 1L),
      s"same pixels must collapse across formats: $groups")
  }

  test("multimodal: perceptual audio dedup collapses the same clip across containers") {
    // One clip in WAV (little-endian), AIFF and AU (big-endian) — three
    // byte-distinct containers, identical decoded samples → ONE envelope
    // group; a different-amplitude clip and a different-length clip each
    // stay their own group.
    val (wav, aiff, au) = (Multimodal.squareAudio(64, 8000f, 6000, "wav"),
      Multimodal.squareAudio(64, 8000f, 6000, "aiff"),
      Multimodal.squareAudio(64, 8000f, 6000, "au"))
    assert(wav.toSeq != aiff.toSeq && aiff.toSeq != au.toSeq,
      "the three containers must be byte-distinct")
    val louder = Multimodal.squareAudio(64, 8000f, 12000, "wav")
    val longer = Multimodal.squareAudio(128, 8000f, 6000, "wav")
    val media = Multimodal.asMediaTable(
      Seq((1L, wav), (2L, aiff), (3L, au), (4L, louder), (5L, longer))
        .toDF("id", "bytes").withColumn("src", lit("t")),
      "id", "bytes", "src", mediaType = "audio")
    val groups = Multimodal.dedupAudioByEnvelope(media).collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_dups")).toMap
    assert(groups == Map(1L -> 3L, 4L -> 1L, 5L -> 1L),
      s"same samples must collapse across containers: $groups")
  }

  test("multimodal: decompression bomb refused from the header, before pixel allocation") {
    // A valid PNG signature + IHDR declaring 50000x50000 (2.5G pixels) with
    // no pixel data: the guard must reject on the HEADER dims — a decoder
    // that reached pixel allocation would try a multi-GB array first.
    def bombPng(w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      val ihdr = java.nio.ByteBuffer.allocate(17)
      ihdr.put("IHDR".getBytes("US-ASCII"))
      ihdr.putInt(w).putInt(h)
      ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      val chunk = ihdr.array()
      val crc = new java.util.zip.CRC32()
      crc.update(chunk)
      val len = java.nio.ByteBuffer.allocate(4).putInt(13).array()
      bos.write(len); bos.write(chunk)
      bos.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      bos.toByteArray
    }
    val media = Multimodal.asMediaTable(
      Seq((1L, bombPng(50000, 50000)), (2L, Multimodal.constantPng(2, 2, 1, 2, 3)))
        .toDF("id", "bytes").withColumn("src", lit("t")), "id", "bytes", "src")
    val out = Multimodal.decodeImages(media).collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(2), "bomb must be refused")
    assert(out(2L).getBoolean(2), "legitimate image still decodes")
    val rz = Multimodal.resizeImages(media, 2, 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rz == Map(1L -> false, 2L -> true))
    val fr = Multimodal.sampleFrames(media, 1).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(fr == Set((1L, false), (2L, true)))
  }

  test("multimodal: perceptual video dedup collapses the same clip across codecs") {
    // One 3-frame gray clip as raw BGR24 and as MJPEG (real JPEG frames) —
    // byte-disjoint payloads, same decoded signature → ONE group; a
    // different-gray clip and a different-length clip stay separate. Gray
    // levels sit on the lumaQuant=8 lattice so MJPEG's DC error is absorbed.
    val grays = Seq(48, 96, 160)
    val dib = Multimodal.constantAvi(6, 4, 10, grays.map(l => (l, l, l)))
    val mjpeg = Multimodal.constantMjpegAvi(6, 4, 10, grays)
    assert(dib.toSeq != mjpeg.toSeq, "codec variants must be byte-distinct")
    val darker = Multimodal.constantAvi(6, 4, 10, grays.map(_ - 16).map(l => (l, l, l)))
    val shorter = Multimodal.constantAvi(6, 4, 10, grays.take(2).map(l => (l, l, l)))
    val media = Multimodal.asMediaTable(
      Seq((1L, dib), (2L, mjpeg), (3L, darker), (4L, shorter))
        .toDF("id", "bytes").withColumn("src", lit("t")),
      "id", "bytes", "src", mediaType = "video")
    val groups = Multimodal.dedupVideoBySignature(media).collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_dups")).toMap
    assert(groups == Map(1L -> 2L, 3L -> 1L, 4L -> 1L),
      s"same frames must collapse across codecs: $groups")
    val sig = Multimodal.videoLumaSignatures(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Int]]("frame_sig")).toMap
    assert(sig(1L) == Seq(6, 12, 20), s"lattice grays quantize exactly: ${sig(1L)}")
    assert(sig(1L) == sig(2L), s"MJPEG must match DIB: ${sig(2L)}")
  }

  test("multimodal: a trailing partial PCM frame doesn't fail the envelope") {
    // Unknown-length stereo AU whose PCM carries 3 whole frames plus ONE
    // trailing sample (7 samples, 2 channels): the envelope must ignore the
    // partial frame and still decode, consistently with decodeAudio — not
    // silently degrade to decoded=false on an ArrayIndexOutOfBounds.
    def rawAu(samples: Array[Short], rate: Int, channels: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24 + samples.length * 2)
      bb.put(".snd".getBytes("US-ASCII"))
      bb.putInt(24)  // data offset
      bb.putInt(-1)  // unknown data size (streamed AU)
      bb.putInt(3)   // 16-bit linear PCM
      bb.putInt(rate)
      bb.putInt(channels)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val ragged = rawAu(Array[Short](1000, 1000, 2000, 2000, 3000, 3000, 4000), 8000, 2)
    val media = Multimodal.asMediaTable(
      Seq((1L, ragged)).toDF("id", "bytes").withColumn("src", lit("t")),
      "id", "bytes", "src", mediaType = "audio")
    val dec = Multimodal.decodeAudio(media).collect().head
    assert(dec.getAs[Boolean]("decoded"), "decodeAudio must accept the clip")
    val env = Multimodal.audioEnvelopes(media, segments = 8).collect().head
    assert(env.getAs[Boolean]("decoded"),
      "envelope must decode despite the trailing partial frame")
    assert(env.getAs[Long]("n_frames") == 3L)
    assert(env.getAs[Int]("channels") == 2)
    val e = env.getAs[scala.collection.Seq[Int]]("envelope")
    assert(e.length == 8 && e.max > 0, s"envelope computed over whole frames: $e")
  }

  test("IVF top-k on a corpus smaller than nCells degrades gracefully") {
    // 5 vectors vs the default 16 cells: seeding caps k at the corpus size
    // instead of failing KMeans.fit's at-least-k require; probing every
    // (existing) cell makes the result exactly the brute-force answer.
    val tiny = embs.orderBy("vec_id").limit(5).cache()
    val q = tiny.filter($"vec_id" === tiny.agg(min("vec_id")).head.getLong(0))
    val ivf = Similarity.ivfTopK(tiny, q, "vec_id", "embedding",
      k = 3, nCells = 16, nProbe = 16).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    val brute = Similarity.cosineTopK(tiny, q, "vec_id", "embedding", k = 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    assert(ivf.sorted.toSeq == brute.sorted.toSeq,
      s"all-cell probe must equal brute force: ivf=${ivf.toSeq} brute=${brute.toSeq}")
    tiny.unpersist()
  }
}
