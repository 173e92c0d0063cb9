package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale probe for the heaviest pipeline operators: runs the minhash-pairs,
 * connected-components, sequence-packing and line-dedup pipelines on a 1×
 * and an F× (default
 * 10×, ≈sf1) corpus and reports wall time, shuffle bytes, and the observed
 * scaling exponent per op — grounding the "would this hold at 100×" design
 * argument in a measured number instead of plan shape alone.
 *
 * The F× corpus is synthesized from the sf documents table: F copies with
 * shifted ids and every word suffixed `_k` per copy. Within a copy the
 * shingle structure is ISOMORPHIC to the original (same near-dup pairs,
 * same line frequencies); across copies the shingle/line sets are disjoint
 * (`w_3` never equals `w_7`), so candidate generation cannot create
 * cross-copy pairs. Rows, true pairs, and boilerplate lines all scale
 * EXACTLY linearly in F by construction — any super-linear wall-time or
 * shuffle growth is therefore the operator's own, not the corpus's.
 *
 * Output: one JSON line (stdout + SPARK_GRAFT_SCALE_OUT, default
 * SCALE_r08.json) — per factor per op {waves, median_sec, shuffle_mb,
 * rows}, plus `exponents` = log(tF/t1)/log(F).
 */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val waves = sys.env.getOrElse("SPARK_GRAFT_SCALE_WAVES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Diagnostic knob: SPARK_GRAFT_SCALE_NOBROADCAST=1 disables broadcast
    // joins for the whole probe run. Purpose: shuffle-byte EXPONENTS from
    // two scale points conflate real superlinear work with one-time plan
    // transitions — a small side that broadcasts at f1 (zero shuffle
    // bytes) and crosses the 10 MB threshold at f10 (its stream shuffles)
    // reads as exponent >> 1 on bytes that are each linear in their own
    // regime. With broadcast off at BOTH points the transition disappears;
    // an exponent that stays >> 1 would then be genuinely superlinear work.
    if (sys.env.get("SPARK_GRAFT_SCALE_NOBROADCAST").contains("1"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // Cumulative shuffle-byte counters over all completed stages; per-op
    // deltas are read around each timed wave.
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val inputRead = new java.util.concurrent.atomic.AtomicLong
    // Per-stage input bytes, for attributing a statement's read cost to a
    // SPECIFIC stage (the v2_sql_merge probe splits the matching-rows
    // subquery scan from the rewrite scan this way). Cleared by whoever
    // wants a fresh window.
    val stageInputs = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inputRead.addAndGet(m.inputMetrics.bytesRead)
          stageInputs.add(m.inputMetrics.bytesRead)
        }
      }
    })

    // v2_sql_merge subquery-vs-rewrite attribution entries (JSON objects).
    val sqlMergeAttr = scala.collection.mutable.ArrayBuffer.empty[String]

    def scaledCorpus(f: Int): DataFrame = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      (0 until f).map { k =>
        docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "$1_" + k).as("text"))
      }.reduce(_ unionByName _)
    }

    def median(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.size / 2) }
    def jnum(d: Double): String =
      if (d.isNaN || d.isInfinite) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def jarr(ts: Seq[Double]): String = ts.map(jnum).mkString("[", ",", "]")

    // name -> (factor -> (waves, medianSec, shuffleMb, resultRows))
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int, (Seq[Double], Double, Double, Long)]]

    /** Shared timed-wave bookkeeping: runs `op` `waves` times after one
      * untimed warm-up call, recording wall times, the shuffle-byte delta
      * of the last wave, and the result rows under (name, f). */
    // SPARK_GRAFT_SCALE_ONLY=<op,op,...> re-probes a subset (e.g. after a
    // targeted plan change) without paying the full ~20-min sweep; absent →
    // all ops. The written JSON then holds only the probed subset — merge
    // into the round's SCALE file by hand.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    def timedWaves(name: String, f: Int, warm: () => Unit,
        setup: Int => Unit = _ => ())(op: Int => Long): Unit = {
      if (only.exists(!_.contains(name))) return
      warm() // untimed: codegen + JIT compile, exactly like the bench's
      // same-shape warm-ups — without it the f=1 probe (runs first)
      // absorbs all one-time compilation and the exponent skews negative
      // (observed: minhash f1 median 5.8s vs f10 1.8s).
      var rows = 0L
      var shufMb = 0.0
      val ts = (0 until waves).map { i =>
        setup(i) // untimed per-wave state advance (e.g. the ingest write
        //          whose cost the probe wants OUT of the timed op)
        val (r0, w0) = (shufRead.get(), shufWrite.get())
        val t0 = System.nanoTime()
        rows = op(i)
        val dt = (System.nanoTime() - t0) / 1e9
        // Listener events drain async; give the last stage's a moment.
        Thread.sleep(100L)
        shufMb = (shufRead.get() - r0 + shufWrite.get() - w0) / 1e6
        dt
      }
      results.getOrElseUpdate(name,
        scala.collection.mutable.LinkedHashMap.empty)(f) =
        ((ts, median(ts), shufMb, rows))
      println(f"scaleprobe $name%-16s f=$f%-3d median=${median(ts)}%8.3fs " +
        f"waves=${ts.map(t => f"$t%.2f").mkString(",")} shuffle=${shufMb}%.1fMB rows=$rows")
    }

    def probe(name: String, f: Int)(op: DataFrame => Long): Unit = {
      if (only.exists(!_.contains(name))) return // skip synthesis too
      val corpus = scaledCorpus(f)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        corpus.count() // materialize the synthesis untimed: time the OP
        timedWaves(name, f, () => { op(corpus); () })(_ => op(corpus))
      } finally corpus.unpersist(blocking = false)
    }

    // Duplication-skew probe: the same corpus plus ONE document repeated
    // hotK times (ids shifted into their own range). Pre-collapse, that
    // group put hotK rows into each of its 16 band buckets → ~hotK²/2
    // candidates per band (7×10⁷ rows at hotK=3000); with the shingle-set
    // collapse the banding sees ONE representative, so clustering the hot
    // corpus must cost roughly the dup-free baseline. Labels (not pairs)
    // are probed because the expanded pair LIST is quadratic in hotK by
    // definition of the answer.
    val hotK = sys.env.getOrElse("SPARK_GRAFT_SCALE_HOTK", "3000").toInt
    def hotCorpus(): DataFrame = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val hot = spark.range(hotK).select(
        (col("id") + 50000000L).as("doc_id"),
        lit("subscribe to our newsletter for updates and offers every single week").as("text"))
      docs.unionByName(hot)
    }
    probe("d_cluster_hot", 1) { _ =>
      graft.ops.Dedup.nearDupClusters(hotCorpus(), "doc_id", "text",
        minJaccard = 0.5).count()
    }

    // Boilerplate-skew probe for span dedup: EVERY document carries the
    // same trailing boilerplate sentence, so its handful of window hashes
    // reach document frequency = |corpus|. A window-function formulation
    // (partitionBy hash) would sort every occurrence of those hashes in
    // ONE task; the aggregate+join formulation keeps them in map-side
    // partials — this probe's median vs d_dup_spans f=1 is the measured
    // cost of corpus-wide boilerplate, and should be near-flat.
    probe("d_span_hot", 1) { _ =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val boiler = docs.select(col("doc_id"), concat(col("text"),
        lit(" subscribe to our newsletter for updates and offers every single week")
      ).as("text"))
      graft.ops.Dedup.dupSpans(boiler, "doc_id", "text", n = 8).count()
    }

    for (f <- Seq(1, factor)) {
      probe("d_minhash_pairs", f) { c =>
        graft.ops.Dedup.nearDupPairs(c, "doc_id", "text", minJaccard = 0.5,
          eager = true).count()
      }
      probe("d_cluster_cc", f) { c =>
        graft.ops.Cluster.clusterDocs(c, "doc_id",
          graft.ops.Dedup.nearDupPairs(c, "doc_id", "text", minJaccard = 0.5,
            eager = true)).count()
      }
      // Attribution twins (r18): the SAME ops with broadcast joins
      // disabled at BOTH factors. The broadcast-enabled rows read a
      // shuffle-bytes exponent ≫1 because the f=1 point's small join
      // sides broadcast (zero shuffle bytes) while the f=10 sides cross
      // spark.sql.autoBroadcastJoinThreshold and shuffle their linear
      // streams — a one-time plan transition (Dedup.nearDupPairs scale
      // doc; same mechanism as x_dsir's, Importance.scala). With the
      // transition removed the exponent must read ~1: the twin's f10
      // bytes should equal the enabled run's (the enabled f10 plan is
      // already all shuffle joins) while its f1 point gains the bytes
      // broadcast was hiding.
      def noBroadcast(op: => Long): Long = {
        val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try op finally
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      }
      probe("d_minhash_pairs_noB", f) { c =>
        noBroadcast(graft.ops.Dedup.nearDupPairs(c, "doc_id", "text",
          minJaccard = 0.5, eager = true).count())
      }
      probe("d_cluster_cc_noB", f) { c =>
        noBroadcast(graft.ops.Cluster.clusterDocs(c, "doc_id",
          graft.ops.Dedup.nearDupPairs(c, "doc_id", "text", minJaccard = 0.5,
            eager = true)).count())
      }
      probe("x_pack", f) { c =>
        graft.ops.Curation.packSequences(c, "doc_id", "text",
          budget = 256, shards = 64).count()
      }
      probe("d_dup_spans", f) { c =>
        // Window df + flagged-subset span merge: shuffled bytes must stay
        // ~linear in corpus size (only (hash, id) pairs and the flagged
        // windows move), and the time exponent well under 1.
        graft.ops.Dedup.dupSpans(
          c.unionByName(c.filter(col("doc_id") % 10 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000000L)),
          "doc_id", "text", n = 8).count()
      }
      probe("x_dsir", f) { c =>
        // Reference-distribution scoring: two count aggs + one doc-feature
        // join, every key an 8-byte hash. The target subset scales with f.
        // Expect a superlinear SHUFFLE-BYTES exponent across the broadcast
        // threshold: at small f the vocabulary-sized ratio table broadcasts
        // (zero shuffle bytes for the join), past it the join shuffles its
        // linear 8-byte-key stream — a one-time plan transition, not
        // quadratic work (see Importance.scala's scale-shape doc).
        graft.ops.Importance.dsirTopK(c,
          c.filter(col("doc_id") % 5 === 0), "doc_id", "text", k = 100).count()
      }
      probe("x_corpus_overlap", f) { c =>
        // Group-pair shingle overlap over 20 synthetic sources: expect
        // ~linear shuffle (distinct 8-byte (group, hash) pairs) and a flat
        // G²-bounded output regardless of corpus size.
        graft.ops.Dedup.corpusOverlap(
          c.withColumn("src", col("doc_id") % 20), "src", "text").count()
      }
      probe("x_heavy_hitters", f) { c =>
        // Sketch-filtered exact heavy hitters: the scaled corpus suffixes
        // every token per copy, so the distinct-trigram vocabulary grows
        // f× while per-gram counts stay flat — the worst case for the
        // exact aggregate (state ∝ vocabulary) and exactly where the CMS
        // filter earns its keep: pass-2 shuffle carries only survivors'
        // occurrences, the sketch itself is a fixed few MB at any f.
        graft.ops.TextAnalysis.heavyHitters(c, "text",
          n = 3, k = 50, minCount = 5L).count()
      }
      probe("x_top_ngrams_exact", f) { c =>
        // The unfiltered exact aggregate over the same corpus — the
        // baseline x_heavy_hitters' shuffle bytes are judged against.
        graft.ops.TextAnalysis.topNgrams(c, "text", n = 3, k = 50).count()
      }
      probe("x_cdc_chunks", f) { c =>
        // Content-defined chunking + the chunk-dedup audit: the split is
        // map-side (zero shuffle of text); only 8-byte chunk hashes move.
        graft.ops.Curation.chunkDupStats(c, "doc_id", "text").head()
        1L
      }
      probe("x_line_dedup", f) { c =>
        // The gate entry's construction (CurationQueries x_line_dedup):
        // 8-token windows re-joined to multi-line docs, then the corpus
        // line-frequency drop.
        val lines8 = graft.ops.Curation.chunkTokens(c, "doc_id", "text",
          window = 8, overlap = 0)
        val multi = lines8.groupBy("doc_id").agg(
          array_join(transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
            s2 => s2.getField("chunk_text")), "\n").as("text"))
        graft.ops.Curation.dropRepeatedLines(multi, "doc_id", "text",
          maxDocFreq = 5).count()
      }
    }

    // Layout probe: a FIXED-WIDTH window read over a range-clustered table
    // that grows f× (disjoint id ranges per copy; the probed window lives
    // in copy 0, so its content is identical at every f). The claim under
    // test is the data-skipping one: with the manifest's per-dir min/max
    // the window read plans ~window-many dirs regardless of table size —
    // time exponent ≈ 0 — while the cluster() rewrite itself is the
    // expected ~linear sort. An unclustered table would re-scan all f×
    // dirs per window read (exponent ≈ 1).
    // Three scale points (f1 / f10 / f30), not two: the flat f1→f10 window
    // curve was round 11's 100 TB claim for the clustering operator, and a
    // two-point "flat" could still hide a slow creep — the f30 point triples
    // the extrapolation base at negligible probe cost (events is the small
    // table). The exponent fields still derive from f1→factor; the f30
    // entry is read directly off the artifact.
    if (only.forall(s => s("t_cluster_rewrite") || s("t_cluster_window") ||
        s("t_cluster_window_mor")))
    for (f <- Seq(1, factor, 3 * factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val ev = (0 until f).map { k =>
        ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value"),
          col("props"))
      }.reduce(_ unionByName _)
      val t = new graft.table.GraftTable(spark,
        Files.createTempDirectory(s"scale-cluster-$f-").resolve("t"), "t")
      t.overwrite(ev)
      val tc0 = System.nanoTime()
      t.cluster(Seq("event_id"), 16 * f) // dirs scale with data: fixed dir size
      val clusterSec = (System.nanoTime() - tc0) / 1e9
      if (only.forall(_("t_cluster_rewrite"))) {
        results.getOrElseUpdate("t_cluster_rewrite",
          scala.collection.mutable.LinkedHashMap.empty)(f) =
          ((Seq(clusterSec), clusterSec, 0.0, ev.count()))
        println(f"scaleprobe t_cluster_rewrite f=$f%-3d median=$clusterSec%8.3fs")
      }
      timedWaves("t_cluster_window", f,
        () => { t.readRange("event_id", 10000L, 12000L).count(); () }) { _ =>
        t.readRange("event_id", 10000L, 12000L).count()
      }
      // The same fixed window UNDER PENDING MOR DELTAS — the state a
      // continuously-ingesting clustered table is in almost always.
      // readBox's written soundness argument (base-dir pruning commutes
      // with delta resolution) was argued, never measured: a small deferred
      // upsert (~1% of keys, some inside the window) opens the chain, and
      // the probed read must then plan the pruned base dirs PLUS the delta
      // chain. Flat-vs-f here is the claim that pending deltas don't
      // un-flatten the layout story (the delta chain is bounded by
      // compaction cadence, not table size — the probe's chain is one
      // batch at every f).
      t.upsertDeferred(
        ev.filter(col("event_id") % 100 === 0)
          .withColumn("value", col("value") + 1.0), "event_id")
      timedWaves("t_cluster_window_mor", f,
        () => { t.readRange("event_id", 10000L, 12000L).count(); () }) { _ =>
        t.readRange("event_id", 10000L, 12000L).count()
      }
    }

    // Bloom point-read scaling: f× data in f× dirs (4 user-disjoint dirs
    // per data copy, copies shifted so a copy-0 user_id exists ONLY in
    // copy 0), probe a FIXED user_id. Manifest min/max prunes the shifted
    // copies (per-copy user ranges are disjoint); the bloom prunes the 4
    // interleaved slices WITHIN the copy (identical min/max — stats are
    // blind there). Flat-vs-f is the 100 TB claim for the index: the probe
    // job is one narrow O(dirs) sidecar scan, the data read is the one dir
    // that holds the value, regardless of table size.
    if (only.forall(_("t_bloom_point")))
    for (f <- Seq(1, factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val t = new graft.table.GraftTable(spark,
        Files.createTempDirectory(s"scale-bloom-$f-").resolve("t"), "t")
      for (k <- 0 until f; s <- 0 until 4) {
        val slice = ev0.filter(col("user_id") % 4 === s)
          .select(col("event_id"), col("ts"),
            (col("user_id") + lit(k * 100000000L)).as("user_id"),
            col("event_type"), col("value"), col("props"))
        if (k == 0 && s == 0) t.overwrite(slice) else t.append(slice)
      }
      t.buildBloomIndex("user_id")
      val uid = ev0.select("user_id").head.getLong(0)
      timedWaves("t_bloom_point", f,
        () => { t.readPoint("user_id", uid).count(); () }) { _ =>
        t.readPoint("user_id", uid).count()
      }
    }

    // Storage-partitioned-join scaling — the v2 connector's 100 TB claim:
    // the co-bucketed join's SHUFFLE bytes stay ~ZERO at every f (only the
    // final scalar agg exchanges a handful of partials), while the SAME
    // join over the same data read as plain parquet shuffles both sides
    // linearly. Both tables and the bucket count scale with f (a real
    // table is bucket-sized to its data), so per-partition work is
    // constant and wall time tracks total data. Broadcast is pinned off in
    // both arms: the comparison is exchange-vs-no-exchange, and at 100 TB
    // neither side broadcasts.
    if (only.forall(s => s("spj_join") || s("spj_shuffle_join")))
    for (f <- Seq(1, factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val ev = (0 until f).map { k =>
        ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
          col("user_id"), col("event_type"), col("value"))
      }.reduce(_ unionByName _)
      val right = ev.select(col("event_id"), (col("value") * 2).as("v2"))
      val cat = graft.queries.ConnectorQueries.tempCatalog(spark)
      graft.queries.ConnectorQueries.ingestBucketed(
        spark, cat, "l", ev, "event_id", 16 * f)
      graft.queries.ConnectorQueries.ingestBucketed(
        spark, cat, "r", right, "event_id", 16 * f)
      // The shuffled twin reads the SAME graft-table files through the
      // plain scan path, so the two arms differ ONLY in exchange-vs-elision
      // (a twin over the original parquet would also compare file layouts).
      val wh = Paths.get(spark.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val gcat = new graft.catalog.GraftCatalog(spark, wh)
      val (lt, rt) = (gcat.table("l"), gcat.table("r"))
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        def spj(): Long = {
          val d = spark.table(s"$cat.l").join(spark.table(s"$cat.r"), "event_id")
            .agg(sum("value"), sum("v2")).count()
          d
        }
        timedWaves("spj_join", f, () => { spj(); () })(_ => spj())
        def shuffled(): Long =
          lt.read().join(rt.read(), "event_id")
            .agg(sum("value"), sum("v2")).count()
        timedWaves("spj_shuffle_join", f, () => { shuffled(); () })(_ => shuffled())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }

    // As-of join scaling: the union-window plan's one exchange carries
    // |L|+|R| rows, so time AND shuffle exponents ≈ 1. Copies shift BOTH
    // ids and user ids — growth adds keys, never per-key depth — matching
    // how an events corpus actually grows.
    if (only.forall(_("j_asof")))
    for (f <- Seq(1, factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val ev = (0 until f).map { k =>
        ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
          (col("user_id") + lit(k * 1000000L)).as("user_id"),
          col("ts"), col("event_type"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        ev.count()
        // count(s_event_id), not count(): a bare row count lets Catalyst
        // prune the unreferenced window column and the whole sweep with it
        // (first probe read 0 MB shuffle and flat time — it measured a
        // filtered union count, not the join).
        def aj(): Long = graft.ops.TimeJoin.asofBackward(
          ev, ev.filter(col("event_type") === "signup"),
          "user_id", "ts", "ts", Seq("event_id"), prefix = "s_",
          tieBreak = Some("event_id"))
          .agg(count("s_event_id"), count(lit(1))).head.getLong(1)
        timedWaves("j_asof", f, () => { aj(); () })(_ => aj())
      } finally ev.unpersist(blocking = false)
    }

    // v2 in-scan MOR resolution probe: the base table (and bucket count)
    // grow f×, the pending chain stays a FIXED 20k-row deferred upsert.
    // `v2_read` prices the plain columnar catalog scan; `v2_mor_read` the
    // same scan with the chain resolving inside it (row path + per-bucket
    // chain filter + hash merge). The claim is attribution: the resolve
    // overhead tracks the CHAIN, so (mor − read) stays ~flat while both
    // absolute times grow with the base.
    if (only.forall(s => s("v2_read") || s("v2_mor_read")))
    for (f <- Seq(1, factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val ev = (0 until f).map { k =>
        ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value"),
          col("props"))
      }.reduce(_ unionByName _)
      val cat = graft.queries.ConnectorQueries.tempCatalog(spark)
      graft.queries.ConnectorQueries.ingestBucketed(
        spark, cat, "t", ev, "event_id", 16 * f)
      def rd(): Long =
        spark.table(s"$cat.t").agg(count("value"), count(lit(1))).head.getLong(1)
      timedWaves("v2_read", f, () => { rd(); () })(_ => rd())
      val wh = Paths.get(spark.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val gt = new graft.catalog.GraftCatalog(spark, wh).table("t")
      gt.upsertDeferred(ev.filter(col("event_id") % 100 === 0).limit(20000)
        .withColumn("value", col("value") + 1.0), "event_id")
      timedWaves("v2_mor_read", f, () => { rd(); () })(_ => rd())
    }

    // SQL MERGE through the row-level operation (v2_sql_merge): the base
    // table AND its bucket count grow f×; the CDC batch stays FIXED at 50
    // keys chosen (driver-side, the layout's own hash) to hash into ONE
    // bucket. Runtime group filtering should then rewrite exactly that
    // bucket — whose size is ~constant when buckets scale with the table —
    // so the merge wall-clock stays ~flat while the table grows 10×. The
    // fixed-bucket batch is the partial-rewrite claim; a full-spread batch
    // touches every bucket by construction and is priced by the bench's
    // CDC sections instead.
    if (only.forall(_.contains("v2_sql_merge")))
    for (f <- Seq(1, factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val ev = (0 until f).map { k =>
        ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value"))
      }.reduce(_ unionByName _)
      val n = 16 * f
      val cat = graft.queries.ConnectorQueries.tempCatalog(spark)
      graft.queries.ConnectorQueries.ingestBucketed(
        spark, cat, "t", ev, "event_id", n)
      // 50 existing keys all hashing into bucket 0 of n.
      val keys = ev0.select("event_id").limit(20000).collect()
        .map(_.getLong(0))
        .filter(k => graft.plans.BucketHash.bucketId(
          k, org.apache.spark.sql.types.LongType, n, "UTC") == 0)
        .take(50).toSeq
      require(keys.size == 50, s"need 50 bucket-0 keys, got ${keys.size}")
      val batch = ev.filter(col("event_id").isin(keys: _*))
        .withColumn("value", col("value") + 1.0)
        .withColumn("op", lit("u"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
      batch.createOrReplaceTempView("sql_merge_batch")
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      val stmt = s"""MERGE INTO $cat.t t USING sql_merge_batch s
        ON t.event_id = s.event_id
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET ${cols.filterNot(_ == "event_id")
          .map(c => s"t.$c = s.$c").mkString(", ")}
        WHEN NOT MATCHED AND s.op != 'd' THEN INSERT (${cols.mkString(", ")})
          VALUES (${cols.map(c => s"s.$c").mkString(", ")})"""
      timedWaves("v2_sql_merge", f, () => ()) { _ =>
        spark.sql(stmt); keys.size.toLong
      }
      // Attribution of the r14 t^0.28 wall residual (shuffle was flat, so
      // the growth had to be a scan): per-stage input bytes split the
      // statement into its two reads — the matching-rows subquery
      // (RowLevelOperationRuntimeGroupFiltering joins the WHOLE target
      // against the batch to find touched groups; nothing in the plain ON
      // condition is statically translatable, so that scan reads every
      // bucket and grows with the table) and the COW rewrite (runtime
      // group-filtered to the one touched bucket — flat). top_stage_mb at
      // f>1 IS the subquery scan.
      def attrRun(st: String): (Double, Double, Double) = {
        stageInputs.clear()
        val i0 = inputRead.get()
        val t0 = System.nanoTime()
        spark.sql(st)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300L)
        import scala.jdk.CollectionConverters._
        val top = stageInputs.asScala.map(_.longValue).maxOption.getOrElse(0L)
        (dt, (inputRead.get() - i0) / 1e6, top / 1e6)
      }
      val (pWall, pIn, pTop) =
        Seq(attrRun(stmt), attrRun(stmt)).minBy(_._1)
      // The statically-prunable twin: the same CDC merge with the batch's
      // literal key list as an extra ON conjunct (a CDC merger KNOWS its
      // batch keys driver-side — CdcPipeline does). The In filter
      // translates to the bucket set on BOTH scans, so the subquery scan
      // prunes to the touched bucket and the whole statement goes flat.
      val stmtKeyed = s"""MERGE INTO $cat.t t USING sql_merge_batch s
        ON t.event_id = s.event_id AND t.event_id IN (${keys.mkString(", ")})
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET ${cols.filterNot(_ == "event_id")
          .map(c => s"t.$c = s.$c").mkString(", ")}
        WHEN NOT MATCHED AND s.op != 'd' THEN INSERT (${cols.mkString(", ")})
          VALUES (${cols.map(c => s"s.$c").mkString(", ")})"""
      timedWaves("v2_sql_merge_keyed", f, () => { spark.sql(stmtKeyed); () }) { _ =>
        spark.sql(stmtKeyed); keys.size.toLong
      }
      val (kWall, kIn, kTop) =
        Seq(attrRun(stmtKeyed), attrRun(stmtKeyed)).minBy(_._1)
      println(f"scaleprobe v2_sql_merge_attr f=$f%-3d plain: wall=${pWall}%.3fs " +
        f"input=${pIn}%.1fMB top_stage=${pTop}%.1fMB | keyed: wall=${kWall}%.3fs " +
        f"input=${kIn}%.1fMB top_stage=${kTop}%.1fMB")
      sqlMergeAttr += (s"""{"f":$f,"plain_wall_sec":${jnum(pWall)},""" +
        s""""plain_input_mb":${jnum(pIn)},"plain_top_stage_mb":${jnum(pTop)},""" +
        s""""keyed_wall_sec":${jnum(kWall)},"keyed_input_mb":${jnum(kIn)},""" +
        s""""keyed_top_stage_mb":${jnum(kTop)}}""")
      batch.unpersist(blocking = false)
    }

    // Range-layout twin (round 17, v2_sql_merge_range): the table is
    // bucketed by user_id — the MERGE key event_id is NOT the bucket key,
    // so the key-IN variant cannot apply — and ingested as f APPEND-ORDERED
    // slices with disjoint event_id windows (each bucket leaf carries a
    // tight event_id min/max). The fixed 50-key batch lives in slice 0.
    // MergeKeyPruneRule's min/max conjunct + the v2 scan's manifest stats
    // skipping should hold the matching-rows subquery (top_stage_mb) at
    // ~slice size while the table grows f× — the range-clustered analogue
    // of the bucket-pinned claim above.
    if (only.forall(_.contains("v2_sql_merge_range")))
    for (f <- Seq(1, factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val n = 16 * f
      val cat = graft.queries.ConnectorQueries.tempCatalog(spark)
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      def slice(k: Int): DataFrame =
        ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value"))
      graft.queries.ConnectorQueries.ingestBucketed(
        spark, cat, "t", slice(0), "user_id", n)
      (1 until f).foreach { k =>
        slice(k).createOrReplaceTempView("rng_slice")
        spark.sql(s"INSERT INTO $cat.t SELECT * FROM rng_slice")
      }
      val keys = ev0.select("event_id").limit(50).collect()
        .map(_.getLong(0)).toSeq
      val batch = slice(0).filter(col("event_id").isin(keys: _*))
        .withColumn("value", col("value") + 1.0)
        .withColumn("op", lit("u"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
      batch.createOrReplaceTempView("sql_merge_range_batch")
      val stmt = s"""MERGE INTO $cat.t t USING sql_merge_range_batch s
        ON t.event_id = s.event_id
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET ${cols.filterNot(_ == "event_id")
          .map(c => s"t.$c = s.$c").mkString(", ")}
        WHEN NOT MATCHED AND s.op != 'd' THEN INSERT (${cols.mkString(", ")})
          VALUES (${cols.map(c => s"s.$c").mkString(", ")})"""
      timedWaves("v2_sql_merge_range", f, () => ()) { _ =>
        spark.sql(stmt); keys.size.toLong
      }
      def attrRunR(st: String): (Double, Double, Double) = {
        stageInputs.clear()
        val i0 = inputRead.get()
        val t0 = System.nanoTime()
        spark.sql(st)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300L)
        import scala.jdk.CollectionConverters._
        val top = stageInputs.asScala.map(_.longValue).maxOption.getOrElse(0L)
        (dt, (inputRead.get() - i0) / 1e6, top / 1e6)
      }
      val (rWall, rIn, rTop) = Seq(attrRunR(stmt), attrRunR(stmt)).minBy(_._1)
      println(f"scaleprobe v2_sql_merge_range_attr f=$f%-3d wall=${rWall}%.3fs " +
        f"input=${rIn}%.1fMB top_stage=${rTop}%.1fMB")
      sqlMergeAttr += (s"""{"f":$f,"layout":"range","wall_sec":${jnum(rWall)},""" +
        s""""input_mb":${jnum(rIn)},"top_stage_mb":${jnum(rTop)}}""")
      batch.unpersist(blocking = false)
    }

    // In-scan MOR chain amplification probe (v2_mor_chain): every bucket
    // task re-reads the WHOLE unbucketed chain and keeps its bucket's keys
    // (GraftSparkTable.scala, GraftMorPartitionReader), so total chain
    // bytes read scale as buckets × chainBytes — the deliberate price of
    // a shuffle-free ingest path that keeps storage-partitioned joins
    // valid mid-stream. This probe PRICES that product: bucket count ×
    // chain length sweep, recording measured task input bytes against the
    // base+chain floor, the scan wall-clock, and the compact() escape
    // hatch's cost at the same state — the numbers that say where the
    // amplification crosses "just compact".
    val chainAmp = scala.collection.mutable.ArrayBuffer.empty[String]
    if (only.forall(_.contains("v2_mor_chain")))
    for (b <- Seq(16, 64); c <- Seq(1, 4, 8)) {
      val ev = graft.queries.Q.events(spark, sfDir)
      val cat = graft.queries.ConnectorQueries.tempCatalog(spark)
      graft.queries.ConnectorQueries.ingestBucketed(
        spark, cat, "t", ev, "event_id", b)
      val wh = Paths.get(spark.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val gt = new graft.catalog.GraftCatalog(spark, wh).table("t")
      (0 until c).foreach { k =>
        gt.upsertDeferred(ev.filter(col("event_id") % 50 === k).limit(20000)
          .withColumn("value", col("value") + 1.0), "event_id")
      }
      val head = gt.log.latest().get
      def dirBytes(rels: Seq[String]): Long = rels.map { rel =>
        val dir = wh.resolve("t").resolve(rel).toFile
        Option(dir.listFiles()).map(_.filter(_.getName.endsWith(".parquet"))
          .map(_.length()).sum).getOrElse(0L)
      }.sum
      val chainMb = dirBytes(head.deltaDirs) / 1e6
      val baseMb = dirBytes(head.dataDirs) / 1e6
      // One real data column in the read schema: a bare count would prune
      // to zero columns and understate both base and chain bytes.
      def rd(): Long =
        spark.table(s"$cat.t").agg(count("value"), count(lit(1))).head.getLong(1)
      rd() // untimed warm-up
      var inputMb = 0.0
      val ts = (0 until waves).map { _ =>
        val i0 = inputRead.get()
        val t0 = System.nanoTime()
        rd()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100L)
        inputMb = (inputRead.get() - i0) / 1e6
        dt
      }
      val t1 = System.nanoTime()
      gt.compact()
      val compactSec = (System.nanoTime() - t1) / 1e9
      val predictedMb = baseMb + b * chainMb
      println(f"scaleprobe v2_mor_chain b=$b%-3d c=$c%-2d base=${baseMb}%.1fMB " +
        f"chain=${chainMb}%.1fMB scan=${median(ts)}%.3fs input=${inputMb}%.1fMB " +
        f"predicted=${predictedMb}%.1fMB compact=${compactSec}%.3fs")
      chainAmp += (s"""{"buckets":$b,"chain_commits":$c,"base_mb":${jnum(baseMb)},""" +
        s""""chain_mb":${jnum(chainMb)},"scan_sec":${jnum(median(ts))},""" +
        s""""scan_waves":${jarr(ts)},"input_mb":${jnum(inputMb)},""" +
        s""""predicted_mb":${jnum(predictedMb)},"compact_sec":${jnum(compactSec)}}""")
    }

    // Hot-key as-of probe: EVERY row carries one key — the monolithic
    // sweep is fully serialized (one task sorts and sweeps the lot) while
    // timeSplits=32 spreads it over 32 (key, range) partitions with
    // carry-over seeds. Two depths bracket the measured crossover on this
    // box: at 100k-1M rows per key the mono sweep still wins (a single
    // task sorts that in ~0.2 s; the split path pays ~0.4 s of bounds/
    // winners/carry machinery), at 5M rows per key the split sweep wins
    // ~2× (3.1-3.6 s vs 5.8-6.3 s measured) and the gap widens with
    // depth. timeSplits is therefore a deliberate knob for the
    // millions-of-rows-per-entity regime, not a default.
    if (only.forall(s => s("j_asof_hot") || s("j_asof_hot_mono")))
    for (f <- Seq(1, 5 * factor)) {
      val ev0 = graft.queries.Q.events(spark, sfDir)
      val hot = (0 until f).map { k =>
        ev0.select(
          (col("event_id") + lit(k * 100000000L)).as("event_id"),
          lit(777L).as("user_id"),
          col("ts"), col("event_type"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        hot.count()
        def aj(splits: Int): Long = graft.ops.TimeJoin.asofBackward(
          hot, hot.filter(col("event_type") === "signup"),
          "user_id", "ts", "ts", Seq("event_id"), prefix = "s_",
          tieBreak = Some("event_id"), timeSplits = splits)
          .agg(count("s_event_id"), count(lit(1))).head.getLong(1)
        timedWaves("j_asof_hot_mono", f, () => { aj(1); () })(_ => aj(1))
        timedWaves("j_asof_hot", f, () => { aj(32); () })(_ => aj(32))
      } finally hot.unpersist(blocking = false)
    }

    // CDC merge scaling — the reference's core workload, not covered by
    // the document probes above. Each wave is a full-update envelope
    // image of EVERY key (the bench's steady diet) applied to a bucketed
    // table of the same f× size: the probe therefore times the whole
    // foreachBatch body shape — JSON envelope decode → flatten → in-batch
    // dedup → merge — minus the streaming machinery. COW is the bucketed
    // partial rewrite with all buckets touched (its worst case, and the
    // honest one for a full-update wave); MOR is the O(batch) delta
    // append (preDeduped, as the pipeline calls it). Both the base table
    // and the batch scale by f, so time_exponent ≈ 1 is the "holds at
    // 100×" answer for COW, and MOR's exponent measures pure batch-size
    // scaling (its cost must not depend on the delta chain or table size).
    if (only.forall(s => s("cdc_cow_merge") || s("cdc_mor_append"))) {
      import org.apache.spark.sql.types._
      val rowSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts_us", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      for (f <- Seq(1, factor)) {
        val ev0 = graft.queries.Q.events(spark, sfDir)
        val ev = (0 until f).map { k =>
          ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
            col("ts"), col("user_id"), col("event_type"), col("value"),
            col("props"))
        }.reduce(_ unionByName _)
        val img = struct(col("event_id"),
          graft.plans.TimestampMicrosExprs.wallMicros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        // The envelope TEXT is the probe's input (persisted untimed, like
        // a received micro-batch): the decode is part of every timed wave.
        val rawEnv = ev.withColumn("value", col("value") + 1)
          .select(to_json(struct(struct(
            lit(null).cast(rowSchema).as("before"), img.as("after"),
            lit("u").as("op"), (col("event_id") * 10 + 1).as("ts_ms"))
            .as("payload"))).as("value"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nWave = rawEnv.count()
        val base = ev.select(col("event_id"),
          graft.plans.TimestampMicrosExprs.wallMicros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        def freshTable(tag: String): graft.table.GraftTable = {
          val t = new graft.table.GraftTable(spark,
            Files.createTempDirectory(s"scale-cdc-$tag-$f-").resolve("t"), "t")
          t.overwriteBucketed(base, "event_id", 16)
          t
        }
        def decoded(): DataFrame =
          graft.cdc.Envelope.transformBatch(rawEnv, rowSchema, "event_id")
            .drop("ts_ms")
        def onWave(t: graft.table.GraftTable, mor: Boolean, tag: String)(i: Int): Long = {
          val b = decoded()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (mor) t.upsertDeferred(b, "event_id", opCol = Some("op"),
              batchKey = Some(s"scale-$tag-$f-$i"), preDeduped = true)
            else t.upsert(b, "event_id", opCol = Some("op"),
              batchKey = Some(s"scale-$tag-$f-$i"))
            nWave
          } finally b.unpersist(blocking = false)
        }
        val cowT = freshTable("cow")
        timedWaves("cdc_cow_merge", f,
          () => { onWave(cowT, mor = false, "cow-warm")(0); () })(
          onWave(cowT, mor = false, "cow"))
        val morT = freshTable("mor")
        timedWaves("cdc_mor_append", f,
          () => { onWave(morT, mor = true, "mor-warm")(0); () })(
          onWave(morT, mor = true, "mor"))
        rawEnv.unpersist(blocking = false)
      }
    }

    // Change-feed + materialized-view maintenance scaling — the
    // incremental-consumption claim: feed and refresh cost track the
    // CHANGES, not the table. Base and bucket count BOTH scale with f
    // (a real table is bucket-sized to its data), the change batch stays
    // FIXED, so exponent ≈ 0 is "a downstream consumer's tick costs the
    // same on the 100 TB table as on the 10 TB one".
    //  - feed_append: insert-only window — reads only the commit's new dir.
    //  - feed_mor_delta: a 16-key deferred-upsert window — pre-images come
    //    from the delta keys' buckets only (bucket-pruned semi join), and
    //    those buckets are fixed-size because nb grows with f.
    //  - mv_refresh: the full maintenance tick (append a fixed batch +
    //    fold the feed into the view) — O(batch) + O(groups).
    if (only.forall(s =>
      s("feed_append") || s("feed_mor_delta") || s("mv_refresh"))) {
      for (f <- Seq(1, factor)) {
        val ev0 = graft.queries.Q.events(spark, sfDir)
        val base = (0 until f).map { k =>
          ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
            graft.plans.TimestampMicrosExprs.wallMicros(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _)
        val t = new graft.table.GraftTable(spark,
          Files.createTempDirectory(s"scale-feed-$f-").resolve("t"), "t")
        t.overwriteBucketed(base, "event_id", 16 * f)
        val v1 = t.latestVersion
        val batch = base.filter(col("event_id") < 20000)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        batch.count() // materialize untimed; the batch is the fixed change
        t.append(batch) // v2: the insert-only window
        val v2 = t.latestVersion
        timedWaves("feed_append", f,
          () => { t.changesBetween(v1, v2, "event_id").count(); () })(
          _ => t.changesBetween(v1, v2, "event_id").count())
        // Attribution twin: a plain Spark read of the SAME appended leaf
        // dirs, no feed machinery. The insert-only window's cost is the
        // commit's own file fan (16f bucket leaves at a fixed batch size);
        // twin ≈ feed_append means the feed's metadata walk adds ~nothing
        // and the residual growth is the per-leaf list/footer/task
        // constant — O(commit's own files), the feed's natural unit.
        locally {
          val snap2 = t.log.get(v2).get
          val addedDirs = t.log.commitDirDelta(v2).map(_._1).getOrElse(
            snap2.dataDirs.filterNot(
              t.log.get(v1).map(_.dataDirs).getOrElse(Seq.empty).toSet))
          val st = org.apache.spark.sql.types.DataType
            .fromJson(snap2.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          def readTwin(): Long = spark.read.schema(st).parquet(
            addedDirs.map(d => t.root.resolve(d).toString): _*).count()
          timedWaves("feed_append_readtwin", f,
            () => { readTwin(); () })(_ => readTwin())
        }
        t.upsertDeferred(base.filter(col("event_id") < 16)
          .withColumn("value", col("value") + 1.0), "event_id") // v3
        val v3 = t.latestVersion
        timedWaves("feed_mor_delta", f,
          () => { t.changesBetween(v2, v3, "event_id").count(); () })(
          _ => t.changesBetween(v2, v3, "event_id").count())
        val mv = new graft.table.MaterializedAgg(t, "by_type", "event_id",
          Seq("event_type"), Seq("value"))
        mv.create() // untimed setup: the one-off full recompute
        def tick(i: Int): Long = {
          t.append(batch, batchKey = Some(s"scale-mv-$f-$i"))
          mv.refresh()
          batch.count()
        }
        var w = -1
        timedWaves("mv_refresh", f, () => { w += 1; tick(1000 + w); () }) { i =>
          tick(i)
        }
        // Attribution twin: the same tick with the APPEND untimed (per-wave
        // setup) — times only the view's fold of the feed, separating the
        // ingest write's own O(bucket-count) footer/commit cost from the
        // refresh claim.
        var w2 = -1
        timedWaves("mv_refresh_only", f, () => (),
          setup = _ => { w2 += 1
            t.append(batch, batchKey = Some(s"scale-mvo-$f-$w2")) }) { _ =>
          mv.refresh()
          batch.count()
        }
        batch.unpersist(blocking = false)
      }
    }

    // Driver-side planning cost at HIGH DIR COUNTS (manifest_scale): the
    // manifest is O(dirs) with side stats; at 100 TB a table can carry
    // 10^5-10^6 dirs, and the untested bottleneck is the driver's
    // read+prune+plan step, not the executors. Synthesize a head that
    // references `extra` empty bucket-leaf dirs with DISJOINT stats (so
    // range pruning must consider and reject each one) on top of a real
    // small table, then measure: manifest read (fresh instance), a pruned
    // point lookup (bucket-suffix scan over every dir name + listing of
    // the key's bucket), and a stat-pruned range read.
    val manifestScale = scala.collection.mutable.ArrayBuffer.empty[String]
    if (only.forall(_.contains("manifest_scale")))
    // The 10^6 row (r16) models the layout a real 100 TB table at that dir
    // count would carry — ~1000 buckets, so dirs-per-bucket stays in the
    // hundreds — because the lookup contract under test is O(dirs-in-bucket
    // + chain), not O(dirs): the Snapshot-cached bucket index makes the
    // manifest term flat, and the residual warm cost is the key's own
    // bucket (its dir listings), which a 16-bucket 10^6-dir layout would
    // drown in 62k listings no index can avoid.
    for ((extra, nb) <- Seq((1000, 16), (10000, 16), (100000, 16),
        (1000000, 1024))) {
      val wh = Files.createTempDirectory("graft-mscale-")
      val gc = new graft.catalog.GraftCatalog(spark, wh)
      val ev = graft.queries.Q.events(spark, sfDir).limit(60000)
      val t0t = gc.saveTable("t", ev.limit(0))
      t0t.overwriteBucketed(ev, "event_id", nb)
      val head = t0t.log.latest().get
      val keys = ev.select("event_id").orderBy("event_id").limit(10)
        .collect().map(_.getLong(0))
      val fakes = (0 until extra).map(i => s"data/f$i/__bucket=${i % nb}")
      // The manifest references every fake dir (that is the cost under
      // test); on DISK only the dirs a probe lookup can touch need to
      // exist — the probed keys' buckets. At 10^6 dirs, creating all of
      // them would spend minutes of probe wall on mkdir syscalls the
      // measurement never reads.
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      val keyBuckets = keys.map(k => graft.plans.BucketHash.bucketId(
        k, org.apache.spark.sql.types.LongType, nb, tz)).toSet
      fakes.filter(d => graft.log.Snapshot.bucketOfDir(d).exists(keyBuckets))
        .foreach(d => Files.createDirectories(wh.resolve("t").resolve(d)))
      // Stats far outside the real key domain: every fake dir is
      // CONSIDERED and REJECTED by the range prune — the O(dirs) path.
      val fakeStats = fakes.map(d => d -> Map(
        "event_id:min" -> "9000000000", "event_id:max" -> "9000000999")).toMap
      val fakeRecs = fakes.map(_ -> 1000L).toMap
      t0t.log.commitExpecting(Some(head.snapshotId), "append", head.schemaJson,
        head.dataDirs ++ fakes, head.summary, None,
        head.dirRecords ++ fakeRecs, Seq.empty, head.dirStats ++ fakeStats)
      def freshT() = new graft.catalog.GraftCatalog(spark, wh).table("t")
      freshT().lookupKeyRows(keys(0)) // warm: JIT + fs metadata
      def ms(body: => Unit): Double = {
        val s0 = System.nanoTime(); body; (System.nanoTime() - s0) / 1e6
      }
      // COLD = fresh process: the parse/head caches are process-wide since
      // round 17 (a fresh catalog instance alone would be served another
      // instance's work), so each cold sample clears them first.
      def coldCaches(): Unit = graft.log.SnapshotLog.clearSharedCaches()
      val latestMs = (0 until 3).map(_ =>
        ms { coldCaches(); freshT().log.latest() }).min
      val lookupMs = (1 to 3).map(i =>
        ms { coldCaches(); require(freshT().lookupKeyRows(keys(i)).nonEmpty) }).min
      // Warm = a RESIDENT serving instance (manifest cached): what a
      // steady-state server pays per lookup at this dir count.
      val resident = freshT()
      resident.lookupKeyRows(keys(4))
      val warmMs = (5 to 7).map(i =>
        ms { require(resident.lookupKeyRows(keys(i)).nonEmpty) }).min
      val rangeMs = (0 until 3).map(_ => ms { coldCaches()
        freshT().readRange("event_id", keys(0), keys(9)).count() }).min
      // Warm range = a RESIDENT instance re-planning the same column: the
      // per-snapshot parsed-stats arrays (round 17) make repeat planning
      // two comparisons per dir instead of an O(dirs) stat-string parse.
      val rangeWarmMs = {
        resident.readRange("event_id", keys(0), keys(9)).count() // arrays build
        (0 until 3).map(_ => ms {
          resident.readRange("event_id", keys(0), keys(9)).count() }).min
      }
      // The segmented-detail prices (r16): a WHOLE one-row append at this
      // dir count (the ~0.3 s Spark write is constant across rows, so the
      // growth across rows isolates the metadata term), and what the
      // RESIDENT serving instance pays to re-read the head after that
      // commit (parse the new segment; prior segments cached).
      // Self-contained details made both O(dirs) — at 10^6 dirs, a
      // ~147 MB detail write per commit and a ~7.5 s re-parse per head
      // change.
      val ev1 = ev.limit(1).withColumn("event_id",
        col("event_id") + lit(7777777777L))
      val appendMs = ms { resident.append(ev1) }
      val headChangeMs = ms { resident.log.latest() }
      val warmAfterMs = (5 to 7).map(i =>
        ms { require(resident.lookupKeyRows(keys(i)).nonEmpty) }).min
      val manifestMb = {
        val logDir = wh.resolve("t").resolve("_log")
        scala.util.Using.resource(Files.list(logDir)) { st =>
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(Files.isRegularFile(_))
            .map(f => Files.size(f)).sum
        } / 1e6
      }
      println(f"scaleprobe manifest_scale extra=$extra%-7d buckets=$nb%-4d " +
        f"latest=${latestMs}%.1fms lookup=${lookupMs}%.1fms warm=${warmMs}%.1fms " +
        f"range=${rangeMs}%.1fms range_warm=${rangeWarmMs}%.1fms append=${appendMs}%.1fms " +
        f"head_change=${headChangeMs}%.1fms warm_after=${warmAfterMs}%.1fms " +
        f"log=${manifestMb}%.1fMB")
      manifestScale += (s"""{"extra_dirs":$extra,"buckets":$nb,""" +
        s""""latest_ms":${jnum(latestMs)},""" +
        s""""lookup_ms":${jnum(lookupMs)},"lookup_warm_ms":${jnum(warmMs)},""" +
        s""""range_ms":${jnum(rangeMs)},"range_warm_ms":${jnum(rangeWarmMs)},"append_commit_ms":${jnum(appendMs)},""" +
        s""""head_change_ms":${jnum(headChangeMs)},""" +
        s""""lookup_warm_after_commit_ms":${jnum(warmAfterMs)},""" +
        s""""log_mb":${jnum(manifestMb)}}""")
    }

    // Concurrent-writer CAS pricing (cas_contention): ConcurrencySpec
    // proves the races CORRECT; this prices them. Four appenders race
    // 8 batches each on one table while a compactor fires mid-stream;
    // report wall, CAS conflicts burned (retries), whether the
    // single-attempt compact survived, and staged-but-unreferenced bytes
    // (a loser's data that never committed — orphan-GC diet).
    val casContention = scala.collection.mutable.ArrayBuffer.empty[String]
    if (only.forall(_.contains("cas_contention"))) {
      val wh = Files.createTempDirectory("graft-cas-")
      val gc = new graft.catalog.GraftCatalog(spark, wh)
      val ev = graft.queries.Q.events(spark, sfDir).limit(80000)
      val t = gc.saveTable("t", ev.limit(0))
      t.overwriteBucketed(ev, "event_id", 16)
      val batch = ev.limit(2000)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
      val c0 = graft.log.CommitConflictException.total.get()
      val rows0 = t.read().count()
      @volatile var compactOk = true
      val t0 = System.nanoTime()
      val writers = (0 until 4).map { w =>
        new Thread(() => {
          val wt = new graft.catalog.GraftCatalog(spark, wh).table("t")
          (0 until 8).foreach { i =>
            wt.append(batch.withColumn("event_id",
              col("event_id") + lit((w * 8 + i + 1) * 10000000L)))
          }
        })
      }
      val compactor = new Thread(() => {
        Thread.sleep(400L)
        try new graft.catalog.GraftCatalog(spark, wh).table("t").compact()
        catch { case _: graft.log.CommitConflictException => compactOk = false }
      })
      (writers :+ compactor).foreach(_.start())
      (writers :+ compactor).foreach(_.join())
      val wallSec = (System.nanoTime() - t0) / 1e9
      val conflicts = graft.log.CommitConflictException.total.get() - c0
      val tEnd = new graft.catalog.GraftCatalog(spark, wh).table("t")
      val headEnd = tEnd.log.latest().get
      require(tEnd.read().count() == rows0 + 4 * 8 * batch.count(),
        "CAS race lost rows — contention probe found a correctness bug")
      // Unreferenced staged bytes: data dirs on disk minus every dir any
      // RETAINED snapshot references.
      val referenced = tEnd.log.snapshots()
        .flatMap(s => s.dataDirs ++ s.deltaDirs).toSet
      val dataRoot = wh.resolve("t")
      def dirBytes(p: java.nio.file.Path): Long =
        scala.util.Using.resource(Files.walk(p)) { st =>
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(Files.isRegularFile(_))
            .map(f => Files.size(f)).sum
        }
      val totalBytes = dirBytes(dataRoot.resolve("data"))
      val refBytes = referenced.iterator
        .map(d => wh.resolve("t").resolve(d))
        .filter(Files.isDirectory(_)).map(dirBytes).sum
      val orphanMb = math.max(0L, totalBytes - refBytes) / 1e6
      // The append-only rebase makes compactor survival a guarantee under
      // pure-append contention, not a coin flip — hold the probe to it.
      require(compactOk,
        "compact() starved under append-only contention — rebase regressed")
      // Close the orphan loop: expire history, run the grace-gated sweep
      // with grace=0 (the probe IS past any in-flight write), and measure
      // what survives. This documents the orphan-lifetime bound: an
      // unreferenced dir lives at most gcGraceMs + sweep interval.
      val gcT = new graft.table.GraftTable(spark, wh.resolve("t"), "t",
        gcGraceMs = 0L)
      gcT.expireSnapshots(5)
      gcT.log.gcOrphanDataDirs()
      val refAfter = gcT.log.snapshots()
        .flatMap(s => s.dataDirs ++ s.deltaDirs).toSet
      val totalAfter = dirBytes(dataRoot.resolve("data"))
      val refAfterBytes = refAfter.iterator
        .map(d => wh.resolve("t").resolve(d))
        .filter(Files.isDirectory(_)).map(dirBytes).sum
      val orphanAfterMb = math.max(0L, totalAfter - refAfterBytes) / 1e6
      require(orphanAfterMb < 0.05,
        f"orphaned staging not reclaimed post-sweep: ${orphanAfterMb}%.2f MB")
      println(f"scaleprobe cas_contention wall=${wallSec}%.2fs conflicts=$conflicts " +
        f"compact_ok=$compactOk orphan=${orphanMb}%.1fMB " +
        f"orphan_after_gc=${orphanAfterMb}%.2fMB commits=${headEnd.snapshotId}")
      casContention += (s"""{"writers":4,"appends_per_writer":8,""" +
        s""""wall_sec":${jnum(wallSec)},"cas_conflicts":$conflicts,""" +
        s""""compact_survived":$compactOk,"orphan_staged_mb":${jnum(orphanMb)},""" +
        s""""orphan_after_gc_mb":${jnum(orphanAfterMb)},""" +
        s""""final_snapshot":${headEnd.snapshotId}}""")
      batch.unpersist(blocking = false)
    }

    val perOp = results.map { case (name, byF) =>
      val fs = byF.map { case (f, (ts, med, mb, rows)) =>
        s""""f$f":{"waves":${jarr(ts)},"median_sec":${jnum(med)},"shuffle_mb":${jnum(mb)},"rows":$rows}"""
      }.mkString(",")
      val expo =
        for { (_, m1, _, _) <- byF.get(1); (_, mf, _, _) <- byF.get(factor)
              if m1 > 0 && factor > 1 }
          yield math.log(mf / m1) / math.log(factor.toDouble)
      val shufExpo =
        for { (_, _, s1, _) <- byF.get(1); (_, _, sf, _) <- byF.get(factor)
              if s1 > 0 && factor > 1 }
          yield math.log(sf / s1) / math.log(factor.toDouble)
      s""""$name":{$fs,"time_exponent":${expo.map(jnum).getOrElse("null")},"shuffle_exponent":${shufExpo.map(jnum).getOrElse("null")}}"""
    }.mkString("{", ",", "}")
    val chainJson =
      if (chainAmp.isEmpty) "null" else chainAmp.mkString("[", ",", "]")
    val sqlMergeAttrJson =
      if (sqlMergeAttr.isEmpty) "null" else sqlMergeAttr.mkString("[", ",", "]")
    val manifestScaleJson =
      if (manifestScale.isEmpty) "null" else manifestScale.mkString("[", ",", "]")
    val casJson =
      if (casContention.isEmpty) "null" else casContention.mkString("[", ",", "]")
    val json =
      s"""{"metric":"scale_probe","factor":$factor,"sf":"$sfDir","ops":$perOp,"mor_chain_amplification":$chainJson,"v2_sql_merge_attribution":$sqlMergeAttrJson,"manifest_scale":$manifestScaleJson,"cas_contention":$casJson}"""
    println(json)
    println("SCALE_JSON:" + json)
    // Default to a SCRATCH file, not a round artifact: a partial probe run
    // (SPARK_GRAFT_SCALE_ONLY=...) emits null for every section it skipped,
    // and writing that over a curated SCALE_r{N}.json would silently drop
    // the other sections. Curate subsets into the round artifact explicitly.
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "scale_probe_last.json")
    try Files.write(Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => println(s"scale_out write failed: ${e.getMessage}") }
    spark.stop()
  }
}
