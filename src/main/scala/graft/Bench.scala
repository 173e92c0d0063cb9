package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/**
 * Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
 * prints ONE JSON line. Failures are reported explicitly per query (-1
 * timing + an `errors` entry) instead of masquerading as timings.
 *
 * Also reports `merge_rows_per_sec`: a 10%-of-table CDC-style upsert into a
 * bucketed table — the apples-to-apples number against the reference's
 * ~50k rows/sec merger claim (`OZONE_ARCHITECTURE.md:75`).
 */
object Bench {

  /** Headline subset: analytics, engine DML, CDC, LLM ops. */
  private val headline = Seq(
    "q1_pricing_summary", "q4_topk_orders", "q5_latest_per_user",
    "q8_semi_join", "q9_region_rollup",
    "t_upsert_bucketed", "c_cdc_batch",
    "d_minhash_pairs", "e_cosine_topk", "x_quality")

  /** Curation ops (rounds 3-6), timed as their own group so the headline
    * `total` stays comparable across rounds. The media entries time REAL
    * codec work (JDK PNG decode incl. corpus synthesis; native AVI parse)
    * over one synthetic asset per document. */
  private val curation =
    Seq("d_cluster_cc", "x_decontam", "x_chunks", "x_split", "x_repetition",
      "x_line_dedup", "x_url_canon", "x_pack", "x_oov", "m_image_decode",
      "m_video_decode", "m_audio_dedup", "m_video_dedup",
      // round 10: substring-span dedup and the reference-distribution
      // scorers (DSIR + bigram-LM fluency).
      "d_dup_spans", "x_dsir_topk", "x_lm_topk",
      // round 13: the time-series joins (as-of union-window sweep and the
      // binned interval join) — tracked officially per round.
      "j_asof", "j_interval")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up the session (codegen, parquet footer caches, JIT) so the
    // first timed query isn't charged with one-time startup cost.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    // Ambient-load probe: a fixed single-threaded integer loop whose
    // wall-clock depends only on how much CPU this process actually gets.
    // Timed at bench start and end and reported as `calib_ms` — on a quiet
    // machine both readings sit near the nominal ~100-200 ms; a loaded
    // official run shows inflated calibration, making a noisy reading
    // distinguishable from a code regression without a rerun.
    def calibMs(): Double = {
      var acc = 0L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < 100000000L) {
        acc ^= java.lang.Long.rotateLeft(acc + i * 0x9E3779B97F4A7C15L, 13)
        i += 1
      }
      val ms = (System.nanoTime() - t0) / 1e6
      if (acc == 42L) println("calib") // defeat dead-code elimination
      ms
    }
    calibMs() // untimed: JIT-compile the loop so `start` measures load, not warm-up

    // Multi-threaded ambient-load probe: `cpus` concurrent copies of a
    // SHORTER version of the same loop, reporting the slowest thread's
    // wall-clock. r7 showed why the single-threaded probe alone is blind:
    // calib_ms sat at a quiet 103-113 ms while three independent 32-thread
    // workloads (d_minhash_pairs, cluster_cc pairs, x_line_dedup) all read
    // 2.1-2.3x slower on byte-identical code — co-tenant load that leaves
    // one core idle enough for a 1-thread probe still halves a 32-thread
    // stage. This probe contends for EVERY core the way Spark stages do.
    def calibMtMs(): Double = {
      val n = cpus.toInt
      val times = new java.util.concurrent.atomic.AtomicLongArray(n)
      val threads = (0 until n).map { t =>
        new Thread(() => {
          var acc = 0L
          var i = 0L
          val t0 = System.nanoTime()
          while (i < 25000000L) {
            acc ^= java.lang.Long.rotateLeft(acc + i * 0x9E3779B97F4A7C15L, 13)
            i += 1
          }
          times.set(t, System.nanoTime() - t0)
          if (acc == 42L) println("calib-mt")
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      (0 until n).map(times.get).max / 1e6
    }
    // I/O ambient-load probe: write a fixed 8 MB blob, fsync, read it back,
    // delete. The CPU probes are BLIND to co-tenant I/O pressure — the r13
    // official run shipped m_audio_dedup at 12.94 s vs 0.76 s quiet (17x)
    // while every trailing CPU bracket read a clean 34-40 ms, so the drop
    // rule never fired and the artifact could not attribute the inflation.
    // Media decode is the one section family that streams blobs, and this
    // probe contends for the disk exactly the way those sections do (the
    // fsync defeats the page cache on the write side).
    val ioCalibBuf: Array[Byte] = {
      val b = new Array[Byte](8 << 20)
      var i = 0; var acc = 0x9E3779B97F4A7C15L
      while (i < b.length) { acc = acc * 6364136223846793005L + 1442695040888963407L; b(i) = (acc >>> 56).toByte; i += 1 }
      b
    }
    // MIN of three write-fsync-read cycles: a single cycle has heavy tails
    // even on a quiet box (journal flush timing, temp-dir metadata), and a
    // noisy baseline would spuriously drop clean waves. Sustained co-tenant
    // I/O load inflates all three cycles; a one-off flush spike only one.
    def calibIoMs(): Double = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      val p = Files.createTempFile("graft-io-calib", ".bin")
      try {
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE)
        try { ch.write(java.nio.ByteBuffer.wrap(ioCalibBuf)); ch.force(false) }
        finally ch.close()
        val back = Files.readAllBytes(p)
        if (back.length == 42) println("io-calib") // defeat dead-code elim
      } finally Files.deleteIfExists(p)
      (System.nanoTime() - t0) / 1e6
    }.min
    calibIoMs() // untimed warm-up (JIT + temp-dir metadata)
    calibMtMs() // untimed JIT warm-up, same as the single-threaded probe
    val calibStart = calibMs()
    val calibMtStart = calibMtMs()

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Single-line, JSON-safe error text (multi-line Spark messages would
    // break the one-JSON-line output contract).
    def errText(e: Throwable): String =
      Option(e.getMessage).getOrElse(e.getClass.getName)
        .linesIterator.take(1).mkString.take(200)

    /** `n` timed runs, RAW — the median is the headline (single-shot timings
      * on a busy machine swing ±30%), and the full per-wave series is
      * reported as a dispersion field so a loaded-machine official run is
      * distinguishable from a code regression without a rerun. */
    def runsN(n: Int)(run: Int => Double): Seq[Double] = (0 until n).map(run)
    def median(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.size / 2) }

    // Generalized bracket-attributed wave-drop protocol, for EVERY timed
    // section (r11 proved it on the CDC sections, then published a 6.8 s
    // official d_minhash_pairs for a 1.8 s quiet plan and a 115 ms
    // lookup_mor_ms for a 21.5 ms quiet path purely because the other
    // sections lacked it). Each wave is followed by a multi-threaded
    // calibration bracket; a wave whose trailing bracket exceeds 2x the
    // section's ENTRY bracket ran under a co-tenant spike and is dropped
    // (largest brackets first, never below `minSurvivors`) before the
    // median. The raw wave series, every bracket, the entry reading, and
    // the dropped indices are all reported (`wave_calib_mt_ms`,
    // `section_entry_mt_ms`, `dropped_waves`), so no official median can
    // disagree with a quiet rerun without the artifact carrying the
    // bracket that explains it.
    val waveBrackets = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val waveIoBrackets = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val droppedWaves = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Int]]
    val sectionEntryMs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val sectionEntryIoMs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def robustWaves(name: String, n: Int, minSurvivors: Int, entryMs: Double,
        ioEntryMs: Option[Double] = None)(
        wave: Int => Double): (Seq[Double], Double) = {
      sectionEntryMs(name) = entryMs
      ioEntryMs.foreach(sectionEntryIoMs(name) = _)
      val brackets = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ioBrackets = scala.collection.mutable.ArrayBuffer.empty[Double]
      val waves = (0 until n).map { i =>
        val w = wave(i)
        brackets += calibMtMs()
        ioEntryMs.foreach(_ => ioBrackets += calibIoMs())
        w
      }
      // Baseline = min(entry, observed brackets): the entry reading can
      // itself land on a spike (the first bench run of this rule read the
      // headline entry at 103 ms vs the section's own 34-59 ms brackets —
      // allocation/GC debt from session warm-up), and an inflated baseline
      // silently disables the rule for its whole section. The probe's
      // quiet time is a stable floor, so the minimum observed reading is
      // the section's best estimate of "unloaded".
      val baseline = (entryMs +: brackets.toSeq).min
      val ioBaseline = ioEntryMs.map(e => (e +: ioBrackets.toSeq).min)
      // A wave is flagged when EITHER probe family saw the machine loaded:
      // the CPU bracket (every section, 2x) or the I/O bracket
      // (blob-streaming sections, 3x — I/O timing has heavier quiet-state
      // tails than a CPU spin even after calibIoMs's min-of-3). Drop order
      // = worst relative inflation across both families, never below
      // `minSurvivors`.
      def ioSev(i: Int): Double =
        ioBaseline.filter(_ => i < ioBrackets.size)
          .map(b => ioBrackets(i) / b).getOrElse(0.0)
      val flagged = waves.indices.filter { i =>
        brackets(i) > 2.0 * baseline || ioSev(i) > 3.0
      }
      val dropped = flagged
        .sortBy(i => -math.max(brackets(i) / baseline, ioSev(i)))
        .take(waves.size - minSurvivors).sorted
      waveBrackets(name) = brackets.toSeq
      if (ioBrackets.nonEmpty) waveIoBrackets(name) = ioBrackets.toSeq
      droppedWaves(name) = dropped.toSeq
      val kept = waves.indices.filterNot(dropped.contains)
      // LOWER middle for an even survivor count: dropping the middle wave
      // of [cold-start, steady, loaded] must not promote the cold first
      // wave to "the median" (observed: q1 medianed 3.79 s from survivors
      // [3.79, 1.03] — the raw series and brackets stay in the artifact,
      // so the choice is auditable).
      def survivorMedian(ts: Seq[Double]): Double = {
        val s = ts.sorted; s((s.size - 1) / 2)
      }
      val med = if (waves.exists(_ < 0)) -1.0 else survivorMedian(kept.map(waves))
      (waves, med)
    }

    // Every query entry is timed in 3 waves (median reported, raw series in
    // `dispersion`): the r5 official run read d_cluster_cc at 9.1s where r4
    // said 3.1s on UNCHANGED operator code (first-run codegen/JIT), and the
    // r7 run read d_minhash_pairs at 9.5s vs 4.4s — both single-shot
    // readings that could not be classified as code-vs-environment from the
    // artifact. The wave series can (cold first wave + tight warm tail =
    // startup; uniformly shifted series = regression or sustained load, and
    // the multi-threaded calibration probe splits THOSE two).
    // One section-entry bracket per query GROUP (headline / curation); each
    // query's waves then carry their own trailing brackets and the drop
    // rule — 3 waves, at most 1 dropped (minSurvivors = 2).
    // Sections that stream media blobs are I/O-bound: their waves carry an
    // I/O bracket in addition to the CPU one (see calibIoMs — the r13
    // officials shipped 17x inflated with clean CPU brackets).
    val ioBoundSections = Set(
      "m_image_decode", "m_video_decode", "m_audio_dedup", "m_video_dedup")
    // r18: the three sections whose official medians diverged most from
    // quiet across r16/r17 (officials 2x quiet with all waves loaded —
    // c_cdc_batch 3.44 s official vs 2.07 quiet with ZERO droppable waves)
    // run 7 waves with >=4 survivors: 3 waves with at most 1 drop cannot
    // bound the median when 2+ waves land on one sustained co-tenant ramp,
    // 7 waves spanning ~20 s usually straddle it.
    val highVarianceWaves = Map(
      "c_cdc_batch" -> ((7, 4)),
      "t_upsert_bucketed" -> ((7, 4)),
      "d_minhash_pairs" -> ((7, 4)))
    def timeWaves(names: Seq[String], n: Int): Seq[(String, Seq[Double], Double)] = {
      val entry = calibMtMs()
      val ioEntry: Option[Double] =
        if (names.exists(ioBoundSections)) Some(calibIoMs()) else None
      names.map { name =>
        val fn = SparkEntry.queries(name)
        val (nWaves, minSurv) = highVarianceWaves.getOrElse(name, (n, 2))
        val (waves, med) = robustWaves(name, nWaves, minSurvivors = minSurv,
          entry, ioEntryMs = ioEntry.filter(_ => ioBoundSections(name))) { _ =>
          if (errors.contains(name)) -1.0
          else {
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
            catch { case e: Throwable => errors(name) = errText(e); -1.0 }
          }
        }
        (name, waves, med)
      }
    }
    val headWavesAll = timeWaves(headline, 3)
    val headWaves = headWavesAll.map { case (n, ws, _) => n -> ws }
    val results = headWavesAll.map { case (n, _, m) => n -> m }
    val curWavesAll = timeWaves(curation, 3)
    val curWaves = curWavesAll.map { case (n, ws, _) => n -> ws }
    val curResults = curWavesAll.map { case (n, _, m) => n -> m }

    // Pair-generation vs connected-components split for the cluster entry.
    // CC is timed DIRECTLY over a cached pair frame — the r6 shape derived
    // cc_sec as tFull - tPairs across two separate end-to-end runs, and
    // run-to-run variance in the dominant pairs stage swamped the CC share
    // (the clamp reported 0.000, i.e. nothing).
    var ccPhases: Option[(Double, Double)] = None
    try {
      // SAME corpus construction as the gate entries (LlmQueries.dedupCorpus,
      // incl. its core-spreading exchange): the scope cache keys on plan
      // equality, so a differently-built corpus here would fork every
      // collapse/LSH intermediate into a second cache copy.
      val docs = graft.queries.LlmQueries.dedupCorpus(spark, sfDir)
      // The pair frame is persisted+counted here so CONSTRUCTION is the
      // pair-generation phase and CC then runs over the cached frame. The
      // shared per-corpus scope means this diagnostic re-queries the same
      // collapse/LSH caches the gate waves above warmed — the phase split
      // prices the incremental pair/CC work, matching how a pipeline that
      // just ran near-dup pairs would price a follow-on clustering.
      val scope = graft.queries.LlmQueries.dedupScope(sfDir)
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.nearDupPairs(docs, "doc_id", "text",
          minJaccard = 0.5, scope = scope)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      try {
        val t1 = System.nanoTime()
        graft.ops.Cluster.clusterDocs(docs, "doc_id", pairs).count()
        val tCc = (System.nanoTime() - t1) / 1e9
        ccPhases = Some((tPairs, tCc))
      } finally pairs.unpersist(blocking = false)
    } catch { case e: Throwable => errors("cluster_cc_phases") = errText(e) }

    // Heap hygiene before the throughput sections: the curation group above
    // now includes the REAL media codecs (ImageIO pixel rasters, AVI frame
    // buffers — large, short-lived allocations), and r6 showed the first CDC
    // waves after them running 6-14x steady state while the operator code on
    // that path was unchanged. A resident merger does not carry another
    // workload's garbage; forcing collection here keeps one section's
    // allocation debt from being billed to the next section's timed waves
    // (and the per-wave GC trace below proves out whatever remains).
    System.gc()
    Thread.sleep(200L)

    // CDC-merge throughput at the reference's batch size (~100k rows per
    // trigger, `cdc_merger_optimized.py:23`): keyed upsert into a bucketed
    // table of the full lineitem (600k rows at sf0.1). STEADY-STATE: the
    // baseline's ~50k rows/s is a long-running merger's sustained rate, so
    // one untimed warm-up merge absorbs the one-time codegen/JIT compile a
    // resident service amortizes; each timed merge then does every piece of
    // real per-batch work (scan, dedup, anti-join, bucketed write, commit).
    // Ambient-load brackets for the TABLE-LEVEL merge/MOR sections too:
    // this round's local validation read mor_rows_per_sec at 45k (waves
    // 2.2/2.2/2.3/2.5/0.77s — four loaded waves, one quiet) on code that
    // measures ~130k end-to-end seconds later in the same run, and only
    // the CDC sections carried brackets to prove the co-tenant ramp.
    val tblCalib = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    tblCalib("before_table_merge_ms") = calibMtMs()
    var mergeWaves: Seq[Double] = Seq.empty
    val mergeThroughput =
      try {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .withColumn("li_id", col("l_orderkey") * 10 + col("l_linenumber"))
        val t = new GraftTable(spark,
          Files.createTempDirectory("bench-wh-").resolve("t"), "t")
        t.overwriteBucketed(li, "li_id", 32)
        val batch = li.filter(col("l_orderkey") % 6 === 0)
          .withColumn("l_quantity", col("l_quantity") + 1)
        val nBatch = batch.count()
        // Warm-up merge with the SAME PLAN SHAPE as the timed waves (the
        // extra literal-add projection included): a bare-batch warm-up
        // leaves the timed shape's codegen uncompiled and wave 1 pays it —
        // r7 diagnosis read wave 1 at 2.9s vs a 1.3s steady state.
        t.upsert(batch.withColumn("l_quantity", col("l_quantity") + 100), "li_id")
        // Seven waves (r18; five since r6, three originally): two quiet
        // back-to-back r18 runs read this metric 57.3k vs 74.9k rows/s on
        // identical code — a ~8 s five-wave window can sit entirely inside
        // one co-tenant ramp. Seven waves + the bracket drop rule
        // (keep >= 4) straddle it the same way the CDC sections' 7 waves do.
        val (ws, med) = robustWaves("table_merge", 7, minSurvivors = 4,
            tblCalib("before_table_merge_ms")) { i =>
          val b = batch.withColumn("l_quantity", col("l_quantity") + i + 1)
          val t0 = System.nanoTime()
          t.upsert(b, "li_id")
          (System.nanoTime() - t0) / 1e9
        }
        mergeWaves = ws
        nBatch / med
      } catch { case e: Throwable => errors("merge_throughput") = errText(e); -1.0 }

    // Merge-on-read ingest throughput: the same 100k batch as a DELTA
    // append (no base rewrite) — the fast-ingest path's headline number.
    tblCalib("before_table_mor_ms") = calibMtMs()
    var morWaves: Seq[Double] = Seq.empty
    val morThroughput =
      try {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .withColumn("li_id", col("l_orderkey") * 10 + col("l_linenumber"))
        val t = new GraftTable(spark,
          Files.createTempDirectory("bench-mor-").resolve("t"), "t")
        t.overwriteBucketed(li, "li_id", 32)
        val batch = li.filter(col("l_orderkey") % 6 === 0)
          .withColumn("l_quantity", col("l_quantity") + 1)
        val nBatch = batch.count()
        // Same-shape warm-up as the merge metric (see above).
        t.upsertDeferred(batch.withColumn("l_quantity", col("l_quantity") + 100), "li_id")
        val (ws, med) = robustWaves("table_mor", 7, minSurvivors = 4,
            tblCalib("before_table_mor_ms")) { i =>
          val b = batch.withColumn("l_quantity", col("l_quantity") + i + 1)
          val t0 = System.nanoTime()
          t.upsertDeferred(b, "li_id")
          (System.nanoTime() - t0) / 1e9
        }
        morWaves = ws
        nBatch / med
      } catch { case e: Throwable => errors("mor_throughput") = errText(e); -1.0 }

    // End-to-end CDC streaming throughput: envelope JSON files → decode →
    // flatten → dedup → idempotent merge commits, via the real pipeline.
    // STEADY-STATE like the merge metric: ONE resident stream (the
    // reference's merger is a long-running process, `smart_ingest.sh`);
    // wave 1 runs untimed (absorbs stream/codegen warm-up), each later wave
    // lands on the running query and its processing is timed via
    // `processAllAvailable`. Each wave is one ~100k-row micro-batch —
    // exactly the reference's trigger sizing (`maxOffsetsPerTrigger=100000`,
    // `cdc_merger_optimized.py:23`), since events at sf0.1 is 100k rows.
    //
    // Each wave is ONE file moved in with ONE atomic rename: the resident
    // stream polls continuously, so a multi-file wave moved in a loop can be
    // picked up partially, silently splitting the wave into several
    // micro-batches that each pay a full merge — that race, not the
    // pipeline, produced the 22.6k rows/s r3 reading (the same code
    // measured 65-70k unsplit). decodeParallelism keeps the JSON decode of
    // the single-split file spread across the cores (AQE is off in
    // streaming plans, so nothing re-partitions the batch otherwise).
    var cdcBatchRows = -1L
    var cdcCowWaves: Seq[Double] = Seq.empty
    var cdcMorWaves: Seq[Double] = Seq.empty
    // Point-lookup latencies measured WHILE the resident MOR stream commits
    // (see the serving-under-ingest block below); p50/p99 in the artifact.
    var lookupUnderIngest: Seq[Double] = Seq.empty
    // Concurrent (t_rel_ms, cpu_ms, io_ms) bracket series sampled through
    // the under-ingest section, and the latency subset whose covering
    // bracket window was clean (see the sampler in the CDC MOR section).
    var underIngestBrackets: Seq[(Double, Double, Double)] = Seq.empty
    var lookupUnderIngestClean: Seq[Double] = Seq.empty
    // The clean samples with their tail-attribution fields intact:
    // (t_rel_ms, latency_ms, gc_delta_ms, post_commit) — see the probe.
    var underIngestCleanSamples: Seq[(Double, Double, Double, Boolean)] = Seq.empty
    // The MOR run's table, kept so the accumulated delta chain can be
    // compacted — and that compaction TIMED — after the ingest waves.
    var cdcMorTable: Option[GraftTable] = None
    // Multi-threaded ambient-load reading bracketing each CDC section:
    // r9's official run read cdc_mor at 21.4k rows/s on code that measures
    // 140k on a quiet machine — the run-level mt calibration (start 40ms /
    // end 127ms) showed co-tenant load ramping up, but couldn't say it hit
    // the MOR section specifically. These per-section brackets can.
    val cdcCalib = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Per-micro-batch traces for every wave incl. warm-up — zero-cost
    // bracketing plus the merge's NAMED phase split (prepass / merge+write /
    // footer listing / commit), see CdcPipeline.traces. Wave time minus
    // body time = streaming machinery; gc_sec isolates collector pauses;
    // the phase split lands whatever remains in a named stage.
    var cdcCowTrace: Seq[graft.cdc.CdcPipeline.BatchTrace] = Seq.empty
    var cdcMorTrace: Seq[graft.cdc.CdcPipeline.BatchTrace] = Seq.empty
    // Per-WAVE mt-calibration brackets and the indices the robust median
    // dropped (see robustWaves above — r9 and r10 both read the official
    // MOR figure at roughly a third of its quiet-wave value because one or
    // two load-spiked waves sat next to the median slot; the 7-wave CDC
    // sections drop at most down to 4 survivors).
    // Decode-vs-merge split of one instrumented COW wave (run AFTER the
    // timed ones — the instrumentation adds a cache-materializing count()).
    var cdcPhases: Option[(Long, Double, Double)] = None
    def cdcWaveThroughput(mergeOnRead: Boolean, tag: String): Double =
      try {
        import org.apache.spark.sql.types._
        val rowSchema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts_us", LongType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType)))
        val ev = graft.queries.Q.events(spark, sfDir)
        // Q.events emits NTZ; wallMicros extracts the micros zone-free
        // (unix_micros rejects NTZ).
        val img = struct(col("event_id"),
          graft.plans.TimestampMicrosExprs.wallMicros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        def envOf(rows: org.apache.spark.sql.DataFrame, op: String, tsOff: Int) =
          rows.select(to_json(struct(struct(lit(null).cast(rowSchema).as("before"),
            img.as("after"), lit(op).as("op"),
            (col("event_id") * 10 + tsOff).as("ts_ms")).as("payload")))
            .as("value"))
        val inDir = Files.createTempDirectory(s"bench-cdc-$tag-").resolve("in")
        envOf(ev, "c", 0).repartition(8).write.mode("overwrite").text(inDir.toString)
        val cat = new graft.catalog.GraftCatalog(spark,
          Files.createTempDirectory(s"bench-cdc-$tag-wh-"))
        val target = cat.createTable("cdc_bench", rowSchema,
          bucketBy = Some(("event_id", 16)))
        if (mergeOnRead) cdcMorTable = Some(target)
        val ckpt = Files.createTempDirectory(s"bench-cdc-$tag-ckpt-").toString
        // compactEvery = 16 > the 4 waves, so the MOR figure measures pure
        // delta-append ingest (compaction is the amortized background cost,
        // priced separately by mor_rows_per_sec's table machinery).
        val q = graft.cdc.CdcPipeline.start(spark, inDir.toString, rowSchema, target,
          "event_id", ckpt,
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
          maxFilesPerTrigger = 8, mergeOnRead = mergeOnRead,
          decodeParallelism = cpus.toInt)
        sys.props("graft.cdc.trace") = "true"
        graft.cdc.CdcPipeline.traces = Vector.empty
        try {
          q.processAllAvailable() // wave 1: full insert load, untimed warm-up
          // Timed waves are full UPDATE images of every key (the reference
          // merger's steady diet), median-timed. Each wave is written to a
          // STAGING dir the resident stream can't see, then moved in as one
          // atomic rename AFTER t0 — one wave, one file, one micro-batch,
          // deterministically.
          val nWave = ev.count()
          cdcBatchRows = nWave
          def oneWave(i: Int): Double = {
            val stage = Files.createTempDirectory(s"bench-cdc-$tag-stage-$i-")
            envOf(ev.withColumn("value", col("value") + 10 + i), "u", i + 1)
              .repartition(1).write.mode("overwrite").text(stage.toString)
            val part = {
              val parts = java.nio.file.Files.list(stage)
              try parts.filter(p => p.getFileName.toString.startsWith("part-"))
                .findFirst().get()
              finally parts.close()
            }
            val t0 = System.nanoTime()
            java.nio.file.Files.move(part, inDir.resolve(s"wave$i.json"))
            q.processAllAvailable() // timed: decode + dedup + merge of the wave
            val elapsed = (System.nanoTime() - t0) / 1e9
            // Drop the drained staging dir (only _SUCCESS/CRC leftovers).
            val rest = java.nio.file.Files.list(stage)
            try rest.forEach(p => java.nio.file.Files.deleteIfExists(p))
            finally rest.close()
            java.nio.file.Files.deleteIfExists(stage)
            elapsed
          }
          // Second untimed warm-up wave, this time an UPDATE: the insert
          // backfill lands in an EMPTY table, which never exercises the
          // merge's anti-join + touched-bucket rewrite plan — r6's first
          // TIMED wave paid that path's codegen/JIT (14-19s vs 1.4s steady
          // state) and, as the median-setter's neighbor, dragged the
          // official figure below half of steady state. A resident merger
          // compiles that path once at startup; so does the bench now.
          oneWave(20) // wave index 20: clear of the 0-6 timed file names
          // Seven timed waves, each followed by an mt-calibration bracket.
          // The official figure is the median of the waves that SURVIVE
          // load attribution: a wave whose trailing bracket exceeds 2x the
          // section-entry bracket ran under a co-tenant spike and is
          // dropped (largest brackets first, never below 4 survivors).
          // The raw 7-wave series and every bracket are reported, so the
          // artifact shows exactly which waves the median ignored and why.
          val entryBracket = calibMtMs()
          cdcCalib(s"${tag}_wave_entry_ms") = entryBracket
          val (waves, med) =
            robustWaves(s"cdc_$tag", 7, minSurvivors = 4, entryBracket)(oneWave)
          if (mergeOnRead) cdcMorWaves = waves else cdcCowWaves = waves
          if (mergeOnRead) {
            // Serving latency UNDER ACTIVE INGEST: the reference's
            // millisecond-serving claim is about a table a CDC merger is
            // continuously committing into — ConcurrencySpec proves those
            // races CORRECT, this measures what they COST. While three
            // more (untimed) update waves land on the resident stream, a
            // driver thread issues point lookups against the same table at
            // a ~5 ms think-time cadence; the full latency distribution is
            // summarized as p50/p99 in the artifact. Runs AFTER the timed
            // waves so the official ingest figure stays probe-free, and is
            // itself bracketed (before/after) for load attribution.
            try {
              val probeKeys = spark.read.parquet(s"$sfDir/events.parquet")
                .select("event_id").orderBy("event_id").limit(200)
                .collect().map(_.getLong(0))
              cdcCalib("before_lookup_ingest_ms") = calibMtMs()
              // Each latency sample carries its section-relative timestamp,
              // and a CONCURRENT sampler thread records a (t, cpu_ms,
              // io_ms) bracket series through the whole section — a p99
              // spike in the histogram is then attributable to the bracket
              // window it fell in (the r14 official shipped a 1092 ms p99
              // for a 46 ms quiet path with NO way to tell co-tenant load
              // from a real serving stall). The sampler uses the
              // single-threaded CPU probe so it cannot itself perturb the
              // ingest or the probe thread on a many-core box.
              // Each sample also carries (r18 tail attribution) the GC
              // time accrued DURING it and whether a new snapshot landed
              // since the previous sample — the two candidate causes of
              // the clean-bracket 160 ms p99 the r17 artifact couldn't
              // split (GC pause from the ingest writer vs cold footers /
              // head re-read on a fresh commit). The post-commit pre-warm
              // (GraftTable.prewarmServing) targets the second; this
              // breakdown proves which one remains.
              val lat = new java.util.concurrent.ConcurrentLinkedQueue[(Double, Double, Double, Boolean)]()
              val brSeries = new java.util.concurrent.ConcurrentLinkedQueue[(Double, Double, Double)]()
              val secT0 = System.nanoTime()
              def relMs = (System.nanoTime() - secT0) / 1e6
              @volatile var ingesting = true
              val gcBeans = java.lang.management.ManagementFactory
                .getGarbageCollectorMXBeans
              def gcTotalMs(): Double = {
                var s = 0L
                gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime))
                s.toDouble
              }
              val probe = new Thread(() => {
                var i = 0
                // Commit detection via the in-process commit tick, read
                // BEFORE each lookup: zero store I/O (the old per-sample
                // latestVersion listing taxed the path under measurement),
                // and a commit landing mid-lookup flags the NEXT sample —
                // the first lookup that STARTED after the commit — instead
                // of retroactively flagging the pre-commit one.
                var lastTick = graft.log.SnapshotLog.commitTick.get()
                while (ingesting) {
                  val k = probeKeys(i % probeKeys.length)
                  val tick = graft.log.SnapshotLog.commitTick.get()
                  val postCommit = tick != lastTick
                  lastTick = tick
                  val gc0 = gcTotalMs()
                  val t0 = System.nanoTime()
                  val n = target.lookupKeyRows(k).size
                  val latMs = (System.nanoTime() - t0) / 1e6
                  val gcD = gcTotalMs() - gc0
                  if (n > 0) lat.add((relMs, latMs, gcD, postCommit))
                  i += 1
                  Thread.sleep(5L)
                }
              })
              val sampler = new Thread(() => {
                while (ingesting) {
                  val cpu = calibMs()
                  val io = calibIoMs()
                  brSeries.add((relMs, cpu, io))
                  Thread.sleep(500L)
                }
              })
              probe.start(); sampler.start()
              (40 until 43).foreach(oneWave) // untimed ingest, deltas accrue
              ingesting = false
              probe.join(10000L); sampler.join(10000L)
              cdcCalib("after_lookup_ingest_ms") = calibMtMs()
              import scala.jdk.CollectionConverters._
              val samples = lat.asScala.toSeq.sortBy(_._1)
              lookupUnderIngest = samples.map(_._2)
              underIngestBrackets = brSeries.asScala.toSeq.sortBy(_._1)
              // Clean segment: samples whose NEXT bracket reading (the
              // first taken at-or-after the sample — it reflects the load
              // the sample ran under) is within 2x/3x of the series' own
              // quiet floor. With no bracket after a sample, the last one
              // covers it.
              if (underIngestBrackets.nonEmpty) {
                val cpuFloor = underIngestBrackets.map(_._2).min
                val ioFloor = underIngestBrackets.map(_._3).min
                def coveringBracket(t: Double) =
                  underIngestBrackets.find(_._1 >= t)
                    .getOrElse(underIngestBrackets.last)
                underIngestCleanSamples = samples.filter { case (t, _, _, _) =>
                  val (_, cpu, io) = coveringBracket(t)
                  cpu <= 2.0 * cpuFloor && io <= 3.0 * ioFloor
                }
                lookupUnderIngestClean = underIngestCleanSamples.map(_._2)
              }
            } catch { case e: Throwable =>
              errors("lookup_under_ingest") = errText(e) }
          }
          val trc = graft.cdc.CdcPipeline.traces
          if (mergeOnRead) cdcMorTrace = trc else cdcCowTrace = trc
          if (!mergeOnRead) {
            // One extra instrumented wave for the decode/merge split.
            sys.props("graft.cdc.timing") = "true"
            try { oneWave(30); cdcPhases = graft.cdc.CdcPipeline.lastTiming }
            finally sys.props.remove("graft.cdc.timing")
          }
          nWave / med
        } finally { q.stop(); sys.props.remove("graft.cdc.trace") }
      } catch { case e: Throwable => errors(s"cdc_${tag}_throughput") = errText(e); -1.0 }

    // End-to-end resident stream in BOTH write modes: copy-on-write
    // (bucketed partial rewrite per batch — the apples-to-apples number vs
    // the reference's merger) and merge-on-read (delta append per batch —
    // the fast-ingest mode's end-to-end number).
    cdcCalib("before_cow_ms") = calibMtMs()
    val cdcThroughput = cdcWaveThroughput(mergeOnRead = false, tag = "cow")
    cdcCalib("before_mor_ms") = calibMtMs()
    val cdcMorThroughput = cdcWaveThroughput(mergeOnRead = true, tag = "mor")
    cdcCalib("after_mor_ms") = calibMtMs()

    // Serving point lookup UNDER PENDING DELTAS — the state a CDC table is
    // in almost all the time between compactions, and the one the
    // "millisecond-latency" claim actually has to survive: the driver-side
    // MOR path resolves the key's base bucket plus the whole delta chain
    // (here ~9 waves' worth) without a Spark job. Timed BEFORE compact()
    // folds the chain away.
    var morLookupWaves: Seq[Double] = Seq.empty
    val morLookupMs =
      try {
        cdcMorTable.filter(_.log.latest().exists(_.deltaDirs.nonEmpty)) match {
          case Some(t) =>
            val keys = spark.read.parquet(s"$sfDir/events.parquet")
              .select("event_id").orderBy("event_id").limit(300)
              .collect().map(_.getLong(0))
            // Seven timed keys, pairwise-distinct buckets (of 16), same
            // rationale as the table-lookup section: 7 waves / >= 4
            // survivors gives the drop rule room on a millisecond path.
            val timedKeys = {
              val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
              val used = scala.collection.mutable.Set.empty[Int]
              keys.iterator.drop(20).foreach { k =>
                if (picked.size < 7) {
                  val b = graft.plans.BucketHash.bucketId(k,
                    org.apache.spark.sql.types.LongType, 16, "UTC")
                  if (!used.contains(b)) { used += b; picked += k }
                }
              }
              require(picked.size == 7,
                s"need 7 distinct-bucket keys, got ${picked.size}")
              picked.toSeq
            }
            // Warm-up keys from buckets DISJOINT from every timed key's
            // bucket (the CDC bench table is bucketed (event_id, 16)), same
            // rule as the table-lookup section below: a warm key hashing
            // into a timed key's bucket would pre-cache its footers and dir
            // listing and understate the reported cold latency.
            val timedBks = timedKeys.map(k => graft.plans.BucketHash.bucketId(
              k, org.apache.spark.sql.types.LongType, 16, "UTC")).toSet
            keys.iterator.filterNot(timedKeys.contains)
              .filter(k => !timedBks.contains(graft.plans.BucketHash.bucketId(
                k, org.apache.spark.sql.types.LongType, 16, "UTC")))
              .take(3)
              .foreach(k => t.lookupKeyRows(k)) // warm-up: JIT + footers
            val (ws, med) = robustWaves("lookup_mor", 7, minSurvivors = 4,
                calibMtMs(), ioEntryMs = Some(calibIoMs())) { i =>
              val t0 = System.nanoTime()
              val n = t.lookupKeyRows(timedKeys(i)).size
              val dt = (System.nanoTime() - t0) / 1e9
              require(n > 0, s"MOR lookup key ${timedKeys(i)} must exist")
              dt * 1000.0
            }
            morLookupWaves = ws
            med
          case None => -1.0
        }
      } catch { case e: Throwable => errors("mor_lookup_latency") = errText(e); -1.0 }

    // Price the MOR compaction: the ingest waves above deliberately stay
    // below compactEvery so the throughput figure is pure delta-append —
    // compaction is the amortized background cost, and an unpriced
    // "amortized" is an assertion, not a number. The table now holds the
    // base plus one 100k-row delta per wave; compact() resolves
    // latest-per-key across the whole chain and rewrites the base. Input
    // rows = base + all delta rows (what the resolution shuffle actually
    // processes).
    var compactSec = -1.0
    var compactInputRows = -1L
    // Phase split of the timed compaction (prepass / merge+write / footer /
    // commit, from GraftTable.lastMergePhases): the r13 quiet figure
    // dropped 518k -> 344k rows/s after the rank-cut correctness fix and
    // NOTHING in the artifact could attribute it — this trace names the
    // phase that moved, every round, for free.
    var compactPhases: Option[Seq[(String, Double)]] = None
    val compactRowsPerSec =
      try {
        cdcMorTable.flatMap(t => t.log.latest().map(s => (t, s))) match {
          case Some((t, head)) if head.deltaDirs.nonEmpty =>
            val rootP = t.root
            def dirRows(rel: String): Long =
              spark.read.parquet(rootP.resolve(rel).toString).count()
            compactInputRows = head.dirRecords.values.sum +
              head.deltaDirs.map(dirRows).sum
            GraftTable.lastMergePhases = None // only THIS compaction counts
            val t0 = System.nanoTime()
            t.compact()
            compactSec = (System.nanoTime() - t0) / 1e9
            compactPhases = GraftTable.lastMergePhases
            compactInputRows / compactSec
          case _ => -1.0
        }
      } catch { case e: Throwable => errors("compact_throughput") = errText(e); -1.0 }

    // Serving-path point-lookup latency, speaking to the reference's
    // "millisecond-latency" serving claim (`OZONE_ARCHITECTURE.md:87`):
    // median wall-clock of a bucket-pruned key lookup on the full lineitem
    // table (driver-side bucket hash → one bucket's files → footer
    // min/max skipping), collected to completion like a serving call.
    // Bracketed like every other throughput section: a loaded co-tenant
    // machine shows up as an inflated calibration reading, which is the
    // ONLY way to attribute a slow official lookup to load vs code from
    // the artifact alone (the r10 734 ms reading was unattributable).
    val lookupCalib = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var lookupWaves: Seq[Double] = Seq.empty
    var lookupWarmWaves: Seq[Double] = Seq.empty
    var lookupMultiWaves: Seq[Double] = Seq.empty
    var lookupWarmMs = -1.0
    var lookupMultiMs = -1.0
    var pointWaves: Seq[Double] = Seq.empty
    var pointMs = -1.0
    var pointScanMs = -1.0
    val lookupMs =
      try {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .withColumn("li_id", col("l_orderkey") * 10 + col("l_linenumber"))
        val t = new GraftTable(spark,
          Files.createTempDirectory("bench-lkp-").resolve("t"), "t")
        t.overwriteBucketed(li, "li_id", 32)
        // Timed keys come from the DATA (li_id is orderkey*10+linenumber,
        // a sparse domain — a guessed literal almost always misses, and an
        // empty-result lookup understates real point-read cost).
        val keys = li.select("li_id").orderBy("li_id").limit(400)
          .collect().map(_.getLong(0))
        // SEVEN timed keys from pairwise-DISTINCT buckets (the cold series
        // needs every wave to pay its own footer; see minSurvivors note
        // below): picked by scanning the id list with the same driver-side
        // hash the pruning uses.
        val timedKeys = {
          val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
          val used = scala.collection.mutable.Set.empty[Int]
          keys.iterator.drop(40).foreach { k =>
            if (picked.size < 7) {
              val b = graft.plans.BucketHash.bucketId(k,
                org.apache.spark.sql.types.LongType, 32, "UTC")
              if (!used.contains(b)) { used += b; picked += k }
            }
          }
          require(picked.size == 7, s"need 7 distinct-bucket keys, got ${picked.size}")
          picked.toSeq
        }
        // lookupKeyRows is the serving call: rows to completion, like the
        // reference's serving tier. THREE warm-up lookups, not one: r9
        // read lookup_ms at 33.8 with a monotonically improving wave
        // series (44/34/24 ms) — the signature of residual JIT/
        // classloading warm-up, not I/O — where r8 read 16.5; extra
        // warm-up calls compile the serving path fully before the first
        // timed wave. Warm keys are PROVABLY from different buckets than
        // every timed key (same driver-side hash the pruning uses), so
        // each timed lookup still pays its own cold footer — picked by
        // scan, not by index guess (xxhash64 scatters neighbors).
        val timedBuckets = timedKeys
          .map(k => graft.plans.BucketHash.bucketId(k,
            org.apache.spark.sql.types.LongType, 32, "UTC")).toSet
        val warmKeys = keys.iterator
          .filterNot(timedKeys.contains)
          .filter(k => !timedBuckets.contains(graft.plans.BucketHash.bucketId(
            k, org.apache.spark.sql.types.LongType, 32, "UTC")))
          .take(3).toSeq
        warmKeys.foreach(k => t.lookupKeyRows(k))
        def timedWave(i: Int): Double = {
          val key = timedKeys(i) // distinct existing keys
          val t0 = System.nanoTime()
          val n = t.lookupKeyRows(key).size
          val dt = (System.nanoTime() - t0) / 1e9
          require(n > 0, s"lookup key $key must exist")
          dt * 1000.0
        }
        val lookupEntry = calibMtMs()
        // The serving paths are parquet-decode/read-bound: co-tenant I/O
        // pressure inflates them while every CPU bracket stays clean (the
        // r14 official read lookup_mor at 766 ms for a 5.4 ms quiet path
        // with 33-44 ms CPU brackets). Every serving wave therefore carries
        // the same I/O bracket the media sections earned in r13, and the
        // sections run 7 waves / >= 4 survivors so the drop rule has room.
        val lookupIoEntry = calibIoMs()
        lookupCalib("before_lookup_ms") = lookupEntry
        val (coldWs, coldMed) =
          robustWaves("lookup", 7, minSurvivors = 4, lookupEntry,
            ioEntryMs = Some(lookupIoEntry))(timedWave)
        lookupWaves = coldWs
        // Warm repeat of the SAME keys: dir listings, footers, and the
        // serving-path JIT are all hot, so this series isolates the code
        // cost from cold-file I/O — a cold/warm gap is the filesystem, a
        // high warm floor is the decode path.
        val (warmWs, warmMed) =
          robustWaves("lookup_warm", 7, minSurvivors = 4, lookupEntry,
            ioEntryMs = Some(lookupIoEntry))(timedWave)
        lookupWarmWaves = warmWs
        // Multi-key serving form (the search tier's postings-fetch shape):
        // six keys spanning several buckets, one driver-side IN read.
        val multiKeys = Seq(keys(20), keys(80), keys(140), keys(220),
          keys(280), keys(360))
        t.lookupKeys(multiKeys).collect() // warm-up
        // SEVEN waves, not three (every key fixed across waves): the r13
        // quiet median (47.4 ms) landed ABOVE the co-tenant-loaded official
        // (23.5 ms) — run-to-run variance a 3-wave median cannot tame on a
        // ~30 ms multi-bucket driver read. More waves + the drop rule give
        // the median four survivors minimum.
        val (multiWs, multiMed) =
          robustWaves("lookup_multi", 7, minSurvivors = 4, lookupEntry,
            ioEntryMs = Some(lookupIoEntry)) { _ =>
            val t0 = System.nanoTime()
            val n = t.lookupKeys(multiKeys).collect().length
            val dt = (System.nanoTime() - t0) / 1e9
            // >= not ==: the synthetic lineitem can carry duplicate
            // (orderkey, linenumber) pairs, so one key may match several rows.
            require(n >= multiKeys.distinct.size,
              s"multi lookup expected >= ${multiKeys.distinct.size}, got $n")
            dt * 1000.0
          }
        lookupMultiWaves = multiWs
        lookupMultiMs = multiMed
        // Bloom-indexed SERVING equality read on a NON-bucket column
        // (l_suppkey): readPointRows prunes on the driver (manifest stats
        // + cached bloom sidecar) and decodes with the cached-footer
        // reader — zero Spark jobs steady-state, the non-key sibling of
        // lookup_ms. The companion full-scan filter read prices what the
        // index saves; both share the wave-drop brackets.
        val suppVals = li.select("l_suppkey").orderBy("li_id").limit(20)
          .collect().map(_.getLong(0)).distinct
        t.buildBloomIndex("l_suppkey") // untimed maintenance pass
        t.readPointRows("l_suppkey", suppVals(0)) // warm-up: JIT + caches
        val pv = suppVals(1)
        val (pWs, pMed) =
          robustWaves("point", 7, minSurvivors = 4, lookupEntry,
            ioEntryMs = Some(lookupIoEntry)) { _ =>
            val t0 = System.nanoTime()
            val n = t.readPointRows("l_suppkey", pv).size
            val dt = (System.nanoTime() - t0) / 1e9
            require(n > 0, s"point value $pv must exist")
            dt * 1000.0
          }
        pointWaves = pWs
        pointMs = pMed
        val (_, pScanMed) =
          robustWaves("point_scan", 7, minSurvivors = 4, lookupEntry,
            ioEntryMs = Some(lookupIoEntry)) { _ =>
            val t0 = System.nanoTime()
            t.read().filter(col("l_suppkey") === pv).count()
            (System.nanoTime() - t0) / 1e9 * 1000.0
          }
        pointScanMs = pScanMed
        lookupCalib("after_lookup_ms") = calibMtMs()
        lookupWarmMs = warmMed
        coldMed
      } catch { case e: Throwable => errors("lookup_latency") = errText(e); -1.0 }

    // LAYOUT section: range clustering and the window read it exists for.
    // One timed cluster() rewrite of the events table into 16 range-sorted
    // dirs, then a fixed narrow window read — dirs-planned vs dirs-total
    // puts the manifest data-skipping claim in the official artifact
    // (SCALE_r11 shows the same window flat at 10× the table).
    var clusterRewriteSec = -1.0
    var clusterWindowWaves: Seq[Double] = Seq.empty
    var clusterDirsRead = -1
    var clusterDirsTotal = -1
    val clusterWindowMs =
      try {
        val ev = graft.queries.Q.events(spark, sfDir)
        val t = new GraftTable(spark,
          Files.createTempDirectory("bench-cl-").resolve("t"), "t")
        t.overwrite(ev)
        val t0 = System.nanoTime()
        val snap = t.cluster(Seq("event_id"), 16)
        clusterRewriteSec = (System.nanoTime() - t0) / 1e9
        clusterDirsTotal = snap.dataDirs.size
        def win() = t.readRange("event_id", 1000L, 3000L)
        clusterDirsRead = win().inputFiles
          .map(_.split('/').takeRight(2).head).distinct.length
        win().count() // warm-up: codegen for the pruned-scan shape
        val (ws, med) = robustWaves("cluster_window", 7, minSurvivors = 4,
            calibMtMs(), ioEntryMs = Some(calibIoMs())) { _ =>
          val s0 = System.nanoTime()
          val n = win().count()
          val dt = (System.nanoTime() - s0) / 1e6
          require(n > 0, "clustered window must be non-empty")
          dt
        }
        clusterWindowWaves = ws
        med
      } catch { case e: Throwable => errors("cluster_layout") = errText(e); -1.0 }

    // STORAGE-PARTITIONED JOIN section: the same co-bucketed orders ⋈
    // lineitem aggregation priced through the v2 catalog (zero exchanges —
    // SpjSpec asserts the plan; this measures what the elision buys) and
    // through the plain parquet path (both sides exchange). Broadcast is
    // pinned off in BOTH arms so the comparison is exchange-vs-no-exchange,
    // not exchange-vs-broadcast; at 100 TB neither side broadcasts anyway.
    var spjWaves: Seq[Double] = Seq.empty
    var spjShuffleWaves: Seq[Double] = Seq.empty
    var spjJoinSec = -1.0
    val spjShuffleSec =
      try {
        val cat = graft.queries.ConnectorQueries.tempCatalog(spark)
        val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        graft.queries.ConnectorQueries.ingestBucketed(
          spark, cat, "orders", orders, "o_orderkey", 16)
        graft.queries.ConnectorQueries.ingestBucketed(
          spark, cat, "lineitem", li, "l_orderkey", 16)
        // The shuffled twin reads the SAME graft-table files through the
        // plain scan path — the arms differ only in exchange-vs-elision.
        val wh = java.nio.file.Paths.get(
          spark.conf.get(s"spark.sql.catalog.$cat.warehouse"))
        val gcat = new graft.catalog.GraftCatalog(spark, wh)
        val (ot, lt) = (gcat.table("orders"), gcat.table("lineitem"))
        def agg(l: org.apache.spark.sql.DataFrame,
            r: org.apache.spark.sql.DataFrame): Long =
          l.join(r, col("o_orderkey") === col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(sum("l_quantity"), count(lit(1))).count()
        val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          agg(spark.table(s"$cat.orders"), spark.table(s"$cat.lineitem")) // warm-up
          val entry = calibMtMs()
          val (ws, med) = robustWaves("spj_join", 3, minSurvivors = 2, entry) { _ =>
            val t0 = System.nanoTime()
            require(agg(spark.table(s"$cat.orders"),
              spark.table(s"$cat.lineitem")) > 0)
            (System.nanoTime() - t0) / 1e9
          }
          spjWaves = ws; spjJoinSec = med
          agg(ot.read(), lt.read()) // warm-up the shuffled shape
          val (sws, smed) = robustWaves("spj_shuffle", 3, minSurvivors = 2, entry) { _ =>
            val t0 = System.nanoTime()
            require(agg(ot.read(), lt.read()) > 0)
            (System.nanoTime() - t0) / 1e9
          }
          spjShuffleWaves = sws
          smed
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      } catch { case e: Throwable => errors("spj_join") = errText(e); -1.0 }

    def jnum(d: Double): String =
      if (d.isNaN || d.isInfinite) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    val cqs = curResults.map { case (k, v) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    val curTotal = curResults.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map { case (k, v) =>
      val esc = v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => ""
        case c => c.toString
      }
      s"\"$k\":\"$esc\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Per-metric raw wave series (plus min/median/max for the graded CDC
    // figure): a loaded-machine official run shows up as high spread, a
    // code regression as a uniformly shifted series.
    def jarr(ts: Seq[Double]): String = ts.map(jnum).mkString("[", ",", "]")
    val headDispersion = headWaves
      .map { case (k, ws) => s"\"$k\":${jarr(ws)}" }.mkString("{", ",", "}")
    val curDispersion = curWaves
      .map { case (k, ws) => s"\"$k\":${jarr(ws)}" }.mkString("{", ",", "}")
    val dispersion =
      s"""{"headline_secs":$headDispersion,"merge_secs":${jarr(mergeWaves)},"mor_secs":${jarr(morWaves)},"cdc_cow_secs":${jarr(cdcCowWaves)},"cdc_mor_secs":${jarr(cdcMorWaves)},"lookup_ms":${jarr(lookupWaves)},"lookup_warm_ms":${jarr(lookupWarmWaves)},"lookup_multi_ms":${jarr(lookupMultiWaves)},"lookup_mor_ms":${jarr(morLookupWaves)},"point_ms":${jarr(pointWaves)},"cluster_window_ms":${jarr(clusterWindowWaves)},"spj_join_secs":${jarr(spjWaves)},"spj_shuffle_secs":${jarr(spjShuffleWaves)},"curation_secs":$curDispersion}"""
    val cdcStats =
      if (cdcCowWaves.isEmpty) "null"
      else s"""{"min":${jnum(cdcCowWaves.min)},"median":${jnum(median(cdcCowWaves))},"max":${jnum(cdcCowWaves.max)}}"""
    def jtrace(ts: Seq[graft.cdc.CdcPipeline.BatchTrace]): String =
      ts.map { t =>
        val ph = t.phases.map(_.map { case (name, sec) =>
          s""","${name}_sec":${jnum(sec)}"""
        }.mkString).getOrElse("")
        s"""{"batch":${t.batchId},"body_sec":${jnum(t.bodySec)},"gc_sec":${jnum(t.gcSec)}$ph}"""
      }.mkString("[", ",", "]")
    val phases = cdcPhases.map { case (r, d, m) =>
      s"""{"rows":$r,"decode_sec":${jnum(d)},"merge_sec":${jnum(m)}}"""
    }.getOrElse("null")
    val ccPhasesJson = ccPhases.map { case (p, c) =>
      s"""{"pairs_sec":${jnum(p)},"cc_sec":${jnum(c)}}"""
    }.getOrElse("null")
    val calibEnd = calibMs()
    val calibMtEnd = calibMtMs()
    val calib = s"""{"start_ms":${jnum(calibStart)},"end_ms":${jnum(calibEnd)},"mt_start_ms":${jnum(calibMtStart)},"mt_end_ms":${jnum(calibMtEnd)}}"""
    // (No after_table_mor bracket: the CDC section's before_cow reading
    // lands immediately after the table-level MOR waves and covers it.)
    val cdcCalibJson = (tblCalib ++ cdcCalib ++ lookupCalib)
      .map { case (k, v) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    val waveBracketJson = waveBrackets
      .map { case (k, v) => s"\"$k\":${jarr(v)}" }.mkString("{", ",", "}")
    val waveIoBracketJson = waveIoBrackets
      .map { case (k, v) => s"\"$k\":${jarr(v)}" }.mkString("{", ",", "}")
    val droppedJson = droppedWaves.filter(_._2.nonEmpty)
      .map { case (k, v) => s"\"$k\":${v.mkString("[", ",", "]")}" }
      .mkString("{", ",", "}")
    val entryJson = sectionEntryMs
      .map { case (k, v) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    val entryIoJson = sectionEntryIoMs
      .map { case (k, v) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    val compactPhasesJson = compactPhases
      .map(_.map { case (p, s) => s"\"$p\":${jnum(s)}" }.mkString("{", ",", "}"))
      .getOrElse("null")
    def pct(ts: Seq[Double], p: Double): Double = {
      val s = ts.sorted
      s(math.min(s.size - 1, (p * s.size).toInt))
    }
    val underIngestJson =
      if (lookupUnderIngest.isEmpty) "null"
      else {
        val clean =
          if (lookupUnderIngestClean.isEmpty) ""
          else s""","clean_p50_ms":${jnum(pct(lookupUnderIngestClean, 0.50))},"clean_p99_ms":${jnum(pct(lookupUnderIngestClean, 0.99))},"clean_max_ms":${jnum(lookupUnderIngestClean.max)},"clean_n":${lookupUnderIngestClean.size}"""
        // Tail attribution (r18): split the clean samples into the first
        // lookup after a fresh commit vs steady-state, and count samples
        // whose latency was at least half GC time — together these name
        // what a clean_p99 above the steady band was spent on.
        val tail =
          if (underIngestCleanSamples.isEmpty) ""
          else {
            val (post, steady) = underIngestCleanSamples.partition(_._4)
            val gcAttr = underIngestCleanSamples.count(s =>
              s._3 >= math.max(5.0, 0.5 * s._2))
            val postP = if (post.isEmpty) "null"
              else jnum(pct(post.map(_._2), 0.99))
            val steadyP = if (steady.isEmpty) "null"
              else jnum(pct(steady.map(_._2), 0.99))
            s""","clean_post_commit_n":${post.size},"clean_post_commit_p99_ms":$postP,"clean_steady_p99_ms":$steadyP,"clean_gc_attributed_n":$gcAttr"""
          }
        val series =
          if (underIngestBrackets.isEmpty) ""
          else {
            val t = underIngestBrackets.map(b => jnum(b._1)).mkString(",")
            val c = underIngestBrackets.map(b => jnum(b._2)).mkString(",")
            val io = underIngestBrackets.map(b => jnum(b._3)).mkString(",")
            s""","bracket_t_ms":[$t],"bracket_cpu_ms":[$c],"bracket_io_ms":[$io]"""
          }
        s"""{"p50_ms":${jnum(pct(lookupUnderIngest, 0.50))},"p99_ms":${jnum(pct(lookupUnderIngest, 0.99))},"max_ms":${jnum(lookupUnderIngest.max)},"n":${lookupUnderIngest.size}$clean$tail$series}"""
      }
    // Headline variant: percentiles + the clean segment, no bracket series
    // (the last stdout line must stay compact for the driver's tail-parse).
    val underIngestCompactJson =
      if (lookupUnderIngest.isEmpty) "null"
      else {
        val clean =
          if (lookupUnderIngestClean.isEmpty) ""
          else s""","clean_p99_ms":${jnum(pct(lookupUnderIngestClean, 0.99))},"clean_n":${lookupUnderIngestClean.size}"""
        s"""{"p50_ms":${jnum(pct(lookupUnderIngest, 0.50))},"p99_ms":${jnum(pct(lookupUnderIngest, 0.99))},"n":${lookupUnderIngest.size}$clean}"""
      }
    val json = s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"curation_queries":$cqs,"curation_total_sec":${jnum(curTotal)},"errors":$errJson,"merge_rows_per_sec":${jnum(mergeThroughput)},"mor_rows_per_sec":${jnum(morThroughput)},"cdc_rows_per_sec":${jnum(cdcThroughput)},"cdc_mor_rows_per_sec":${jnum(cdcMorThroughput)},"cdc_batch_rows":$cdcBatchRows,"compact_sec":${jnum(compactSec)},"compact_input_rows":$compactInputRows,"compact_rows_per_sec":${jnum(compactRowsPerSec)},"lookup_ms":${jnum(lookupMs)},"lookup_warm_ms":${jnum(lookupWarmMs)},"lookup_multi_ms":${jnum(lookupMultiMs)},"lookup_mor_ms":${jnum(morLookupMs)},"point_ms":${jnum(pointMs)},"point_scan_ms":${jnum(pointScanMs)},"lookup_under_ingest":$underIngestJson,"cluster_rewrite_sec":${jnum(clusterRewriteSec)},"cluster_window_ms":${jnum(clusterWindowMs)},"spj_join_sec":${jnum(spjJoinSec)},"spj_shuffle_join_sec":${jnum(spjShuffleSec)},"cluster_dirs_read":$clusterDirsRead,"cluster_dirs_total":$clusterDirsTotal,"dispersion":$dispersion,"cdc_cow_wave_sec":$cdcStats,"cdc_cow_phases":$phases,"cdc_cow_trace":${jtrace(cdcCowTrace)},"cdc_mor_trace":${jtrace(cdcMorTrace)},"compact_phases":$compactPhasesJson,"cdc_section_calib_mt_ms":$cdcCalibJson,"wave_calib_mt_ms":$waveBracketJson,"wave_calib_io_ms":$waveIoBracketJson,"section_entry_mt_ms":$entryJson,"section_entry_io_ms":$entryIoJson,"dropped_waves":$droppedJson,"cluster_cc_phases":$ccPhasesJson,"calib_ms":$calib,"sf":"$sfDir"}"""
    // The FULL artifact (~9 kB: every wave, bracket, trace) goes to the
    // file sink and an early stdout line; the LAST stdout line is a COMPACT
    // headline (~1 kB) because the driver records only a 2000-char stdout
    // TAIL — r10/r11/r13 all shipped `parsed: null` when the full line was
    // last and its head got truncated away.
    val compact = s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"curation_total_sec":${jnum(curTotal)},"merge_rows_per_sec":${jnum(mergeThroughput)},"mor_rows_per_sec":${jnum(morThroughput)},"cdc_rows_per_sec":${jnum(cdcThroughput)},"cdc_mor_rows_per_sec":${jnum(cdcMorThroughput)},"compact_rows_per_sec":${jnum(compactRowsPerSec)},"compact_phases":$compactPhasesJson,"lookup_ms":${jnum(lookupMs)},"lookup_warm_ms":${jnum(lookupWarmMs)},"lookup_multi_ms":${jnum(lookupMultiMs)},"lookup_mor_ms":${jnum(morLookupMs)},"point_ms":${jnum(pointMs)},"point_scan_ms":${jnum(pointScanMs)},"lookup_under_ingest":$underIngestCompactJson,"cluster_window_ms":${jnum(clusterWindowMs)},"spj_join_sec":${jnum(spjJoinSec)},"spj_shuffle_join_sec":${jnum(spjShuffleSec)},"dropped_waves":$droppedJson,"n_errors":${errors.size},"calib_ms":$calib,"sf":"$sfDir"}"""
    println("BENCH_JSON:" + json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => println(s"bench_out write failed: ${e.getMessage}") }
    // LAST line of stdout, bare JSON (run / outputStrategy := StdoutOutput
    // passes it through sbt verbatim): what the driver's tail parses.
    println(compact)
    spark.stop()
  }
}
