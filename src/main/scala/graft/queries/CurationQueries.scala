package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Curation
import Q._

/**
 * Gate entries for the corpus-curation operators: benchmark
 * decontamination, deterministic hash splitting, PII-style redaction, and
 * token-window chunking. Every entry has a full DuckDB oracle — the
 * operators were designed around engine-portable primitives (md5 hex,
 * RE2-safe regexes, integer-exact chunk arithmetic) precisely so the
 * correctness gate can hash-check them.
 */
object CurationQueries {

  /**
   * Deterministic PII injection for the redaction gate: the corpus is
   * synthetic and contains no emails/URLs/phones, so every 7th document
   * gets a suffix with one of each — BOTH the Spark query and the DuckDB
   * oracle construct the same input, keeping the gate non-vacuous.
   */
  private val piiSuffix =
    " Contact bob.smith@example.com via https://example.com/a?b=1 or call 555-123-4567 now"

  val queries: Map[String, QueryFn] = Map(
    // Benchmark decontamination: every 5th doc stands in for the eval set;
    // n_hits = distinct shared word-5-grams per contaminated corpus doc.
    "x_decontam" -> ((s, d) => {
      val docs = Q.spread(tbl(s, d, "documents"), "doc_id")
      Curation.contaminationHits(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", n = 5)
    }),

    // WHERE the contamination sits: benchmark-overlap windows merged into
    // per-doc token spans (the review surface behind the x_decontam flag).
    "x_decontam_spans" -> ((s, d) => {
      val docs = Q.spread(tbl(s, d, "documents"), "doc_id")
      Curation.contaminationSpans(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", n = 5)
    }),

    // Model-based quality filtering machinery (fasttext-style): logistic
    // regression over hashed n-gram features, trained by in-engine
    // Adagrad GD on the md5 train slice against a deterministic probe
    // label (docs with >= 2 'the' tokens — balanced AND exactly linear in
    // the feature space via the reciprocal-length meta feature, so the
    // held-out gate measures the TRAINING machinery, not corpus
    // semantics the synthetic data doesn't have). Split/class sizes are
    // exactly reproducible integers; accuracy/separation leave the plan
    // only as margin-robust booleans (float sums are order-sensitive).
    "x_quality_clf" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val lbl = size(filter(graft.ops.Dedup.tokens(col("text")),
        t => t === "the")) >= 2
      graft.ops.QualityClassifier.trainEval(docs, "doc_id", "text", lbl,
        numBuckets = 512, iters = 60, lr = 8.0, l2 = 1e-4)
    }),

    // Surgical decontamination: benchmark-overlap SPANS removed, the rest
    // of each document kept (vs x_decontam's whole-doc drop).
    "x_decontam_strip" -> ((s, d) => {
      val docs = Q.spread(tbl(s, d, "documents"), "doc_id")
      Curation.stripContamination(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", n = 5)
    }),

    // Deterministic content-hash split (~80/10/10 by md5 prefix).
    "x_split" -> ((s, d) =>
      Curation.withSplit(tbl(s, d, "documents"), "text")
        .select("doc_id", "split")),

    // PII redaction over the injected corpus: cleaned text + per-category counts.
    "x_redact" -> ((s, d) =>
      Curation.redactionReport(
        tbl(s, d, "documents").withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(piiSuffix)))
            .otherwise(col("text"))),
        "doc_id", "text")),

    // Token-window chunking (window 32, overlap 4).
    "x_chunks" -> ((s, d) =>
      Curation.chunkTokens(tbl(s, d, "documents"), "doc_id", "text")),

    // Content-defined chunking: the boundaries are a rolling-hash function
    // SQL cannot reproduce, so the gate checks the property that IS
    // SQL-expressible — chunks concatenated in chunk_id order reproduce
    // every non-null document exactly (losslessness through the real
    // split + posexplode + re-assemble plumbing). The content-defined
    // properties a value check can't see (boundary re-alignment after an
    // insertion, min/avg/max bounds, fixed-size contrast) are asserted by
    // CdcChunkSpec.
    "x_cdc_chunks" -> ((s, d) =>
      Curation.cdcChunks(tbl(s, d, "documents"), "doc_id", "text",
          minSize = 16, avgSize = 64, maxSize = 256)
        .groupBy("doc_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          c => c.getField("chunk_text")), "").as("text"))),

    // URL canonicalization + registered-domain extraction: each doc id
    // builds a deliberately messy URL (uppercase scheme/host, default
    // port, tracking params, unsorted query, trailing slash, fragment)
    // whose CANONICAL form is a closed-form function of the id — the
    // Spark side does the real normalization, the oracle is arithmetic.
    // Suffixes rotate through a generic two-label (.co.uk), a ccTLD
    // national two-label (.ne.jp — the extended heuristic set), and a
    // plain gTLD (.com), so both keep-three-label paths are oracle-checked.
    "x_url_canon" -> ((s, d) => {
      val messy = concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("http://")),
        lit("WWW.Site"), col("doc_id") % 20,
        when(col("doc_id") % 3 === 0, lit(".CO.UK"))
          .when(col("doc_id") % 3 === 1, lit(".NE.JP"))
          .otherwise(lit(".COM")),
        when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")),
        lit("/Page"), col("doc_id"),
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        lit("?b=2&utm_source=x&a="), col("doc_id") % 7,
        when(col("doc_id") % 4 === 0, lit("&gclid=z")).otherwise(lit("")),
        lit("#sec"), col("doc_id"))
      tbl(s, d, "documents")
        .select(col("doc_id"), messy.as("__url"))
        .select(col("doc_id"),
          Curation.canonicalizeUrl(col("__url")).as("url_canonical"),
          Curation.registeredDomain(col("__url")).as("domain"))
    }),

    // Corpus-level line dedup (RefinedWeb/C4 boilerplate removal). The
    // fixture text carries no newlines, so the gate first RECONSTRUCTS
    // multi-line documents deterministically — 8-token non-overlapping
    // windows joined by \n (the x_chunks construction, overlap 0) — then
    // drops every line shared by more than 5 distinct documents and
    // rebuilds the survivors. Exact-duplicate docs (the fixture's 50 dup
    // groups) make their lines boilerplate wherever a group exceeds the
    // cap, so the result exercises both drop and keep paths.
    "x_line_dedup" -> ((s, d) => {
      // NOT spread: measured neutral-to-worse (0.74 s -> 0.80 s) — the
      // reconstruction collect_list shuffle dominates, not the scan CPU.
      val docs = tbl(s, d, "documents")
      val lines8 = Curation.chunkTokens(docs, "doc_id", "text",
        window = 8, overlap = 0)
      val multi = lines8.groupBy("doc_id").agg(
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          s2 => s2.getField("chunk_text")), "\n").as("text"))
      Curation.dropRepeatedLines(multi, "doc_id", "text", maxDocFreq = 5)
    }),

    // Deterministic 25% content-hash sample.
    "x_sample" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      docs.filter(Curation.sampleByHash("text", keep16 = 0x4000))
        .select("doc_id")
    }),

    // Per-language quota of 30 docs (domain balancing), md5-deterministic.
    "x_cap_group" -> ((s, d) =>
      Curation.capPerGroup(tbl(s, d, "documents"), "lang", "doc_id", "text", k = 30)
        .select("lang", "doc_id")),

    // Stratified 25% sample per language: exact ceil(frac*n) quota per
    // group, membership by md5 order — the oracle reproduces the sample
    // row-for-row.
    "x_stratified" -> ((s, d) =>
      Curation.stratifiedSample(tbl(s, d, "documents"), "lang", "doc_id",
          "text", frac = 0.25)
        .select("lang", "doc_id")),

    // Weighted training mix: en at 1.5 epochs, de at 0.75, the rest at
    // 1.0 — binary-exact weights so the fractional quota arithmetic is
    // bit-identical across engines. The oracle reproduces every (doc,
    // epoch) row.
    "x_mix" -> ((s, d) =>
      Curation.weightedMix(tbl(s, d, "documents"), "lang", "doc_id", "text",
          weights = Map("en" -> 1.5, "de" -> 0.75))
        .select("doc_id", "lang", "epoch")),

    // Greedy sequence packing: whole documents into 256-token training
    // sequences, 8 id-shards packed independently. The oracle replays the
    // same greedy recurrence with a recursive CTE over (shard, id) order,
    // so every (seq_id, seq_offset) assignment is hash-checked.
    "x_pack" -> ((s, d) =>
      Curation.packSequences(tbl(s, d, "documents"), "doc_id", "text",
        budget = 256, shards = 8)),

    // Bloom-membership triage of an ingest batch against the corpus
    // sketch: even-id batch docs are true re-ingests (byte-identical
    // text), odd-id docs get a novel suffix. The sketch's one-sided
    // guarantee is the gate: zero false negatives (hard Bloom property),
    // false positives under the sized-for bound. n_batch/n_exact_dup are
    // recomputed exactly by the oracle; the booleans assert the sketch
    // behavior the way the ANN recall gates do.
    "x_bloom" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val batch = docs.select((col("doc_id") + 50000).as("bid"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zz"), col("doc_id"))).as("btext"))
      // expectedItems plays the corpus-size hint that table stats supply
      // at scale. Sized from the actual corpus count (cheap at gate
      // scale, and floored for tiny corpora) rather than a hardcoded
      // 10000 — the driver has regenerated testdata between rounds
      // before, and an under-sized sketch would blow the fp_rate gate.
      val bloom = graft.ops.Dedup.corpusBloom(docs, "text",
        expectedItems = math.max(docs.count(), 1000L), fpp = 0.01)
      val corpusNorm = docs
        .select(graft.ops.Dedup.normalize(col("text")).as("__norm")).distinct()
      val joined = graft.ops.Dedup.bloomFlag(batch, "bid", "btext", bloom)
        .join(corpusNorm,
          graft.ops.Dedup.normalize(col("btext")) === col("__norm"), "left")
        .select(col("maybe_dup"), col("__norm").isNotNull.as("__is_dup"))
      val fp = sum(when(col("maybe_dup") && !col("__is_dup"), 1L).otherwise(0L))
      joined.agg(
        count(lit(1)).as("n_batch"),
        sum(when(col("__is_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
        bool_and(!col("__is_dup") || col("maybe_dup")).as("no_false_negatives"),
        (fp <= lit(10L) ||
          fp * 20 <= sum(when(!col("__is_dup"), 1L).otherwise(0L))).as("fp_rate_ok"))
    }),

    // COMPOSITE training-sequence export — the tail of the pipeline a
    // pretraining run actually ships: exact dedup → quality filter →
    // 32-token chunking → greedy packing of the chunks into 128-token
    // sequences. Chunk unit ids are doc_id*1000+chunk_id (chunk counts are
    // bounded far below 1000 by the 32-token window against the corpus's
    // doc lengths), so the oracle can replay the whole chain including the
    // packing recurrence. Every sequence assignment is hash-checked.
    "p_training_export" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val deduped = graft.ops.Dedup.exactDedup(docs, "doc_id", "text")
      val quality = deduped.filter(graft.ops.TextAnalysis.passesQuality(col("text")))
      val chunks = Curation.chunkTokens(quality, "doc_id", "text",
        window = 32, overlap = 0)
      val units = chunks.select(
        (col("doc_id") * 1000 + col("chunk_id")).as("cid"), col("chunk_text"))
      Curation.packSequences(units, "cid", "chunk_text", budget = 128, shards = 8)
    }),

    // COMPOSITE end-to-end curation pipeline — the operators chained the
    // way a real training-data run chains them: exact dedup → benchmark
    // decontamination → quality filter → deterministic split → token
    // chunking, rolled up per split. One hash-checked gate proves the whole
    // chain, not just each stage in isolation.
    "p_curation_pipeline" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val deduped = graft.ops.Dedup.exactDedup(docs, "doc_id", "text")
      val corpus = deduped.filter(col("doc_id") % 5 =!= 0)
      val bench = docs.filter(col("doc_id") % 5 === 0)
      val clean = Curation.decontaminate(corpus, bench, "doc_id", "text")
      // Quality gate, split label and chunk count are all per-row columns:
      // one pass over the decontaminated survivors, no self-joins.
      clean.filter(graft.ops.TextAnalysis.passesQuality(col("text")))
        .select(Curation.hashSplit("text").as("split"),
          Curation.chunkCount(col("text")).as("__nc"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("__nc").as("n_chunks"))
    }))

  private val tokCte =
    """WITH tok AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ts FROM documents)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    // CORPUS-COUPLED CONSTANTS: `true AS acc_ok, true AS sep_ok` assert
    // that training converges (test accuracy / score separation above the
    // gate body's thresholds) on THIS synthetic corpus + split — a learned
    // outcome no one-shot SQL can recompute. Validated at sf0.001, sf0.01
    // and sf0.1; if the corpus changes and the classifier stops separating,
    // the Spark side emits false and the gate FAILS (the desired signal)
    // rather than passing by construction.
    "x_quality_clf" ->
      """WITH lab AS (SELECT doc_id,
        |  CASE WHEN len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    t -> t = 'the')) >= 2 THEN 1 ELSE 0 END AS y,
        |  CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 1 ELSE 0 END AS tr
        |  FROM documents)
        |SELECT CAST(sum(tr) AS BIGINT) AS n_train,
        |  CAST(sum(tr * y) AS BIGINT) AS n_pos_train,
        |  CAST(sum(1 - tr) AS BIGINT) AS n_test,
        |  CAST(sum((1 - tr) * y) AS BIGINT) AS n_pos_test,
        |  true AS acc_ok, true AS sep_ok
        |FROM lab""".stripMargin,
    "x_decontam_strip" ->
      (tokCte +
        """,win AS (SELECT doc_id, len(ts) AS nt,
          |    unnest(CASE WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')]
          |      ELSE list_transform(range(0, len(ts) - 4),
          |        i -> array_to_string(ts[CAST(i + 1 AS INT):CAST(i + 5 AS INT)], ' ')) END) AS gram,
          |    unnest(CASE WHEN len(ts) < 5 THEN [CAST(0 AS BIGINT)] ELSE range(0, len(ts) - 4) END) AS pos
          |  FROM tok WHERE doc_id % 5 <> 0),
          |bench AS (SELECT DISTINCT
          |    unnest(CASE WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')]
          |      ELSE list_transform(range(0, len(ts) - 4),
          |        i -> array_to_string(ts[CAST(i + 1 AS INT):CAST(i + 5 AS INT)], ' ')) END) AS gram
          |  FROM tok WHERE doc_id % 5 = 0),
          |fl AS (SELECT w.doc_id, CAST(w.pos AS BIGINT) AS pos, CAST(least(w.pos + 5, w.nt) AS BIGINT) AS e
          |       FROM win w JOIN bench USING (gram)),
          |brk AS (SELECT doc_id, pos, e,
          |    CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS b
          |  FROM fl),
          |isl AS (SELECT doc_id, pos, e, sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM brk),
          |spans AS (SELECT doc_id, island, min(pos) AS s, max(e) AS e2 FROM isl GROUP BY doc_id, island),
          |toks AS (SELECT doc_id, unnest(ts) AS tk, unnest(range(0, len(ts))) AS p FROM tok WHERE doc_id % 5 <> 0),
          |kept AS (SELECT t.doc_id, t.tk, t.p FROM toks t
          |         WHERE NOT EXISTS (SELECT 1 FROM spans sp
          |           WHERE sp.doc_id = t.doc_id AND t.p >= sp.s AND t.p < sp.e2))
          |SELECT d.doc_id, coalesce(k.ct, '') AS clean_text
          |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0) d
          |LEFT JOIN (SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS ct
          |           FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin),
    "x_decontam_spans" ->
      (tokCte +
        """,win AS (SELECT doc_id, len(ts) AS nt,
          |    unnest(CASE WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')]
          |      ELSE list_transform(range(0, len(ts) - 4),
          |        i -> array_to_string(ts[CAST(i + 1 AS INT):CAST(i + 5 AS INT)], ' ')) END) AS gram,
          |    unnest(CASE WHEN len(ts) < 5 THEN [CAST(0 AS BIGINT)] ELSE range(0, len(ts) - 4) END) AS pos
          |  FROM tok WHERE doc_id % 5 <> 0),
          |bench AS (SELECT DISTINCT
          |    unnest(CASE WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')]
          |      ELSE list_transform(range(0, len(ts) - 4),
          |        i -> array_to_string(ts[CAST(i + 1 AS INT):CAST(i + 5 AS INT)], ' ')) END) AS gram
          |  FROM tok WHERE doc_id % 5 = 0),
          |fl AS (SELECT w.doc_id, CAST(w.pos AS BIGINT) AS pos, CAST(least(w.pos + 5, w.nt) AS BIGINT) AS e
          |       FROM win w JOIN bench USING (gram)),
          |brk AS (SELECT doc_id, pos, e,
          |    CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS b
          |  FROM fl),
          |isl AS (SELECT doc_id, pos, e, sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM brk)
          |SELECT doc_id, min(pos) AS span_start, max(e) AS span_end, CAST(count(*) AS BIGINT) AS n_windows
          |FROM isl GROUP BY doc_id, island""".stripMargin),
    "x_decontam" ->
      (tokCte +
        """,g AS (SELECT doc_id, unnest(CASE WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')]
          |         ELSE list_transform(range(1, len(ts) - 3),
          |           i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2] || ' ' || ts[CAST(i AS INT)+3] || ' ' || ts[CAST(i AS INT)+4]) END) AS sh
          |      FROM tok),
          |dt AS (SELECT DISTINCT doc_id, sh FROM g),
          |bench AS (SELECT DISTINCT sh FROM dt WHERE doc_id % 5 = 0)
          |SELECT doc_id, count(*) AS n_hits FROM dt JOIN bench USING (sh)
          |WHERE doc_id % 5 <> 0 GROUP BY doc_id""".stripMargin),
    "x_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "x_redact" ->
      """WITH injected AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN text || ' Contact bob.smith@example.com via https://example.com/a?b=1 or call 555-123-4567 now'
        |         ELSE text END AS text
        |  FROM documents),
        |stages AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, 'https?://[^ \t\n]+', '<URL>', 'g') AS after_url
        |  FROM injected),
        |stages2 AS (
        |  SELECT doc_id, text, after_url,
        |    regexp_replace(after_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g') AS after_email
        |  FROM stages)
        |SELECT doc_id,
        |  regexp_replace(after_email, '\+?[0-9][0-9]{2}[0-9()\- ]{5,10}[0-9]', '<PHONE>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS INT) AS n_urls,
        |  CAST(len(regexp_extract_all(after_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(after_email, '\+?[0-9][0-9]{2}[0-9()\- ]{5,10}[0-9]')) AS INT) AS n_phones
        |FROM stages2""".stripMargin,
    "x_sample" ->
      "SELECT doc_id FROM documents WHERE substr(md5(text), 1, 4) < '4000'",
    "x_cap_group" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 30""".stripMargin,
    "x_mix" ->
      """WITH w AS (SELECT doc_id, lang, text,
        |    CASE lang WHEN 'en' THEN 1.5 WHEN 'de' THEN 0.75 ELSE 1.0 END AS wt
        |  FROM documents),
        |fullc AS (SELECT doc_id, lang, unnest(range(0, CAST(floor(wt) AS BIGINT))) AS epoch FROM w),
        |frac AS (SELECT doc_id, lang, CAST(floor(wt) AS BIGINT) AS epoch FROM (
        |    SELECT doc_id, lang, wt,
        |      row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn,
        |      count(*) OVER (PARTITION BY lang) AS n
        |    FROM w)
        |  WHERE rn <= ceil(n * (wt - floor(wt))))
        |SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch FROM fullc
        |UNION ALL
        |SELECT doc_id, lang, epoch FROM frac""".stripMargin,
    "x_stratified" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |WHERE rn <= ceil(n * 0.25)""".stripMargin,
    // Replays packSequences' greedy fold with one recursion chain PER
    // SHARD, advanced in parallel (anchor = each shard's first row; every
    // iteration joins the previous row of all live shards to their next) —
    // iterations scale as rows-per-shard, not total rows, which keeps the
    // oracle tractable at the 10× sweep scale. A new sequence opens
    // exactly when the next document no longer fits the 256-token budget.
    "x_pack" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, shard, nt,
        |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM toks),
        |pack AS (
        |  SELECT rn, doc_id, shard, nt,
        |    CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_offset
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.doc_id, b.shard, b.nt,
        |    CASE WHEN p.seq_offset + p.nt + b.nt > 256 THEN p.seq_id + 1
        |         ELSE p.seq_id END,
        |    CASE WHEN p.seq_offset + p.nt + b.nt > 256 THEN CAST(0 AS BIGINT)
        |         ELSE p.seq_offset + p.nt END
        |  FROM base b JOIN pack p ON b.shard = p.shard AND b.rn = p.rn + 1)
        |SELECT doc_id, shard, seq_id, seq_offset, nt AS n_tokens FROM pack""".stripMargin,
    // The whole export chain replayed: dedup + quality mirror
    // p_curation_pipeline's fragments, chunking mirrors x_chunks (window
    // 32, overlap 0), packing mirrors x_pack's recursive CTE over
    // (shard, cid) order with budget 128.
    "p_training_export" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, text, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ts
        |  FROM documents),
        |dedup AS (SELECT min(doc_id) AS doc_id FROM documents
        |          GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
        |kept AS (SELECT t.doc_id, t.ts FROM tok t JOIN dedup USING (doc_id)
        |         WHERE length(t.text) >= 20
        |           AND len(t.ts) >= 5
        |           AND CAST(length(t.text) - length(regexp_replace(t.text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |               / greatest(length(t.text), 1) < 0.2),
        |n AS (SELECT doc_id, ts, greatest(len(ts) - 1, 0) // 32 + 1 AS nc FROM kept),
        |c AS (SELECT doc_id, ts, unnest(range(0, nc)) AS chunk_id FROM n),
        |units AS (SELECT doc_id * 1000 + chunk_id AS cid,
        |            CAST(len(ts[CAST(chunk_id*32+1 AS INT) : CAST(chunk_id*32+32 AS INT)]) AS BIGINT) AS nt
        |          FROM c),
        |base AS (SELECT cid, cid % 8 AS shard, nt,
        |           row_number() OVER (PARTITION BY cid % 8 ORDER BY cid) AS rn
        |         FROM units),
        |pack AS (
        |  SELECT rn, cid, shard, nt,
        |    CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_offset
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.cid, b.shard, b.nt,
        |    CASE WHEN p.seq_offset + p.nt + b.nt > 128 THEN p.seq_id + 1
        |         ELSE p.seq_id END,
        |    CASE WHEN p.seq_offset + p.nt + b.nt > 128 THEN CAST(0 AS BIGINT)
        |         ELSE p.seq_offset + p.nt END
        |  FROM base b JOIN pack p ON b.shard = p.shard AND b.rn = p.rn + 1)
        |SELECT cid, shard, seq_id, seq_offset, nt AS n_tokens FROM pack""".stripMargin,
    "x_bloom" ->
      """WITH corpus AS (
        |  SELECT DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |batch AS (
        |  SELECT doc_id + 50000 AS bid,
        |    CASE WHEN doc_id % 2 = 0 THEN text ELSE text || ' zz' || doc_id END AS btext
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_batch,
        |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM corpus c
        |    WHERE c.norm = regexp_replace(lower(trim(b.btext)), '\s+', ' ', 'g'))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
        |  true AS no_false_negatives, true AS fp_rate_ok
        |FROM batch b""".stripMargin,
    "p_curation_pipeline" ->
      (tokCte +
        """,dedup AS (SELECT min(doc_id) AS doc_id FROM documents
          |          GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
          |g AS (SELECT doc_id, unnest(CASE WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')]
          |        ELSE list_transform(range(1, len(ts) - 3),
          |          i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2] || ' ' || ts[CAST(i AS INT)+3] || ' ' || ts[CAST(i AS INT)+4]) END) AS sh
          |      FROM tok),
          |dt AS (SELECT DISTINCT doc_id, sh FROM g),
          |bench AS (SELECT DISTINCT sh FROM dt WHERE doc_id % 5 = 0),
          |corpus AS (SELECT d.doc_id, d.text FROM documents d JOIN dedup USING (doc_id)
          |           WHERE d.doc_id % 5 <> 0),
          |hits AS (SELECT DISTINCT dt.doc_id FROM dt JOIN bench USING (sh)
          |         JOIN corpus c ON c.doc_id = dt.doc_id),
          |clean AS (SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
          |kept AS (SELECT doc_id, text,
          |           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ts
          |         FROM clean
          |         WHERE length(text) >= 20
          |           AND len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) >= 5
          |           AND CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
          |               / greatest(length(text), 1) < 0.2),
          |lab AS (SELECT doc_id,
          |          CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
          |               WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
          |               ELSE 'test' END AS split,
          |          greatest(len(ts) - 5, 0) // 28 + 1 AS nc
          |        FROM kept)
          |SELECT split, count(*) AS n_docs, CAST(sum(nc) AS BIGINT) AS n_chunks
          |FROM lab GROUP BY split""".stripMargin),
    "x_line_dedup" ->
      (tokCte +
        """,n AS (SELECT doc_id, ts, greatest(len(ts) - 1, 0) // 8 + 1 AS nc FROM tok),
          |c AS (SELECT doc_id, unnest(range(0, nc)) AS line_id, ts FROM n),
          |l AS (SELECT doc_id, line_id,
          |        array_to_string(ts[CAST(line_id*8+1 AS INT) : CAST(line_id*8+8 AS INT)], ' ') AS line
          |      FROM c),
          |df AS (SELECT line, count(DISTINCT doc_id) AS nd
          |       FROM l WHERE line <> '' GROUP BY line),
          |keep AS (SELECT l.doc_id, l.line_id, l.line
          |         FROM l LEFT JOIN df USING (line)
          |         WHERE df.nd IS NULL OR df.nd <= 5)
          |SELECT doc_id, string_agg(line, chr(10) ORDER BY line_id) AS text_clean,
          |  CAST(count(CASE WHEN line <> '' THEN 1 END) AS BIGINT) AS n_lines_kept
          |FROM keep GROUP BY doc_id""".stripMargin),
    "x_chunks" ->
      (tokCte +
        """,n AS (SELECT doc_id, ts, greatest(len(ts) - 5, 0) // 28 + 1 AS nc FROM tok),
          |c AS (SELECT doc_id, ts, unnest(range(0, nc)) AS chunk_id FROM n)
          |SELECT doc_id, chunk_id,
          |  CAST(len(ts[CAST(chunk_id*28+1 AS INT) : CAST(chunk_id*28+32 AS INT)]) AS INT) AS n_tokens,
          |  array_to_string(ts[CAST(chunk_id*28+1 AS INT) : CAST(chunk_id*28+32 AS INT)], ' ') AS chunk_text
          |FROM c""".stripMargin),
    // CDC chunking is gated on lossless reconstruction (see the queries
    // entry): the oracle is the raw text of every document that yields at
    // least one chunk — i.e. non-null, non-empty text.
    "x_cdc_chunks" ->
      "SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND len(text) > 0",
    // The canonical form of x_url_canon's synthetic URL, in closed form:
    // params sorted ('a=' < 'b='), trackers dropped, default port and the
    // fragment gone, trailing slash trimmed, scheme/host lowercased.
    "x_url_canon" ->
      """SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
        |    || '://www.site' || (doc_id % 20)
        |    || (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'
        |             WHEN doc_id % 3 = 1 THEN '.ne.jp' ELSE '.com' END)
        |    || '/Page' || doc_id
        |    || '?a=' || (doc_id % 7) || '&b=2' AS url_canonical,
        |  'site' || (doc_id % 20)
        |    || (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'
        |             WHEN doc_id % 3 = 1 THEN '.ne.jp' ELSE '.com' END) AS domain
        |FROM documents""".stripMargin)
}
