package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a large-scale training-data pipeline runs
 * between dedup and training: benchmark decontamination, deterministic
 * train/validation/test splitting, PII-style redaction, and token-window
 * chunking. Nearly all are pure column expressions or narrow hash joins
 * that never put document text on the shuffle wire; the one exception is
 * [[Curation.dropRepeatedLines]]'s per-document rebuild, which shuffles
 * each document's surviving lines once (see its scaladoc).
 */
object Curation {

  /** Canonical whitespace tokenizer — see [[graft.functions.Tokenize]]. */
  private def tokens(text: Column): Column = graft.functions.Tokenize.tokens(text)

  // ------------------------------------------------------- decontamination

  /**
   * Benchmark decontamination hits: for every corpus document, the number
   * of distinct word n-grams it shares with ANY benchmark document (the
   * standard "n-gram collision" test for eval-set leakage into training
   * data). Zero-hit documents are absent from the result.
   *
   * Scale shape: both sides reduce to (id, shingleHash) pairs map-side via
   * the codegen'd [[graft.plans.ShingleHashesExpr]] — only 64-bit hashes
   * shuffle, never text. The benchmark side of the join is tiny by
   * definition (an eval set), so AQE broadcasts it; the corpus side is
   * never shuffled at all in that plan.
   */
  def contaminationHits(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    def shingles(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(graft.plans.ShingleHashesExpr.shingleHashes(tokens(col(textCol)), n)).as("__sh"))
        .distinct()
    shingles(corpus, "__cid")
      .join(shingles(benchmark, "__bid").select("__sh").distinct(), "__sh")
      .groupBy(col("__cid").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /**
   * WHERE a document overlaps the benchmark, not just whether: corpus
   * n-token windows matching any benchmark window, merged into maximal
   * `[span_start, span_end)` token spans per document ([[Dedup.mergeSpans]]
   * algebra). The review surface for a decontamination pass — a doc with a
   * one-line benchmark quote carries one small span; a wholesale copy
   * carries a full-doc span. Same scale shape as [[contaminationHits]]:
   * only 64-bit window hashes join; the flagged subset alone shuffles by
   * doc for the merge.
   */
  def contaminationSpans(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    val win = Dedup.windowHashes(corpus, idCol, textCol, n)
    val benchHashes = benchmark.select(
      explode(graft.plans.ShingleHashesExpr.shingleHashes(
        tokens(col(textCol)), n)).as("__h")).distinct()
    val flagged = win.join(benchHashes, "__h")
      .select(col("__id"), col("__pos").cast("long").as("__pos"),
        least(col("__pos") + n, col("__nt")).as("__end"))
    Dedup.mergeSpans(flagged, idCol)
  }

  /**
   * Surgical decontamination: remove only the benchmark-overlap spans and
   * keep the rest of each document — the alternative to dropping whole
   * documents ([[decontaminate]]) when the overlap is a quoted snippet
   * inside otherwise-good text. Returns (id, clean_text) for EVERY corpus
   * document (normalized token stream minus contaminated spans).
   */
  def stripContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame =
    Dedup.subtractSpans(corpus,
      contaminationSpans(corpus, benchmark, idCol, textCol, n), idCol, textCol)

  /** Corpus minus contaminated documents (anti join on the hit set). */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame =
    corpus.join(contaminationHits(corpus, benchmark, idCol, textCol, n)
      .select(idCol), Seq(idCol), "left_anti")

  // ------------------------------------------------------------- splitting

  /**
   * Deterministic content-hash train/validation/test split: the first two
   * hex chars of `md5(text)` give 256 stable buckets; documents fall into
   * named ranges. Portable across engines (md5 hex is identical everywhere,
   * the comparison is plain string order), stable across runs and cluster
   * sizes — the properties a training pipeline needs so that re-ingesting a
   * document never migrates it between splits.
   *
   * `cuts` maps split names to upper-bound bucket counts out of 256; the
   * default is ~80/10/10 (204/26/26).
   */
  def hashSplit(
      textCol: String,
      cuts: Seq[(String, Int)] = Seq("train" -> 204, "val" -> 230, "test" -> 256)): Column = {
    require(cuts.nonEmpty && cuts.init.forall(c => c._2 > 0 && c._2 < 256),
      "non-final cuts must be upper bounds in (0, 256)")
    val bucket = substring(md5(col(textCol).cast("binary")), 1, 2)
    val hex = "0123456789abcdef"
    def bound(i: Int): String = s"${hex(i / 16)}${hex(i % 16)}"
    cuts.init.foldRight(lit(cuts.last._1)) { case ((name, ub), rest) =>
      when(bucket < bound(ub), name).otherwise(rest)
    }
  }

  /** Documents labeled with their split. */
  def withSplit(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("split", hashSplit(textCol))

  // -------------------------------------------------------------- sampling

  /**
   * Deterministic content-hash sampling: keep a document iff its first four
   * md5 hex chars fall under `keep16` out of 65536 slices. Like
   * [[hashSplit]] this is stable across runs, engines and cluster layouts —
   * re-ingesting a document never flips its membership, and a downstream
   * engine can reproduce the exact sample. Pure map-side filter.
   */
  def sampleByHash(textCol: String, keep16: Int): Column = {
    require(keep16 >= 0 && keep16 <= 0x10000)
    val hex = "0123456789abcdef"
    val bound = (3 to 0 by -1).map(i => hex((keep16 >> (4 * i)) & 0xF)).mkString
    if (keep16 == 0x10000) lit(true)
    else substring(md5(col(textCol).cast("binary")), 1, 4) < bound
  }

  /**
   * Per-group quota (domain/language balancing): keep at most `k` documents
   * per group, chosen deterministically by md5 order (id tie-break for
   * equal texts). One shuffle on the group key; the rank never sees text
   * beyond the md5 already computed map-side.
   */
  def capPerGroup(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(textCol).cast("binary")), col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  // ------------------------------------------------------------- redaction

  /**
   * PII-style patterns, deliberately restricted to syntax Java regex and
   * RE2 (DuckDB/Go engines) interpret identically: no lookaround, no
   * backreferences, explicit character classes.
   */
  val urlPattern = "https?://[^ \\t\\n]+"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val phonePattern = "\\+?[0-9][0-9]{2}[0-9()\\- ]{5,10}[0-9]"

  /**
   * Redact URLs, emails and phone-shaped digit runs (in that order — an
   * email inside a URL must be consumed by the URL rule first). Map-side
   * `regexp_replace` chain, fully codegen'd.
   */
  // ------------------------------------------------------ URL curation

  /**
   * URL canonicalization — the C4/CommonCrawl-style normalization run
   * before URL-level dedup so syntactic variants of one page collapse:
   * lowercase scheme and host, strip the scheme's default port, drop the
   * fragment, drop tracking query parameters (`utm_*`, `fbclid`, `gclid`),
   * sort the surviving parameters, and trim a bare trailing slash. Pure
   * codegen'd Column combinators (regexp splits + array ops) — map-side at
   * any scale, and exactly mirrorable in an external SQL engine for
   * verification.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val pathQ = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val path = regexp_extract(pathQ, "^([^?]*)", 1)
    val query = when(pathQ.contains("?"), regexp_extract(pathQ, "\\?(.*)$", 1))
      .otherwise(lit(""))
    val keptParams = array_join(
      array_sort(filter(split(query, "&"),
        p => !(p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)=") || p === ""))),
      "&")
    val trimmedPath = when(path === "", lit("/"))
      .when(path =!= "/" && path.endsWith("/"),
        path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    // Canonicalization is defined on ABSOLUTE URLs; anything without a
    // scheme (relative refs, bare hosts) passes through unchanged rather
    // than being mangled into "://…".
    when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      concat(scheme, lit("://"), host, trimmedPath,
        when(keptParams === "", lit("")).otherwise(concat(lit("?"), keptParams))))
      .otherwise(url)
  }

  /**
   * Registered domain of a URL or bare host — the per-site grouping key for
   * domain quotas and provenance stats. Heuristic public-suffix handling,
   * NOT the full public-suffix list (which is a ~10k-entry moving target):
   * a two-label suffix keeps three labels when its second level is in the
   * generic set (`co|com|net|org|ac|gov|edu` — these are second-level
   * registries under essentially every ccTLD that has them), or — only
   * under a two-letter ccTLD — in the extended set covering the other
   * widespread national second levels (`ne.jp`, `or.at`, `id.au`,
   * `go.kr`, `mil.*`, `sch.uk`, `gob.mx`, `asn.au`, `ltd.uk`, `plc.uk`,
   * `web.za`, …). Everything else keeps two labels — the explicit
   * fallback. Residual inaccuracy is bounded and one-sided: an unlisted
   * national suffix (e.g. `pref.aichi.jp`) under-splits, so unrelated
   * sites beneath it share one quota group in [[capPerGroup]]-style
   * balancing; listed entries never over-split because the extended set
   * applies only where the trailing label is a ccTLD (so `foo.go.com`
   * still groups as `go.com`).
   */
  def registeredDomain(url: Column): Column = {
    val host = when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)))
      .otherwise(lower(regexp_extract(url, "^([^/?#:]*)", 1)))
    val labels = split(host, "\\.")
    val n = size(labels)
    val secondLevel = element_at(labels, n - 1)
    val tld = element_at(labels, n)
    val generic = secondLevel.rlike("^(co|com|net|org|ac|gov|edu)$")
    val ccNational = tld.rlike("^[a-z][a-z]$") &&
      secondLevel.rlike("^(ne|or|id|go|mil|sch|gob|asn|ltd|plc|web|nom|in|gen)$")
    when(n >= 3 && (generic || ccNational),
      concat_ws(".", element_at(labels, n - 2), secondLevel, element_at(labels, n)))
      .when(n >= 2, concat_ws(".", secondLevel, element_at(labels, n)))
      .otherwise(host)
  }

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, "<URL>"),
        emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Per-document redaction counts by category (regexp_count is codegen'd). */
  def redactionReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val afterUrl = regexp_replace(col(textCol), urlPattern, "<URL>")
    val afterEmail = regexp_replace(afterUrl, emailPattern, "<EMAIL>")
    docs.select(col(idCol),
      redact(col(textCol)).as("clean_text"),
      regexp_count(col(textCol), lit(urlPattern)).as("n_urls"),
      regexp_count(afterUrl, lit(emailPattern)).as("n_emails"),
      regexp_count(afterEmail, lit(phonePattern)).as("n_phones"))
  }

  // -------------------------------------------------------------- chunking

  /**
   * Fixed token-window chunking with overlap — the context-window
   * preparation step before tokenizer packing. Chunk `i` covers tokens
   * `[i*stride, i*stride + window)` (stride = window - overlap); the last
   * chunk may be short; documents shorter than the window yield one chunk.
   *
   * Pure per-row explode: chunk count arithmetic is integer-exact (`div`)
   * so an external oracle reproduces boundaries bit-for-bit.
   */
  /** Chunk count for a token count — floor-div is exact for the
    * non-negative ints here, identical to integer `div`. */
  private def numChunks(nTokens: Column, window: Int, overlap: Int): Column =
    floor(greatest(nTokens - (overlap + 1), lit(0)).cast("double") / (window - overlap))
      .cast("long") + 1

  /** Number of chunks [[chunkTokens]] yields per document — the same
    * integer-exact arithmetic without materializing the chunks (rollups
    * like the composite pipeline gate need only the count). */
  def chunkCount(text: Column, window: Int = 32, overlap: Int = 4): Column = {
    require(overlap < window, "overlap must be smaller than the window")
    numChunks(size(tokens(text)), window, overlap)
  }

  // ---------------------------------------------------- line deduplication

  /**
   * Corpus-level line deduplication (the RefinedWeb/C4-style boilerplate
   * filter): a NON-BLANK line occurring in more than `maxDocFreq` DISTINCT
   * documents is boilerplate — navigation chrome, license banners, template
   * headers — and is dropped from EVERY document; each document's text is
   * rebuilt from its surviving lines in original order. Blank lines
   * (empty / whitespace-only — paragraph separators) are exempt: they
   * repeat everywhere by nature and deleting them would destroy paragraph
   * structure corpus-wide. NULL text reads as empty text, so the document
   * passes through rather than vanishing. A document whose non-blank lines
   * were ALL boilerplate either disappears (no line survives) or surfaces
   * with `n_lines_kept = 0` (only blank separators survive) — filter
   * `n_lines_kept > 0` for trainable content; blank and phantom lines
   * never count toward it.
   *
   * Returns (idCol, text_clean, n_lines_kept).
   *
   * Scale shape — candidate-then-verify, like every hash family here:
   * phase 1 counts doc frequency per 64-bit line hash (only hashes and ids
   * shuffle, map-side partial); phase 2 recounts EXACTLY, by text, only
   * the candidate hashes' lines (a tiny high-df subset), so a birthday
   * collision with a boilerplate hash cannot drop an innocent line — the
   * drop decision is text-exact. The boilerplate set is small by
   * definition, so the anti-join back broadcasts under AQE. Reconstruction
   * shuffles each document's own surviving lines once, keyed by the
   * document id — the same partitioning a downstream per-document write
   * wants.
   *
   * The exploded line frame is deliberately NOT persisted across its three
   * references (phase-1 count, phase-2 recount, rebuild): it is
   * corpus-sized, so caching it would spill the whole corpus to executor
   * disk, while recomputing it is a two-column columnar re-scan plus a
   * map-side split — the cheaper side of that trade at 100 TB (unlike
   * [[graft.ops.Dedup.nearDupPairs]]'s candidate frames, which are tiny
   * and ARE persisted).
   */
  def dropRepeatedLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Int,
      delim: String = "\n"): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be at least 1")
    val lines = docs
      .select(col(idCol), posexplode(
        split(coalesce(col(textCol), lit("")), java.util.regex.Pattern.quote(delim)))
        .as(Seq("__pos", "__line")))
      .withColumn("__h", xxhash64(col("__line")))
    // rlike("\\S"), not trim(): Spark's trim strips only ASCII space, so a
    // CRLF corpus's "\r" separator lines (or tab-indented blanks) would
    // count as content and get dropped corpus-wide as boilerplate.
    val nonBlank = lines.filter(col("__line").rlike("\\S"))
    // phase 1: cheap hash-keyed doc-frequency — candidates only
    val candidates = nonBlank
      .groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > maxDocFreq)
      .select("__h")
    // phase 2: exact text-keyed recount restricted to candidate hashes —
    // a true boilerplate line always survives phase 1 (its hash df >= its
    // text df), and a collision victim is exonerated here
    val boilerplate = nonBlank
      .join(candidates, Seq("__h"))
      .groupBy("__h", "__line")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > maxDocFreq)
      .select("__h", "__line")
    lines
      .join(boilerplate, Seq("__h", "__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")),
          delim).as("text_clean"),
        // Only CONTENT lines count: blank separators and the empty line a
        // NULL/empty doc degenerates to would otherwise make an
        // all-boilerplate shell look trainable to a n_lines_kept > 0 filter.
        count(when(col("__line").rlike("\\S"), 1)).as("n_lines_kept"))
  }

  // ------------------------------------------------- stratified sampling

  /**
   * Stratified sample: keep a deterministic `frac` of each group (language
   * / source balancing with exact per-group quotas, where
   * [[sampleByHash]]'s global hash slice only hits the fraction in
   * expectation). The quota is `ceil(frac * group_size)` and membership is
   * decided by md5 order with id tie-break — the same stable ordering as
   * [[capPerGroup]], so re-ingestion never flips membership and any SQL
   * engine can reproduce the exact sample.
   *
   * Scale shape: one shuffle on the group key; both window functions share
   * that single partitioning, and only (group, md5, id) triples ride the
   * wire if the caller projects text away first.
   */
  def stratifiedSample(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(textCol).cast("binary")), col(idCol))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    docs.withColumn("__rn", row_number().over(w))
      .withColumn("__k", ceil(count(lit(1)).over(wg) * lit(frac)))
      .filter(col("__rn") <= col("__k"))
      .drop("__rn", "__k")
  }

  /**
   * Weighted training-mix construction: per-group epoch weights, the
   * standard knob for balancing a pretraining mix (weight 1.5 = every doc
   * once plus a deterministic half of the group again; 0.75 = a
   * deterministic three-quarters sample). Integer part → that many full
   * copies, tagged `epoch` 0..⌊w⌋-1; fractional part → a
   * [[stratifiedSample]]-style md5-ordered ceil(frac·n) slice at epoch
   * ⌊w⌋. Deterministic end to end: re-running, re-partitioning or
   * re-ingesting never changes which documents repeat.
   *
   * Scale shape: the full copies are a map-side explode (no shuffle); the
   * fractional slice is the stratified sample's single group-key shuffle.
   */
  def weightedMix(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "weights must be non-negative")
    val wcol = weights.foldLeft(lit(defaultWeight)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    val fullN = floor(wcol).cast("long")
    val fullCopies = docs.withColumn("__n", fullN)
      .filter(col("__n") > 0) // guard BEFORE explode: sequence(0,-1) descends
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(textCol).cast("binary")), col(idCol))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val fractional = docs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__k", ceil(count(lit(1)).over(wg) * (wcol - floor(wcol))))
      .filter(col("__rn") <= col("__k"))
      .drop("__rn", "__k")
      .withColumn("epoch", fullN)
    fullCopies.unionByName(fractional)
  }

  // -------------------------------------------------- sequence packing

  /**
   * Greedy sequence packing: place whole documents into fixed token-budget
   * training sequences (the standard pretraining step that turns short
   * documents into dense `budget`-token contexts instead of padding each
   * one). Documents are assigned to `shards` by id; within a shard,
   * documents are scanned in id order and a document opens a new sequence
   * exactly when it no longer fits (`offset + n_tokens > budget` at a
   * non-zero offset). A single document longer than the budget occupies
   * its own sequence (training-side truncation is out of scope here).
   *
   * Output: one row per document — (id, shard, seq_id, seq_offset,
   * n_tokens), with seq_id numbered per shard and seq_offset the token
   * position where the document starts in its sequence.
   *
   * Scale shape: the greedy recurrence is a non-associative sequential
   * fold, so it cannot be a window function — but it is embarrassingly
   * parallel ACROSS shards, which is how packing actually runs at 100 TB
   * (each worker packs its shards independently; shard count scales with
   * the cluster). The implementation hash-repartitions on the shard key so
   * every shard lands whole in one partition, sorts within partitions by
   * (shard, id) — the standard secondary-sort idiom — and runs the fold in
   * one `mapPartitions` pass over (id, shard, n_tokens) triples; document
   * text never leaves the map side.
   */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int = 256,
      shards: Int = 8): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(shards > 0, "shard count must be positive")
    Dedup.requireIntegralId(docs, idCol, "packSequences")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).cast("long").as("__id"),
      pmod(col(idCol).cast("long"), lit(shards.toLong)).as("__shard"),
      size(tokens(col(textCol))).cast("long").as("__nt"))
    toks.repartition(col("__shard"))
      .sortWithinPartitions("__shard", "__id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var shard = Long.MinValue
        var seq = 0L
        var off = 0L // next placement offset within the current sequence
        it.map { case (id, sh, nt) =>
          if (sh != shard) { shard = sh; seq = 0L; off = 0L }
          else if (off > 0 && off + nt > budget) { seq += 1; off = 0L }
          val placed = (id, sh, seq, off, nt)
          off += nt
          placed
        }
      }
      .toDF(idCol, "shard", "seq_id", "seq_offset", "n_tokens")
  }

  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 32,
      overlap: Int = 4): DataFrame = {
    require(overlap < window, "overlap must be smaller than the window")
    val stride = window - overlap
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__nc", numChunks(size(col("__toks")), window, overlap))
    withToks
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(window)).as("__c"))
      .select(col(idCol), col("chunk_id"),
        size(col("__c")).as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  // ------------------------------------------------ content-defined chunking

  /** Deterministic 256-entry gear table (splitmix64 over a fixed seed) —
    * the per-character randomness source of the rolling hash. Fixed seed =
    * identical boundaries across sessions/executors, which is what makes
    * chunk hashes joinable across independently-processed corpus shards. */
  private[ops] val gearTable: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** Gear-hash CDC split (Xia et al., FastCDC'16 family): cut after any
    * position where the rolling hash's low `mask` bits are zero and the
    * chunk has reached `minSize`; force a cut at `maxSize`. The hash
    * `h = (h << 1) + gear(c)` forgets a character after 64 shifts, so a
    * boundary decision depends only on the trailing 64 characters — which
    * is the whole point: an insertion re-aligns boundaries within ~one
    * chunk instead of shifting every later boundary the way fixed-size
    * chunking does (asserted by CdcChunkSpec). */
  private[ops] def cdcSplit(
      text: String, minSize: Int, mask: Long, maxSize: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var h = 0L
    var i = 0
    while (i < text.length) {
      h = (h << 1) + gearTable(text.charAt(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        out += text.substring(start, i + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < text.length) out += text.substring(start)
    out.toArray
  }

  /**
   * Content-defined chunking of each document (FastCDC-style gear hash):
   * one row per (doc, chunk), boundaries a pure local function of the text
   * itself. This is the storage/dedup-grade splitter: where [[chunkTokens]]'
   * fixed windows shift wholesale after any insertion, CDC boundaries
   * re-align within about one chunk, so near-identical documents (crawl
   * re-fetches, template pages, versioned shards) share almost all chunk
   * hashes — the unit [[chunkDupStats]] and chunk-level dedup operate on.
   *
   * Scale shape: map-side only — the splitter is a per-row character scan
   * (a deliberate UDF, the [[Dedup.bloomFlag]] precedent: no Catalyst
   * equivalent exists for a stateful rolling hash) followed by posexplode;
   * NO shuffle. Downstream consumers aggregate chunk hashes, not text.
   * Expected chunk length ≈ minSize + 2^round(log2(avgSize - minSize))
   * (the boundary test is geometric once past minSize); maxSize bounds the
   * worst case on low-entropy text (a run of one repeated character never
   * fires a hash boundary).
   *
   * Null/empty text yields zero chunks. Concatenating a doc's chunks in
   * chunk_id order reproduces its text exactly (the x_cdc_chunks gate).
   */
  def cdcChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 64,
      avgSize: Int = 256,
      maxSize: Int = 1024): DataFrame = {
    require(0 < minSize && minSize <= avgSize && avgSize <= maxSize,
      s"need 0 < minSize <= avgSize <= maxSize, got $minSize/$avgSize/$maxSize")
    val spread = math.max(1, avgSize - minSize)
    val bits = 63 - java.lang.Long.numberOfLeadingZeros(spread.toLong)
    val mask = (1L << bits) - 1
    val split = udf((s: String) =>
      if (s == null) Array.empty[String] else cdcSplit(s, minSize, mask, maxSize))
    docs.select(col(idCol),
      posexplode(split(col(textCol))).as(Seq("chunk_id", "chunk_text")))
  }

  /**
   * Corpus-level chunk-dedup audit: how much storage chunk-level dedup
   * would reclaim. One map-side [[cdcChunks]] pass reduced to 8-byte chunk
   * hashes, one hash-keyed shuffle, one scalar row out: total/distinct
   * chunk counts and character volumes, plus `dedup_ratio` = chars kept /
   * chars stored (1.0 = nothing shared). Chunk text never shuffles; a
   * 64-bit hash collision undercounts distinct chars by one chunk — the
   * [[Dedup.hashShingleSets]] accepted risk.
   */
  def chunkDupStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 64,
      avgSize: Int = 256,
      maxSize: Int = 1024): DataFrame = {
    val ch = cdcChunks(docs, idCol, textCol, minSize, avgSize, maxSize)
      .select(xxhash64(col("chunk_text")).as("__h"),
        length(col("chunk_text")).cast("long").as("__len"))
    ch.groupBy("__h").agg(count(lit(1)).as("__c"), first(col("__len")).as("__len"))
      .agg(sum("__c").as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("__len") * col("__c")).as("total_chars"),
        sum("__len").as("distinct_chars"))
      .select(col("n_chunks"), col("n_distinct_chunks"),
        col("total_chars"), col("distinct_chars"),
        (col("distinct_chars").cast("double") / col("total_chars"))
          .as("dedup_ratio"))
  }
}
