package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding vocabulary induction (Sennrich et al.,
 * ACL 2016) — the tokenizer-training step of an LLM data pipeline, run
 * where the data lives instead of sampling it out.
 *
 * Scale shape: the corpus is touched ONCE (word-frequency aggregation with
 * map-side partials — the classic word-count shuffle); every merge
 * iteration after that runs over the DISTINCT-WORD table (vocabulary-
 * sized, orders of magnitude smaller than the corpus), computing adjacent
 * symbol-pair counts weighted by word frequency in one aggregation and
 * collecting only the single best pair to the driver. The iterated
 * symbol-table lineage is cut with localCheckpoint every few rounds (the
 * connected-components discipline).
 *
 * Determinism: best pair = highest weighted count, ties broken by symbol
 * pair ascending — stable across partitionings and engines.
 */
object Bpe {

  /** One learned merge: rank (1-based), the joined pair, and its weighted
    * count at merge time. */
  final case class BpeMerge(rank: Int, a: String, b: String, count: Long)

  /** End-of-word marker (Sennrich's `</w>`): keeps merges word-internal
    * and lets the encoder restore word boundaries. */
  val EndOfWord = "</w>"

  /** Distinct words with occurrence counts — the ONE corpus pass. */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))

  /** [[trainFull]]'s result: the merges plus the word-table summary
    * numbers that were already materialized on the way (so callers never
    * pay a second corpus scan to re-derive them). */
  final case class BpeTraining(
      merges: Seq[BpeMerge], nWords: Long, nStartSymbols: Long)

  /**
   * Learn `numMerges` merges from the corpus. Stops early when the best
   * remaining pair's weighted count falls below `minCount` (merging a
   * pair seen once memorizes noise, not vocabulary).
   */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L,
      batchCandidates: Int = 64): Seq[BpeMerge] =
    trainFull(docs, textCol, numMerges, minCount, batchCandidates).merges

  /**
   * [[train]] plus the vocabulary summary, and the engine underneath it:
   * each Spark round collects the top `batchCandidates + 1` pairs and
   * accepts a PROVABLY-SEQUENTIAL batch of merges from them
   * ([[selectBatch]]), so a production vocabulary costs
   * ~numMerges/batch-size scheduler round-trips instead of one per merge
   * — the driver-paced-loop bound a 32k-merge training would otherwise
   * hit. `BpeProps` holds the batched trainer merge-for-merge equal to
   * the sequential reference.
   */
  def trainFull(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L,
      batchCandidates: Int = 64): BpeTraining = {
    require(batchCandidates >= 1, "batchCandidates must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, n) => (charSymbols(w) :+ EndOfWord, n) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nWords = words.count() // materialize the corpus pass before iterating
    if (nWords == 0L) {
      words.unpersist(blocking = false)
      return BpeTraining(Seq.empty, 0L, 0L)
    }
    // Start-symbol total over the PERSISTED vocabulary table — an
    // aggregation on cached vocab-sized data, not a corpus re-scan.
    val nStartSymbols = words.map(_._1.size.toLong).reduce(_ + _)
    val merges = scala.collection.mutable.Buffer.empty[BpeMerge]
    var round = 0
    try {
      var exhausted = false
      while (merges.size < numMerges && !exhausted) {
        val want = math.min(batchCandidates, numMerges - merges.size)
        // want+1 rows: the first NON-accepted pair's count is the batch's
        // correctness boundary (see selectBatch) and must be visible even
        // when `want` pairs are all acceptable.
        val top = words.flatMap { case (syms, n) =>
            if (syms.size < 2) Iterator.empty
            else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, n) }
          }.toDF("__a", "__b", "__n")
          .groupBy("__a", "__b").agg(sum("__n").as("__c"))
          .orderBy(col("__c").desc, col("__a"), col("__b"))
          .limit(want + 1).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        if (top.isEmpty || top.head._3 < minCount) exhausted = true
        else {
          val accepted = selectBatch(top, want, minCount)
          merges ++= accepted.zipWithIndex.map { case ((a, b, c), i) =>
            BpeMerge(merges.size + i + 1, a, b, c)
          }
          val pairs = accepted.map { case (a, b, _) => (a, b) }
          val prev = words
          val mapped = prev.map { case (syms, n) => (mergeAll(syms, pairs), n) }
          round += 1
          // Cut the per-round map lineage periodically (localCheckpoint
          // stores its own blocks — persisting the pre-checkpoint frame too
          // would leak one cache entry per cut); otherwise materialize the
          // round's cache before releasing the previous round's.
          words =
            if (round % 8 == 0) mapped.localCheckpoint(true)
            else {
              val w = mapped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              w.count(); w
            }
          prev.unpersist(blocking = false)
        }
      }
      BpeTraining(merges.toSeq, nWords, nStartSymbols)
    } finally words.unpersist(blocking = false)
  }

  /**
   * The largest prefix of the round's sorted pair list (count desc, then
   * pair ascending) that the SEQUENTIAL algorithm provably picks in that
   * exact order, so applying it as one batch changes nothing:
   *
   *  - accepted pairs must be pairwise symbol-disjoint — then applying one
   *    cannot change another's count (it only decrements pairs sharing its
   *    symbols and creates pairs containing its brand-new merged symbol);
   *  - let L be the count of the FIRST non-accepted row (conflict, count
   *    < minCount, or the want-limit; -inf when the list is exhausted).
   *    Every pair sharing a symbol with an accepted pair sits at or past
   *    that row, so each NEW pair a batch merge creates — whose count is
   *    bounded by a pre-merge pair sharing one of its symbols — counts
   *    at most L. Accepting only pairs with count STRICTLY above L
   *    (after the unconditional head) therefore keeps every accepted
   *    pair ahead of anything a merge could surface, ties included;
   *  - a self-pair (a,a) is its own symbol-sharing parent — the pairs it
   *    creates are bounded by its OWN count, not L — so it can only be
   *    accepted as the batch's last element.
   */
  private[ops] def selectBatch(
      rows: Seq[(String, String, Long)],
      want: Int,
      minCount: Long): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var open = true
    while (open && i < rows.length) {
      val (a, b, c) = rows(i)
      if (acc.size >= want || c < minCount ||
          (acc.nonEmpty && (used(a) || used(b)))) open = false
      else {
        acc += ((a, b, c)); used += a; used += b; i += 1
        if (a == b) open = false
      }
    }
    val boundary = if (i < rows.length) rows(i)._3 else Long.MinValue
    (acc.head +: acc.tail.takeWhile(_._3 > boundary)).toSeq
  }

  /** Apply a batch of merges in rank order (each leftmost-first). */
  private def mergeAll(
      syms: Seq[String], pairs: Seq[(String, String)]): Seq[String] =
    pairs.foldLeft(syms) { case (s, (a, b)) => mergePair(s, a, b, a + b) }

  /** CODEPOINT split (not UTF-16 chars): a non-BMP codepoint must stay one
    * symbol, matching how SQL engines index characters. */
  private[ops] def charSymbols(w: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** Left-to-right single-pass merge of every adjacent (a, b) — the BPE
    * replacement step (non-overlapping, leftmost first). */
  private[ops] def mergePair(
      syms: Seq[String], a: String, b: String, merged: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode one word (no marker) with learned merges: repeatedly apply the
    * LOWEST-RANK applicable merge — the standard BPE encoder. */
  def encodeWord(word: String, merges: Seq[BpeMerge]): Seq[String] = {
    val rankOf = merges.map(m => (m.a, m.b) -> m.rank).toMap
    var syms: Seq[String] = charSymbols(word) :+ EndOfWord
    var done = false
    while (!done && syms.size >= 2) {
      val cand = syms.zip(syms.tail).flatMap(p => rankOf.get(p).map(r => (r, p)))
      if (cand.isEmpty) done = true
      else {
        val (_, (a, b)) = cand.minBy(_._1)
        syms = mergePair(syms, a, b, a + b)
      }
    }
    syms
  }

  /** Per-document token count under the learned vocabulary — the budget
    * number a pipeline sizes batches with. The merge table broadcasts via
    * the closure (kilobytes); per-word encoding is memoized per partition
    * (word frequency follows Zipf — most lookups hit the memo). */
  def encodedTokenCount(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    Dedup.requireIntegralId(docs, idCol, "encodedTokenCount")
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges
    docs.select(col(idCol).cast("long").as("__id"),
        Dedup.tokens(col(textCol)).as("__ts"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, ts) =>
          (id, ts.iterator.map(w =>
            memo.getOrElseUpdate(w, encodeWord(w, ms).size)).sum.toLong)
        }
      }
      .toDF(idCol, "n_bpe_tokens")
  }

  /**
   * The gate-shaped training summary — one row of exactly-recomputable
   * integers plus the FIRST merge (a single BPE step IS SQL-expressible,
   * so the oracle checks it literally; the full merge sequence is
   * iterative and is property-tested against a sequential reference
   * instead): (n_words, n_start_symbols, first_a, first_b, first_count,
   * merges_done, counts_bounded).
   */
  def trainSummary(
      docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE corpus pass: the summary numbers ride out of trainFull's already-
    // materialized word table instead of a second wordCounts aggregation
    // (which used to double the only corpus-sized scan of the pipeline).
    val training = trainFull(docs, textCol, numMerges)
    val merges = training.merges
    require(merges.nonEmpty,
      "BPE training produced no merges — empty corpus or every pair below minCount")
    val first = merges.head
    val bounded = merges.forall(_.count <= first.count)
    Seq((training.nWords, training.nStartSymbols)).toDF("n_words", "n_start_symbols")
      .select(col("n_words"), col("n_start_symbols"),
        lit(first.a).as("first_a"), lit(first.b).as("first_b"),
        lit(first.count).as("first_count"),
        lit(merges.size).as("merges_done"),
        lit(bounded).as("counts_bounded"))
  }
}
