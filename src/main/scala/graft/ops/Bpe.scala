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

  /**
   * Learn `numMerges` merges from the corpus. Stops early when the best
   * remaining pair's weighted count falls below `minCount` (merging a
   * pair seen once memorizes noise, not vocabulary).
   */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L): Seq[BpeMerge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, n) => (charSymbols(w) :+ EndOfWord, n) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count() // materialize the corpus pass before iterating
    val merges = scala.collection.mutable.Buffer.empty[BpeMerge]
    try {
      var rank = 1
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        val top = words.flatMap { case (syms, n) =>
            if (syms.size < 2) Iterator.empty
            else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, n) }
          }.toDF("__a", "__b", "__n")
          .groupBy("__a", "__b").agg(sum("__n").as("__c"))
          .orderBy(col("__c").desc, col("__a"), col("__b"))
          .limit(1).collect()
        val best = top.headOption.filter(_.getLong(2) >= minCount)
        best match {
          case None => exhausted = true
          case Some(r) =>
            val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
            merges += BpeMerge(rank, a, b, c)
            val merged = a + b
            val prev = words
            val mapped = prev.map { case (syms, n) => (mergePair(syms, a, b, merged), n) }
            // Cut the per-iteration map lineage periodically (localCheckpoint
            // stores its own blocks — persisting the pre-checkpoint frame too
            // would leak one cache entry per cut); otherwise materialize the
            // round's cache before releasing the previous round's.
            words =
              if (rank % 8 == 0) mapped.localCheckpoint(true)
              else {
                val w = mapped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                w.count(); w
              }
            prev.unpersist(blocking = false)
            rank += 1
        }
      }
      merges.toSeq
    } finally words.unpersist(blocking = false)
  }

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
    val merges = train(docs, textCol, numMerges)
    require(merges.nonEmpty,
      "BPE training produced no merges — empty corpus or every pair below minCount")
    val wc = wordCounts(docs, textCol)
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("__w")) + 1).as("n_start_symbols"))
    val first = merges.head
    val bounded = merges.forall(_.count <= first.count)
    wc.select(col("n_words"), col("n_start_symbols"),
      lit(first.a).as("first_a"), lit(first.b).as("first_b"),
      lit(first.count).as("first_count"),
      lit(merges.size).as("merges_done"),
      lit(bounded).as("counts_bounded"))
  }
}
