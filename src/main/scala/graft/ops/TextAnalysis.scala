package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation: token/char statistics,
 * quality scoring, n-gram-heuristic language identification, and rolling-hash
 * document fingerprinting. All pure column expressions — per-row, map-side,
 * no shuffle until the caller aggregates.
 */
object TextAnalysis {

  /** Canonical whitespace tokenizer — see [[graft.functions.Tokenize]]. */
  def tokens(text: Column): Column = graft.functions.Tokenize.tokens(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-style pre-tokenizer regex (GPT-2 family shape, ASCII-restricted so
   * Java and RE2 regex dialects agree): contraction suffixes, optional-space
   * letter runs, digit runs, punctuation runs. The unit a byte-pair encoder
   * would merge within — the token count LLM-pipeline budgeting uses.
   */
  val bpePattern: String = "'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Token count under the BPE-ish pre-tokenizer (vs whitespace [[tokenCount]]). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  def charLen(text: Column): Column = length(text)

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.!?,;:]", ""))

  /** Ratio columns are double per-row divisions — deterministic IEEE. */
  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Tiny per-language stopword lists for the heuristic scorer. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Number of tokens that are stopwords of `lang`. */
  def stopwordCount(text: Column, lang: String): Column = {
    val set = stopwords(lang)
    size(filter(tokens(text), t => t.isin(set: _*)))
  }

  def stopwordRatio(text: Column, lang: String = "en"): Column =
    stopwordCount(text, lang).cast("double") / greatest(tokenCount(text), lit(1)).cast("double")

  def avgTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** The pass/fail curation predicate (length bounds, punctuation sanity) —
    * a pure per-row column, usable as a map-side filter with no join. */
  def passesQuality(text: Column): Column =
    charLen(text) >= 20 && tokenCount(text) >= 5 && punctRatio(text) < 0.2

  /**
   * Composite quality metrics per document — the curation filters a training
   * pipeline applies before dedup (length bounds, punctuation sanity,
   * stopword density).
   */
  def qualityMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      charLen(t).as("n_chars"),
      tokenCount(t).cast("long").as("n_tokens"),
      avgTokenLen(t).as("avg_token_len"),
      punctRatio(t).as("punct_ratio"),
      stopwordRatio(t, "en").as("stopword_ratio"),
      passesQuality(t).as("passes_quality"))
  }

  /**
   * Stopword-vote language ID: the language whose stopword list scores the
   * most token hits wins; ties and zero-hit rows fall back to 'und'
   * (undetermined). Deterministic tie-break: language order as listed.
   */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    val scores = langs.map(l => stopwordCount(text, l))
    val best = greatest(scores: _*)
    val pick = langs.zip(scores).foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight builds last-to-first, so earlier langs overwrite later ones
    // on ties — i.e. precedence follows the list order.
    pick
  }

  /**
   * Order-sensitive rolling hash over the token stream (a content-defined
   * fingerprint: same token sequence → same fingerprint, any reordering →
   * different). fp = fold(xxhash64(acc, token)) — hash chaining instead of
   * polynomial multiply keeps it overflow-free under ANSI mode.
   */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /**
   * Corpus-wide top-k word n-grams by total occurrence count (vocabulary /
   * boilerplate mining). The classic word-count shape: map-side partial
   * aggregation means only (gram, partialCount) per distinct gram per
   * partition shuffles — never the documents. Deterministic tie-break:
   * count desc, then gram asc.
   */
  def topNgrams(docs: DataFrame, textCol: String, n: Int = 2, k: Int = 50): DataFrame =
    docs.select(explode(Dedup.wordShingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)

  /**
   * EXACT corpus heavy hitters — the top-`k` word n-grams among those with
   * total occurrence count >= `minCount` (count desc, gram asc) — computed
   * the way the problem stays feasible at 100 TB: a two-pass
   * sketch-filtered aggregation.
   *
   * [[topNgrams]]' single groupBy is exact but its exchange and final
   * hash aggregate are sized by the DISTINCT-n-gram vocabulary — at web
   * scale tens of billions of entries, dominated by a once-seen long tail
   * that the answer never mentions. Here pass 1 folds the corpus into a
   * fixed-size count-min sketch (Cormode & Muthukrishnan 2005; Spark's
   * mergeable `count_min_sketch` aggregate — a few MB regardless of
   * corpus size), and pass 2 re-streams the corpus keeping only n-grams
   * the sketch estimates >= `minCount`. CMS never underestimates, so
   * every true heavy hitter survives the filter — zero false negatives;
   * sketch collisions only let extra tail grams through, and the exact
   * count then culls them. The exact groupBy therefore shuffles the
   * CANDIDATES' occurrences only; the long tail dies map-side against a
   * broadcast sketch probe (the [[Dedup.bloomFlag]] precedent: a per-row
   * primitive-long probe with no Catalyst builtin — the one deliberate
   * UDF here). The final answer depends only on the exact counts, so it
   * is deterministic and sketch-parameter-independent.
   *
   * `eps`/`confidence` size the sketch (~1/eps counters per depth row,
   * ~ln(1/(1-confidence)) rows): an estimate overshoots the true count by
   * more than eps·N (N = total n-gram occurrences) with probability at
   * most 1-confidence; an overshooting tail gram costs one extra
   * exact-count row, never a wrong answer. Pick eps ≲ minCount/N at scale
   * so the overshoot can't promote the tail wholesale (eps=1e-5 ≈ a
   * few-MB sketch). Grams are probed via xxhash64 (8-byte sketch entries,
   * not strings); a 64-bit gram collision again only merges ESTIMATES
   * upward — the exact pass keys on the string.
   */
  def heavyHitters(
      docs: DataFrame,
      textCol: String,
      n: Int = 3,
      k: Int = 50,
      minCount: Long = 5L,
      eps: Double = 1e-5,
      confidence: Double = 0.999): DataFrame = {
    require(minCount >= 1 && k >= 1, s"minCount/k must be >= 1")
    val grams = docs.select(explode(Dedup.wordShingles(col(textCol), n)).as("ngram"))
    val skRow = grams
      .select(count_min_sketch(xxhash64(col("ngram")), lit(eps),
        lit(confidence), lit(42)).as("sk"))
      .head()
    // Empty corpus: the aggregate yields an empty sketch (not null —
    // unlike bloomFilter), but guard the deserialize anyway.
    val sketch = Option(skRow.getAs[Array[Byte]]("sk")) match {
      case Some(bytes) => org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      case None => return grams.sparkSession.createDataFrame(
        grams.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ngram",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_occurrences",
            org.apache.spark.sql.types.LongType))))
    }
    val bc = grams.sparkSession.sparkContext.broadcast(sketch)
    val maybeHeavy = udf((h: Long) => bc.value.estimateCount(h) >= minCount)
    grams
      .filter(maybeHeavy(xxhash64(col("ngram"))))
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)
  }

  /**
   * Per-document top-`k` terms by TF-IDF — the classic corpus-weighting
   * signal (keyword extraction, boilerplate-vs-content separation, cheap
   * topic features for curation mixes). Weight = tf · ln(N / df) with raw
   * term frequency and unsmoothed idf; a term appearing in every document
   * weighs 0 regardless of tf.
   *
   * The returned columns are integer/string ONLY — (doc_id, rank, term,
   * tf, df): the float weight ORDERS the window but never leaves the
   * plan, so an external engine reproduces the output exactly. (Ulp-level
   * `ln` differences across engines cannot flip an ordering between
   * distinct (tf, df) pairs, and exact ties — same tf and df, e.g. the
   * all-docs idf-0 terms — break on the term itself.)
   *
   * Scale shape: the token stream is shuffled ONCE — the (doc, term)
   * partial-aggregated tf count; df then aggregates the tf frame (already
   * one row per (doc, term), so the second exchange carries the distinct
   * postings, not the tokens), N is a 1-row scalar-aggregate cross join,
   * the tf⋈df join shuffles postings by term (df is vocabulary-sized —
   * unbounded at corpus scale, so it is NOT broadcast), and the top-k
   * window repartitions by doc_id. No step is quadratic and nothing
   * corpus-sized lands on the driver.
   */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5): DataFrame = {
    require(k > 0)
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("__wgt").desc, col("term"))
    tf.join(df, "term").crossJoin(n)
      .withColumn("__wgt",
        col("tf").cast("double") * log(col("__n").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }

  /**
   * Vocabulary-coverage (out-of-vocabulary) statistics — the CCNet-style
   * corpus-level quality signal: documents whose tokens mostly fall
   * outside the corpus's top-`topK` vocabulary are gibberish, boilerplate
   * code, or the wrong language. Per document: total token count, tokens
   * outside the vocabulary, and their ratio.
   *
   * Two-phase at any scale: (1) the vocabulary is a word-count top-k —
   * map-side partial aggregation, then one `TakeOrdered` (deterministic
   * tie-break: count desc, word asc); (2) the per-doc scan joins tokens
   * against the BROADCAST vocabulary (topK rows by construction), so the
   * corpus-side token stream is never shuffled — the only wide exchange is
   * the final per-doc groupBy on the id. Counts are integers and the ratio
   * is one IEEE division, so an external engine reproduces the output
   * bit-for-bit.
   */
  def oovStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 100): DataFrame = {
    require(topK > 0)
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("__w"))
    val vocab = tok.groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(topK)
      .select(col("__w"), lit(1).as("__in"))
    tok.join(broadcast(vocab), Seq("__w"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ratio", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Word n-grams WITH multiplicity; a doc shorter than `n` tokens has none
    * (repetition metrics count occurrences — no whole-text fallback here,
    * unlike the dedup shingles). */
  private def countedNgrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - n + 1),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Occurrence count of the most frequent gram: sort, then a longest-run
    * fold — O(n log n) per row, so a pathological million-token document
    * costs a sort, not a distinct×total quadratic scan. Map-side only. */
  private def topGramCount(grams: Column): Column =
    aggregate(array_sort(grams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /**
   * Gopher/FineWeb-style repetition metrics per document — the filter
   * family that removes boilerplate-heavy and degenerate (looping) text
   * before training. All outputs are INTEGER counts plus one boolean, so an
   * external engine reproduces them bit-for-bit; callers derive the
   * fractions. Per doc:
   *
   *  - `n_tokens`, and for n ∈ {2, 3}: total n-grams + distinct n-grams
   *  - `top_ngram_2`: occurrences of the most frequent 2-gram
   *  - `passes_repetition`: duplicate-2-gram fraction ≤ 20%, most-frequent-
   *    2-gram fraction ≤ 20% (a gram occurring ONCE is exempt — it is not
   *    repetition, and short clean docs would otherwise fail on 1/total
   *    alone), duplicate-3-gram fraction ≤ 10% — compared in integer
   *    arithmetic (`dup·5 ≤ total`), never floating point.
   *
   * Pure per-row column expressions: map-side, no shuffle, codegen'd.
   */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g2 = countedNgrams(col(textCol), 2)
    val g3 = countedNgrams(col(textCol), 3)
    docs.select(
      col(idCol),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      size(g2).cast("long").as("n_ngrams_2"),
      size(array_distinct(g2)).cast("long").as("n_distinct_2"),
      topGramCount(g2).cast("long").as("top_ngram_2"),
      size(g3).cast("long").as("n_ngrams_3"),
      size(array_distinct(g3)).cast("long").as("n_distinct_3"))
      .withColumn("passes_repetition",
        (col("n_ngrams_2") - col("n_distinct_2")) * 5 <= col("n_ngrams_2") &&
          (col("top_ngram_2") <= 1 ||
            col("top_ngram_2") * 5 <= col("n_ngrams_2")) &&
          (col("n_ngrams_3") - col("n_distinct_3")) * 10 <= col("n_ngrams_3"))
  }
}
