package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Native two-tier keyword search — the Spark re-expression of the
 * reference's Elasticsearch + LIKE-fallback stack:
 *
 *  - index tier: AND-match over all terms with a ×10 phrase boost, top 50
 *    (`api_poc.py:65-123`: `multi_match cross_fields operator=and` +
 *    `match_phrase boost 10.0`, size 50);
 *  - id semi-join from index hits back to the table (`api_poc.py:399-403`);
 *  - fallback tier: multi-column `CAST(c AS VARCHAR) LIKE '%kw%'` scan with
 *    the all-digits → id-equality special case (`api_poc.py:406-414`);
 *  - index build: lowercased whitespace tokens, one (token, id) posting per
 *    distinct pair (`sync_to_es.py:44-52` analog).
 *
 * Scale notes: the inverted-index table is partitioned by token on write, so
 * an AND-match is a k-way posting intersection (shuffle on doc id only);
 * the fallback LIKE scan is the reference's own degraded path and stays a
 * single predicate-pushdown scan.
 */
object Search {

  /** Canonical whitespace tokenizer — see [[graft.functions.Tokenize]]. */
  def tokenize(text: Column): Column = graft.functions.Tokenize.tokens(text)

  /**
   * Inverted-index table: one row per distinct (token, id). `docFreq` adds
   * the per-token posting count (used for rare-term-first intersection).
   */
  def buildIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    buildIndex(df, idCol, Seq(textCol))

  /**
   * Multi-column index build — the ES `"fields": ["*"]` shape the
   * reference's index tier queries (`api_poc.py:81-86`): postings are
   * FIELD-AGNOSTIC (token → id over the union of every listed column's
   * tokens), so a term set split across columns still AND-matches, exactly
   * like `multi_match` with `cross_fields` + `operator: and`. One extra
   * array flatten per row at build; query cost is unchanged.
   */
  def buildIndex(df: DataFrame, idCol: String, textCols: Seq[String]): DataFrame = {
    require(textCols.nonEmpty, "buildIndex needs at least one column")
    val toks =
      if (textCols.sizeIs == 1) tokenize(col(textCols.head).cast("string"))
      // coalesce each column to an empty array: tokenize null-propagates,
      // and flatten() returns NULL if ANY nested array is NULL — without
      // the guard one NULL column would erase the document's postings from
      // every other column, making it unfindable by the index tier (ES
      // cross_fields simply skips missing fields).
      else array_distinct(flatten(array(
        textCols.map(c => coalesce(tokenize(col(c).cast("string")),
          array())): _*)))
    df.select(explode(toks).as("token"), col(idCol).as("id"))
      .filter(col("token") =!= "")
      .distinct()
  }

  /** Every string column of `df` — the default `["*"]` field set. */
  def stringCols(df: DataFrame): Seq[String] =
    df.schema.fields.toSeq
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)

  def docFreq(index: DataFrame): DataFrame =
    index.groupBy("token").agg(count(lit(1)).as("n_docs"))

  /**
   * Query terms ordered by ascending posting count (ties by term for
   * determinism). Terms absent from the index count 0 and sort first —
   * the intersection then empties on the first join, the cheapest outcome.
   */
  def rareFirst(index: DataFrame, terms: Seq[String]): Seq[String] = {
    val freq = index.filter(col("token").isin(terms: _*))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.distinct.sortBy(t => (freq.getOrElse(t, 0L), t))
  }

  /**
   * Persist the inverted index as a token-BUCKETED catalog table (the
   * durable analog of `sync_to_es.py`'s bulk index): each term lookup then
   * prunes to one bucket dir via [[graft.table.GraftTable.lookupKey]] —
   * at 100 TB a posting fetch reads 1/numBuckets of the index, not all of
   * it. Rebuilt wholesale on refresh, like the reference's sync — a refresh
   * over an existing index passes `overwrite = true` (the catalog rejects
   * silently clobbering an existing table otherwise).
   */
  def persistIndex(
      catalog: graft.catalog.GraftCatalog,
      indexName: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 64,
      overwrite: Boolean = false): graft.table.GraftTable =
    persistIndex(catalog, indexName, docs, idCol, Seq(textCol), numBuckets, overwrite)

  /** Multi-column [[persistIndex]] — the `["*"]` index as a durable sink. */
  def persistIndex(
      catalog: graft.catalog.GraftCatalog,
      indexName: String,
      docs: DataFrame,
      idCol: String,
      textCols: Seq[String],
      numBuckets: Int,
      overwrite: Boolean): graft.table.GraftTable = {
    val t = catalog.materialized(indexName, overwrite)
    t.overwriteBucketed(buildIndex(docs, idCol, textCols), "token", numBuckets)
    t
  }

  /** Phrase-boost ranking + fetch shared by the index tiers: base score 1.0,
    * ×10 when ANY of `phraseCols` contains the exact phrase (the reference
    * boosts `match_phrase` hits by 10, `api_poc.py:97-101`). */
  private def rankAndFetch(
      df: DataFrame,
      candidates: DataFrame,
      idCol: String,
      phraseCols: Seq[String],
      query: String,
      size: Int): DataFrame = {
    val hits = df.join(candidates.withColumnRenamed("id", idCol), Seq(idCol))
    val phrase = phraseCols
      .map(c => lower(col(c).cast("string")).contains(query.toLowerCase(java.util.Locale.ROOT)))
      .reduce(_ || _)
    hits
      .withColumn("score", when(phrase, 10.0).otherwise(1.0))
      .orderBy(desc("score"), col(idCol).asc)
      .limit(size)
  }

  /**
   * AND-match against a PERSISTED index: every term's postings come from a
   * bucket-pruned point lookup; the intersection + fetch + rank is the same
   * as [[searchViaIndex]].
   */
  def searchPersistedIndex(
      df: DataFrame,
      index: graft.table.GraftTable,
      idCol: String,
      textCol: String,
      query: String,
      size: Int = 50): DataFrame =
    searchPersistedIndex(df, index, idCol, Seq(textCol), query, size)

  /** Multi-column [[searchPersistedIndex]]: the index already posts every
    * column's tokens; only the phrase boost needs the column list. */
  def searchPersistedIndex(
      df: DataFrame,
      index: graft.table.GraftTable,
      idCol: String,
      textCols: Seq[String],
      query: String,
      size: Int): DataFrame = {
    val terms = graft.functions.Tokenize.queryTerms(query)
    require(terms.nonEmpty, "empty query")
    // ONE bucket-pruned scan fetches every term's postings (lookupKeys
    // reads the union of the terms' buckets); the AND-match is then a
    // count-distinct per doc id — equivalent to intersecting the k posting
    // lists, but one scan + one aggregation instead of k scans + k-1
    // semi-joins.
    val candidates = index.lookupKeys(terms)
      .groupBy("id").agg(count_distinct(col("token")).as("__nt"))
      .filter(col("__nt") === terms.distinct.size)
      .select("id")
    rankAndFetch(df, candidates, idCol, textCols, query, size)
  }

  /**
   * Index-tier search: docs containing ALL query terms (AND-match),
   * scored 1.0 base + 9.0 phrase boost (total 10.0 on exact-phrase hit,
   * matching the reference's phrase boost of 10), top `size` by
   * (score desc, id asc).
   */
  def searchRanked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      size: Int = 50): DataFrame = {
    val terms = graft.functions.Tokenize.queryTerms(query)
    val toks = tokenize(col(textCol))
    val andMatch = terms.map(t => array_contains(toks, t)).reduce(_ && _)
    val phrase = lower(col(textCol)).contains(query.toLowerCase(java.util.Locale.ROOT))
    df.filter(andMatch)
      .withColumn("score", when(phrase, 10.0).otherwise(1.0))
      .orderBy(desc("score"), col(idCol).asc)
      .limit(size)
  }

  /**
   * Index-backed AND-match: intersect the query terms' posting lists in the
   * inverted-index table (each term filter prunes to one token's postings —
   * with the index partitioned by token, a partition-pruned read), then
   * fetch + phrase-boost-rank only the candidate rows. This is the tier
   * that avoids touching the base table until candidates are known — at
   * 100 TB the base scan of [[searchRanked]] is the fallback, not the norm.
   */
  def searchViaIndex(
      df: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      size: Int = 50): DataFrame =
    searchViaIndex(df, index, idCol, Seq(textCol), query, size)

  /** Multi-column [[searchViaIndex]] (`cross_fields` AND): terms may match
    * in DIFFERENT columns — the index is field-agnostic, so the posting
    * intersection is unchanged; only the phrase boost spans the columns. */
  def searchViaIndex(
      df: DataFrame,
      index: DataFrame,
      idCol: String,
      textCols: Seq[String],
      query: String,
      size: Int): DataFrame = {
    val terms = graft.functions.Tokenize.queryTerms(query)
    require(terms.nonEmpty, "empty query")
    // Rarest term FIRST: the left side of the first semi-join bounds every
    // later intersection, so starting from a stopword-sized posting list
    // would drag the whole list through each join. The ordering costs one
    // tiny aggregate over just the query terms' postings (k rows back).
    val ordered = rareFirst(index, terms)
    val candidates = ordered.map(t => index.filter(col("token") === t).select("id"))
      .reduce((a, b) => a.join(b, Seq("id"), "left_semi"))
    // No explicit broadcast hint: a query of common terms can intersect to
    // millions of ids, and forcing them through the driver would OOM — AQE
    // broadcasts at runtime when the candidate set turns out small.
    rankAndFetch(df, candidates, idCol, textCols, query, size)
  }

  /** Two-tier flow: ranked index hits → id semi-join back to the base table. */
  def searchThenFetch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      size: Int = 50): DataFrame = {
    val hits = searchRanked(df, idCol, textCol, query, size).select(idCol, "score")
    df.join(broadcast(hits), Seq(idCol))
  }

  /**
   * Fallback tier (`api_poc.py:406-414`): all-digits query → exact id match;
   * otherwise OR of `CAST(col AS string) LIKE '%kw%'` over the id and every
   * string column.
   */
  def likeFallback(df: DataFrame, idCol: String, keyword: String): DataFrame =
    if (keyword.nonEmpty && keyword.forall(_.isDigit))
      df.filter(col(idCol).cast("string") === keyword)
    else {
      val stringCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
      val cols = (idCol +: stringCols.toSeq).distinct
      val pred = cols.map(c => col(c).cast("string").contains(keyword)).reduce(_ || _)
      df.filter(pred)
    }

  /** Id-list semi-join (`api_poc.py:399-403`): ES-hit ids back to rows. */
  def fetchByIds(df: DataFrame, idCol: String, ids: Seq[String]): DataFrame =
    df.filter(col(idCol).cast("string").isin(ids: _*))
}
