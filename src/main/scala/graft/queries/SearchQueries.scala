package graft.queries

import org.apache.spark.sql.functions._

import graft.search.Search
import Q._

/**
 * Gate entries for the native two-tier search module (SURVEY.md §2 P3/P4/P5,
 * O5, S11, F12) over the documents corpus.
 */
object SearchQueries {

  val queries: Map[String, QueryFn] = Map(
    // P3/F3: multi-column LIKE fallback scan.
    "s_like_multi" -> ((s, d) =>
      Search.likeFallback(tbl(s, d, "documents"), "doc_id", "fast merge")),

    // P4: all-digits query routes to id equality.
    "s_digit_route" -> ((s, d) =>
      Search.likeFallback(tbl(s, d, "documents"), "doc_id", "42")),

    // P5: id-list semi-join (the ES-hits → table fetch path).
    "s_fetch_by_ids" -> ((s, d) =>
      Search.fetchByIds(tbl(s, d, "documents"), "doc_id",
        Seq("3", "7", "11", "99", "250", "444"))),

    // O5: AND-match + phrase-boost-10 top-50, then fetch rows by hit ids.
    "s_keyword_rank" -> ((s, d) =>
      Search.searchThenFetch(tbl(s, d, "documents"), "doc_id", "text",
        "merge batch", size = 50)),

    // O5 via the index tier: posting-list intersection, then fetch + rank.
    "s_index_search" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val idx = Search.buildIndex(docs, "doc_id", "text")
      Search.searchViaIndex(docs, idx, "doc_id", "text", "merge batch", size = 50)
    }),

    // S11 as a SINK: persisted token-bucketed index; term lookups prune to
    // one bucket each, then the same intersection + fetch + rank.
    "s_persisted_index" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val cat = new graft.catalog.GraftCatalog(s,
        java.nio.file.Files.createTempDirectory("graft-idx-"))
      val idx = Search.persistIndex(cat, "doc_index", docs, "doc_id", "text")
      Search.searchPersistedIndex(docs, idx, "doc_id", "text", "merge batch", size = 50)
    }),

    // S11/F12: inverted-index build + per-token document frequency.
    "s_token_index" -> ((s, d) =>
      Search.docFreq(Search.buildIndex(tbl(s, d, "documents"), "doc_id", "text"))),

    // ES `"fields": ["*"]` cross_fields AND (`api_poc.py:81-86`): the index
    // posts every string column's tokens, so a term set SPLIT across
    // columns still AND-matches — here 'merge' appears only in `text` and
    // 'en' only in `lang` (no document's text contains the token 'en'), so
    // every hit is findable only cross-column.
    "s_index_multicol" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val cols = Search.stringCols(docs)
      val idx = Search.buildIndex(docs, "doc_id", cols)
      Search.searchViaIndex(docs, idx, "doc_id", cols, "merge en", size = 50)
    }))

  val oracles: Map[String, String] = Map(
    "s_like_multi" ->
      """SELECT * FROM documents
        |WHERE CAST(doc_id AS VARCHAR) LIKE '%fast merge%' OR text LIKE '%fast merge%'
        |   OR lang LIKE '%fast merge%' OR source LIKE '%fast merge%'""".stripMargin,
    "s_digit_route" ->
      "SELECT * FROM documents WHERE CAST(doc_id AS VARCHAR) = '42'",
    "s_fetch_by_ids" ->
      "SELECT * FROM documents WHERE CAST(doc_id AS VARCHAR) IN ('3','7','11','99','250','444')",
    "s_keyword_rank" ->
      """WITH hits AS (
        |  SELECT doc_id,
        |    CASE WHEN position('merge batch' IN lower(text)) > 0 THEN 10.0 ELSE 1.0 END AS score
        |  FROM documents
        |  WHERE list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'merge')
        |    AND list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'batch')
        |  ORDER BY score DESC, doc_id LIMIT 50)
        |SELECT d.*, h.score FROM documents d JOIN hits h USING (doc_id)""".stripMargin,
    "s_persisted_index" ->
      """WITH m AS (
        |  SELECT doc_id, text, lang, source, n_chars,
        |    CASE WHEN position('merge batch' IN lower(text)) > 0 THEN 10.0 ELSE 1.0 END AS score
        |  FROM documents
        |  WHERE list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'merge')
        |    AND list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'batch'))
        |SELECT * FROM m ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    "s_index_search" ->
      """WITH hits AS (
        |  SELECT doc_id,
        |    CASE WHEN position('merge batch' IN lower(text)) > 0 THEN 10.0 ELSE 1.0 END AS score
        |  FROM documents
        |  WHERE list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'merge')
        |    AND list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'batch')
        |  ORDER BY score DESC, doc_id LIMIT 50)
        |SELECT d.*, h.score FROM documents d JOIN hits h USING (doc_id)""".stripMargin,
    "s_token_index" ->
      """SELECT token, count(*) AS n_docs FROM (
        |  SELECT DISTINCT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents) WHERE token <> '' GROUP BY token""".stripMargin,
    "s_index_multicol" ->
      """WITH m AS (
        |  SELECT *,
        |    (list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'merge')
        |     OR list_contains(string_split(regexp_replace(lower(trim(lang)), '\s+', ' ', 'g'), ' '), 'merge')
        |     OR list_contains(string_split(regexp_replace(lower(trim(source)), '\s+', ' ', 'g'), ' '), 'merge')) AS has_merge,
        |    (list_contains(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 'en')
        |     OR list_contains(string_split(regexp_replace(lower(trim(lang)), '\s+', ' ', 'g'), ' '), 'en')
        |     OR list_contains(string_split(regexp_replace(lower(trim(source)), '\s+', ' ', 'g'), ' '), 'en')) AS has_en
        |  FROM documents)
        |SELECT doc_id, text, lang, source, n_chars,
        |  CASE WHEN position('merge en' IN lower(text)) > 0
        |         OR position('merge en' IN lower(lang)) > 0
        |         OR position('merge en' IN lower(source)) > 0
        |       THEN 10.0 ELSE 1.0 END AS score
        |FROM m WHERE has_merge AND has_en
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)
}
