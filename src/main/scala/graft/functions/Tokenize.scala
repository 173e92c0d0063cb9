package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The ONE canonical whitespace tokenizer, shared by search indexing
 * (`graft.search.Search`), dedup shingling (`graft.ops.Dedup`) and text
 * analysis (`graft.ops.TextAnalysis`) — and mirrored verbatim by every
 * DuckDB oracle (`string_split(regexp_replace(lower(trim(text)), '\s+',
 * ' ', 'g'), ' ')`).
 *
 * Semantics: lowercase, trim, collapse any whitespace RUN (space, tab,
 * newline) to a single space, split on single space. Runs of whitespace
 * therefore never produce empty tokens, and the index side can never emit
 * a token the query side (`query.split("\\s+")`) wouldn't match —
 * splitting on a literal single space would (tab- or double-space-separated
 * text used to index dirty tokens like `"a\tb"`).
 *
 * Deliberately NOT a bare regex split: `split(s, "\\s+")` keeps a leading
 * empty token for text with leading whitespace, and engines disagree on
 * trailing empties — normalize-then-split is deterministic and identical
 * everywhere.
 */
object Tokenize {

  /** Lowercased, whitespace-collapsed text (also the exact-dedup key). */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Canonical token array. Empty text yields a single empty token. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Driver-side analog for query strings. */
  def queryTerms(query: String): Seq[String] =
    query.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSeq
}
