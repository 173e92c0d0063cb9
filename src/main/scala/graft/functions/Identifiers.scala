package graft.functions

/**
 * Identifier hygiene + primary-key discovery, ported behaviorally from the
 * reference's Python glue (NOT its engine — these are driver-side helpers).
 */
object Identifiers {

  /**
   * Avro/Parquet-safe column-name sanitization: spaces → `_`, strip
   * `. / ( )`. Behavior of `ingest_csv_hudi.py:63-64` in the reference.
   */
  def sanitize(name: String): String =
    name.trim
      .replaceAll("\\s+", "_")
      .replaceAll("[./()]", "")

  def sanitizeAll(names: Seq[String]): Seq[String] = {
    // keep uniqueness when sanitization collides ("a b" and "a.b" → a_b, a_b_2)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val s = sanitize(n)
      val c = seen.getOrElse(s, 0)
      seen(s) = c + 1
      if (c == 0) s else s"${s}_${c + 1}"
    }
  }

  /**
   * SQL-injection guard on table names: Python's `str.isidentifier()` used at
   * `api_poc.py:292,304` — re-expressed as the equivalent regex.
   */
  def isValidIdent(name: String): Boolean =
    name.matches("[A-Za-z_][A-Za-z0-9_]*")

  /**
   * Primary-key column heuristic. Union of the two heuristics in the
   * reference, in precedence order:
   *  1. exact-name candidates from `api_poc.py:44-51` (`find_id_col`) and
   *     `lake_cli.py:39-48`;
   *  2. any `*_id`-suffixed column (`lake_cli.py:46-47`);
   *  3. first column.
   * Matching is case-insensitive, as in both sources.
   */
  def findIdCol(columns: Seq[String]): String = {
    val candidates = Seq(
      "id", "index", "internal_id", "uid", "uuid", "guid", "key", "pk",
      "customer_id", "product_id", "emp_id", "user_id", "transaction_id")
    val lower = columns.map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
    candidates.collectFirst { case c if lower.contains(c) => lower(c) }
      .orElse(columns.find(_.toLowerCase(java.util.Locale.ROOT).endsWith("_id")))
      .getOrElse(columns.head)
  }

  /** True when [[findIdCol]] would find a GENUINE id-like column — i.e.
    * would not fall back to "first column". Callers that must not key on
    * an arbitrary column (a form-driven upsert) gate on this. */
  def hasIdCol(columns: Seq[String]): Boolean =
    columns.nonEmpty && {
      val found = findIdCol(columns)
      found != columns.head ||
        found.toLowerCase(java.util.Locale.ROOT).endsWith("_id") ||
        Seq("id", "index", "internal_id", "uid", "uuid", "guid", "key", "pk")
          .contains(found.toLowerCase(java.util.Locale.ROOT))
    }
}
