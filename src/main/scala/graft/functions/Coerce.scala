package graft.functions

import java.time.{Instant, OffsetDateTime}
import org.apache.spark.sql.types._

/**
 * Form-value string → typed-value coercion, behaviorally matching the
 * reference's `get_cast_val` (`api_poc.py:704-726`):
 *   - int-family → toInt/toLong
 *   - double/decimal/real → toDouble
 *   - boolean → truthy set {"true","1","yes","on"} (case-insensitive)
 *   - timestamp/date → ISO-8601, accepting a trailing `Z` (→ +00:00)
 *   - any parse failure → fall back to the raw string (the reference never
 *     throws on user form input; it lets the engine cast or fail later)
 */
object Coerce {
  private val truthy = Set("true", "1", "yes", "on")

  /**
   * `java.sql.Timestamp` → epoch MICROS, floor-based. floorDiv, not `/`:
   * plain division truncates toward zero and flips the fractional second
   * of pre-epoch timestamps (`getNanos` is always the non-negative
   * sub-second part). Shared by streaming sessionization and manifest-stat
   * pruning so their integer time arithmetic can never drift apart.
   */
  def timestampMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  def coerce(raw: String, dataType: DataType): Any = {
    if (raw == null) return null
    val v = raw.trim
    try {
      dataType match {
        case IntegerType | ShortType | ByteType => v.toInt
        case LongType => v.toLong
        case DoubleType | FloatType | _: DecimalType => v.toDouble
        case BooleanType => truthy.contains(v.toLowerCase(java.util.Locale.ROOT))
        case TimestampType =>
          val iso = if (v.endsWith("Z")) v.dropRight(1) + "+00:00" else v
          java.sql.Timestamp.from(
            try OffsetDateTime.parse(iso).toInstant
            catch {
              case _: java.time.format.DateTimeParseException =>
                try java.time.LocalDateTime.parse(iso)
                  .toInstant(java.time.ZoneOffset.UTC)
                catch {
                  // Date-only input → midnight UTC, like Python's
                  // datetime.fromisoformat("1992-01-01") in the
                  // reference's get_cast_val — a date bound on a
                  // timestamp column is routine serving input.
                  case _: java.time.format.DateTimeParseException =>
                    java.time.LocalDate.parse(iso)
                      .atStartOfDay.toInstant(java.time.ZoneOffset.UTC)
                }
            })
        case TimestampNTZType =>
          // External type for TIMESTAMP_NTZ is LocalDateTime — wall-clock,
          // no zone. Parquet timestamp[ms/us] WITHOUT isAdjustedToUTC
          // (pandas/arrow's default) loads as NTZ, so serving bounds on
          // ingested tables routinely land here. A trailing Z or offset is
          // accepted and its instant reinterpreted as UTC wall-clock.
          val iso = if (v.endsWith("Z")) v.dropRight(1) + "+00:00" else v
          try OffsetDateTime.parse(iso).withOffsetSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
          catch {
            case _: java.time.format.DateTimeParseException =>
              try java.time.LocalDateTime.parse(iso)
              catch {
                case _: java.time.format.DateTimeParseException =>
                  java.time.LocalDate.parse(iso).atStartOfDay
              }
          }
        case DateType =>
          // Spark's external type for DateType is java.sql.Date, not
          // Timestamp (the reference's Python datetime covers both).
          val iso = if (v.endsWith("Z")) v.dropRight(1) + "+00:00" else v
          java.sql.Date.valueOf(
            try OffsetDateTime.parse(iso).toLocalDate
            catch {
              case _: java.time.format.DateTimeParseException =>
                try java.time.LocalDateTime.parse(iso).toLocalDate
                catch {
                  case _: java.time.format.DateTimeParseException =>
                    java.time.LocalDate.parse(iso)
                }
            })
        case _ => v
      }
    } catch { case _: RuntimeException => v }
  }

  /**
   * pandas-dtype-string → Spark type mapping used for CDC schema sidecars
   * (`cdc_merger_optimized.py:59-63`, exported by `csv_to_sql.py:40-44`).
   * Deliberate divergence: the reference maps every int dtype to a 32-bit
   * integer, but pandas' DEFAULT integer dtype is int64 — an id ≥ 2^31
   * would overflow the 32-bit type and null out under from_json, silently
   * losing the merge key. int64 therefore maps to LongType here; narrower
   * int dtypes keep the reference's IntegerType.
   */
  def dtypeToSpark(dtype: String): DataType = {
    val d = dtype.toLowerCase(java.util.Locale.ROOT)
    if (d.contains("int64")) LongType
    else if (d.contains("int")) IntegerType
    else if (d.contains("float") || d.contains("double")) DoubleType
    else StringType
  }
}
