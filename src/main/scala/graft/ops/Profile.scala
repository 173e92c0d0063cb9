package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column profiling — the data-quality summary a lakehouse surfaces next to
 * every table (null rates, cardinality, value ranges). One aggregation job
 * over the table: all per-column statistics are computed in a single
 * `agg(...)` pass (map-side partial aggregation; nothing but the final
 * scalar row crosses the wire), then unpivoted to one row per column.
 *
 * `exact = false` swaps exact COUNT(DISTINCT) — one expensive expand per
 * column — for HyperLogLog `approx_count_distinct`, the 100 TB default.
 */
object Profile {

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    val types = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    cols.map { c =>
      (c, types(c), n, n - row.getAs[Long](s"__nn_$c"),
        row.getAs[Long](s"__nd_$c"),
        Option(row.getAs[String](s"__mn_$c")).orNull,
        Option(row.getAs[String](s"__mx_$c")).orNull)
    }.toDF("column", "dtype", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
