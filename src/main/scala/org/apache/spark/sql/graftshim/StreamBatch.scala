package org.apache.spark.sql.graftshim

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.{DataFrame, Row}

/**
 * The one `private[sql]` touch the v1 streaming-source contract forces.
 *
 * `MicroBatchExecution` asserts that the `DataFrame` a v1
 * `Source.getBatch` returns carries `isStreaming = true` — Spark's own
 * file/memory sources satisfy it with
 * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming = true)`,
 * which is `private[sql]`. This object lives under `org.apache.spark.sql`
 * solely to reach that constructor; everything else about the graft change
 * feed stays in `graft.*`.
 *
 * The wrap plans the computed batch to `queryExecution.toRdd` (lazy — the
 * inner plan still optimizes and executes distributed when the sink pulls
 * it) and re-tags the result streaming. The RDD boundary does stop
 * predicate pushdown from the sink side into the batch plan, which is
 * inherent to v1 micro-batch sources (Delta's source has the same shape):
 * the feed plan on the inside is already pruned to the window's commits.
 */
object StreamBatch {
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
