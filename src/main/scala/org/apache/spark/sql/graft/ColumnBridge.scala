package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into the `private[sql]` Column ↔ catalyst-Expression converters —
 * the standard packaging technique for Spark-native extensions that define
 * custom codegen'd expressions (the public API intentionally hides the
 * catalyst types).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unwraps a row-level-operation write wrapper (`private[sql]`) to the
    * connector table underneath; identity for anything else. */
  def unwrapRowLevelTable(t: org.apache.spark.sql.connector.catalog.Table)
      : org.apache.spark.sql.connector.catalog.Table = t match {
    case w: org.apache.spark.sql.connector.write.RowLevelOperationTable => w.table
    case other => other
  }

  /** `Dataset.ofRows` bridge (the object is `private[sql]` in Spark 4):
    * lets optimizer rules execute a bounded driver-side probe over an
    * already-resolved logical subplan (graft.plans.MergeKeyPruneRule). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
