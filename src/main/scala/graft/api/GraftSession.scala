package graft.api

import org.apache.spark.sql.DataFrame

import graft.catalog.GraftCatalog

/**
 * SQL serving surface — the native equivalent of the reference's `/query` +
 * SQL-workspace endpoints (`api_poc.py:208-263`): any SQL against named
 * catalog tables, with the trailing-semicolon strip (`api_poc.py:217`) and
 * the preview limit of the `/data` endpoint (`api_poc.py:287,293`).
 *
 * Tables resolve by name because every catalog table is registered as a
 * temp view over its LATEST snapshot; [[refreshViews]] re-registers after
 * commits (a view pins the snapshot that was current at registration,
 * mirroring the reference where Trino sees the table as of query planning).
 */
final class GraftSession(val catalog: GraftCatalog) {

  /** (Re-)register every catalog table as a temp view over its latest
    * snapshot, plus a `<t>__snapshots` metadata view (the SQL face of
    * Iceberg's `t$snapshots`, `api_poc.py:426-429`). */
  def refreshViews(): Unit =
    catalog.listTables().foreach { t =>
      val table = catalog.table(t)
      table.read().createOrReplaceTempView(t)
      table.snapshotsDF.createOrReplaceTempView(s"${t}__snapshots")
    }

  /** Register one table (e.g. right after ingest) without a full refresh. */
  def registerView(name: String): Unit =
    catalog.table(name).read().createOrReplaceTempView(name)

  /** `/query`: passthrough SQL with the Trino-ism semicolon strip (F11). */
  def sql(query: String): DataFrame =
    catalog.spark.sql(query.trim.stripSuffix(";"))

  /** `/data/{t}` preview: first `limit` rows of a table (`api_poc.py:287`). */
  def preview(table: String, limit: Int = 10): DataFrame =
    catalog.table(table).read().limit(limit)
}
