package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, sum, when}

import graft.log.Snapshot

/**
 * Incrementally-maintained aggregate table (materialized view) over a
 * [[GraftTable]]: `GROUP BY groupCols → count(*) AS cnt, sum(c) AS c_sum…`,
 * refreshed from the base table's CHANGE FEED instead of recomputed.
 * Refresh cost is O(changes since last refresh) + O(groups) — independent
 * of the base table's size, which on a 100 TB table is the difference
 * between a sub-second maintenance tick and a full-scan job. The same
 * derived-table shape the reference serves dashboards from
 * (`api_poc.py` status-count pages), kept fresh without rescanning.
 *
 * Only SELF-MAINTAINABLE aggregates are offered: count and sum (avg =
 * sum/count downstream) fold any change as a signed delta. min/max are NOT
 * incrementally maintainable under deletes without per-group value
 * multisets — use [[recompute]] (or the base table's metadata stats) for
 * those. A group whose count reaches zero is dropped from the view.
 * A sum over a group whose every value is NULL is stored as 0 rather than
 * SQL's NULL — the one place the incremental fold is coarser than a
 * recompute.
 *
 * The view is itself a [[GraftTable]] (`<base>__mv_<name>`), so it
 * snapshots, time-travels and serves like any other table. The base
 * version each state reflects lives in the SAME commit's summary
 * (`mv_base_version`), so refresh is crash-idempotent: retry after a
 * committed refresh sees the new version and no-ops; retry after a crash
 * before the commit re-reads the same change window. The view spec is
 * persisted in the base table's props sidecar (`mv_<name>`), so shells and
 * HTTP servers can reopen it by name — [[MaterializedAgg.of]].
 */
final class MaterializedAgg(val base: GraftTable, val name: String,
    val pk: String, val groupCols: Seq[String],
    val sumCols: Seq[String] = Seq.empty) {
  require(groupCols.nonEmpty, "materialized aggregate needs group columns")

  val table: GraftTable = new GraftTable(base.spark,
    base.root.resolveSibling(s"${base.name}__mv_$name"),
    s"${base.name}__mv_$name")

  private def sumAlias(c: String) = s"${c}_sum"

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c)).as(sumAlias(c))): _*)

  /** Base snapshot id the CURRENT view state reflects. */
  def refreshedVersion: Long = table.log.latest()
    .flatMap(_.summary.get("mv_base_version")).map(_.toLong)
    .getOrElse(throw new IllegalStateException(
      s"materialized view ${table.name} has not been created"))

  def read(): DataFrame = table.read()

  /** Create (or re-create) the view by full recompute at the base's current
    * version, and persist the spec so [[MaterializedAgg.of]] can reopen it. */
  def create(): Snapshot = {
    base.log.putProp(s"mv_$name", MaterializedAgg.specJson(this))
    recompute()
  }

  /** Full recompute at the base's current version — the fallback when the
    * change window has been expired, and the refresh path for aggregates
    * the incremental fold cannot maintain. */
  def recompute(): Snapshot = {
    val v = base.latestVersion
    table.overwrite(aggregate(base.read()),
      Map("mv_base_version" -> v.toString))
  }

  /**
   * Incremental refresh: fold the base's change feed since the last
   * refreshed version into the stored groups. The signed weight w (+1 for
   * insert/update_post, −1 for update_pre/delete) turns every change row
   * into a pure additive delta — Δcnt = Σw, Δsum(c) = Σ w·c — so updates
   * contribute post − pre and no-op updates cancel exactly. The delta
   * aggregate is O(changes); folding it into the view is one join of two
   * group-sized frames (deltas broadcast). Falls back to [[recompute]]
   * when the change window crosses expired snapshots.
   */
  def refresh(): Snapshot = {
    val from = refreshedVersion
    val to = base.latestVersion
    if (to == from) return table.log.latest().get
    val ch =
      try base.changesBetween(from, to, pk)
      catch { case _: IllegalStateException => return recompute() }
    fold(ch, to)
  }

  /**
   * Continuous maintenance: a streaming query over the base's
   * `graft-changes` source that folds every micro-batch into the view as
   * it lands — [[refresh]] without the polling, at whatever freshness the
   * stream trigger gives. Starts from the view's CURRENT reflected
   * version, so create → maintainStream never misses or re-folds a
   * window; [[foldBatch]]'s version filter makes replayed batches
   * (restart re-running its last committed window) no-ops, so the
   * checkpointed stream is exactly-once into the view. One maintainer at
   * a time per view (stream OR manual refresh), same single-writer
   * contract as every maintenance verb.
   */
  def maintainStream(checkpointLocation: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    base.spark.readStream.format("graft-changes")
      .option("path", base.root.toString)
      .option("pk", pk)
      .option("startingVersion", refreshedVersion.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) => foldBatch(batch); () }
      .start()

  /** Fold ONE feed micro-batch into the view. Rows at or below the
    * reflected version are already folded and drop out (the idempotence
    * that makes stream-batch replay safe); the commit reflects the
    * batch's own max version — one tiny O(changes) agg, no base-table
    * metadata round-trip. */
  def foldBatch(feedBatch: DataFrame): Unit = {
    // persist: the max-version probe and the fold both consume the batch,
    // and a v1 streaming batch re-runs its plan per action; unpersist per
    // batch so a long-running maintainer does not accumulate cache entries
    val fresh = feedBatch.filter(col("_commit_version") > refreshedVersion)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val to = fresh.agg(org.apache.spark.sql.functions.max("_commit_version"))
        .head.getAs[Any](0)
      if (to != null) { fold(fresh, to.asInstanceOf[Long]); () }
    } finally { fresh.unpersist(blocking = false); () }
  }

  /** The signed-weight fold shared by [[refresh]] and [[foldBatch]]. */
  private def fold(ch: DataFrame, to: Long): Snapshot = {
    val w = when(col("_change_type").isin("insert", "update_post"), lit(1L))
      .otherwise(lit(-1L))
    val deltas = ch.groupBy(groupCols.map(col): _*)
      .agg(sum(w).as("d_cnt"),
        sumCols.map(c => sum(w * col(c)).as("d_" + sumAlias(c))): _*)
    val cur = table.read()
    // Null-safe equi-join: a NULL group value is a group like any other
    // (groupBy treats it so; a plain join condition would orphan it).
    val cond = groupCols.map(g => cur(g) <=> deltas(g)).reduce(_ && _)
    val merged = cur.join(broadcast(deltas), cond, "full_outer")
      .select(
        groupCols.map(g => coalesce(cur(g), deltas(g)).as(g)) ++
          Seq((coalesce(cur("cnt"), lit(0L)) +
            coalesce(deltas("d_cnt"), lit(0L))).as("cnt")) ++
          sumCols.map { c =>
            val a = sumAlias(c)
            (coalesce(cur(a), lit(0)) + coalesce(deltas("d_" + a), lit(0))).as(a)
          }: _*)
      .filter(col("cnt") > 0)
    table.overwrite(merged, Map("mv_base_version" -> to.toString))
  }
}

object MaterializedAgg {
  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  private[table] def specJson(mv: MaterializedAgg): String =
    org.json4s.jackson.Serialization.write(Map(
      "pk" -> mv.pk,
      "groups" -> mv.groupCols.mkString(","),
      "sums" -> mv.sumCols.mkString(",")))

  /** Reopen a view previously [[MaterializedAgg.create]]d on `base`. */
  def of(base: GraftTable, name: String): MaterializedAgg = {
    val raw = base.log.props().getOrElse(s"mv_$name",
      throw new NoSuchElementException(
        s"table ${base.name} has no materialized view '$name'"))
    val m = org.json4s.jackson.JsonMethods.parse(raw)
      .extract[Map[String, String]]
    def split(s: String) = s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    new MaterializedAgg(base, name, m("pk"), split(m("groups")),
      split(m.getOrElse("sums", "")))
  }

  /** Names of views created on `base`. */
  def list(base: GraftTable): Seq[String] =
    base.log.props().keys.filter(_.startsWith("mv_"))
      .map(_.stripPrefix("mv_")).toSeq.sorted
}
