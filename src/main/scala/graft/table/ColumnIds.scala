package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/**
 * Stable column identity for metadata-only RENAME / DROP (the Iceberg
 * schema-evolution verbs the reference's stack performs as field-id
 * metadata commits — its `large_transactions` fixture churns schemas three
 * times, `metadata/v4.metadata.json`, without rewriting data).
 *
 * Design: the manifest schema's field NAMES are PHYSICAL — the names
 * actually present in every data file — and never change after a field is
 * first written. A rename is a metadata-only commit that sets the field's
 * `graft.logical` metadata to the new user-visible name; a drop removes
 * the field from the manifest schema while the files keep the column. All
 * internal machinery (dir stats keys, bucket_key, bloom sidecars, MOR
 * keys, parquet predicates) keeps operating on physical names, so only
 * the API boundaries translate:
 *
 *   - reads rename physical -> logical on the way OUT ([[toLogical]]),
 *   - incoming DataFrames / column arguments rename logical -> physical on
 *     the way IN ([[toPhysical]], [[physicalFor]]).
 *
 * Every helper is an identity no-op on a table that never renamed a
 * column (`hasMapping` false), so the untouched-table fast path is the
 * pre-existing code path byte for byte.
 *
 * Each field also carries a stable integer id (`graft.id`), assigned at
 * creation / ADD COLUMNS and never reused within retained history — the
 * provenance anchor renames hang off.
 *
 * Full rewrites ([[GraftTable.commitRewrite]]) NATURALIZE the mapping:
 * they rewrite every file under the logical names and commit the logical
 * schema, so the physical/logical split only persists while data written
 * under the old name is still live. Time travel stays consistent either
 * way — each snapshot's schemaJson carries the mapping as of that commit.
 */
private[graft] object ColumnIds {
  val LogicalKey = "graft.logical"
  val IdKey = "graft.id"

  /** The user-visible name of a field (physical name unless renamed). */
  def logicalName(f: StructField): String =
    if (f.metadata.contains(LogicalKey)) f.metadata.getString(LogicalKey)
    else f.name

  def fieldId(f: StructField): Option[Long] =
    if (f.metadata.contains(IdKey)) Some(f.metadata.getLong(IdKey)) else None

  /** True when any field's logical name differs from its physical name. */
  def hasMapping(st: StructType): Boolean =
    st.fields.exists(f => logicalName(f) != f.name)

  /** The schema as the USER sees it: logical names, physical metadata kept
    * (ids survive; `graft.logical` is dropped since name == logical). */
  def logicalSchema(st: StructType): StructType =
    if (!hasMapping(st)) st
    else StructType(st.fields.map { f =>
      val ln = logicalName(f)
      if (ln == f.name) f
      else f.copy(name = ln, metadata = without(f.metadata, LogicalKey))
    })

  /** Rename a frame read under PHYSICAL names to logical (no-op without a
    * mapping). Columns not in `st` (internals like __seq) pass through. */
  def toLogical(df: DataFrame, st: StructType): DataFrame = {
    val m = renames(st)
    if (m.isEmpty) df
    else df.select(df.columns.map(c =>
      m.get(c).map(l => col(c).as(l)).getOrElse(col(c))): _*)
  }

  /** Rename an incoming LOGICAL-named frame to physical (no-op without a
    * mapping). Columns that match no logical name pass through (schema
    * evolution: genuinely new columns keep their names). */
  def toPhysical(df: DataFrame, st: StructType): DataFrame = {
    val m = renames(st).map(_.swap)
    if (m.isEmpty) df
    else df.select(df.columns.map(c =>
      m.get(c).map(p => col(c).as(p)).getOrElse(col(c))): _*)
  }

  /** physical -> logical pairs that actually differ. */
  def renames(st: StructType): Map[String, String] =
    st.fields.iterator.map(f => f.name -> logicalName(f))
      .filter { case (p, l) => p != l }.toMap

  /** The physical name behind a user-supplied column name (identity when
    * unmapped or unknown). */
  def physicalFor(st: StructType, logical: String): String =
    st.fields.find(f => logicalName(f) == logical).map(_.name)
      .getOrElse(logical)

  /** The logical name of a physical column (identity when unknown). */
  def logicalFor(st: StructType, physical: String): String =
    st.fields.find(_.name == physical).map(logicalName).getOrElse(physical)

  /** Re-stamp identity metadata (id + logical name) onto a derived
    * schema whose fields came from `head` physical columns — transforms
    * (unions, merges) can drop field metadata, and a commit that loses the
    * mapping would silently re-expose physical names. */
  def restoreMeta(derived: StructType, head: StructType): StructType = {
    val byPhys = head.fields.map(f => f.name -> f).toMap
    StructType(derived.fields.map { f =>
      byPhys.get(f.name) match {
        case Some(h) => f.copy(metadata = h.metadata)
        case None => f
      }
    })
  }

  /** Marker set by [[GraftTable.widenColumn]]: live data files still carry
    * the NARROWER physical type, which Spark's parquet readers promote on
    * read (vectorized + row-based, Spark 4 type widening) — but parquet-mr
    * ROW-GROUP FILTERS are type-strict, so pushdown paths must skip
    * predicates on widened columns (the scan re-filters above; correctness
    * never depended on the pushdown). A FULL rewrite (commitRewrite —
    * zero carried dirs) clears the marker via [[clearWidened]]: every
    * surviving file then stores the wide type and pushdown returns. */
  val WidenedKey = "graft.widened"

  def isWidened(f: StructField): Boolean =
    f.metadata.contains(WidenedKey) && f.metadata.getBoolean(WidenedKey)

  def markWidened(f: StructField): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putBoolean(WidenedKey, true).build())

  /** Strip widened markers from every field (full-rewrite commits). */
  def clearWidened(st: StructType): StructType =
    StructType(st.fields.map { f =>
      if (!f.metadata.contains(WidenedKey)) f
      else f.copy(metadata = without(f.metadata, WidenedKey))
    })

  def withLogical(f: StructField, logical: String): StructField =
    if (logical == f.name) f.copy(metadata = without(f.metadata, LogicalKey))
    else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(LogicalKey, logical).build())

  def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(IdKey, id).build())

  private def without(m: Metadata, key: String): Metadata = {
    if (!m.contains(key)) m
    else {
      // MetadataBuilder has no remove; rebuild from the JSON map minus key.
      val b = new MetadataBuilder().withMetadata(m)
      b.remove(key)
      b.build()
    }
  }
}
