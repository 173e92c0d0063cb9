package graft.connector

import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.GraftCatalog
import graft.functions.Identifiers

/**
 * DataSource-v2 catalog over a graft warehouse (`<warehouse>/<table>/
 * {_log,data}` — the same layout [[graft.catalog.GraftCatalog]] manages),
 * exposing every graft table to Spark's native SQL/DataFrame surface:
 *
 * {{{
 *   spark.conf.set("spark.sql.catalog.g", classOf[GraftSparkCatalog].getName)
 *   spark.conf.set("spark.sql.catalog.g.warehouse", "/data/warehouse")
 *   spark.sql("SELECT * FROM g.orders JOIN g.lineitem ON ...")
 * }}}
 *
 * The point of the connector is not the read itself (`GraftTable.read()`
 * already serves that) but what Spark's planner can do once the table's
 * LAYOUT is declared through the v2 API: scans report the `__bucket=k`
 * layout as a [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
 * over a catalog-resolved `bucket(n, key)` transform, so a join or
 * aggregation between tables co-bucketed on the join key runs with NO
 * shuffle on either side (Spark's storage-partitioned join,
 * `spark.sql.sources.v2.bucketing.enabled=true`). At 100 TB per side that
 * is the difference between a full-table exchange of both fact tables and
 * a pure map-side merge of co-located buckets — the v2 analog of the
 * reference stack's Iceberg `catalog.schema.table` surface
 * (`api_poc.py:18-19`), which exposes the same bucket layout to its
 * engines' planners.
 *
 * This catalog also implements [[FunctionCatalog]] for exactly one
 * function, `bucket`, because that is how Spark validates that two scans'
 * partitionings are THE SAME function before eliding the exchange: both
 * sides' transforms must resolve through their catalog to bound functions
 * with equal `canonicalName`.
 */
final class GraftSparkCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: java.nio.file.Path = _

  // Per-call: catalogs outlive sessions, so never cache the session here.
  private def cat: GraftCatalog =
    new GraftCatalog(SparkSession.active, warehouse)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = options.get("warehouse")
    require(wh != null && wh.nonEmpty,
      s"catalog $name requires spark.sql.catalog.$name.warehouse")
    warehouse = Paths.get(wh)
  }

  override def name(): String = catalogName

  /** Tables live flat under the warehouse; the only namespace is the empty
    * (or `default`) one, mirroring [[GraftCatalog]]'s flat listing. */
  private def requireNs(namespace: Array[String]): Unit =
    require(namespace.isEmpty || namespace.sameElements(Array("default")),
      s"graft catalog $catalogName has no namespace '${namespace.mkString(".")}'")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNs(namespace)
    cat.listTables().map(t => Identifier.of(namespace, t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || ident.namespace.sameElements(Array("default"))) &&
      Identifiers.isValidIdent(ident.name) && cat.tableExists(ident.name)

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftSparkTable(warehouse.resolve(ident.name).toString, ident.name)
  }

  /** `VERSION AS OF <id>` — the version string is a graft snapshot id. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val id =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft VERSION AS OF takes a numeric snapshot id, got '$version'")
      }
    new GraftSparkTable(warehouse.resolve(ident.name).toString, ident.name, Some(id))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands epoch MICROseconds; resolve to
    * the newest snapshot committed at or before it (same cutoff rule as
    * `GraftTable.readAsOfTimestamp`, parsed not lexicographic). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val cutoff = java.time.Instant.EPOCH.plus(timestamp,
      java.time.temporal.ChronoUnit.MICROS)
    val gt = cat.table(ident.name)
    val id = gt.log.snapshotsCore()
      .filter(s => !java.time.Instant.parse(s.committedAt).isAfter(cutoff))
      .map(_.snapshotId).maxOption
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftSparkTable(warehouse.resolve(ident.name).toString, ident.name, Some(id))
  }

  /** `CREATE TABLE g.t (...) PARTITIONED BY (bucket(16, id))` — the bucket
    * transform becomes the graft bucket spec; any other transform is
    * rejected (the format has exactly one layout primitive). */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    requireNs(ident.namespace)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val bucketBy: Option[(String, Int)] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) =>
        Some(GraftSparkTable.asBucketTransform(t).getOrElse(
          throw new UnsupportedOperationException(
            s"graft tables support only bucket(n, col) partitioning, got $t")))
      case many =>
        throw new UnsupportedOperationException(
          s"graft tables take at most one bucket transform, got ${many.mkString(", ")}")
    }
    cat.createTable(ident.name, schema, bucketBy)
    loadTable(ident)
  }

  /** `ALTER TABLE cat.t ADD COLUMNS (...)` — a metadata-only schema
    * widening ([[graft.table.GraftTable.addColumns]]); anything else
    * (renames, drops, type changes) would need a data rewrite the format
    * deliberately refuses. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = cat.table(ident.name)
    // RENAME / DROP are single-change statements in Spark's grammar; ADD
    // COLUMNS may carry several adds. All three are METADATA-ONLY commits
    // (GraftTable.renameColumn/dropColumn/addColumns) — zero data dirs move.
    changes.toList match {
      case List(r: TableChange.RenameColumn) if r.fieldNames.length == 1 =>
        t.renameColumn(r.fieldNames()(0), r.newName)
      case List(d: TableChange.DeleteColumn) if d.fieldNames.length == 1 =>
        t.dropColumn(d.fieldNames()(0))
      case List(u: TableChange.UpdateColumnType) if u.fieldNames.length == 1 =>
        t.widenColumn(u.fieldNames()(0), u.newDataType)
      case cs =>
        val adds = cs.map {
          case a: TableChange.AddColumn if a.fieldNames.length == 1 =>
            // Metadata-only widening can never backfill existing rows, so a
            // NOT NULL add must be REJECTED (GraftTable.addColumns refuses
            // non-nullable adds loudly) — silently widening it to nullable
            // would hand back a schema the user didn't ask for.
            if (!a.isNullable) throw new UnsupportedOperationException(
              s"graft ADD COLUMNS cannot add NOT NULL column ${a.fieldNames()(0)}: " +
                "existing rows have no value for it; declare it nullable")
            StructField(a.fieldNames()(0), a.dataType, nullable = true)
          case other => throw new UnsupportedOperationException(
            "graft ALTER TABLE supports only top-level ADD COLUMNS, " +
              s"RENAME COLUMN and DROP COLUMN, got $other")
        }
        t.addColumns(adds)
    }
    invalidateTable(ident)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (tableExists(ident)) { cat.dropTable(ident.name); true } else false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")

  // ------------------------------------------------------ FunctionCatalog

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    requireNs(namespace)
    Array(Identifier.of(Array.empty[String], GraftBucketFunction.Name))
  }

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.isEmpty && ident.name == GraftBucketFunction.Name)
      GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/**
 * The v2 form of the write path's bucket assignment
 * (`pmod(xxhash64(col), n)` — [[graft.table.GraftTable]]'s `bucketId`,
 * mirrored driver-side by [[graft.plans.BucketHash]]): Spark resolves the
 * reported `bucket(n, key)` transform against this function when deciding
 * whether two scans are co-partitioned, and evaluates it only under
 * partially-clustered distribution. Bit-for-bit agreement with the write
 * path is therefore a CORRECTNESS requirement, not a convention — it is
 * met by computing the hash with the same Catalyst xxhash64 (seed 42,
 * null folds to the seed) the writer's column expression uses.
 */
object GraftBucketFunction extends UnboundFunction {
  val Name = "bucket"

  override def name(): String = Name
  override def description(): String =
    "graft hash bucket: pmod(xxhash64(col, seed=42), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket expects (numBuckets INT, col), got $inputType")
    new Bound(inputType.fields(1).dataType)
  }

  private final class Bound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = Name
    override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      // ONE implementation of the bucket assignment (bit-for-bit parity
      // with the write path is a correctness requirement — never fork it).
      GraftSparkTable.bucketIdOf(
        if (input.isNullAt(1)) null else input.get(1, dt), dt, input.getInt(0))
    }
  }
}
