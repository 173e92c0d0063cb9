package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.functions.Identifiers
import graft.table.GraftTable

/**
 * Warehouse catalog: `<warehouse>/<table>/{_log, data}`. The native
 * equivalent of the reference's `catalog.schema.table` namespace over
 * Iceberg + Hive metastore (`api_poc.py:18-19`, DDL at
 * `cdc_merger_optimized.py:189-203`): create / list / describe / drop plus
 * batch CSV ingestion with schema inference, name sanitization and
 * append-time schema evolution.
 */
final class GraftCatalog(val spark: SparkSession, val warehouse: Path) {
  Files.createDirectories(warehouse)

  private def tableRoot(name: String): Path = warehouse.resolve(name)

  private def requireValid(name: String): Unit =
    require(Identifiers.isValidIdent(name),
      s"invalid table name '$name' (guard from api_poc.py:292,304)")

  /**
   * `CREATE TABLE IF NOT EXISTS` with a declared schema (S15), optionally
   * hash-bucketed by key (`bucketBy`) so every later keyed DML is a partial
   * rewrite (the TBLPROPERTIES analog of the reference's DDL,
   * `cdc_merger_optimized.py:189-203`).
   */
  def createTable(name: String, schema: StructType,
      bucketBy: Option[(String, Int)] = None,
      constraint: Option[String] = None): GraftTable = {
    requireValid(name)
    val t = new GraftTable(spark, tableRoot(name), name)
    if (t.log.latest().isEmpty) {
      Files.createDirectories(tableRoot(name))
      val spec = bucketBy.map { case (k, n) =>
        Map("bucket_key" -> k, "bucket_count" -> n.toString)
      }.getOrElse(Map.empty)
      t.log.commit("create", schema.json, Seq.empty, Map("records" -> "0") ++ spec)
      // After the create commit so the DDL-time validation resolves the
      // condition against the declared schema.
      constraint.foreach(t.setCheckConstraint)
    }
    t
  }

  /**
   * Validated handle + directory for a DERIVED table (search index, IVF
   * cells, dedup signature state) whose builder will overwrite it directly
   * — same name guard as [[createTable]], no initial empty commit.
   *
   * An EXISTING table under this name is rejected unless the caller passes
   * `overwrite = true`: builders derive extra table names (`__shingles`,
   * `__centroids` suffixes), and a silent overwriteBucketed over an
   * unrelated table that happened to collide would destroy user data.
   */
  def materialized(name: String, overwrite: Boolean = false): GraftTable = {
    requireValid(name)
    require(overwrite || !tableExists(name),
      s"table $name already exists; pass overwrite = true to re-materialize it")
    Files.createDirectories(tableRoot(name))
    new GraftTable(spark, tableRoot(name), name)
  }

  def tableExists(name: String): Boolean =
    Files.isDirectory(tableRoot(name).resolve("_log")) &&
      new GraftTable(spark, tableRoot(name), name).log.latest().isDefined

  def table(name: String): GraftTable = {
    requireValid(name)
    require(tableExists(name), s"table $name does not exist")
    new GraftTable(spark, tableRoot(name), name)
  }

  /** `SHOW TABLES` (S16). */
  def listTables(): Seq[String] =
    if (!Files.isDirectory(warehouse)) Seq.empty
    else
      Using.resource(Files.list(warehouse)) { s =>
        s.iterator().asScala
          .filter(p => Files.isDirectory(p.resolve("_log")))
          .map(_.getFileName.toString)
          .toSeq
          .sorted
      }

  /** `DESCRIBE t` (S16). */
  def describe(name: String): StructType = table(name).logicalSchema

  def dropTable(name: String): Unit = {
    requireValid(name)
    val root = tableRoot(name)
    if (Files.exists(root)) {
      Using.resource(Files.walk(root)) { s =>
        s.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
          .foreach(Files.deleteIfExists(_))
      }
    }
  }

  /** Save a DataFrame as a catalog table (replace or append-with-evolution). */
  def saveTable(name: String, df: DataFrame, mode: String = "replace"): GraftTable = {
    requireValid(name)
    val t = new GraftTable(spark, tableRoot(name), name)
    Files.createDirectories(tableRoot(name))
    mode match {
      case "replace" => t.overwrite(df)
      case "append" => t.append(df)
      case other => throw new IllegalArgumentException(s"unknown save mode $other")
    }
    t
  }

  /**
   * Batch CSV → table (S1 + S8): header + type inference
   * (`ingest_trino.py:77`), column-name sanitization
   * (`ingest_csv_hudi.py:63-64`), then replace or append-with-evolution.
   */
  def ingestCsv(
      csvPath: String,
      name: String,
      mode: String = "replace",
      inferSchema: Boolean = true,
      key: Option[String] = None): GraftTable = {
    requireValid(name)
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .csv(csvPath)
    val df = raw.toDF(Identifiers.sanitizeAll(raw.columns.toSeq): _*)
    val t = new GraftTable(spark, tableRoot(name), name)
    Files.createDirectories(tableRoot(name))
    mode match {
      case "replace" => t.overwrite(df)
      case "append" => t.append(df)
      case "upsert" =>
        // Hudi-style keyed CSV ingest (`ingest_csv_hudi.py:80-99`): record
        // key from the reference's id heuristic unless given; a synthesized
        // current-timestamp precombine column orders replays
        // (`ingest_csv_hudi.py:68-69`), added only when absent.
        val pk = key.getOrElse(Identifiers.findIdCol(df.columns.toSeq))
        val withTs =
          if (df.columns.contains("current_ts")) df
          else df.withColumn("current_ts",
            org.apache.spark.sql.functions.current_timestamp().cast("string"))
        if (t.log.latest().isEmpty) t.overwrite(withTs)
        else t.upsert(withTs, pk, precombine = Some("current_ts"))
      case other => throw new IllegalArgumentException(s"unknown ingest mode $other")
    }
    t
  }

  /**
   * Raw object put (`smart_ingest.sh:37-40` analog): copy the source file
   * untouched into the warehouse `_raw/` area as an ingest backup.
   */
  def putRaw(srcPath: String, destName: String): Path = {
    val rawDir = warehouse.resolve("_raw")
    Files.createDirectories(rawDir)
    val dest = rawDir.resolve(destName)
    Files.copy(Paths.get(srcPath), dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest
  }
}
