package graft.queries

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/**
 * Gate entries for the DataSource-v2 connector
 * ([[graft.connector.GraftSparkCatalog]]): every query routes its read
 * through Spark's v2 `BATCH_READ` path — catalog resolution, the
 * executor-side vectorized reader, column pruning, filter pushdown, and
 * the reported bucket partitioning — and the DuckDB oracle checks the
 * values against plain SQL over the same parquet. The SHUFFLE-ELISION
 * claim (storage-partitioned join: co-bucketed joins/aggregations with no
 * exchange) is a plan property a value gate cannot see; `SpjSpec` asserts
 * it on `.queryExecution.executedPlan`.
 */
object ConnectorQueries {

  /** Fresh v2 catalog over a temp warehouse. Catalog instances are cached
    * by name in the session's CatalogManager with the conf they were FIRST
    * loaded under, so a per-call warehouse needs a per-call catalog name. */
  def tempCatalog(s: SparkSession): String = {
    val name = "gv2_" + UUID.randomUUID().toString.replace("-", "").take(8)
    val wh = Files.createTempDirectory("graft-v2-")
    s.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.connector.GraftSparkCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    name
  }

  /** Ingest `df` hash-bucketed into catalog `cat` as `name`. */
  def ingestBucketed(s: SparkSession, cat: String, name: String,
      df: DataFrame, key: String, n: Int): Unit = {
    val wh = java.nio.file.Paths.get(s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
    new graft.catalog.GraftCatalog(s, wh).materialized(name)
      .overwriteBucketed(df, key, n)
  }

  val queries: Map[String, QueryFn] = Map(
    // Storage-partitioned join shape: orders ⋈ lineitem on the orderkey
    // both tables are bucketed by (8 buckets each side). With
    // spark.sql.sources.v2.bucketing.enabled the planner elides BOTH
    // exchanges (asserted in SpjSpec); the gate verifies the joined VALUES
    // survive the whole v2 read path.
    "t_spj_join" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "orders", tbl(s, d, "orders"), "o_orderkey", 8)
      ingestBucketed(s, cat, "lineitem",
        tbl(s, d, "lineitem"), "l_orderkey", 8)
      s.table(s"$cat.orders").join(s.table(s"$cat.lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Bucket-key aggregation through the v2 scan: KeyGroupedPartitioning
    // satisfies the aggregate's clustering, so no exchange (SpjSpec); the
    // gate checks the grouped values.
    "t_spj_agg" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "lineitem",
        tbl(s, d, "lineitem"), "l_orderkey", 8)
      s.table(s"$cat.lineitem")
        .groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    }),

    // v2 filter + projection pushdown: predicate and pruned columns reach
    // the parquet reader (row-group stats + requested schema); values
    // must equal the plain filtered projection.
    "t_v2_filter" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "orders", tbl(s, d, "orders"), "o_orderkey", 8)
      s.table(s"$cat.orders")
        .filter(col("o_totalprice") > 100000.0 && col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ALTER TABLE ADD COLUMNS: metadata-only widening, then an insert into
    // the widened schema — old rows read back with NULLs, new with values.
    "t_v2_alter" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "orders",
        tbl(s, d, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey", 4)
      s.sql(s"ALTER TABLE $cat.orders ADD COLUMNS (note STRING)")
      s.sql(s"INSERT INTO $cat.orders " +
        s"SELECT o_orderkey + 100000, o_totalprice, 'x' AS note " +
        s"FROM parquet.`$d/orders.parquet` WHERE o_orderkey <= 500")
      s.table(s"$cat.orders").orderBy("o_orderkey")
    }),

    // SQL DELETE through the catalog: the pushed conjunction routes to the
    // table's deleteWhere (3VL semantics); the read-back must equal the
    // complement the oracle computes.
    "t_v2_delete" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "orders", tbl(s, d, "orders"), "o_orderkey", 4)
      s.sql(s"DELETE FROM $cat.orders " +
        "WHERE o_orderkey <= 3000 OR o_orderstatus = 'F'")
      s.table(s"$cat.orders").select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // In-scan MOR resolution: the v2 read under a pending three-commit
    // delta chain (updates + tombstones + a chain-landing re-update) must
    // equal the resolved state the oracle computes from the raw parquet.
    "t_v2_mor_read" -> ((s, d) => {
      val cat = tempCatalog(s)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val o = tbl(s, d, "orders")
      val t = new graft.catalog.GraftCatalog(s, wh).materialized("orders")
      t.overwriteBucketed(o, "o_orderkey", 8)
      t.upsertDeferred(o.filter(col("o_orderkey") <= 500)
        .withColumn("o_totalprice", lit(1.0)), "o_orderkey")
      t.upsertDeferred(o.filter(col("o_orderkey").between(501, 600))
        .withColumn("op", lit("d")), "o_orderkey", opCol = Some("op"))
      t.upsertDeferred(o.filter(col("o_orderkey").between(100, 200))
        .withColumn("o_totalprice", lit(2.0)), "o_orderkey")
      s.table(s"$cat.orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Metadata-only aggregate pushdown: count(*)/min/max on a stats-covered
    // column answered from the manifest fold — SpjSpec asserts the plan has
    // no aggregate and no file scan; this gate checks the VALUES over a
    // multi-commit table.
    "t_v2_agg_push" -> ((s, d) => {
      val cat = tempCatalog(s)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val o = tbl(s, d, "orders")
      val t = new graft.catalog.GraftCatalog(s, wh).materialized("orders")
      t.overwriteBucketed(o.filter(col("o_orderkey") <= 5000), "o_orderkey", 4)
      t.append(o.filter(col("o_orderkey") > 5000))
      s.sql(s"SELECT count(*) AS cnt, min(o_orderkey) AS mn, " +
        s"max(o_orderkey) AS mx FROM $cat.orders")
    }),

    // SQL INSERT INTO through the v1 write bridge: both inserts land as
    // schema-aligned append commits; the final SELECT reads them back
    // through the v2 scan.
    "t_v2_insert" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "orders",
        tbl(s, d, "orders").filter(col("o_orderkey") <= 1000), "o_orderkey", 4)
      s.sql(s"INSERT INTO $cat.orders SELECT * FROM " +
        s"parquet.`$d/orders.parquet` WHERE o_orderkey BETWEEN 1001 AND 1500")
      s.sql(s"INSERT INTO $cat.orders SELECT * FROM " +
        s"parquet.`$d/orders.parquet` WHERE o_orderkey > 1500")
      s.table(s"$cat.orders").orderBy("o_orderkey")
    }),

    // Time travel through the v2 catalog: VERSION AS OF pins the scan to
    // the pre-append snapshot, so the delta rows must be absent.
    "t_v2_timetravel" -> ((s, d) => {
      val cat = tempCatalog(s)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val o = tbl(s, d, "orders")
      val t = new graft.catalog.GraftCatalog(s, wh).materialized("orders")
      t.overwriteBucketed(o.filter(col("o_orderkey") <= 2000), "o_orderkey", 4)
      val v1 = t.latestVersion
      t.append(o.filter(col("o_orderkey") > 2000))
      s.sql(s"SELECT o_orderkey, o_totalprice FROM $cat.orders " +
        s"VERSION AS OF $v1 ORDER BY o_orderkey")
    }),

    // Metadata-only column RENAME through SQL (Iceberg's ALTER TABLE ...
    // RENAME COLUMN as a one-manifest commit — stable field ids, zero data
    // dirs move): post-rename reads serve the new name, DML speaks it, the
    // key stays bucket-pruned, and time travel to the pre-rename snapshot
    // serves the OLD name over the SAME files.
    "t_v2_rename" -> ((s, d) => {
      val cat = tempCatalog(s)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val o = tbl(s, d, "orders")
      val t = new graft.catalog.GraftCatalog(s, wh).materialized("orders")
      t.overwriteBucketed(o, "o_orderkey", 8)
      val v1 = t.latestVersion
      val dirsBefore = t.log.latest().get.dataDirs.toSet
      s.sql(s"ALTER TABLE $cat.orders RENAME COLUMN o_totalprice TO price")
      require(t.log.latest().get.dataDirs.toSet == dirsBefore,
        "rename must be metadata-only (zero data-dir changes)")
      // DML under the NEW name, through the row-level SQL path.
      s.sql(s"UPDATE $cat.orders SET price = price + 1000.0 " +
        "WHERE o_orderkey % 10 = 0")
      val now = s.sql(s"SELECT o_orderkey, price FROM $cat.orders " +
        "WHERE o_orderkey <= 2000")
      val old = s.sql(s"SELECT o_orderkey, o_totalprice AS price_v1 " +
        s"FROM $cat.orders VERSION AS OF $v1 WHERE o_orderkey <= 2000")
      now.join(old, "o_orderkey").orderBy("o_orderkey")
    }),

    // Metadata-only column DROP through SQL: the column leaves the live
    // schema (files keep the bytes, the scan never decodes them); time
    // travel to the pre-drop snapshot still serves it.
    "t_v2_drop" -> ((s, d) => {
      val cat = tempCatalog(s)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val o = tbl(s, d, "orders")
      val t = new graft.catalog.GraftCatalog(s, wh).materialized("orders")
      t.overwriteBucketed(o, "o_orderkey", 4)
      val v1 = t.latestVersion
      val dirsBefore = t.log.latest().get.dataDirs.toSet
      s.sql(s"ALTER TABLE $cat.orders DROP COLUMN o_orderstatus")
      require(t.log.latest().get.dataDirs.toSet == dirsBefore,
        "drop must be metadata-only (zero data-dir changes)")
      require(!s.table(s"$cat.orders").columns.contains("o_orderstatus"),
        "dropped column must leave the live schema")
      val now = s.sql(s"SELECT o_orderkey, o_totalprice FROM $cat.orders " +
        "WHERE o_orderkey <= 2000")
      val old = s.sql(s"SELECT o_orderkey, o_orderstatus FROM $cat.orders " +
        s"VERSION AS OF $v1 WHERE o_orderkey <= 2000")
      now.join(old, "o_orderkey").orderBy("o_orderkey")
    }),

    // Metadata-only type WIDENING through SQL (Iceberg ALTER COLUMN ...
    // TYPE): the manifest type widens in one commit; the narrow (int32)
    // files promote on read, a filter on the widened column stays exact
    // (row-group pushdown skipped for it, re-filtering not), and a
    // post-widen INSERT lands at the wide type in the same table.
    "t_v2_widen" -> ((s, d) => {
      val cat = tempCatalog(s)
      val o = tbl(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey").cast("int").as("o_custkey"),
        col("o_totalprice"))
      ingestBucketed(s, cat, "orders", o, "o_orderkey", 4)
      val dirsBefore = {
        val wh = java.nio.file.Paths.get(
          s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
        new graft.catalog.GraftCatalog(s, wh).table("orders")
          .log.latest().get.dataDirs
      }
      s.sql(s"ALTER TABLE $cat.orders ALTER COLUMN o_custkey TYPE BIGINT")
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      require(new graft.catalog.GraftCatalog(s, wh).table("orders")
        .log.latest().get.dataDirs == dirsBefore,
        "widen must be metadata-only (zero data-dir changes)")
      s.sql(s"INSERT INTO $cat.orders VALUES (99999999, 7777777777, 5.5)")
      s.sql(s"SELECT o_orderkey, o_custkey, o_totalprice FROM $cat.orders " +
        "WHERE o_custkey >= 100 ORDER BY o_orderkey")
    }),

    // Decimal + date widenings (round 16, probed on both parquet reader
    // paths): DECIMAL(9,2) -> DECIMAL(13,2) promotes across the int32 ->
    // int64 physical encoding boundary; DATE -> TIMESTAMP_NTZ reads
    // midnight with no zone shift. Metadata-only (zero data-dir changes),
    // then a mixed-era read: the post-widen INSERT writes wide-typed files
    // alongside the narrow ones. Decimal exactness is asserted IN-GATE at
    // the wide type (the only place a raw DECIMAL(13,2) exists); the graded
    // projection casts to DOUBLE per the registry's hash-stable output
    // convention (Q.scala class doc) — the r16 official hash-fail on this
    // gate traced to it being the registry's sole raw-DECIMAL output.
    "t_v2_widen_dec" -> ((s, d) => {
      val cat = tempCatalog(s)
      val o = tbl(s, d, "orders").select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(9,2)").as("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      ingestBucketed(s, cat, "orders", o, "o_orderkey", 4)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val dirsBefore = new graft.catalog.GraftCatalog(s, wh).table("orders")
        .log.latest().get.dataDirs
      s.sql(s"ALTER TABLE $cat.orders ALTER COLUMN o_totalprice TYPE DECIMAL(13,2)")
      s.sql(s"ALTER TABLE $cat.orders ALTER COLUMN o_orderdate TYPE TIMESTAMP_NTZ")
      require(new graft.catalog.GraftCatalog(s, wh).table("orders")
        .log.latest().get.dataDirs == dirsBefore,
        "widen must be metadata-only (zero data-dir changes)")
      s.sql(s"INSERT INTO $cat.orders VALUES " +
        "(99999999, 77777777777.55, TIMESTAMP_NTZ '2031-01-02 03:04:05')")
      // The wide-era row must read back bit-exact at DECIMAL(13,2) — a
      // value beyond DECIMAL(9,2)'s range, so it proves the widened type
      // is live end-to-end (write + mixed-era read).
      val wide = s.sql(s"SELECT o_totalprice FROM $cat.orders " +
        "WHERE o_orderkey = 99999999").collect()
      require(wide.length == 1 && wide(0).getDecimal(0).compareTo(
          new java.math.BigDecimal("77777777777.55")) == 0,
        s"wide-era row must be exact DECIMAL(13,2): ${wide.toSeq}")
      // The narrow-era files must rescale losslessly: exact decimal sum
      // over the promoted read equals the same sum over the source.
      val got = s.table(s"$cat.orders").filter(col("o_orderkey") =!= 99999999)
        .agg(sum(col("o_totalprice").cast(DecimalType(28, 2)))).collect()(0)
      val want = o
        .agg(sum(col("o_totalprice").cast(DecimalType(28, 2)))).collect()(0)
      require(got.getDecimal(0).compareTo(want.getDecimal(0)) == 0,
        s"narrow-era decimal sum must survive the widen: $got vs $want")
      s.sql(s"SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, " +
        s"o_orderdate FROM $cat.orders " +
        "WHERE o_totalprice >= 1000.0 ORDER BY o_orderkey")
    }),

    // Decimal SCALE growth (round 17): DECIMAL(9,2) -> DECIMAL(12,4) keeps
    // integer headroom (9-2 = 12-4 digits) so every narrow value rescales
    // exactly on read; metadata-only, then a mixed-era read with a
    // post-widen INSERT carrying 4 live decimal places. DOUBLE-cast output
    // per the registry convention.
    "t_v2_widen_scale" -> ((s, d) => {
      val cat = tempCatalog(s)
      val o = tbl(s, d, "orders").select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(9,2)").as("o_totalprice"))
      ingestBucketed(s, cat, "orders", o, "o_orderkey", 4)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val dirsBefore = new graft.catalog.GraftCatalog(s, wh).table("orders")
        .log.latest().get.dataDirs
      s.sql(s"ALTER TABLE $cat.orders ALTER COLUMN o_totalprice TYPE DECIMAL(12,4)")
      require(new graft.catalog.GraftCatalog(s, wh).table("orders")
        .log.latest().get.dataDirs == dirsBefore,
        "scale widen must be metadata-only (zero data-dir changes)")
      s.sql(s"INSERT INTO $cat.orders VALUES (99999999, 1234567.8912)")
      val wide = s.sql(s"SELECT o_totalprice FROM $cat.orders " +
        "WHERE o_orderkey = 99999999").collect()
      require(wide.length == 1 && wide(0).getDecimal(0).compareTo(
          new java.math.BigDecimal("1234567.8912")) == 0,
        s"wide-era row must be exact DECIMAL(12,4): ${wide.toSeq}")
      s.sql(s"SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice " +
        s"FROM $cat.orders WHERE o_totalprice >= 1000.0 ORDER BY o_orderkey")
    }),

    // SQL UPDATE through the catalog (SupportsRowLevelOperations,
    // group-based copy-on-write): the modulo predicate is untranslatable,
    // so this exercises the full rewrite — COW scan, replacement write,
    // group-swap commit — not a metadata shortcut.
    "t_v2_update" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "orders", tbl(s, d, "orders"), "o_orderkey", 4)
      s.sql(s"UPDATE $cat.orders SET o_totalprice = o_totalprice * 2.0, " +
        "o_orderstatus = 'U' WHERE o_orderkey % 10 < 3")
      s.table(s"$cat.orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // The reference's literal 3-clause conditional CDC MERGE
    // (cdc_merger_optimized.py:176-183) as SQL through the catalog:
    // WHEN MATCHED AND s.op='d' THEN DELETE / WHEN MATCHED THEN UPDATE
    // SET <all cols> / WHEN NOT MATCHED AND s.op != 'd' THEN INSERT —
    // SET/INSERT lists generated from the column list exactly as the
    // reference generates them (:172-174). The batch carries updates,
    // deletes, inserts, and deletes of ABSENT keys the conditional
    // INSERT clause must ignore.
    "t_sql_merge_cdc" -> ((s, d) => {
      val cat = tempCatalog(s)
      val o = tbl(s, d, "orders")
      ingestBucketed(s, cat, "orders", o, "o_orderkey", 8)
      val src = o.filter(col("o_orderkey") <= 500)
        .withColumn("o_totalprice", lit(1.0)).withColumn("op", lit("u"))
        .unionByName(o.filter(col("o_orderkey").between(501, 700))
          .withColumn("op", lit("d")))
        .unionByName(o.filter(col("o_orderkey").between(701, 900))
          .withColumn("o_orderkey", col("o_orderkey") + 10000000)
          .withColumn("op", lit("c")))
        .unionByName(o.filter(col("o_orderkey").between(901, 1000))
          .withColumn("o_orderkey", col("o_orderkey") + 20000000)
          .withColumn("op", lit("d")))
      src.createOrReplaceTempView("cdc_updates")
      val cols = o.columns.toSeq
      s.sql(s"""MERGE INTO $cat.orders t
        USING cdc_updates s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET ${cols.filterNot(_ == "o_orderkey")
          .map(c => s"t.$c = s.$c").mkString(", ")}
        WHEN NOT MATCHED AND s.op != 'd' THEN INSERT (${cols.mkString(", ")})
          VALUES (${cols.map(c => s"s.$c").mkString(", ")})""")
      s.table(s"$cat.orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    }),

    // SQL DELETE whose predicate canDeleteWhere cannot translate: must
    // fall back to the copy-on-write rewrite instead of failing, and keep
    // exactly the complement.
    "t_v2_delete_cow" -> ((s, d) => {
      val cat = tempCatalog(s)
      ingestBucketed(s, cat, "orders", tbl(s, d, "orders"), "o_orderkey", 4)
      s.sql(s"DELETE FROM $cat.orders WHERE o_orderkey % 3 = 0")
      s.table(s"$cat.orders").select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // CTAS + literal INSERT VALUES through the catalog: CREATE TABLE ...
    // PARTITIONED BY (bucket(n, col)) AS SELECT lands bucketed in one
    // statement; a VALUES row rides the same schema-aligned append.
    "t_v2_ctas" -> ((s, d) => {
      val cat = tempCatalog(s)
      s.sql(s"CREATE TABLE $cat.orders PARTITIONED BY (bucket(4, o_orderkey)) " +
        s"AS SELECT o_orderkey, o_orderstatus, o_totalprice " +
        s"FROM parquet.`$d/orders.parquet`")
      s.sql(s"INSERT INTO $cat.orders VALUES (99999999, 'Z', 42.5)")
      s.table(s"$cat.orders").orderBy("o_orderkey")
    }),

    // v2 SQL surface end-to-end: CREATE TABLE ... PARTITIONED BY
    // (bucket(n, col)) through the catalog, INSERT via the table API,
    // SELECT through spark.sql over the catalog-qualified name.
    "t_v2_sql" -> ((s, d) => {
      val cat = tempCatalog(s)
      val wh = java.nio.file.Paths.get(
        s.conf.get(s"spark.sql.catalog.$cat.warehouse"))
      val n = tbl(s, d, "nation")
      s.sql(s"CREATE TABLE $cat.nation (n_nationkey BIGINT, n_name STRING, " +
        s"n_regionkey BIGINT) PARTITIONED BY (bucket(4, n_nationkey))")
      new graft.catalog.GraftCatalog(s, wh).table("nation")
        .append(n.select("n_nationkey", "n_name", "n_regionkey"))
      s.sql(s"SELECT n_regionkey, count(*) AS cnt FROM $cat.nation " +
        "GROUP BY n_regionkey ORDER BY n_regionkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "t_spj_join" ->
      """SELECT o_orderstatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         count(*) AS n
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "t_spj_agg" ->
      """SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "t_v2_filter" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > 100000.0 AND o_orderstatus = 'F'
         ORDER BY o_orderkey""",
    "t_v2_alter" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS note
           FROM orders
           UNION ALL
           SELECT o_orderkey + 100000, o_totalprice, 'x' AS note
           FROM orders WHERE o_orderkey <= 500
         ) ORDER BY o_orderkey""",
    "t_v2_delete" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE NOT (o_orderkey <= 3000 OR o_orderstatus = 'F')
         ORDER BY o_orderkey""",
    "t_v2_mor_read" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderkey BETWEEN 100 AND 200 THEN 2.0
              WHEN o_orderkey <= 500 THEN 1.0
              ELSE o_totalprice END AS o_totalprice
         FROM orders WHERE o_orderkey NOT BETWEEN 501 AND 600
         ORDER BY o_orderkey""",
    "t_v2_agg_push" ->
      """SELECT count(*) AS cnt, min(o_orderkey) AS mn, max(o_orderkey) AS mx
         FROM orders""",
    "t_v2_insert" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "t_v2_update" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 < 3 THEN o_totalprice * 2.0
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 10 < 3 THEN 'U'
              ELSE o_orderstatus END AS o_orderstatus
         FROM orders ORDER BY o_orderkey""",
    "t_sql_merge_cdc" ->
      """SELECT * FROM (
           SELECT o_orderkey,
             CASE WHEN o_orderkey <= 500 THEN 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate
           FROM orders WHERE o_orderkey NOT BETWEEN 501 AND 700
           UNION ALL
           SELECT o_orderkey + 10000000, o_totalprice, o_orderdate
           FROM orders WHERE o_orderkey BETWEEN 701 AND 900
         ) ORDER BY o_orderkey""",
    "t_v2_delete_cow" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE NOT (o_orderkey % 3 = 0) ORDER BY o_orderkey""",
    "t_v2_ctas" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
           UNION ALL SELECT 99999999, 'Z', 42.5
         ) ORDER BY o_orderkey""",
    "t_v2_timetravel" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",
    "t_v2_rename" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS price,
           o_totalprice AS price_v1
         FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",
    "t_v2_drop" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus
         FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",
    "t_v2_widen" ->
      """SELECT * FROM (
           SELECT o_orderkey,
                  CAST(CAST(o_custkey AS INT) AS BIGINT) AS o_custkey,
                  o_totalprice
           FROM orders
           UNION ALL SELECT 99999999, 7777777777, 5.5
         ) WHERE o_custkey >= 100 ORDER BY o_orderkey""",
    "t_v2_widen_dec" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                o_orderdate
         FROM (
           SELECT o_orderkey,
                  CAST(CAST(o_totalprice AS DECIMAL(9,2)) AS DECIMAL(13,2))
                    AS o_totalprice,
                  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS o_orderdate
           FROM orders
           UNION ALL SELECT 99999999, CAST(77777777777.55 AS DECIMAL(13,2)),
                  TIMESTAMP '2031-01-02 03:04:05'
         ) WHERE o_totalprice >= 1000.0 ORDER BY o_orderkey""",
    "t_v2_widen_scale" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
         FROM (
           SELECT o_orderkey,
                  CAST(CAST(o_totalprice AS DECIMAL(9,2)) AS DECIMAL(12,4))
                    AS o_totalprice
           FROM orders
           UNION ALL SELECT 99999999, CAST(1234567.8912 AS DECIMAL(12,4))
         ) WHERE o_totalprice >= 1000.0 ORDER BY o_orderkey""",
    "t_v2_sql" ->
      // BIGINT cast: the DDL above declares n_regionkey BIGINT (append
      // casts on ingest), while the raw parquet stores int32.
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS cnt
         FROM nation GROUP BY 1 ORDER BY 1"""
  )
}
