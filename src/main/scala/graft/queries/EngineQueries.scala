package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import Q._

/**
 * Gate entries that route the corpus THROUGH the snapshot-table engine
 * (ingest → commit → read back), so the DuckDB oracle verifies the engine's
 * storage/merge/travel semantics, not just Spark's operators:
 * S1/S2/S3/S4/S5/S8/S9/S10/S13/S14, SET1, J1-J4, F6, F9.
 *
 * Every query builds a throwaway table in a temp warehouse from the sf
 * parquet and expresses the expected end state as plain SQL over the same
 * parquet for the oracle.
 */
object EngineQueries {

  private val orderCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")
  private val orderColsSql = orderCols.mkString(", ")

  val queries: Map[String, QueryFn] = Map(
    // S8 replace ingest + S2 latest-snapshot scan round-trip.
    "t_ingest_scan" -> ((s, d) => {
      val t = tempTable(s)
      t.overwrite(tbl(s, d, "orders"))
      t.read()
    }),

    // S1 CSV ingest with header + schema inference + F9 sanitization.
    "t_csv_roundtrip" -> ((s, d) => {
      val csvDir = Files.createTempDirectory("graft-csv-").resolve("region")
      tbl(s, d, "region").coalesce(1)
        .write.option("header", "true").csv(csvDir.toString)
      val cat = new graft.catalog.GraftCatalog(s, Files.createTempDirectory("graft-cat-"))
      cat.ingestCsv(csvDir.toString, "region_csv").read()
    }),

    // SET1/F6: append-time schema-union evolution pads old rows with typed nulls.
    "t_append_evolve" -> ((s, d) => {
      val c = tbl(s, d, "customer")
      val t = tempTable(s)
      t.overwrite(c.select("c_custkey", "c_name", "c_nationkey"))
      t.append(c.filter(col("c_custkey") <= 750)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      t.read()
    }),

    // J1/J3/S9: keyed COW upsert — updates fully replace matched rows.
    "t_upsert" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") % 3 =!= 0))
      val updates = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("o_orderpriority", lit("9-UPSERTED"))
      t.upsert(updates, "o_orderkey")
      t.read()
    }),

    // Bucketed COW: same merge semantics as t_upsert, but the table is
    // hash-bucketed so the merge is a partial rewrite (the 100 TB layout).
    "t_upsert_bucketed" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwriteBucketed(o.filter(col("o_orderkey") % 3 =!= 0), "o_orderkey", 8)
      val updates = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("o_orderpriority", lit("9-UPSERTED"))
      t.upsert(updates, "o_orderkey")
      t.read()
    }),

    // Merge-on-read: deferred upsert + tombstone deltas, resolved at read.
    "t_upsert_mor" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o)
      t.upsertDeferred(o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000), "o_orderkey")
      t.upsertDeferred(o.filter(col("o_orderkey") % 5 === 0)
        .withColumn("op", lit("d")), "o_orderkey", opCol = Some("op"))
      t.read()
    }),

    // W1 precombine: duplicate keys in one batch — greatest precombine wins.
    "t_upsert_precombine" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o)
      val hits = o.filter(col("o_orderkey") % 10 === 0)
      val v1 = hits.withColumn("o_orderpriority", lit("P1")).withColumn("ver", lit(1L))
      val v2 = hits.withColumn("o_orderpriority", lit("P2"))
        .withColumn("o_totalprice", col("o_totalprice") + 500)
        .withColumn("ver", lit(2L))
      t.upsert(v1.unionByName(v2), "o_orderkey", precombine = Some("ver"))
      t.read().drop("ver")
    }),

    // J1 with Debezium op codes: op='d' deletes, others upsert (S9+S10 in one merge).
    "t_merge_cdc_ops" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o)
      val dels = o.filter(col("o_orderkey") % 5 === 0).withColumn("op", lit("d"))
      val ups = o.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 111)
        .withColumn("op", lit("u"))
      t.upsert(dels.unionByName(ups), "o_orderkey", opCol = Some("op"))
      t.read()
    }),

    // J4/S10: delete-as-anti-join by key list.
    "t_delete_keys" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o)
      t.deleteKeys(o.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"), "o_orderkey")
      t.read()
    }),

    // S14 with SQL three-valued logic: NULL-predicate rows must survive.
    "t_delete_where_null" -> ((s, d) => {
      val o = tbl(s, d, "orders").withColumn("o_orderpriority",
        when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      val t = tempTable(s)
      t.overwrite(o)
      t.deleteWhere(col("o_orderpriority") === "1-URGENT")
      t.read()
    }),

    // S13: copy-on-write UPDATE ... WHERE.
    "t_update_where" -> ((s, d) => {
      val t = tempTable(s)
      t.overwrite(tbl(s, d, "orders"))
      t.updateWhere(col("o_orderstatus") === "O",
        Map("o_orderpriority" -> lit("5-LOW")))
      t.read()
    }),

    // S3: time travel to the pre-append version.
    "t_timetravel" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      val v1 = t.overwrite(o.filter(col("o_orderkey") <= 9999))
      t.append(o.filter(col("o_orderkey") > 9999))
      t.readAsOf(v1.snapshotId)
    }),

    // P6: snapshot-cutoff time travel — commit twice, then read back with
    // the FIRST commit's wall-clock instant as the cutoff (the Hudi
    // `_hoodie_commit_time <= ts` shape). Must resolve to v1, not v2.
    "t_timetravel_ts" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      val v1 = t.overwrite(o.filter(col("o_orderkey") <= 9999))
      t.append(o.filter(col("o_orderkey") > 9999))
      t.readAsOfTimestamp(v1.committedAt)
    }),

    // S4: $snapshots metadata relation (minus the wall-clock column).
    "t_snapshots_meta" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") <= 9999))
      t.append(o.filter(col("o_orderkey") > 9999))
      t.snapshotsDF.select("snapshot_id", "parent_id", "operation", "records")
    }),

    // S5/A3: commit history (rows-per-commit), wall-clock column dropped.
    "t_history" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") <= 9999))
      t.append(o.filter(col("o_orderkey") > 9999))
      t.history.select("operation", "records")
    }),

    // S16: DESCRIBE — column names + types of a catalog table.
    "t_describe" -> ((s, d) => {
      import s.implicits._
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-desc-"))
      cat.saveTable("region_t", tbl(s, d, "region"))
      cat.describe("region_t").fields.toSeq
        .map(f => (f.name, f.dataType.simpleString)).toDF("col_name", "data_type")
    }),

    // S16: SHOW TABLES over the warehouse catalog.
    "t_show_tables" -> ((s, d) => {
      import s.implicits._
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-show-"))
      cat.saveTable("orders_t", tbl(s, d, "orders").limit(10))
      cat.saveTable("region_t", tbl(s, d, "region"))
      cat.listTables().toDF("table_name")
    }),

    // S12/F8: single-row INSERT from raw form strings via type coercion.
    "t_insert_row" -> ((s, d) => {
      val t = tempTable(s)
      t.overwrite(tbl(s, d, "region"))
      t.insertRow(Map("r_regionkey" -> "99", "r_name" -> "TESTLAND"))
      t.read()
    }),

    // F7/F8/F9/F10: the driver-side glue functions, pinned against SQL
    // semantics — form-value coercion (int/double/truthy-bool/ISO timestamp
    // with Z and explicit-offset handling, raw-string fallback), the
    // identifier guard, name sanitization, and the pk heuristic, all
    // evaluated in Scala and hash-compared to the oracle's literals.
    "f_coerce" -> ((s, d) => {
      import org.apache.spark.sql.types._
      import graft.functions.{Coerce, Identifiers}
      val row = org.apache.spark.sql.Row(
        Coerce.coerce(" 42 ", IntegerType),
        Coerce.coerce("9.5", DoubleType),
        Coerce.coerce("YES", BooleanType),
        Coerce.coerce("off", BooleanType),
        // NTZ, not session-TZ TimestampType: the oracle's TIMESTAMP
        // literals are naive, and an LTZ column parquet-encodes as
        // adjusted-to-UTC — a schema mismatch at the gate (the TimestampType
        // branch of coerce stays covered by CoreSpec).
        Coerce.coerce("2026-01-02T03:04:05Z", TimestampNTZType),
        Coerce.coerce("2026-01-02T03:04:05+02:00", TimestampNTZType),
        Coerce.coerce("not a time", StringType),
        Identifiers.isValidIdent("tbl_1"),
        Identifiers.isValidIdent("1; drop tables"),
        Identifiers.sanitize("Customer Id"),
        Identifiers.findIdCol(Seq("name", "customer_id", "x")))
      val schema = StructType(Seq(
        StructField("int_val", IntegerType), StructField("dbl_val", DoubleType),
        StructField("bool_true", BooleanType), StructField("bool_false", BooleanType),
        StructField("ts_utc", TimestampNTZType), StructField("ts_offset", TimestampNTZType),
        StructField("fallback_val", StringType),
        StructField("ident_ok", BooleanType), StructField("ident_bad", BooleanType),
        StructField("sanitized", StringType), StructField("id_col", StringType)))
      s.createDataFrame(s.sparkContext.parallelize(Seq(row), 1), schema)
    }),

    // S9/F5: Hudi-style keyed CSV upsert ingest with synthesized precombine.
    "t_csv_upsert" -> ((s, d) => {
      val base = tbl(s, d, "customer").select("c_custkey", "c_name", "c_nationkey")
      val dir = Files.createTempDirectory("graft-csvup-")
      base.coalesce(1).write.option("header", "true").csv(dir.resolve("v1").toString)
      base.filter(col("c_custkey") <= 100)
        .withColumn("c_name", lit("UPDATED"))
        .coalesce(1).write.option("header", "true").csv(dir.resolve("v2").toString)
      val cat = new graft.catalog.GraftCatalog(s, dir.resolve("wh"))
      cat.ingestCsv(dir.resolve("v1").toString, "cust", mode = "upsert")
      cat.ingestCsv(dir.resolve("v2").toString, "cust", mode = "upsert")
      cat.table("cust").read().drop("current_ts")
    }),

    // S17: raw object put — the backup copy must round-trip byte-exactly
    // (read back through the CSV reader and hash-compared to the source
    // table the file was derived from). Region is 5 rows; the driver-side
    // materialization is O(small) by construction.
    "t_raw_put" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-raw-"))
      val src = Files.createTempFile("graft-src-", ".csv")
      val content = "r_regionkey,r_name\n" +
        tbl(s, d, "region").orderBy("r_regionkey").collect()
          .map(r => s"${r.get(0)},${r.get(1)}").mkString("\n")
      Files.write(src, content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val dest = cat.putRaw(src.toString, "backup.csv")
      s.read.option("header", "true").csv(dest.toString)
        .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
    }),

    // A5 (manifest tier): range read with manifest-level min/max data
    // skipping — three range-correlated appends, a window over the middle
    // one; only the matching dir's files are planned (StatsSpec asserts the
    // inputFiles set; this entry hash-checks the values).
    "t_range_pruned" -> ((s, d) => {
      val t = Q.tempTable(s)
      val ev = Q.events(s, d)
      t.overwrite(ev.filter(col("event_id") < 1000))
      t.append(ev.filter(col("event_id") >= 1000 && col("event_id") < 2000))
      t.append(ev.filter(col("event_id") >= 2000))
      t.readRange("event_id", 1200L, 1800L)
    }),

    // P2/A5: key-equality lookup with bucket pruning (scans 1 of 8 buckets).
    "t_key_lookup_pruned" -> ((s, d) => {
      val t = tempTable(s)
      t.overwriteBucketed(tbl(s, d, "orders"), "o_orderkey", 8)
      t.lookupKey(7777L)
    }),

    // P2/P5: multi-key pruned lookup — one scan over the union of the keys'
    // buckets (the driver-known-id-list semi-join shape).
    "t_key_multi_lookup" -> ((s, d) => {
      val t = tempTable(s)
      t.overwriteBucketed(tbl(s, d, "orders"), "o_orderkey", 8)
      t.lookupKeys(Seq(42L, 777L, 7777L, 9999L))
    }),

    // P1/O4/F11: SQL serving surface — catalog tables as views + semicolon
    // strip + passthrough ORDER BY (the reference's postman query shape,
    // `datalake_postman_collection.json:64`).
    "t_sql_passthrough" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-sql-"))
      cat.saveTable("products", tbl(s, d, "part"))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      session.sql("SELECT * FROM products WHERE p_retailprice > 50 ORDER BY p_retailprice DESC;")
    }),

    // MERGE INTO SQL sugar (the Hudi/Delta upsert idiom): UPDATE SET * +
    // INSERT * routes to the engine's keyed upsert; the gate reads the
    // post-merge table state.
    "t_sql_merge" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-merge-"))
      val o = tbl(s, d, "orders").select(orderCols.head, orderCols.tail: _*)
      cat.saveTable("orders_m", o.filter(col("o_orderkey") % 3 =!= 0))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("o_orderpriority", lit("9-MERGED"))
        .createOrReplaceTempView("upd")
      session.sql("MERGE INTO orders_m USING upd " +
        "ON orders_m.o_orderkey = upd.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      session.sql("SELECT * FROM orders_m ORDER BY o_orderkey")
    }),

    // MERGE with a PARTIAL SET list on the session surface: no engine-verb
    // sugar covers it, so it routes through the scratch v2 catalog and
    // Catalyst's row-level machinery (RewriteMergeIntoTable over the
    // connector's copy-on-write op) — the same execution the statement
    // gets against the `lake` catalog, now reachable on temp-view names.
    "t_sql_merge_partial" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-mpart-"))
      val o = tbl(s, d, "orders").select(orderCols.head, orderCols.tail: _*)
      cat.saveTable("orders_p", o.filter(col("o_orderkey") % 3 =!= 0))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      o.filter(col("o_orderkey") % 2 === 0).createOrReplaceTempView("updp")
      session.sql("MERGE INTO orders_p t USING updp s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice + 1000 " +
        "WHEN NOT MATCHED THEN INSERT *")
      session.sql("SELECT o_orderkey, o_totalprice FROM orders_p ORDER BY o_orderkey")
    }),

    // UPDATE / DELETE as SQL TEXT on the session surface (the reference's
    // row update, api_poc.py:755, via /query-style SQL): the statement
    // skeleton is pre-parsed, SET/WHERE expressions go through Catalyst's
    // full expression grammar, and the verbs are the engine's
    // updateWhere/deleteWhere (3VL semantics).
    "t_sql_update" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-squp-"))
      val o = tbl(s, d, "orders").select(orderCols.head, orderCols.tail: _*)
      cat.saveTable("orders_u", o)
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      session.sql("UPDATE orders_u SET o_totalprice = o_totalprice * 2, " +
        "o_orderstatus = 'U' WHERE o_orderkey % 5 = 0")
      session.sql("DELETE FROM orders_u WHERE o_orderkey % 7 = 0")
      session.sql("SELECT o_orderkey, o_totalprice, o_orderstatus " +
        "FROM orders_u ORDER BY o_orderkey")
    }),

    // P1/P2/O3: the typed read API — projection + equality filter + limit.
    "t_read_api" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-read-"))
      cat.saveTable("customer_t", tbl(s, d, "customer"))
      new graft.api.GraftSession(cat).read("customer_t",
        columns = Seq("c_custkey", "c_name", "c_acctbal"),
        filter = Some(("c_custkey", 42L)), limit = 100)
    }),

    // The dashboard composite /view: time-travel + keyword search + page.
    "t_view_page" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-view-"))
      val o = tbl(s, d, "orders")
      val t = cat.saveTable("orders_v", o.filter(col("o_orderkey") <= 9999))
      t.append(o.filter(col("o_orderkey") > 9999))
      // search "O" hits o_orderstatus via the multi-column LIKE fallback;
      // snapshot 1 pins the pre-append version; newest-first page of 100.
      new graft.api.GraftSession(cat)
        .view("orders_v", search = Some("O"), snapshotId = Some(1L), pageSize = 100)
    }),

    // S3 via SQL: `VERSION AS OF` time-travel sugar through the SQL surface.
    "t_sql_timetravel" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-sqltt-"))
      val o = tbl(s, d, "orders")
      val t = cat.saveTable("orders_tt", o.filter(col("o_orderkey") <= 9999))
      t.append(o.filter(col("o_orderkey") > 9999))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      session.sql("SELECT * FROM orders_tt VERSION AS OF 1;")
    }),

    // A2 via SQL: the reference's own verify query shape (`run_verify.bat:3`).
    "t_sql_group" -> ((s, d) => {
      val cat = new graft.catalog.GraftCatalog(s,
        Files.createTempDirectory("graft-sql-"))
      cat.saveTable("transactions_t", tbl(s, d, "orders"))
      val session = new graft.api.GraftSession(cat)
      session.refreshViews()
      session.sql("SELECT count(*) AS total_records, o_orderstatus FROM transactions_t GROUP BY o_orderstatus;")
    }),

    // J2 cell-level: per-cell old → new values for modified rows.
    "t_diff_cells" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      val v1 = t.overwrite(o.filter(col("o_orderkey") % 4 =!= 1))
      t.upsert(o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 7), "o_orderkey")
      val v3 = t.deleteKeys(o.filter(col("o_orderkey") % 5 === 0)
        .select("o_orderkey"), "o_orderkey")
      t.diffCells(v3.snapshotId, v1.snapshotId, "o_orderkey")
        .select(col("o_orderkey"), col("column").as("col_name"),
          col("old_value").cast("double").as("old_price"),
          col("new_value").cast("double").as("new_price"))
    }),

    // J2: snapshot diff across upsert + delete commits.
    "t_diff" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      val v1 = t.overwrite(o.filter(col("o_orderkey") % 4 =!= 1))
      t.upsert(o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 7), "o_orderkey")
      val v3 = t.deleteKeys(o.filter(col("o_orderkey") % 5 === 0)
        .select("o_orderkey"), "o_orderkey")
      t.diff(v3.snapshotId, v1.snapshotId, "o_orderkey")
        .withColumn("changed_cols", array_join(col("changed_columns"), ","))
        .drop("changed_columns")
    }),

    // Lifecycle: rollback to a pre-upsert snapshot — metadata-only commit,
    // the head re-reads the target's exact dir set.
    "t_rollback" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      val v1 = t.overwrite(o.filter(col("o_orderkey") <= 9999))
      t.upsert(o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000), "o_orderkey")
      t.rollback(v1.snapshotId)
      t.read()
    }),

    // Lifecycle: explicit snapshot expiry + immediate storage reclaim —
    // the superseded v1 dir is deleted from disk (LifecycleSpec asserts the
    // physical delete); the retained head still reads everything.
    "t_expire" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") <= 5000))
      t.overwrite(o)
      t.expireSnapshots(1)
      t.read()
    }),

    // Layout: range clustering — rewrite as range-contiguous sorted dirs so
    // a window read plans ~1/targetDirs of the table (LifecycleSpec asserts
    // the dir pruning; this entry hash-checks the window's values).
    "t_cluster_range" -> ((s, d) => {
      val t = tempTable(s)
      t.overwrite(events(s, d))
      t.cluster(Seq("event_id"), 8)
      t.readRange("event_id", 200L, 780L)
    }),

    // Layout: Z-ORDER clustering on two columns — the window here is on the
    // SECOND dimension, which a single-column sort could not prune.
    "t_zorder_range" -> ((s, d) => {
      val t = tempTable(s)
      t.overwrite(events(s, d))
      t.cluster(Seq("user_id", "event_id"), 16)
      t.readRange("user_id", 3L, 9L)
    }),

    // Layout: 2-D box read over the Z-ordered layout — manifest skipping on
    // BOTH bounded columns at once (multiplicative pruning).
    "t_zorder_box" -> ((s, d) => {
      val t = tempTable(s)
      t.overwrite(events(s, d))
      t.cluster(Seq("user_id", "event_id"), 16)
      t.readBox(Seq("user_id" -> (3L, 9L), "event_id" -> (200L, 800L)))
    }),

    // Governed writes: branch at head, stage an upsert on the branch
    // (main is isolated from it — BranchSpec asserts that), publish the
    // branch back to main as one atomic fast-forward commit (WAP). The
    // gate hash-checks the POST-publish main state.
    "t_branch_wap" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
      val t = tempTable(s)
      t.overwrite(o)
      t.createBranch("audit")
      t.branch("audit").upsert(
        o.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderpriority", lit("8-BRANCH")), "o_orderkey")
      t.publishBranch("audit")
      t.read()
    }),

    // Governed writes: tag a snapshot, advance the table, expire every
    // untagged snapshot — the tag pins its manifest AND its data dirs, so
    // the tagged read still answers exactly.
    "t_tag_read" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") <= 8000))
      t.createTag("release")
      t.overwrite(o)
      t.expireSnapshots(1)
      t.readTag("release")
    }),

    // Metadata-only aggregates: count(*) + min/max answered from the
    // manifest's per-dir records and column statistics — zero data I/O
    // (MetaStatsSpec proves the path by deleting a data file first). The
    // oracle recomputes the same aggregates by scanning.
    "t_meta_stats" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val t = tempTable(s)
      t.append(o.filter(col("o_orderkey") % 2 === 0))
      t.append(o.filter(col("o_orderkey") % 2 =!= 0))
      t.statsSummary(Seq("o_orderkey", "o_orderdate"))
    }),

    // Governed writes: CHECK-constraint ingest with quarantine — accepted
    // rows land in the table, violating rows in the side quarantine table,
    // nothing is dropped. ANSI CHECK semantics (NULL passes).
    "t_expect_split" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
      val cat = new graft.catalog.GraftCatalog(
        s, Files.createTempDirectory("graft-gov-"))
      val t = cat.createTable("orders_gov", o.schema,
        constraint = Some("o_totalprice <= 250000"))
      t.appendExpect(o)
      t.read().withColumn("disposition", lit("ok"))
        .unionByName(t.quarantineTable.read().drop("__rule")
          .withColumn("disposition", lit("quarantine")))
    }),

    // Change feed over copy-on-write history: append → pure inserts,
    // keyed upsert → update_pre/update_post pairs (net effect only — the
    // untouched rows the rewrite carried emit nothing), delete → preimages.
    // The oracle reconstructs the exact expected change set per commit.
    "t_changes_feed" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") <= 8000)) // v1
      t.append(o.filter(col("o_orderkey") > 8000 && col("o_orderkey") <= 9000)) // v2
      t.upsert(o.filter(col("o_orderkey") <= 9000 && col("o_orderkey") % 5 === 0)
        .withColumn("o_orderpriority", lit("7-CHANGED")), "o_orderkey") // v3
      t.deleteKeys(o.filter(col("o_orderkey") <= 9000 && col("o_orderkey") % 100 === 0)
        .select("o_orderkey"), "o_orderkey") // v4
      t.changesBetween(1, 4, "o_orderkey")
    }),

    // Change feed over a merge-on-read delta commit: post-images from the
    // delta dir, pre-images resolved against the parent via broadcast-keys
    // semi joins, tombstones (`op = 'd'`) as deletes — a tombstone for an
    // absent key deletes nothing.
    "t_changes_mor" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
      val t = tempTable(s)
      t.overwriteBucketed(o.filter(col("o_orderkey") <= 8000), "o_orderkey", 4) // v1
      val batch = o.filter(col("o_orderkey") <= 9000 && col("o_orderkey") % 7 === 0)
        .withColumn("o_orderpriority", lit("7-MOR"))
        .withColumn("__action", when(col("o_orderkey") % 21 === 0, lit("d"))
          .otherwise(lit(null).cast("string")))
      t.upsertDeferred(batch, "o_orderkey", opCol = Some("__action")) // v2
      t.changesSince(1, "o_orderkey")
    }),

    // TABLE_CHANGES SQL sugar (Delta's CDF table-valued-function shape):
    // the change feed reached from plain SQL through GraftSession.sql's
    // outside-literals rewrite, composing with ordinary projections.
    "t_sql_changes" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
      val cat = new graft.catalog.GraftCatalog(
        s, Files.createTempDirectory("graft-sqlch-"))
      val t = cat.saveTable("orders_ch", o.filter(col("o_orderkey") <= 8000)) // v1
      t.append(o.filter(col("o_orderkey") > 8000 && col("o_orderkey") <= 9000)) // v2
      t.deleteKeys(o.filter(col("o_orderkey") % 100 === 0)
        .select("o_orderkey"), "o_orderkey") // v3
      new graft.api.GraftSession(cat).sql(
        "SELECT * FROM TABLE_CHANGES('orders_ch', 1, 3, 'o_orderkey')")
    }),

    // Bloom-filter skipping index: equality read on a NON-layout column
    // (o_custkey is neither the bucket key nor range-clustered) through
    // per-dir blooms — one dir indexed at build time, one covered by an
    // incremental refresh. BloomIndexSpec asserts the pruning; the oracle
    // hash-checks that pruning never loses a row.
    "t_bloom_point" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") % 3 === 0))
      t.append(o.filter(col("o_orderkey") % 3 === 1))
      t.buildBloomIndex("o_custkey")
      t.append(o.filter(col("o_orderkey") % 3 === 2))
      t.refreshBloomIndex("o_custkey")
      t.readPoint("o_custkey", 41L)
    }),

    // The `graft-changes` STREAMING source driven through the real
    // micro-batch engine: the stream starts at version 1, then three
    // commits land while it runs, consumed incrementally into a memory
    // sink (two ticks — ChangeFeedStreamSpec asserts per-commit batch
    // boundaries; here the oracle hash-checks that what the STREAM
    // delivered is exactly the batch feed's change set).
    "t_feed_stream" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") <= 8000)) // v1
      val sink = "feed_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.format("graft-changes")
        .option("path", t.root.toString).option("pk", "o_orderkey")
        .option("startingVersion", "1").load()
        .writeStream.format("memory").queryName(sink).start()
      try {
        t.append(o.filter(col("o_orderkey") > 8000 && col("o_orderkey") <= 9000)) // v2
        q.processAllAvailable()
        t.upsert(o.filter(col("o_orderkey") <= 9000 && col("o_orderkey") % 5 === 0)
          .withColumn("o_orderpriority", lit("7-STREAM")), "o_orderkey") // v3
        t.deleteKeys(o.filter(col("o_orderkey") <= 9000 && col("o_orderkey") % 100 === 0)
          .select("o_orderkey"), "o_orderkey") // v4
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink)
    }),

    // Incrementally-refreshed materialized aggregate: count + sum per group
    // maintained from the change feed (insert-only window, then a mixed
    // upsert+delete window) — never recomputed from the base. The oracle is
    // the full GROUP BY over the equivalent final state. Sums run over a
    // DECIMAL(18,2) column so incremental and single-pass addition agree
    // exactly; the final cast to double mirrors the oracle's.
    "t_mv_refresh" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(orderCols.map(col): _*)
        .withColumn("price_d", dec(col("o_totalprice")))
      val t = tempTable(s)
      t.overwrite(o.filter(col("o_orderkey") <= 8000)) // v1
      val mv = new graft.table.MaterializedAgg(t, "by_status", "o_orderkey",
        Seq("o_orderstatus"), Seq("price_d"))
      mv.create()
      t.append(o.filter(col("o_orderkey") > 8000)) // v2
      mv.refresh()
      t.upsert(o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("price_d", dec(col("o_totalprice"))), "o_orderkey") // v3
      t.deleteKeys(o.filter(col("o_orderkey") % 10 === 0)
        .select("o_orderkey"), "o_orderkey") // v4
      mv.refresh()
      mv.read().select(col("o_orderstatus"), col("cnt"),
        col("price_d_sum").cast("double").as("price_sum"))
    }))

  val oracles: Map[String, String] = Map(
    "t_ingest_scan" -> "SELECT * FROM orders",
    "t_csv_roundtrip" -> "SELECT * FROM region",
    "t_append_evolve" ->
      """SELECT c_custkey, c_name, c_nationkey, CAST(NULL AS DOUBLE) AS c_acctbal FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_custkey <= 750""".stripMargin,
    "t_upsert" ->
      s"""SELECT $orderColsSql FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000 AS o_totalprice,
         |       o_orderdate, '9-UPSERTED' AS o_orderpriority
         |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,
    "t_upsert_bucketed" ->
      s"""SELECT $orderColsSql FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000 AS o_totalprice,
         |       o_orderdate, '9-UPSERTED' AS o_orderpriority
         |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,
    "t_upsert_mor" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 5 <> 0""".stripMargin,
    "t_upsert_precombine" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 500 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'P2' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders""".stripMargin,
    "t_merge_cdc_ops" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 111 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 5 <> 0""".stripMargin,
    "t_delete_keys" ->
      "SELECT * FROM orders WHERE o_orderkey % 5 <> 0",
    "t_delete_where_null" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders)
        |SELECT * FROM base WHERE NOT coalesce(o_orderpriority = '1-URGENT', false)""".stripMargin,
    "t_update_where" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderstatus = 'O' THEN '5-LOW' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders""".stripMargin,
    "t_timetravel" ->
      "SELECT * FROM orders WHERE o_orderkey <= 9999",
    "t_timetravel_ts" ->
      "SELECT * FROM orders WHERE o_orderkey <= 9999",
    "t_snapshots_meta" ->
      """SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(NULL AS BIGINT) AS parent_id,
        |  'overwrite' AS operation, (SELECT count(*) FROM orders WHERE o_orderkey <= 9999) AS records
        |UNION ALL
        |SELECT 2, 1, 'append', (SELECT count(*) FROM orders)""".stripMargin,
    "t_history" ->
      """SELECT 'overwrite' AS operation, (SELECT count(*) FROM orders WHERE o_orderkey <= 9999) AS records
        |UNION ALL
        |SELECT 'append', (SELECT count(*) FROM orders)""".stripMargin,
    "t_show_tables" ->
      "SELECT 'orders_t' AS table_name UNION ALL SELECT 'region_t'",
    "t_describe" ->
      """SELECT 'r_regionkey' AS col_name, 'int' AS data_type
        |UNION ALL SELECT 'r_name', 'string'""".stripMargin,
    "t_insert_row" ->
      """SELECT * FROM region
        |UNION ALL SELECT 99 AS r_regionkey, 'TESTLAND' AS r_name""".stripMargin,
    "f_coerce" ->
      """SELECT CAST(42 AS INTEGER) AS int_val, CAST(9.5 AS DOUBLE) AS dbl_val,
        |  true AS bool_true, false AS bool_false,
        |  TIMESTAMP '2026-01-02 03:04:05' AS ts_utc,
        |  TIMESTAMP '2026-01-02 01:04:05' AS ts_offset,
        |  'not a time' AS fallback_val,
        |  true AS ident_ok, false AS ident_bad,
        |  'Customer_Id' AS sanitized, 'customer_id' AS id_col""".stripMargin,
    "t_csv_upsert" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey <= 100 THEN 'UPDATED' ELSE c_name END AS c_name,
        |  c_nationkey
        |FROM customer""".stripMargin,
    "t_raw_put" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region",
    "t_range_pruned" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events WHERE event_id BETWEEN 1200 AND 1800""".stripMargin,
    "t_rollback" ->
      "SELECT * FROM orders WHERE o_orderkey <= 9999",
    "t_expire" ->
      "SELECT * FROM orders",
    "t_cluster_range" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events WHERE event_id BETWEEN 200 AND 780""".stripMargin,
    "t_zorder_range" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events WHERE user_id BETWEEN 3 AND 9""".stripMargin,
    "t_zorder_box" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events WHERE user_id BETWEEN 3 AND 9 AND event_id BETWEEN 200 AND 800""".stripMargin,
    "t_branch_wap" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |  CASE WHEN o_orderkey % 7 = 0 THEN '8-BRANCH' ELSE o_orderpriority END AS o_orderpriority
         |FROM orders""".stripMargin,
    "t_tag_read" ->
      "SELECT * FROM orders WHERE o_orderkey <= 8000",
    "t_meta_stats" ->
      """SELECT count(*) AS cnt,
        |  min(o_orderkey) AS o_orderkey_min, max(o_orderkey) AS o_orderkey_max,
        |  min(o_orderdate) AS o_orderdate_min, max(o_orderdate) AS o_orderdate_max
        |FROM orders""".stripMargin,
    "t_expect_split" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |  CASE WHEN coalesce(o_totalprice <= 250000, TRUE) THEN 'ok' ELSE 'quarantine' END AS disposition
        |FROM orders""".stripMargin,
    "t_changes_feed" ->
      s"""SELECT $orderColsSql, CAST('insert' AS VARCHAR) AS _change_type,
         |  CAST(2 AS BIGINT) AS _commit_version
         |FROM orders WHERE o_orderkey > 8000 AND o_orderkey <= 9000
         |UNION ALL
         |SELECT $orderColsSql, 'update_pre', CAST(3 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 9000 AND o_orderkey % 5 = 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |  '7-CHANGED', 'update_post', CAST(3 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 9000 AND o_orderkey % 5 = 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |  '7-CHANGED', 'delete', CAST(4 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 9000 AND o_orderkey % 100 = 0""".stripMargin,
    "t_changes_mor" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |  CAST('7-MOR' AS VARCHAR) AS o_orderpriority,
         |  CAST('insert' AS VARCHAR) AS _change_type, CAST(2 AS BIGINT) AS _commit_version
         |FROM orders WHERE o_orderkey > 8000 AND o_orderkey <= 9000
         |  AND o_orderkey % 7 = 0 AND o_orderkey % 21 <> 0
         |UNION ALL
         |SELECT $orderColsSql, 'update_pre', CAST(2 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 8000 AND o_orderkey % 7 = 0 AND o_orderkey % 21 <> 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |  '7-MOR', 'update_post', CAST(2 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 8000 AND o_orderkey % 7 = 0 AND o_orderkey % 21 <> 0
         |UNION ALL
         |SELECT $orderColsSql, 'delete', CAST(2 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 8000 AND o_orderkey % 21 = 0""".stripMargin,
    "t_bloom_point" ->
      s"SELECT $orderColsSql FROM orders WHERE o_custkey = 41",
    "t_sql_changes" ->
      s"""SELECT $orderColsSql, CAST('insert' AS VARCHAR) AS _change_type,
         |  CAST(2 AS BIGINT) AS _commit_version
         |FROM orders WHERE o_orderkey > 8000 AND o_orderkey <= 9000
         |UNION ALL
         |SELECT $orderColsSql, 'delete', CAST(3 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 9000 AND o_orderkey % 100 = 0""".stripMargin,
    "t_feed_stream" ->
      s"""SELECT $orderColsSql, CAST('insert' AS VARCHAR) AS _change_type,
         |  CAST(2 AS BIGINT) AS _commit_version
         |FROM orders WHERE o_orderkey > 8000 AND o_orderkey <= 9000
         |UNION ALL
         |SELECT $orderColsSql, 'update_pre', CAST(3 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 9000 AND o_orderkey % 5 = 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |  '7-STREAM', 'update_post', CAST(3 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 9000 AND o_orderkey % 5 = 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |  '7-STREAM', 'delete', CAST(4 AS BIGINT)
         |FROM orders WHERE o_orderkey <= 9000 AND o_orderkey % 100 = 0""".stripMargin,
    "t_mv_refresh" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |                     ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM orders WHERE o_orderkey % 10 <> 0
        |GROUP BY o_orderstatus""".stripMargin,
    "t_key_lookup_pruned" ->
      "SELECT * FROM orders WHERE o_orderkey = 7777",
    "t_key_multi_lookup" ->
      "SELECT * FROM orders WHERE o_orderkey IN (42, 777, 7777, 9999)",
    "t_sql_passthrough" ->
      "SELECT * FROM part WHERE p_retailprice > 50",
    "t_sql_update" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 5 = 0 THEN 'U'
                ELSE o_orderstatus END AS o_orderstatus
         FROM orders WHERE NOT (o_orderkey % 7 = 0)
         ORDER BY o_orderkey""",
    "t_sql_merge" ->
      """WITH upd AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 1000 AS o_totalprice, o_orderdate,
                  '9-MERGED' AS o_orderpriority
           FROM orders WHERE o_orderkey % 2 = 0)
         SELECT * FROM upd
         UNION ALL
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders
         WHERE o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0
         ORDER BY o_orderkey""",
    "t_sql_merge_partial" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 2 = 0
                THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice
         FROM orders
         WHERE o_orderkey % 3 <> 0 OR o_orderkey % 2 = 0
         ORDER BY o_orderkey""",
    "t_read_api" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
    "t_view_page" ->
      """SELECT * FROM orders
        |WHERE o_orderkey <= 9999
        |  AND (CAST(o_orderkey AS VARCHAR) LIKE '%O%' OR o_orderstatus LIKE '%O%'
        |    OR o_orderpriority LIKE '%O%')
        |ORDER BY o_orderkey DESC LIMIT 100""".stripMargin,
    "t_sql_timetravel" ->
      "SELECT * FROM orders WHERE o_orderkey <= 9999",
    "t_sql_group" ->
      "SELECT count(*) AS total_records, o_orderstatus FROM orders GROUP BY o_orderstatus",
    "t_diff_cells" ->
      """SELECT o_orderkey, 'o_totalprice' AS col_name,
        |  o_totalprice AS old_price, o_totalprice + 7 AS new_price
        |FROM orders
        |WHERE o_orderkey % 4 <> 1 AND o_orderkey % 5 <> 0 AND o_orderkey % 3 = 0""".stripMargin,
    "t_diff" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 4 = 1 THEN 'NEW'
        |       WHEN o_orderkey % 5 = 0 THEN 'DELETED'
        |       WHEN o_orderkey % 3 = 0 THEN 'MODIFIED'
        |       ELSE 'UNCHANGED' END AS change_type,
        |  CASE WHEN o_orderkey % 4 <> 1 AND o_orderkey % 5 <> 0 AND o_orderkey % 3 = 0
        |       THEN 'o_totalprice' ELSE '' END AS changed_cols
        |FROM orders
        |WHERE o_orderkey % 4 <> 1 OR (o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0)""".stripMargin)
}
