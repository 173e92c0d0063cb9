package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ConnectorQueries
import graft.table.GraftTable

/**
 * DataSource-v2 connector + storage-partitioned join guards: the shuffle
 * ELISION the gate's value compare cannot see. A join or bucket-key
 * aggregation between co-bucketed graft tables read through
 * [[graft.connector.GraftSparkCatalog]] must plan with ZERO shuffle
 * exchanges — at 100 TB per side the exchange IS the join's cost, and the
 * connector's whole reason to exist is removing it by layout contract.
 */
class SpjSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  /** Runs `body` with broadcast joins and AQE coalescing pinned off so the
    * executed plan exposes exchanges deterministically. */
  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Exchange nodes in the FINAL adaptive plan (collect() first). */
  private def shuffleCount(df: DataFrame): Int = {
    df.collect()
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    fmt.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
  }

  private def freshCat(): (String, java.nio.file.Path) = {
    val cat = ConnectorQueries.tempCatalog(spark)
    (cat, java.nio.file.Paths.get(
      spark.conf.get(s"spark.sql.catalog.$cat.warehouse")))
  }

  test("co-bucketed join through the v2 catalog plans with zero shuffles") {
    val (cat, _) = freshCat()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "orders", orders, "o_orderkey", 8)
    ConnectorQueries.ingestBucketed(spark, cat, "lineitem", li, "l_orderkey", 8)
    noBroadcast {
      val joined = spark.table(s"$cat.orders")
        .join(spark.table(s"$cat.lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_orderstatus", "l_quantity")
      assert(shuffleCount(joined) == 0,
        s"storage-partitioned join must elide both exchanges:\n" +
          joined.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      // And the elided plan returns exactly the plain join's rows.
      val expected = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_orderstatus", "l_quantity")
      assert(joined.count() == expected.count())
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    }
  }

  test("SPJ and bucket pruning survive a metadata-only bucket-key rename") {
    val (cat, wh) = freshCat()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "orders", orders, "o_orderkey", 8)
    ConnectorQueries.ingestBucketed(spark, cat, "lineitem", li, "l_orderkey", 8)
    val gt = new graft.catalog.GraftCatalog(spark, wh).table("orders")
    val dirsBefore = gt.log.latest().get.dataDirs.toSet
    spark.sql(s"ALTER TABLE $cat.orders RENAME COLUMN o_orderkey TO okey")
    // Metadata-only: zero data-dir changes.
    assert(gt.log.latest().get.dataDirs.toSet == dirsBefore)
    noBroadcast {
      // Co-bucketed join under the NEW key name still elides both
      // exchanges — partitioning() reports the logical name, the bucket
      // function resolves it, KeyGroupedPartitioning holds.
      val joined = spark.table(s"$cat.orders")
        .join(spark.table(s"$cat.lineitem"), col("okey") === col("l_orderkey"))
        .select("okey", "o_orderstatus", "l_quantity")
      assert(shuffleCount(joined) == 0,
        "SPJ must survive a bucket-key rename:\n" +
          joined.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      val expected = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey").as("okey"), col("o_orderstatus"), col("l_quantity"))
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    }
    // Static bucket pruning on the renamed key plans 1 of 8 partitions.
    val probe = spark.table(s"$cat.orders").filter(col("okey") === 42L)
    val n = probe.rdd.getNumPartitions
    assert(n <= 1, s"expected <=1 planned partition after rename-key filter, got $n")
    assert(probe.count() == orders.filter(col("o_orderkey") === 42).count())
  }

  test("bucket-key aggregation through the v2 scan plans with zero shuffles") {
    val (cat, _) = freshCat()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "li", li, "l_orderkey", 8)
    noBroadcast {
      val agg = spark.table(s"$cat.li")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      assert(shuffleCount(agg) == 0,
        "bucket-key aggregation must not exchange:\n" +
          agg.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      val expected = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      assert(agg.exceptAll(expected).isEmpty && expected.exceptAll(agg).isEmpty)
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val (cat, _) = freshCat()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "o8", orders, "o_orderkey", 8)
    ConnectorQueries.ingestBucketed(spark, cat, "l16", li, "l_orderkey", 16)
    noBroadcast {
      val joined = spark.table(s"$cat.o8")
        .join(spark.table(s"$cat.l16"), col("o_orderkey") === col("l_orderkey"))
      val expected = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() == expected.count())
    }
  }

  test("filter and projection push into the v2 scan") {
    val (cat, _) = freshCat()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "orders", orders, "o_orderkey", 8)
    val df = spark.table(s"$cat.orders")
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a v2 BatchScan")
    // Projection reached the reader: the scan outputs only the 2 columns.
    assert(scans.head.output.map(_.name).toSet == Set("o_orderkey", "o_totalprice"))
    // Predicate reached the scan (reported through Scan.description).
    assert(scans.head.scan.description().contains("o_totalprice"),
      s"pushed filter missing from: ${scans.head.scan.description()}")
    // Values match the plain read.
    val expected = orders.filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
  }

  test("schema evolution: old files null-fill through the v2 reader") {
    val (cat, wh) = freshCat()
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val t = new graft.catalog.GraftCatalog(spark, wh).materialized("cust")
    t.overwriteBucketed(c.select("c_custkey", "c_name"), "c_custkey", 4)
    t.append(c.filter(col("c_custkey") <= 100)
      .select("c_custkey", "c_name", "c_acctbal"))
    val viaV2 = spark.table(s"$cat.cust")
    val viaTable = t.read()
    assert(viaV2.schema.fieldNames.toSeq == viaTable.schema.fieldNames.toSeq)
    assert(viaV2.exceptAll(viaTable).isEmpty && viaTable.exceptAll(viaV2).isEmpty)
    // Old rows carry NULL for the evolved column on both paths.
    assert(viaV2.filter(col("c_acctbal").isNull).count() ==
      viaTable.filter(col("c_acctbal").isNull).count())
  }

  test("the v2 scan resolves pending MOR deltas exactly like GraftTable.read") {
    val (cat, wh) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val t = new graft.catalog.GraftCatalog(spark, wh).materialized("mor")
    t.overwriteBucketed(o, "o_orderkey", 4)
    // A three-commit chain: updates, tombstones, and an append landing on
    // the pending chain (duplicate-capable seq ties).
    t.upsertDeferred(o.filter(col("o_orderkey") <= 50)
      .withColumn("o_totalprice", lit(1.0)), "o_orderkey")
    t.upsertDeferred(o.filter(col("o_orderkey").between(51, 60))
      .withColumn("op", lit("d")), "o_orderkey", opCol = Some("op"))
    t.upsertDeferred(o.filter(col("o_orderkey").between(20, 30))
      .withColumn("o_totalprice", lit(2.0)), "o_orderkey")
    val viaV2 = spark.table(s"$cat.mor")
    val viaTable = t.read()
    assert(viaV2.count() == viaTable.count())
    assert(viaV2.exceptAll(viaTable).isEmpty && viaTable.exceptAll(viaV2).isEmpty)
    assert(viaV2.filter(col("o_totalprice") === 2.0).count() == 11)
    assert(viaV2.filter(col("o_orderkey").between(51, 60)).count() == 0)
    // The chain stays key-grouped: the co-bucketed self-join is still
    // exchange-free UNDER pending deltas.
    noBroadcast {
      ConnectorQueries.ingestBucketed(spark, cat, "dim",
        o.select("o_orderkey", "o_orderpriority"), "o_orderkey", 4)
      val joined = spark.table(s"$cat.mor")
        .join(spark.table(s"$cat.dim"), "o_orderkey")
      assert(shuffleCount(joined) == 0,
        "SPJ must hold mid-ingest:\n" + joined.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      assert(joined.count() == viaTable.count())
    }
    // Over the per-bucket byte cap the scan refuses loudly, never stale.
    sys.props(graft.connector.GraftSparkTable.MorDeltaMaxBytesProp) = "10"
    try {
      val e = intercept[Exception](spark.table(s"$cat.mor").collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("compact") || m.contains("delta")), s"got: $e")
    } finally sys.props.remove(graft.connector.GraftSparkTable.MorDeltaMaxBytesProp)
    // compact() folds the chain; the plain columnar scan serves the result.
    t.compact()
    val merged = spark.table(s"$cat.mor")
    assert(merged.filter(col("o_totalprice") === 2.0).count() == 11)
    assert(merged.count() == viaTable.count())
  }

  test("CREATE TABLE ... PARTITIONED BY (bucket(n, col)) round-trips via SQL") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.n (n_nationkey BIGINT, n_name STRING) " +
      "PARTITIONED BY (bucket(4, n_nationkey))")
    val gt = new graft.catalog.GraftCatalog(spark, wh).table("n")
    assert(gt.bucketSpec.contains(("n_nationkey", 4)))
    gt.append(spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name"))
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.n").head().getLong(0) ==
      spark.read.parquet(s"$sf/nation.parquet").count())
    // SHOW TABLES surfaces it; DROP removes it.
    val listed = spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1))
    assert(listed.contains("n"))
    spark.sql(s"DROP TABLE $cat.n")
    assert(!Files.isDirectory(wh.resolve("n").resolve("_log")))
  }

  test("a bucket-key point filter prunes the v2 scan to one partition") {
    val (cat, _) = freshCat()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "orders", orders, "o_orderkey", 8)
    val df = spark.table(s"$cat.orders").filter(col("o_orderkey") === 777L)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.inputPartitions.length == 1,
      s"point filter must plan ONE bucket partition, got ${scans.head.inputPartitions.length}")
    assert(df.count() == orders.filter(col("o_orderkey") === 777L).count())
    // IN-list prunes to the union; a non-key filter keeps all 8.
    val in = spark.table(s"$cat.orders")
      .filter(col("o_orderkey").isin(777L, 7777L))
    in.collect()
    val inParts = in.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.length
    assert(inParts <= 2 && inParts >= 1)
    val all = spark.table(s"$cat.orders").filter(col("o_totalprice") > 0)
    all.collect()
    val allParts = all.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.length
    assert(allParts == 8, s"non-key predicates must not prune, got $allParts")
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin v2 reads to a snapshot") {
    val (cat, wh) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val t = new graft.catalog.GraftCatalog(spark, wh).materialized("tt")
    t.overwriteBucketed(o.filter(col("o_orderkey") <= 1000), "o_orderkey", 4)
    val v1 = t.latestVersion
    val tsAfterV1 = java.time.Instant.now().toString
    Thread.sleep(5)
    t.append(o.filter(col("o_orderkey") > 1000))
    val n1 = o.filter(col("o_orderkey") <= 1000).count()
    assert(spark.sql(s"SELECT * FROM $cat.tt VERSION AS OF $v1").count() == n1)
    assert(spark.sql(s"SELECT * FROM $cat.tt").count() == o.count())
    assert(spark.sql(
      s"SELECT * FROM $cat.tt TIMESTAMP AS OF '$tsAfterV1'").count() == n1)
    // Unknown snapshot id fails loudly, not empty.
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.tt VERSION AS OF 999").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("999")), s"got: $e")
  }

  test("INSERT INTO / INSERT OVERWRITE / writeTo flow through the v1 bridge") {
    val (cat, wh) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "w",
      o.filter(col("o_orderkey") <= 1000), "o_orderkey", 4)
    val gt = new graft.catalog.GraftCatalog(spark, wh).table("w")
    val base = spark.table(s"$cat.w").count()
    // SQL INSERT INTO appends through the commit protocol.
    spark.sql(s"INSERT INTO $cat.w SELECT * FROM parquet.`$sf/orders.parquet` " +
      "WHERE o_orderkey BETWEEN 1001 AND 1200")
    val afterInsert = spark.table(s"$cat.w").count()
    assert(afterInsert == base + o.filter(
      col("o_orderkey").between(1001, 1200)).count())
    // DataFrame writeTo(...).append().
    o.filter(col("o_orderkey").between(1201, 1300)).writeTo(s"$cat.w").append()
    assert(spark.table(s"$cat.w").count() ==
      afterInsert + o.filter(col("o_orderkey").between(1201, 1300)).count())
    // INSERT OVERWRITE replaces and PRESERVES the bucket layout.
    spark.sql(s"INSERT OVERWRITE $cat.w SELECT * FROM parquet.`$sf/orders.parquet`")
    assert(spark.table(s"$cat.w").count() == o.count())
    assert(gt.bucketSpec.contains(("o_orderkey", 4)),
      s"overwrite must keep the bucket spec, got ${gt.bucketSpec}")
    // A snapshot-pinned handle refuses writes.
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.w VERSION AS OF 1 SELECT * FROM parquet.`$sf/orders.parquet`"))
    assert(e != null)
  }

  test("count/min/max push down to the manifest — no aggregate, no file scan") {
    val (cat, wh) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val t = new graft.catalog.GraftCatalog(spark, wh).materialized("o")
    t.overwriteBucketed(o.filter(col("o_orderkey") <= 1000), "o_orderkey", 4)
    t.append(o.filter(col("o_orderkey") > 1000)) // multi-commit stat fold
    val df = spark.sql(s"SELECT count(*) AS cnt, min(o_orderkey) AS mn, " +
      s"max(o_orderkey) AS mx FROM $cat.o")
    val row = df.head()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("metadata-aggregate") && !p.contains("HashAggregate"),
      s"aggregate must complete-push to metadata:\n$p")
    assert(row.getLong(0) == o.count())
    assert(row.getLong(1) == o.agg(min("o_orderkey")).head.getLong(0))
    assert(row.getLong(2) == o.agg(max("o_orderkey")).head.getLong(0))
    // A column outside the stats harvest declines: the fallback plan
    // aggregates a real scan and stays correct.
    val fb = spark.sql(s"SELECT max(o_totalprice) AS mx FROM $cat.o")
    assert(fb.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(fb.head.getDouble(0) == o.agg(max("o_totalprice")).head.getDouble(0))
    // A filter above the aggregate declines the metadata path too.
    val filt = spark.sql(
      s"SELECT count(*) AS c FROM $cat.o WHERE o_orderkey > 1000")
    assert(filt.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(filt.head.getLong(0) == o.filter(col("o_orderkey") > 1000).count())
  }

  test("join-derived runtime filtering prunes fact buckets dynamically") {
    val (cat, _) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "fact", o, "o_orderkey", 8)
    // Two keys KNOWN to share a bucket, written to an opaque parquet dim so
    // the optimizer cannot fold them into a static pushdown — only the
    // runtime (DPP) path can prune.
    import org.apache.spark.sql.types.LongType
    val keys = o.select("o_orderkey").limit(500).collect().map(_.getLong(0))
    val b0 = graft.plans.BucketHash.bucketId(keys.head, LongType, 8, "UTC")
    val k2 = keys.tail.find(k =>
      graft.plans.BucketHash.bucketId(k, LongType, 8, "UTC") == b0).get
    val dimPath = TestSpark.tmpDir("dpp-").resolve("dim").toString
    import spark.implicits._
    Seq(keys.head, k2).toDF("k").write.parquet(dimPath)
    // DPP only inserts when the build side carries a selective predicate.
    val dim = spark.read.parquet(dimPath).filter(col("k") > Long.MinValue)
    val df = spark.table(s"$cat.fact").join(dim, col("o_orderkey") === col("k"))
    assert(df.count() == 2)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b } ++
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
        }.flatten
    val bs = scans(df.queryExecution.executedPlan)
    assert(bs.nonEmpty && bs.head.runtimeFilters.nonEmpty,
      "expected a runtime (dynamic pruning) filter on the v2 scan")
    // The scan's runtime filter() translated the join keys to exactly the
    // one shared bucket (BatchScanExec replans partitions through it; the
    // public `partitions` accessor predates the filter, hence the hook).
    assert(graft.connector.GraftScan.lastRuntimeKept.contains(Set(b0)),
      s"runtime prune kept ${graft.connector.GraftScan.lastRuntimeKept}, expected Set($b0)")
    // (BatchScanExec replans input partitions through filter() — Spark's
    // own machinery from here; values were asserted above.)
  }

  test("the v2 scan reports manifest statistics so small tables broadcast") {
    val (cat, _) = freshCat()
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "nation_v2",
      nation, "n_nationkey", 2)
    val o = spark.read.parquet(s"$sf/customer.parquet")
    // Catalog-read dim joined to a big plain frame: with manifest stats the
    // planner sees a KB-sized relation and broadcasts it (no sort-merge).
    val joined = o.join(spark.table(s"$cat.nation_v2"),
      col("c_nationkey") === col("n_nationkey"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"v2 dim with reported stats must broadcast:\n$p")
  }

  test("DELETE FROM and TRUNCATE TABLE route through the table's delete verb") {
    val (cat, wh) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "del", o, "o_orderkey", 4)
    val gt = new graft.catalog.GraftCatalog(spark, wh).table("del")
    spark.sql(s"DELETE FROM $cat.del WHERE o_orderkey <= 500 OR o_orderstatus = 'F'")
    val expected = o.filter(!(col("o_orderkey") <= 500 || col("o_orderstatus") === "F"))
    assert(spark.table(s"$cat.del").count() == expected.count())
    assert(gt.latestVersion == 2) // one delete commit
    // Untranslatable predicate: canDeleteWhere refuses the metadata path,
    // and the statement falls back to the row-level copy-on-write rewrite
    // (RowLevelSpec covers it in depth) instead of failing — never a
    // partial translation either way.
    val beforeOdd = spark.table(s"$cat.del")
      .filter(col("o_orderkey") % 2 =!= 0).count()
    spark.sql(s"DELETE FROM $cat.del WHERE o_orderkey % 2 = 0")
    assert(spark.table(s"$cat.del").count() == beforeOdd)
    // TRUNCATE rides the AlwaysTrue path.
    spark.sql(s"TRUNCATE TABLE $cat.del")
    assert(spark.table(s"$cat.del").count() == 0)
  }

  test("ALTER TABLE ADD COLUMNS widens the schema without moving data") {
    val (cat, wh) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "alt", o, "o_orderkey", 4)
    val gt = new graft.catalog.GraftCatalog(spark, wh).table("alt")
    val dirsBefore = gt.log.latest().get.dataDirs
    spark.sql(s"ALTER TABLE $cat.alt ADD COLUMNS (note STRING, score DOUBLE)")
    val head = gt.log.latest().get
    assert(head.dataDirs == dirsBefore, "metadata-only: no data may move")
    val df = spark.table(s"$cat.alt")
    assert(df.schema.fieldNames.takeRight(2).toSeq == Seq("note", "score"))
    assert(df.filter(col("note").isNull).count() == o.count())
    // The widened schema is immediately writable and mergeable.
    spark.sql(s"INSERT INTO $cat.alt SELECT o.*, 'x' AS note, 1.5 AS score " +
      s"FROM parquet.`$sf/orders.parquet` o LIMIT 10")
    assert(spark.table(s"$cat.alt").filter(col("note") === "x").count() == 10)
    // Duplicate and non-top-level adds refuse.
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.alt ADD COLUMNS (note STRING)"))
    assert(e != null)
    // NOT NULL adds refuse too — a metadata-only widening cannot backfill
    // existing rows, so silently storing the column as nullable would hand
    // back a schema the user didn't declare.
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.alt ADD COLUMNS (mandatory INT NOT NULL)"))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e2).contains("NOT NULL"), msgs(e2))
    assert(!spark.table(s"$cat.alt").schema.fieldNames.contains("mandatory"))
  }

  test("reported ordering elides the sort-merge join's per-partition sorts") {
    val (cat, wh) = freshCat()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    ConnectorQueries.ingestBucketed(spark, cat, "o_srt", orders, "o_orderkey", 8)
    ConnectorQueries.ingestBucketed(spark, cat, "l_srt", li, "l_orderkey", 8)
    def sortCount(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.count(_.matches("""\(\d+\) Sort\b.*"""))
    }
    noBroadcast {
      val joined = spark.table(s"$cat.o_srt")
        .join(spark.table(s"$cat.l_srt"), col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "l_quantity")
      // One file per bucket (fresh overwrite): the SPJ elides the
      // exchanges AND the reported key order elides both SMJ sorts.
      assert(shuffleCount(joined) == 0)
      assert(sortCount(joined) == 0,
        "reported ordering must elide the SMJ sorts:\n" +
          joined.queryExecution.executedPlan.toString)
      // An APPEND makes a bucket multi-file — concatenated sorted files
      // are not sorted, so the claim must retract and sorts come back.
      new graft.catalog.GraftCatalog(spark, wh).table("o_srt")
        .append(orders.limit(50))
      val joined2 = spark.table(s"$cat.o_srt")
        .join(spark.table(s"$cat.l_srt"), col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "l_quantity")
      assert(sortCount(joined2) > 0,
        "multi-file bucket must NOT claim ordering:\n" +
          joined2.queryExecution.executedPlan.toString)
      assert(joined2.count() >= joined.count())
    }
  }

  test("a non-atomic MOR key refuses the in-scan resolver loudly") {
    // A struct key hashes fine at write time but has no value equality in
    // the resolver's map — admitting it would emit stale rows SILENTLY, so
    // the scan must refuse (the review-caught failure mode).
    val (cat, wh) = freshCat()
    val o = spark.read.parquet(s"$sf/orders.parquet").limit(100)
      .withColumn("sk", struct(col("o_orderkey")))
    val t = new graft.catalog.GraftCatalog(spark, wh).materialized("structmor")
    t.overwriteBucketed(o, "sk", 4)
    t.upsertDeferred(o.limit(5).withColumn("o_totalprice", lit(1.0)), "sk")
    val e = intercept[Exception](spark.table(s"$cat.structmor").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unsupported")), s"got: $e")
    // The table API still resolves it (window algebra needs no hash map).
    assert(t.read().filter(col("o_totalprice") === 1.0).count() == 5)
  }

  test("v2 bucket function agrees bit-for-bit with the write path") {
    import org.apache.spark.sql.types._
    val f = graft.connector.GraftBucketFunction
      .bind(StructType(Seq(
        StructField("n", IntegerType), StructField("k", LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    val rnd = new scala.util.Random(7)
    (0 until 200).map(_ => rnd.nextLong()).foreach { k =>
      val viaV2 = f.produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](16, k)))
      val viaWrite = graft.plans.BucketHash.bucketId(k, LongType, 16, "UTC")
      assert(viaV2 == viaWrite, s"key $k: v2=$viaV2 write=$viaWrite")
    }
  }
}
