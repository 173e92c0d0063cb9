package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.GraftCatalog
import graft.dml.Merge
import graft.functions.{Coerce, Identifiers}

class CoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("materialized tables go through the identifier guard; profile handles empty input") {
    val cat = new graft.catalog.GraftCatalog(spark, TestSpark.tmpDir("matguard-"))
    intercept[IllegalArgumentException] { cat.materialized("../escape") }
    intercept[IllegalArgumentException] { cat.materialized("a/b") }
    assert(cat.materialized("idx__aux").name == "idx__aux")
    // an EXISTING table is protected from silent re-materialization
    cat.saveTable("user_tbl", Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException] { cat.materialized("user_tbl") }
    assert(cat.materialized("user_tbl", overwrite = true).name == "user_tbl")
    val empty = spark.emptyDataset[(Long, String)].toDF("id", "v")
    val p = graft.ops.Profile.profile(empty, exact = true)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p == Map("id" -> 0L, "v" -> 0L))
  }

  test("identifiers: sanitize + pk heuristic") {
    assert(Identifiers.sanitize("Customer Id") == "Customer_Id")
    assert(Identifiers.sanitize("a.b/c(d)") == "abcd")
    assert(Identifiers.sanitizeAll(Seq("a b", "a_b")) == Seq("a_b", "a_b_2"))
    assert(Identifiers.isValidIdent("tbl_1"))
    assert(!Identifiers.isValidIdent("1; drop"))
    assert(Identifiers.findIdCol(Seq("name", "ID", "x")) == "ID")
    assert(Identifiers.findIdCol(Seq("name", "emp_id")) == "emp_id")
    assert(Identifiers.findIdCol(Seq("foo_id", "bar")) == "foo_id")
    assert(Identifiers.findIdCol(Seq("name", "x")) == "name")
  }

  test("coerce: get_cast_val behavior") {
    import org.apache.spark.sql.types._
    assert(Coerce.coerce("42", IntegerType) == 42)
    assert(Coerce.coerce("4.5", DoubleType) == 4.5)
    assert(Coerce.coerce("yes", BooleanType) == true)
    assert(Coerce.coerce("off", BooleanType) == false)
    assert(Coerce.coerce("not_a_number", IntegerType) == "not_a_number")
    val ts = Coerce.coerce("2025-01-01T10:00:00Z", TimestampType)
    assert(ts.isInstanceOf[java.sql.Timestamp])
    // Date-only bound on a timestamp column → midnight UTC, matching
    // Python's datetime.fromisoformat in the reference's get_cast_val.
    val dateOnly = Coerce.coerce("1992-01-01", TimestampType)
    assert(dateOnly == java.sql.Timestamp.from(java.time.Instant.parse("1992-01-01T00:00:00Z")),
      s"got $dateOnly")
    assert(Coerce.dtypeToSpark("int64") == LongType) // pandas default int: 32-bit would null ids >= 2^31
    assert(Coerce.dtypeToSpark("int32") == IntegerType)
    assert(Coerce.dtypeToSpark("float32") == DoubleType)
    assert(Coerce.dtypeToSpark("object") == StringType)
  }

  test("snapshot log + table lifecycle: overwrite, append, upsert, delete, time travel, diff") {
    val cat = new GraftCatalog(spark, TestSpark.tmpDir("graft-core"))
    val t = cat.createTable("users", new org.apache.spark.sql.types.StructType()
      .add("id", "int").add("name", "string").add("salary", "int"))

    // v2: overwrite with 3 rows
    t.overwrite(Seq((1, "ana", 10), (2, "bob", 20), (3, "cy", 30)).toDF("id", "name", "salary"))
    assert(t.read().count() == 3)

    // v3: append 1 row with a NEW column (schema evolution)
    t.append(Seq((4, "dee", 40, "eng")).toDF("id", "name", "salary", "dept"))
    val v3 = t.read()
    assert(v3.columns.toSeq == Seq("id", "name", "salary", "dept"))
    assert(v3.count() == 4)
    assert(v3.filter($"id" === 1 && $"dept".isNull).count() == 1)

    // v4: upsert — update id=2, insert id=5, delete id=3 via op col
    val updates = Seq(
      (2, "bob2", 25, null.asInstanceOf[String], "u", 2L),
      (5, "eve", 50, "ml", "c", 1L),
      (3, null.asInstanceOf[String], 0, null.asInstanceOf[String], "d", 3L)
    ).toDF("id", "name", "salary", "dept", "op", "seq")
    t.upsert(updates.drop("seq"), "id", None, Some("op"))
    val v4 = t.read().orderBy("id").collect()
    assert(v4.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 5))
    assert(v4(1).getString(1) == "bob2" && v4(1).getInt(2) == 25)

    // precombine: two updates for id=1, higher seq wins
    val dup = Seq((1, "ana_old", 11, null.asInstanceOf[String], "u", 1L),
      (1, "ana_new", 12, null.asInstanceOf[String], "u", 2L))
      .toDF("id", "name", "salary", "dept", "op", "seq")
    t.upsert(dup, "id", Some("seq"), Some("op"))
    assert(t.read().filter($"id" === 1).select("name").as[String].head() == "ana_new")

    // delete by keys
    t.deleteKeys(Seq(5).toDF("id"), "id")
    assert(t.read().filter($"id" === 5).count() == 0)

    // updateWhere
    t.updateWhere($"id" === 4, Map("salary" -> lit(99)))
    assert(t.read().filter($"id" === 4).select("salary").as[Int].head() == 99)

    // time travel: v2 still has exactly 3 rows, no dept column
    val tt = t.readAsOf(2)
    assert(tt.count() == 3 && !tt.columns.contains("dept"))
    // expired-snapshot fallback
    assert(t.readAsOfOrLatest(9999).count() == t.read().count())

    // snapshots metadata
    val snaps = t.snapshotsDF.orderBy("snapshot_id").collect()
    assert(snaps.head.getString(3) == "create")
    assert(snaps.map(_.getString(3)).contains("upsert"))

    // diff v3 vs v2: id=4 NEW, others UNCHANGED
    val d = t.diff(3, 2, "id")
    val byType = d.groupBy("change_type").count().as[(String, Long)].collect().toMap
    assert(byType("NEW") == 1)
    assert(byType.getOrElse("UNCHANGED", 0L) == 3)

    // idempotent batchKey commit
    val before = t.latestVersion
    t.append(Seq((6, "fi", 60, "qa")).toDF("id", "name", "salary", "dept"), Some("batch-1"))
    t.append(Seq((6, "fi", 60, "qa")).toDF("id", "name", "salary", "dept"), Some("batch-1"))
    assert(t.latestVersion == before + 1)
  }

  test("schema evolution resolves case-insensitively (no duplicate-modulo-case columns)") {
    val t = new graft.table.GraftTable(spark, TestSpark.tmpDir("case-").resolve("t"), "t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    // Append spelling the key "ID": must land in "id", evolve nothing.
    t.append(Seq((3L, "c")).toDF("ID", "name"))
    assert(t.schema.fieldNames.toSeq == Seq("id", "name"),
      s"case-variant append must not add a column: ${t.schema.fieldNames.toSeq}")
    assert(t.read().orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L))
    // Upsert with a case-variant value column + one genuinely new column.
    t.upsert(Seq((2L, "B2", "x")).toDF("id", "NAME", "extra"), "id")
    assert(t.schema.fieldNames.toSeq == Seq("id", "name", "extra"))
    val r2 = t.read().filter($"id" === 2L).head()
    assert(r2.getAs[String]("name") == "B2", s"case-variant update lost: $r2")
    assert(r2.getAs[String]("extra") == "x")
    assert(t.read().filter($"id" === 1L).head().getAs[String]("extra") == null)
    // Merge-on-read delta with case-variant spelling resolves the same way.
    t.upsertDeferred(Seq((1L, "A2", "y")).toDF("Id", "Name", "Extra"), "id")
    val r1 = t.read().filter($"id" === 1L).head()
    assert(r1.getAs[String]("name") == "A2" && r1.getAs[String]("extra") == "y")
    assert(t.schema.fieldNames.toSeq == Seq("id", "name", "extra"))
  }

  test("merge: last-writer-wins and idempotence algebra") {
    val target = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val batch = Seq((2, "b2", 5L, "u"), (3, "c", 1L, "c")).toDF("id", "v", "seq", "op")
    val once = Merge.merge(target, batch, "id", Some("seq"), Some("op"))
    val twice = Merge.merge(once, batch, "id", Some("seq"), Some("op"))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
    assert(once.count() == 3)
  }

  test("catalog: csv ingest with sanitization + list/describe/drop") {
    val dir = TestSpark.tmpDir("graft-csv")
    val csv = dir.resolve("in.csv")
    java.nio.file.Files.writeString(csv,
      "Customer Id,First Name,amount\n1,ana,10.5\n2,bob,20.25\n")
    val cat = new GraftCatalog(spark, dir.resolve("wh"))
    val t = cat.ingestCsv(csv.toString, "customers")
    assert(t.read().columns.toSeq == Seq("Customer_Id", "First_Name", "amount"))
    assert(t.read().count() == 2)
    assert(cat.listTables() == Seq("customers"))
    assert(cat.describe("customers").fieldNames.contains("amount"))
    cat.ingestCsv(csv.toString, "customers", mode = "append")
    assert(cat.table("customers").read().count() == 4)
    cat.dropTable("customers")
    assert(!cat.tableExists("customers"))
    intercept[IllegalArgumentException](cat.table("no;pe"))
  }
}
