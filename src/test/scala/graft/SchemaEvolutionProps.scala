package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.catalog.GraftCatalog

/**
 * Rename-transparency property: a random interleaving of DML and
 * metadata-only column RENAMEs must be observationally identical to the
 * SAME DML on a never-renamed twin — reads equal modulo the name mapping,
 * at every step, through bucketed partial rewrites, MOR chains and
 * compaction. This is the contract [[graft.table.ColumnIds]] carries:
 * renames change NAMES, never data, plans, or results.
 */
object SchemaEvolutionProps extends Properties("SchemaEvolution") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4) // each case drives many real commits

  // One step of the randomized session. Value columns are addressed by
  // their ORIGINAL name; the runner translates to the current logical name.
  sealed trait Step
  case class Append(seed: Int) extends Step
  case class Upsert(seed: Int) extends Step
  case class MorUpsert(seed: Int) extends Step
  case class DeleteK(seed: Int) extends Step
  case class UpdateW(seed: Int) extends Step
  case object Compact extends Step
  case class Rename(col: Int, tag: Int) extends Step

  private val stepGen: Gen[Step] = Gen.frequency(
    3 -> Gen.chooseNum(0, 999).map(Append),
    3 -> Gen.chooseNum(0, 999).map(Upsert),
    2 -> Gen.chooseNum(0, 999).map(MorUpsert),
    2 -> Gen.chooseNum(0, 999).map(DeleteK),
    2 -> Gen.chooseNum(0, 999).map(UpdateW),
    1 -> Gen.const(Compact),
    4 -> Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0, 99))
      .map { case (c, t) => Rename(c, t) })

  private val sessionGen = Gen.listOfN(10, stepGen)

  private def batch(seed: Int, n: Int = 40): DataFrame = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(1000).toLong,
        rng.alphanumeric.take(5).mkString))
      .toDF("id", "v", "s")
  }

  property("random rename/DML interleavings equal the never-renamed twin") =
    Prop.forAll(sessionGen) { steps =>
      val catA = new GraftCatalog(spark, TestSpark.tmpDir("sevp-a-"))
      val catB = new GraftCatalog(spark, TestSpark.tmpDir("sevp-b-"))
      val a = catA.saveTable("t", batch(1).limit(0)) // renamed table
      val b = catB.saveTable("t", batch(1).limit(0)) // plain twin
      a.overwriteBucketed(batch(1), "id", 4)
      b.overwriteBucketed(batch(1), "id", 4)
      // original column name -> current logical name on table A
      var names = Map("id" -> "id", "v" -> "v", "s" -> "s")
      val orig = Seq("id", "v", "s")
      def toA(df: DataFrame): DataFrame =
        df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, names(c)))
      def readBack(t: graft.table.GraftTable, m: Map[String, String]): Set[String] =
        t.read().select(orig.map(c => col(m(c))): _*)
          .collect().map(_.mkString("|")).toSet
      var ok = true
      steps.foreach {
        case Append(s) =>
          a.append(toA(batch(s))); b.append(batch(s))
        case Upsert(s) =>
          a.upsert(toA(batch(s)), names("id"), precombine = Some(names("v")))
          b.upsert(batch(s), "id", precombine = Some("v"))
        case MorUpsert(s) =>
          a.upsertDeferred(toA(batch(s)), names("id"), precombine = Some(names("v")))
          b.upsertDeferred(batch(s), "id", precombine = Some("v"))
        case DeleteK(s) =>
          val keys = batch(s).select("id").limit(10)
          a.deleteKeys(keys.withColumnRenamed("id", names("id")), names("id"))
          b.deleteKeys(keys, "id")
        case UpdateW(s) =>
          val k = s % 60
          a.updateWhere(col(names("id")) === k, Map(names("v") -> lit(s.toLong)))
          b.updateWhere(col("id") === k, Map("v" -> lit(s.toLong)))
        case Compact =>
          a.compact(); b.compact()
        case Rename(ci, tag) =>
          val o = orig(ci)
          val fresh = s"${o}_r$tag"
          if (!names.values.exists(_ == fresh)) {
            a.renameColumn(names(o), fresh)
            names += (o -> fresh)
          }
      }
      ok &&= readBack(a, names) == readBack(b, Map("id" -> "id", "v" -> "v", "s" -> "s"))
      // Pruned lookup agrees under the mapping too.
      val probe = 7L
      val la = a.lookupKeys(Seq(probe))
        .select(orig.map(c => col(names(c))): _*)
        .collect().map(_.mkString("|")).toSet
      val lb = b.lookupKeys(Seq(probe))
        .collect().map(_.mkString("|")).toSet
      ok && la == lb
    }
}
