package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.Curation

/**
 * Property tests for the deterministic sampling family: stratified
 * sampling and weighted mixing must equal a sequential reference built on
 * the same (md5(text), id) ordering, on random corpora with duplicate
 * texts, skewed groups, and fractional/integer/zero weights.
 */
object SampleProps extends Properties("Curation.sampling") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val docGen = for {
    id <- Gen.chooseNum(0L, 300L)
    // Small text pool → plenty of duplicate texts (md5 ties → id tie-break)
    t <- Gen.oneOf("alpha beta", "gamma", "delta epsilon zeta", "eta", "")
    g <- Gen.oneOf("en", "de", "fr")
  } yield (id, t, g)

  private val corpusGen = Gen.nonEmptyListOf(docGen).map(_.distinctBy(_._1))

  /** Per-group md5-ordered quota slice, sequentially. */
  private def refSample(docs: List[(Long, String, String)], frac: Double): Set[Long] =
    docs.groupBy(_._3).values.flatMap { g =>
      val k = math.ceil(g.size * frac).toLong
      g.sortBy { case (id, t, _) => (md5hex(t), id) }.take(k.toInt).map(_._1)
    }.toSet

  property("stratifiedSample equals the sequential md5-order slice") =
    Prop.forAll(corpusGen, Gen.oneOf(0.0, 0.25, 1.0 / 3, 0.5, 1.0)) { (corpus, frac) =>
      val df = corpus.toDF("doc_id", "text", "lang")
      val got = Curation.stratifiedSample(df, "lang", "doc_id", "text", frac)
        .select("doc_id").as[Long].collect().toSet
      val want = refSample(corpus, frac)
      (got == want) :| s"got ${got.diff(want)} extra, ${want.diff(got)} missing"
    }

  property("weightedMix equals full copies + the fractional slice") =
    Prop.forAll(corpusGen,
      Gen.oneOf(0.0, 0.5, 1.0, 1.5, 2.0, 2.75)) { (corpus, wEn) =>
      val df = corpus.toDF("doc_id", "text", "lang")
      val got = Curation.weightedMix(df, "lang", "doc_id", "text",
          weights = Map("en" -> wEn), defaultWeight = 1.0)
        .select("doc_id", "epoch").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = corpus.flatMap { case (id, t, g) =>
        val w = if (g == "en") wEn else 1.0
        val full = (0L until math.floor(w).toLong).map(e => (id, e))
        val fracPart = w - math.floor(w)
        val inSlice = {
          val grp = corpus.filter(_._3 == g)
          val k = math.ceil(grp.size * fracPart).toLong
          grp.sortBy { case (i, tx, _) => (md5hex(tx), i) }.take(k.toInt).exists(_._1 == id)
        }
        full ++ (if (fracPart > 0 && inSlice) Seq((id, math.floor(w).toLong)) else Nil)
      }.groupBy(identity).view.mapValues(_.length).toMap
      (got == want) :| s"mix mismatch: got=$got want=$want"
    }
}
