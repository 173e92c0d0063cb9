package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.{Dedup, Importance}

/**
 * Property tests for the duplicate-span family and the bigram LM against
 * sequential driver-side references, on random corpora from a tiny token
 * vocabulary (maximizing cross-doc window collisions, overlap merges and
 * the short-doc fallback path).
 */
object SpanProps extends Properties("Dedup.spans") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val vocab = Vector("a", "b", "c", "d")
  private val docGen = for {
    id <- Gen.chooseNum(0L, 200L)
    len <- Gen.chooseNum(1, 12)
    toks <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield (id, toks.mkString(" "))
  private val corpusGen =
    Gen.listOfN(8, docGen).map(_.distinctBy(_._1)).suchThat(_.nonEmpty)

  // Tokenize.tokens semantics on this clean vocab: trim+lower are
  // identities and single spaces separate, so a plain split suffices.
  private def toks(t: String): Vector[String] = t.split(" ").toVector

  /** Sequential reference: windows (token-seq identity), doc frequency,
    * flagged positions, gaps-and-islands merge. */
  private def refSpans(
      docs: List[(Long, String)], n: Int): Set[(Long, Long, Long, Long)] = {
    def windows(ts: Vector[String]): Vector[(Int, Vector[String])] =
      if (ts.size < n) Vector(0 -> ts)
      else ts.sliding(n).zipWithIndex.map { case (w, i) => i -> w.toVector }.toVector
    val df = docs.flatMap { case (id, t) => windows(toks(t)).map(w => (w._2, id)) }
      .distinct.groupBy(_._1).view.mapValues(_.size).toMap
    docs.flatMap { case (id, t) =>
      val ts = toks(t)
      val flagged = windows(ts).filter(w => df(w._2) >= 2)
        .map { case (p, _) => (p.toLong, math.min(p + n, ts.size).toLong) }
        .sortBy(_._1)
      // merge
      val spans = flagged.foldLeft(Vector.empty[(Long, Long, Long)]) {
        case (acc, (p, e)) =>
          acc.lastOption match {
            case Some((s0, e0, c0)) if p <= e0 =>
              acc.init :+ ((s0, math.max(e0, e), c0 + 1))
            case _ => acc :+ ((p, e, 1L))
          }
      }
      spans.map { case (s, e, c) => (id, s, e, c) }
    }.toSet
  }

  property("dupSpans equals the sequential reference") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.dupSpans(df, "doc_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = refSpans(docs, 3)
      (got == want) :| s"got=$got want=$want docs=$docs"
    }

  /** Sequential keep-first strip reference. */
  private def refStrip(docs: List[(Long, String)], n: Int): Map[Long, String] = {
    def windows(ts: Vector[String]): Vector[(Int, Vector[String])] =
      if (ts.size < n) Vector(0 -> ts)
      else ts.sliding(n).zipWithIndex.map { case (w, i) => i -> w.toVector }.toVector
    val byWin = docs.flatMap { case (id, t) => windows(toks(t)).map(w => (w._2, id)) }
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    docs.map { case (id, t) =>
      val ts = toks(t)
      val removal = windows(ts)
        .filter { case (_, w) =>
          val ids = byWin(w); ids.size >= 2 && ids.min != id }
        .map { case (p, _) => (p.toLong, math.min(p + n, ts.size).toLong) }
      val covered = removal.flatMap { case (s, e) => s until e }.toSet
      id -> ts.zipWithIndex.collect { case (w, i) if !covered(i.toLong) => w }
        .mkString(" ")
    }.toMap
  }

  property("stripDupSpans equals the sequential keep-first reference") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.stripDupSpans(df, "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = refStrip(docs, 3)
      (got == want) :| s"got=$got want=$want docs=$docs"
    }

  property("bigramLmScores equals the sequential add-one bigram LM") =
    Prop.forAll(corpusGen, corpusGen) { (raw0, ref0) =>
      // Distinct id spaces so raw/ref overlap is irrelevant.
      val raw = raw0.map { case (id, t) => (id, t) }
      val rawDf = raw.toDF("doc_id", "text")
      val refDf = ref0.toDF("doc_id", "text")
      val uni = ref0.flatMap(d => toks(d._2)).groupBy(identity).view.mapValues(_.size).toMap
      val big = ref0.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toList)
        .groupBy(identity).view.mapValues(_.size).toMap
      val v = uni.size
      val want = raw.flatMap { case (id, t) =>
        val ts = toks(t)
        if (ts.size < 2) None
        else {
          val lps = ts.sliding(2).map { w =>
            val cb = big.getOrElse(w.mkString(" "), 0)
            val cu = uni.getOrElse(w.head, 0)
            math.log((cb + 1).toDouble / (cu + v).toDouble)
          }.toVector
          Some(id -> (lps.sum / lps.size))
        }
      }.toMap
      val got = Importance.bigramLmScores(rawDf, refDf, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_log_prob")).toMap
      val close = got.keySet == want.keySet && got.forall { case (id, m) =>
        math.abs(m - want(id)) <= 1e-9 * math.max(1.0, math.abs(want(id))) }
      close :| s"got=$got want=$want"
    }
}
