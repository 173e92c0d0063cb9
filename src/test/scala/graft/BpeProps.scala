package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.Bpe

/**
 * Property tests for the distributed BPE trainer: the full merge sequence
 * must equal a sequential reference implementation on random corpora from
 * a tiny alphabet (maximizing pair collisions and tie-breaks), and the
 * encoder must reproduce training segmentation.
 */
object BpeProps extends Properties("Bpe") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val wordGen = for {
    len <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString
  private val docGen = for {
    nw <- Gen.chooseNum(1, 8)
    ws <- Gen.listOfN(nw, wordGen)
  } yield ws.mkString(" ")
  private val corpusGen = Gen.listOfN(6, docGen)

  /** Independent leftmost non-overlapping pair replacement. */
  private def refMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Sequential reference BPE over word counts. */
  private def refTrain(
      docs: List[String], numMerges: Int, minCount: Long): List[(String, String, Long)] = {
    var words: Map[Seq[String], Long] = docs.flatMap(_.split(" ").toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => (w.map(_.toString) :+ Bpe.EndOfWord, n) }
    val out = scala.collection.mutable.Buffer.empty[(String, String, Long)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + n
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption.filter(_._2 >= minCount)
      best match {
        case None => done = true
        case Some(((a, b), c)) =>
          out += ((a, b, c))
          
          words = words.toSeq.map { case (syms, n) =>
            (refMerge(syms, a, b), n)
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.toList
  }

  property("train equals the sequential reference merge-for-merge") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bpe.train(df, "text", numMerges = 12, minCount = 1L)
        .map(m => (m.a, m.b, m.count))
      val want = refTrain(docs, 12, 1L)
      (got == want) :| s"got=$got want=$want docs=$docs"
    }

  property("batched rounds are invisible: every batchCandidates gives the sequential answer") =
    Prop.forAll(corpusGen) { docs =>
      // The 3-letter alphabet maximizes pair interaction, ties and
      // self-pairs (a,a) — exactly the cases where an unsound batch
      // acceptance rule would diverge from one-merge-at-a-time.
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val want = refTrain(docs, 10, 1L)
      Prop.all(Seq(1, 2, 5, 64).map { bc =>
        val got = Bpe.train(df, "text", numMerges = 10, minCount = 1L,
          batchCandidates = bc).map(m => (m.a, m.b, m.count))
        (got == want) :| s"batchCandidates=$bc got=$got want=$want docs=$docs"
      }: _*)
    }

  property("trainFull's summary numbers match the word table they summarize") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val t = Bpe.trainFull(df, "text", numMerges = 3, minCount = 1L)
      val distinctWords = docs.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
      val nStart = distinctWords.map(_.length + 1L).sum
      (t.nWords == distinctWords.size.toLong && t.nStartSymbols == nStart) :|
        s"got=(${t.nWords},${t.nStartSymbols}) want=(${distinctWords.size},$nStart)"
    }

  property("encoder applies merges lowest-rank-first to a valid segmentation") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = Bpe.train(df, "text", numMerges = 8, minCount = 1L)
      Prop.all(docs.flatMap(_.split(" ")).filter(_.nonEmpty).map { w =>
        val toks = Bpe.encodeWord(w, merges)
        // Concatenating the tokens restores the word + marker.
        (toks.mkString == w + Bpe.EndOfWord) :| s"w=$w toks=$toks"
      }: _*)
    }
}
