package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.Curation

/**
 * Property test: greedy sequence packing against a sequential reference
 * fold on random corpora. Beyond equality, the invariants a training-data
 * consumer relies on are asserted directly: every document appears exactly
 * once; a sequence never exceeds the budget unless it is a single
 * oversized document; per-shard sequence ids are contiguous from 0; and
 * within a sequence, documents sit at their prefix-sum offsets in id
 * order.
 */
object PackProps extends Properties("Curation.packSequences") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case runs a Spark job

  private val docGen = for {
    id <- Gen.chooseNum(0L, 500L)
    nWords <- Gen.frequency(
      4 -> Gen.chooseNum(1, 20),   // typical short docs
      1 -> Gen.chooseNum(21, 60),  // oversized vs small budgets
      1 -> Gen.const(0))           // empty text (tokenizes to 1 empty token)
  } yield (id, nWords)

  private val corpusGen =
    Gen.nonEmptyListOf(docGen).map(_.distinctBy(_._1)) // ids unique

  /** The contract's greedy fold, sequentially per shard in id order. */
  private def reference(
      docs: List[(Long, Long)], // (id, nTokens), nTokens per Tokenize
      budget: Int,
      shards: Int): Set[(Long, Long, Long, Long, Long)] = {
    docs.groupBy { case (id, _) => java.lang.Math.floorMod(id, shards.toLong) }
      .flatMap { case (shard, ds) =>
        var seq = 0L
        var off = 0L
        ds.sortBy(_._1).map { case (id, nt) =>
          if (off > 0 && off + nt > budget) { seq += 1; off = 0L }
          val row = (id, shard, seq, off, nt)
          off += nt
          row
        }
      }.toSet
  }

  property("equals the sequential greedy fold; invariants hold") =
    Prop.forAll(corpusGen, Gen.chooseNum(8, 40), Gen.oneOf(1, 3, 8)) {
      (corpus, budget, shards) =>
        val docs = corpus.map { case (id, n) =>
          (id, (1 to n).map(i => s"w$i").mkString(" "))
        }.toDF("doc_id", "text")
        val got = Curation.packSequences(docs, "doc_id", "text", budget, shards)
          .as[(Long, Long, Long, Long, Long)].collect().toSet

        // Tokenize semantics: empty text is ONE empty token.
        val toks = corpus.map { case (id, n) => (id, math.max(n, 1).toLong) }
        val want = reference(toks, budget, shards)

        val ids = got.toList.map(_._1)
        val eachOnce = ids.distinct.size == corpus.size && ids.size == corpus.size
        val bySeq = got.groupBy(r => (r._2, r._3))
        val budgetKept = bySeq.values.forall { rs =>
          rs.toList.map(_._5).sum <= budget || rs.size == 1
        }
        val seqsContiguous = got.groupBy(_._2).values.forall { rs =>
          val seqs = rs.map(_._3)
          seqs.min == 0L && seqs.max == seqs.toList.distinct.size - 1L
        }
        val offsetsArePrefixSums = bySeq.values.forall { rs =>
          val ordered = rs.toList.sortBy(_._1)
          ordered.map(_._4) ==
            ordered.map(_._5).scanLeft(0L)(_ + _).init
        }
        Prop.all(
          (got == want) :| s"mismatch vs reference: got ${got.diff(want)}, missing ${want.diff(got)}",
          eachOnce :| "every doc exactly once",
          budgetKept :| "budget exceeded by a multi-doc sequence",
          seqsContiguous :| "per-shard seq ids not contiguous from 0",
          offsetsArePrefixSums :| "offsets are not id-ordered prefix sums")
    }
}
