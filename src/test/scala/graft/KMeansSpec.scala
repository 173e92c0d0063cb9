package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{KMeans, Similarity}

/** Lloyd's k-means and SemDeDup semantic dedup over embeddings. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embs = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  test("k-means recovers well-separated planted blobs exactly") {
    // 3 blobs far apart in 4-d; seeds (smallest ids) land one per blob.
    val pts = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (10L, Array(100f, 0f, 0f, 0f)), (20L, Array(0f, 100f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 1f)), (2L, Array(0f, 1f, 1f, 0f)),
      (11L, Array(99f, 1f, 0f, 0f)), (12L, Array(101f, 0f, 1f, 0f)),
      (21L, Array(1f, 99f, 0f, 1f)), (22L, Array(0f, 101f, 1f, 0f))
    ).toDF("id", "vec")
    val r = KMeans.fit(pts, "id", "vec", k = 3, iters = 3)
    val got = r.assignments.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 10L, 11L, 12L, 20L, 21L, 22L))
    assert(Set(got(0L), got(1L), got(2L)).size == 1)
    assert(Set(got(10L), got(11L), got(12L)).size == 1)
    assert(Set(got(20L), got(21L), got(22L)).size == 1)
    assert(Set(got(0L), got(10L), got(20L)).size == 3, "blobs must get distinct cells")
    assert(r.inertiaMonotone)
  }

  test("k-means invariants on the corpus: monotone inertia, full coverage, determinism") {
    val r1 = KMeans.fit(embs, "vec_id", "embedding", k = 4, iters = 3)
    assert(r1.inertiaMonotone, s"inertia must not increase: ${r1.inertia}")
    assert(r1.inertia.head > r1.inertia.last, "iterations must actually improve")
    assert(r1.assignments.count() == embs.count())
    assert(r1.assignments.select("cell").distinct().count() == 4)
    val r2 = KMeans.fit(embs, "vec_id", "embedding", k = 4, iters = 3)
    assert(r1.assignments.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap ==
      r2.assignments.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap,
      "assignment must be deterministic")
    // Every point sits in its nearest final cell (verified in Scala).
    val cents = r1.centroids
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(x => x.getLong(0) -> x.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val assign = r1.assignments.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      val d = cents.map(c => v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(d(assign(id)) - d.min) < 1e-4,
        s"point $id not in (near-)nearest cell: ${d.toSeq} chose ${assign(id)}")
    }
  }

  test("large-k broadcast-join assignment equals the literal-plan path exactly") {
    // literalLimit = 0 forces the join path; results must be identical —
    // same float centroids, same double accumulation, same tie-break.
    val lit = KMeans.fit(embs, "vec_id", "embedding", k = 4, iters = 3)
    val join = KMeans.fit(embs, "vec_id", "embedding", k = 4, iters = 3, literalLimit = 0)
    // Inertia is a driver-side sum over collected rows whose order may
    // differ between the two plans — compare within float tolerance.
    assert(lit.inertia.zip(join.inertia).forall { case (a, b) =>
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)) },
      s"${lit.inertia} vs ${join.inertia}")
    assert(lit.centroids.zip(join.centroids).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)) } })
    assert(lit.assignments.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      join.assignments.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
    val semLit = KMeans.semanticDupPairs(embs, "vec_id", "embedding", 0.42, 8, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val semJoin = KMeans.semanticDupPairs(embs, "vec_id", "embedding", 0.42, 8, 4, 3,
      literalLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semLit == semJoin)
  }

  test("semantic dedup: high recall vs exact pairs, exact precision") {
    val exact = Similarity.cosineDupPairs(embs, "vec_id", "embedding", 0.42)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = KMeans.semanticDupPairs(embs, "vec_id", "embedding", 0.42,
      k = 8, iters = 4, probes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert((sem -- exact).isEmpty, "every semantic pair must be exact-verified")
    assert((exact -- sem).size <= exact.size / 10,
      s"recall must be >= 90%: missed ${(exact -- sem).size} of ${exact.size}")
  }
}
