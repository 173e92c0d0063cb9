package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.Cluster

/**
 * Property test: distributed connected components (alternating
 * large-star/small-star) must equal a sequential union-find reference on
 * random graphs — including chain-heavy graphs whose diameter exceeds the
 * round count a naive min-label propagation would need.
 */
object ClusterProps extends Properties("Cluster") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each case runs an iterative Spark job

  /** Sequential union-find over the same edges, components keyed by min id. */
  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // Path-compress fully, then relabel every root to the component MIN id.
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private val edgeGen = for {
    a <- Gen.chooseNum(0L, 40L)
    b <- Gen.chooseNum(0L, 40L)
  } yield (a, b)

  private val graphGen = Gen.listOfN(30, edgeGen)

  // A long chain shuffled with random extra edges — worst case for
  // diameter-bound algorithms, routine for large-star/small-star.
  private val chainGen = for {
    n <- Gen.chooseNum(10, 30)
    extra <- Gen.listOfN(5, edgeGen)
  } yield (0L until n.toLong).sliding(2).map(s => (s(0), s(1))).toList ++ extra

  private def check(edges: List[(Long, Long)]): Prop = {
    val real = edges.filter(e => e._1 != e._2)
    if (real.isEmpty) Prop.passed
    else {
      // driverEdgeLimit = 0 forces the DISTRIBUTED star rounds — the
      // default would dispatch these small graphs to the driver union-find
      // and the property would compare union-find against itself.
      val got = Cluster.connectedComponents(real.toDF("id_a", "id_b"), "id_a", "id_b",
        driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(real)
      val viaDriver = Cluster.connectedComponents(real.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (Prop(got == want) :| s"distributed: got=$got want=$want") &&
        (Prop(viaDriver == want) :| s"driver path: got=$viaDriver want=$want")
    }
  }

  property("components equal union-find on random graphs (both paths)") =
    Prop.forAll(graphGen)(check)

  property("components equal union-find on chain-heavy graphs (both paths)") =
    Prop.forAll(chainGen)(check)
}
