package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Near-duplicate CLUSTERING — the step a production dedup pipeline runs
 * after pair generation: fold the near-dup pair graph into connected
 * components, pick one canonical document per component, and drop the rest.
 * (The reference stops at pair/fingerprint level; a training-data pipeline
 * needs the closure, because near-duplication is not transitive at the pair
 * threshold — A~B and B~C must collapse into ONE kept document even when
 * A~C scores below the cutoff.)
 *
 * Connected components use the alternating large-star / small-star
 * algorithm (Kiveris et al., "Connected Components in MapReduce and
 * Beyond", SoCC 2014): each round is two shuffles on narrow (long, long)
 * edge tuples and the round count is O(log^2 n) regardless of component
 * DIAMETER — plain min-label propagation needs diameter-many rounds, which
 * on a 100 TB corpus with chained boilerplate documents can be thousands.
 * Lineage is truncated with `localCheckpoint` every round so the loop does
 * not accumulate a plan of unbounded depth.
 */
object Cluster {

  /**
   * One large-star round: every node points its LARGER neighbors at the
   * minimum of its neighborhood (including itself). Keeps (big, small)
   * orientation, never creates self-loops.
   */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("__mn"))
      .select(col("u"), least(col("__mn"), col("u")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /**
   * One small-star round: edges oriented big→small; every node links all
   * its smaller neighbors (and itself) to its minimum neighbor.
   */
  private def smallStar(edges: DataFrame): DataFrame = {
    val dir = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = dir.groupBy("u").agg(min("v").as("m"))
    dir.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /**
   * Distinct-edge count at or below which components are computed with a
   * DRIVER-SIDE union-find over the collected edge list instead of the
   * distributed star rounds: a near-dup graph of a few thousand edges pays
   * several rounds of wide-shuffle stages that each carry a handful of rows
   * per task — all scheduling overhead. The collect is O(limit) longs by
   * contract (≈3 MB at the default), decided from an aggregate the loop
   * computes anyway. Pass 0 to force the distributed path.
   */
  val defaultDriverEdgeLimit: Long = 200000L

  /**
   * Distinct-edge sanity cap (loud-failure guard, not a tuning knob): a
   * VERIFIED near-dup pair graph is sparse by construction — pairs exist
   * only where the candidate stage matched AND the exact check passed — so
   * even a billion-document corpus yields edges in the millions. An edge
   * frame past this cap almost certainly means a caller wired an
   * UNVERIFIED candidate frame (raw band buckets, a cross join) into the
   * clustering step; at corpus scale that quadratic input would grind
   * through star rounds for hours before anyone noticed. Fail at the first
   * signature aggregate (computed anyway) instead. Pass 0 to disable for
   * a genuinely dense graph.
   */
  val defaultMaxEdges: Long = 100000000L

  /** Driver union-find, components keyed by MIN id (roots merge min-wards —
    * the same canonical labeling the distributed fixpoint produces). */
  private def unionFindComponents(
      spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru < rv) parent(rv) = ru
      else if (rv < ru) parent(ru) = rv
    }
    import spark.implicits._
    parent.keysIterator.map(id => (id, find(id))).toSeq.toDF("id", "component")
  }

  /**
   * Connected components of an undirected edge list. Returns `(id,
   * component)` for every node that appears in an edge, where `component`
   * is the smallest node id in the component (the canonical survivor).
   *
   * Convergence is detected by an order-independent signature of the edge
   * set (count + sum of per-edge hashes) — one tiny aggregate per round,
   * no edge-set diff join. Graphs at or below `driverEdgeLimit` distinct
   * edges dispatch to a driver-side union-find instead (same labeling).
   */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 50,
      driverEdgeLimit: Long = defaultDriverEdgeLimit,
      maxEdges: Long = defaultMaxEdges): DataFrame = {
    val rawEdges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    // Small-graph fast path, probed with ONE bounded job: collect up to
    // limit+1 RAW edges (union-find dedups duplicates for free, so no
    // distinct shuffle, no checkpoint materialization and no signature
    // aggregate run at all — the verified near-dup graphs this clusters are
    // a few thousand edges, and those three extra jobs were the dominant
    // per-call cost). A graph past the limit falls through to the
    // distributed rounds at the price of this one early-aborting collect.
    if (driverEdgeLimit > 0) {
      val probe = rawEdges.limit(
        math.min(driverEdgeLimit, Int.MaxValue - 1L).toInt + 1).collect()
      if (probe.length <= driverEdgeLimit) {
        val es = probe.map(r => (r.getLong(0), r.getLong(1)))
        // The density guard holds on this path too: maxEdges speaks
        // DISTINCT edges, computable for free from the collected probe.
        if (maxEdges > 0) {
          val nd = es.distinct.length
          require(nd <= maxEdges,
            s"edge frame has $nd distinct edges (cap $maxEdges): a verified " +
              "near-dup graph is sparse — this looks like an unverified candidate " +
              "frame; verify pairs first or raise maxEdges explicitly")
        }
        return unionFindComponents(pairs.sparkSession, es)
      }
    }
    // Lazy checkpoints: the signature aggregate right after is the first
    // action, so each round materializes its checkpoint AND computes the
    // signature in ONE job instead of two (eager checkpoint + agg).
    var edges = rawEdges
      .distinct()
      .localCheckpoint(false)

    def signature(e: DataFrame): (Long, String) = {
      // Sum in decimal(38,0): wide enough that per-edge 64-bit hashes cannot
      // overflow it (ANSI mode makes a long sum throw instead of wrapping).
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("u"), col("v"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))), lit(0)).as("h")).head()
      (r.getLong(0), r.get(1).toString)
    }

    var sig = signature(edges)
    if (maxEdges > 0 && sig._1 > maxEdges) {
      // Release the (by definition huge) materialized checkpoint before
      // throwing — a caller catching this in a long-lived session must not
      // be left holding the quadratic frame's blocks.
      edges.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"edge frame has ${sig._1} distinct edges (cap $maxEdges): a verified " +
          "near-dup graph is sparse — this looks like an unverified candidate " +
          "frame; verify pairs first or raise maxEdges explicitly")
    }
    if (sig._1 <= driverEdgeLimit) {
      // Small graph: the edges are already checkpointed, so the collect is
      // a cheap second job over materialized blocks.
      val arr = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist(blocking = false)
      return unionFindComponents(pairs.sparkSession, arr)
    }
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val prev = edges
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val nextSig = signature(next) // materializes next's checkpoint
      prev.unpersist(blocking = false) // prior round's blocks no longer needed
      converged = nextSig == sig
      edges = next
      sig = nextSig
      round += 1
    }
    // Fail loudly rather than return silently-wrong components: the
    // post-loop extraction below is only valid at the star-graph fixpoint.
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds")
    // At the fixpoint every edge is (member, componentMin); roots appear
    // only on the right side and map to themselves.
    val members = edges.select(col("u").as("id"), col("v").as("component"))
    val roots = edges.select(col("v").as("id")).distinct()
      .join(members.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    members.union(roots)
  }

  /**
   * Document-level near-dup clustering: every document gets a `cluster_id`
   * (the smallest doc id among its near-duplicates; its own id if it has
   * none). `edges` is any near-dup pair frame — exact Jaccard for the
   * verification path, MinHash-LSH [[Dedup.nearDupPairs]] at scale.
   */
  def clusterDocs(
      docs: DataFrame,
      idCol: String,
      edges: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxEdges: Long = defaultMaxEdges): DataFrame = {
    val cc = connectedComponents(edges, aCol, bCol, maxEdges = maxEdges)
    docs.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("cluster_id"))
  }

  /** Keep one canonical document per near-dup cluster (the smallest id). */
  def dedupByCluster(
      docs: DataFrame,
      idCol: String,
      edges: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxEdges: Long = defaultMaxEdges): DataFrame =
    clusterDocs(docs, idCol, edges, aCol, bCol, maxEdges)
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol))
      .join(docs, Seq(idCol))
}
