package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed Lloyd's k-means over an embedding column — the clustering
 * step of semantic dedup (SemDeDup-style: cluster embeddings, then search
 * near-duplicates only WITHIN a cluster) and of corpus topic bucketing.
 *
 * Scale shape per iteration: centroids live on the DRIVER (k × dim doubles
 * — tiny by construction) and enter the plan as literals, so assignment is
 * one map-side pass with zero shuffle and zero broadcast-join machinery;
 * the update step shuffles only (cell, dim, partialSum) triples after
 * map-side combine — never the vectors. Iteration count is fixed and small;
 * everything is deterministic (seeded by smallest-id vectors, L2 argmin
 * with cell-index tie-break, exact double accumulation order per row).
 */
object KMeans {

  /** Result: per-point assignment, final centroids, per-iteration inertia. */
  final case class Result(
      assignments: DataFrame, // (idCol, cell)
      centroids: Array[Array[Double]],
      inertia: Seq[Double]) {
    /** Lloyd's invariant: each update step may only lower total inertia. */
    def inertiaMonotone: Boolean =
      inertia.zip(inertia.tail).forall { case (a, b) => b <= a + 1e-9 }
  }

  /** Squared L2 distance to a literal centroid, via the codegen'd dot
    * product: |x|² − 2·x·c + |c|² with |c|² folded driver-side. Centroids
    * enter as float literals (the expression is float-typed like the
    * vectors; the float rounding is deterministic). */
  private def dist2(vec: Column, c: Array[Double]): Column = {
    val cf = c.map(_.toFloat)
    val cLit = array(cf.map(lit): _*)
    val x2 = Similarity.dot(vec, vec)
    val xc = Similarity.dot(vec, cLit)
    x2 - lit(2.0) * xc + lit(cf.map(v => v.toDouble * v).sum)
  }

  /** `(bestDist2, bestCell)` against the current centroids — an array_min
    * over (dist, cell) structs: struct ordering compares dist first, then
    * cell, giving a deterministic argmin tie-break. Pure map-side. */
  private def nearest(vec: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(dist2(vec, c).as("d2"), lit(i).as("cell"))
    }: _*))

  /** The `n` nearest cells as an int array — array_sort over the same
    * structs then slice. Still pure map-side. */
  private def nearestN(vec: Column, cents: Array[Array[Double]], n: Int): Column =
    transform(
      slice(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
        struct(dist2(vec, c).as("d2"), lit(i).as("cell"))
      }: _*)), 1, n),
      s => s.getField("cell"))

  /**
   * Literal-centroid plans stay codegen-friendly up to this many centroid
   * COMPONENTS (k × dim); beyond it assignment dispatches to a broadcast
   * centroid join (same arithmetic to the bit: float centroids, double
   * accumulation, (d2, cell) struct-min tie-break).
   */
  val defaultLiteralLimit = 4096

  /** Broadcast centroid table: (cell, cvec float, |c|² folded driver-side
    * exactly like [[dist2]] does). */
  private def centroidsDF(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.zipWithIndex.toSeq.map { case (c, i) =>
          val cf = c.map(_.toFloat)
          Row(i, cf.toSeq, cf.map(v => v.toDouble * v).sum)
        }, 1),
      StructType(Seq(
        StructField("cell", IntegerType),
        StructField("cvec", ArrayType(FloatType)),
        StructField("c2", DoubleType))))
  }

  /** Large-k assignment: broadcast-join every point against the centroid
    * table, struct-min per point. Output (__id, __d2, __cell), plus __v
    * when `carryVec` — the vector rides through the argmin struct instead
    * of being re-joined afterwards (one shuffle, not two; it cannot affect
    * the min because (d2, cell) is already unique per point). The Lloyd
    * iteration needs the vector for the centroid sums; the final
    * assignment does not, and leaving it out keeps that shuffle narrow. */
  private def assignViaJoin(vecs: DataFrame, cents: Array[Array[Double]],
      carryVec: Boolean = false): DataFrame = {
    val cdf = centroidsDF(vecs.sparkSession, cents)
    val scored = vecs.crossJoin(broadcast(cdf))
      .select(col("__id"),
        (Similarity.dot(col("__v"), col("__v")) -
          lit(2.0) * Similarity.dot(col("__v"), col("cvec")) + col("c2")).as("__d2"),
        col("cell"), col("__v"))
    val m =
      if (carryVec) struct(col("__d2"), col("cell"), col("__v"))
      else struct(col("__d2"), col("cell"))
    val out = Seq(col("__id"), col("__m.__d2").as("__d2"), col("__m.cell").as("__cell")) ++
      (if (carryVec) Seq(col("__m.__v").as("__v")) else Nil)
    scored.groupBy("__id").agg(min(m).as("__m")).select(out: _*)
  }

  /** Large-k top-n cells per point (the multi-probe analog). Output
    * (__id, cell), `n` rows per point. */
  private def nearestNViaJoin(
      vecs: DataFrame, cents: Array[Array[Double]], n: Int): DataFrame = {
    val cdf = centroidsDF(vecs.sparkSession, cents)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy(col("__d2"), col("cell"))
    vecs.crossJoin(broadcast(cdf))
      .select(col("__id"),
        (Similarity.dot(col("__v"), col("__v")) -
          lit(2.0) * Similarity.dot(col("__v"), col("cvec")) + col("c2")).as("__d2"),
        col("cell"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= n)
      .select(col("__id"), col("cell"))
  }

  /**
   * Fit with `iters` Lloyd iterations from deterministic seeds (the `k`
   * smallest-id vectors). Each iteration: literal-centroid argmin assign →
   * per-(cell, dim) partial sums (one narrow shuffle, k×dim rows collected)
   * → driver recomputes means. Empty cells keep their previous centroid.
   *
   * `idCol` must be UNIQUE and NON-NULL — the large-k join path keys its
   * per-point argmin on it (duplicate or null ids would silently collapse
   * or drop rows there, where the literal path would not).
   */
  def fit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      literalLimit: Int = defaultLiteralLimit): Result = {
    // Iterated over `iters` times — cache the projected (id, vector) pairs
    // so each Lloyd pass reads columnar cache, not the source again.
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var cents: Array[Array[Double]] = vecs.orderBy("__id").limit(k)
      .select("__v").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.length == k, s"corpus must contain at least $k vectors")
    def literal = cents.length.toLong * cents.head.length <= literalLimit
    val inertias = scala.collection.mutable.Buffer.empty[Double]

    for (_ <- 1 to iters) {
      val assigned =
        if (literal)
          vecs.select(col("__id"), col("__v"), nearest(col("__v"), cents).as("__n"))
            .select(col("__id"), col("__v"), col("__n.d2").as("__d2"), col("__n.cell").as("__cell"))
        else assignViaJoin(vecs, cents, carryVec = true)
      // One aggregation job yields the iteration's inertia AND the new
      // centroid sums: explode to (cell, dim, x) AFTER the argmin so the
      // shuffle carries k×dim×partitions partials, not vectors.
      val sums = assigned
        .select(col("__cell"), col("__d2"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy("__cell", "__dim")
        .agg(sum("__x").as("__s"), count(lit(1)).as("__n"),
          sum(when(col("__dim") === 0, col("__d2"))).as("__d2sum"))
        .collect()
      inertias += sums.flatMap(r => Option(r.get(4)).map(_.asInstanceOf[Double]))
        .sum
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val (cell, dim) = (r.getInt(0), r.getInt(1))
        next(cell)(dim) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    vecs.unpersist(blocking = false)

    // Lazy: one pass over the source when (and only if) the caller actually
    // evaluates the assignments — semanticDupPairs, for one, needs only the
    // centroids.
    val finalAssign =
      if (literal)
        corpus.select(col(idCol), nearest(col(vecCol), cents).getField("cell").as("cell"))
      else
        assignViaJoin(corpus.select(col(idCol).as("__id"), col(vecCol).as("__v")), cents)
          .select(col("__id").as(idCol), col("__cell").as("cell"))
    Result(finalAssign, cents, inertias.toSeq)
  }

  /**
   * SemDeDup-style semantic near-dup pairs: k-means the corpus, then exact
   * cosine pairs only WITHIN a shared cell — the pair join is keyed on the
   * cell, so the cross-cluster quadratic never materializes. Each point is
   * assigned to its `probes` nearest cells (multi-assignment): a pair is
   * searched iff the cell sets overlap, which recovers pairs straddling a
   * Voronoi boundary at the cost of `probes×` candidate volume. Precision
   * is exact by construction (candidates are cosine-verified).
   */
  def semanticDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      k: Int = 8,
      iters: Int = 4,
      probes: Int = 2,
      literalLimit: Int = defaultLiteralLimit): DataFrame = {
    val cents = fit(corpus, idCol, vecCol, k, iters, literalLimit).centroids
    val tagged =
      if (cents.length.toLong * cents.head.length <= literalLimit)
        corpus.select(col(idCol), col(vecCol),
          explode(nearestN(col(vecCol), cents, probes)).as("cell"))
      else
        corpus.join(
          nearestNViaJoin(corpus.select(col(idCol).as("__id"), col(vecCol).as("__v")),
            cents, probes).withColumnRenamed("__id", idCol),
          idCol)
          .select(col(idCol), col(vecCol), col("cell"))
    val a = tagged.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("__va"),
      Similarity.l2norm(col(vecCol)).as("__na"))
    val b = tagged.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("__vb"),
      Similarity.l2norm(col(vecCol)).as("__nb"))
    a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__va"), col("__vb"), col("__na"), col("__nb"))
      .dropDuplicates(Seq("id_a", "id_b"))
      .withColumn("cosine", when(col("__na") * col("__nb") > 0,
        Similarity.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b")
  }
}
