package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`): brute-force
 * cosine top-k as the exact baseline, and a random-hyperplane-LSH bucketed
 * variant as the 100 TB path (candidates come from a bucket join; the full
 * n×m cartesian never materializes).
 *
 * Dot products run through `aggregate`/`zip_with` higher-order functions with
 * a double accumulator — sequential over the array in both Spark and any
 * oracle engine, so results are deterministic.
 */
object Similarity {

  /** Sequential-fold dot product of two float arrays, accumulated in double.
    * Backed by the codegen'd [[graft.plans.DotProductExpr]] — bit-identical
    * to the `aggregate(zip_with(...))` formulation it replaced, but a
    * generated Java loop instead of per-element interpreted lambdas (this
    * runs O(pairs) times in every similarity operator). */
  def dot(a: Column, b: Column): Column =
    graft.plans.DotProductExpr.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL (not an ANSI divide-by-zero error, not a
    * NaN — which Spark compares GREATER than every number) when either
    * vector has zero norm, so `cosine >= t` filters drop undefined pairs
    * identically here and in any external SQL engine. */
  def cosine(a: Column, b: Column): Column = {
    val den = l2norm(a) * l2norm(b)
    when(den > 0, dot(a, b) / den)
  }

  /**
   * Exact cosine top-k: every query vector against every corpus vector.
   * The queries side is broadcast (it is small by construction); the corpus
   * is scanned once, partition-parallel; ranking shuffles only
   * (query_id, corpus_id, cosine) triples, never the vectors.
   * Output: (query_id, rank, neighbor_id, cosine), rank 1..k per query.
   */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /**
   * Deterministic pseudo-random hyperplane component for (plane, dim):
   * xxhash64 → uniform in [-1, 1). No RNG state, so the signature of a
   * vector is stable across runs and cluster topologies.
   */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(1L << 20)).cast("double") / (1L << 19)) - 1.0

  /** `nPlanes`-bit sign signature of a vector under fixed random hyperplanes
    * (`planeOffset` selects an independent plane family — used for banding). */
  def lshSignature(vec: Column, nPlanes: Int = 16, planeOffset: Int = 0): Column = {
    val dims = sequence(lit(1), size(vec))
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, dims, (x, i) => x.cast("double") * planeComponent(p + planeOffset, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * Embedding-cosine near-duplicate pairs — EXACT baseline: every pair with
   * cosine >= `minCosine`. O(n²) by definition; this is the verification
   * oracle shape, usable on samples. At corpus scale use
   * [[cosineDupPairsLsh]].
   *
   * `maxRows` guards the quadratic blowup: the call refuses a corpus larger
   * than this (one cheap count) rather than silently launching an n²-pair
   * cartesian on a full corpus. Pass a larger cap — or 0 to disable — only
   * when the quadratic cost is the point (an offline oracle recomputation).
   */
  def cosineDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, minCosine: Double,
      maxRows: Long = 100000): DataFrame = {
    if (maxRows > 0) {
      val n = corpus.count()
      require(n <= maxRows,
        s"cosineDupPairs is the exact O(n^2) oracle: corpus has $n rows > " +
          s"maxRows=$maxRows. Use cosineDupPairsLsh at scale, or pass a " +
          "larger maxRows (0 disables the guard) for a deliberate oracle run.")
    }
    // Norms precomputed per ROW (one pass) — only the dot product is per
    // pair; computing l2norm inside the pair loop would triple the work.
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      l2norm(col(vecCol)).as("__na"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      l2norm(col(vecCol)).as("__nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", when(col("__na") * col("__nb") > 0,
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b")
  }

  /**
   * Embedding-cosine near-dup pairs, 100 TB shape: exact-duplicate
   * collapse, then banded random-hyperplane LSH over the distinct vectors,
   * then join-based expansion back to member ids.
   *
   * The collapse is the same hot-key skew guard as the text path
   * ([[graft.ops.Dedup.nearDupPairs]]): byte-identical vectors — which
   * duplicate documents produce — share every LSH bucket in every table,
   * so a K-copy embedding would contribute K² candidate pairs per table.
   * Grouping on a fingerprint of the raw vector keeps the bucket join
   * bounded by the distinct-vector count. Exactness is rigorous because
   * cosine depends only on vector VALUES: cross-group pairs inherit the
   * representative pair's verification verbatim, and intra-group pairs are
   * included iff the group's self-cosine passes the threshold — computed,
   * not assumed, so the zero-vector NaN case and float-rounding at
   * `minCosine = 1.0` behave bit-identically to the un-collapsed join.
   */
  /**
   * @param eager materialize + release internal caches (the one-shot
   *   repeated-consumption pattern); false (default) keeps the result
   *   LAZY so a scale consumer can stream the — quadratic-in-duplication
   *   — pair list without a block-store copy. See [[Dedup.nearDupPairs]].
   * @param scope non-null overrides `eager`: internal caches register
   *   with the [[CacheScope]] for reuse across repeated same-corpus
   *   calls; the result stays lazy. See [[Dedup.nearDupPairs]].
   */
  def cosineDupPairsLsh(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      r: Int = 4,
      tables: Int = 16,
      eager: Boolean = false,
      scope: CacheScope = null): DataFrame = {
    Dedup.requireIntegralId(corpus, idCol, "cosineDupPairsLsh")
    val fpc = xxhash64(col(vecCol))
    val members = corpus.select(col(idCol).cast("long").as("__mid"), fpc.as("__fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps = corpus.select(col(idCol).cast("long").as("__mid"),
        col(vecCol).as("__rv"), fpc.as("__fp"))
      .groupBy("__fp")
      .agg(min("__mid").as("__rid"), min_by(col("__rv"), col("__mid")).as("__rv"),
        count(lit(1)).as("__sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repPairs = cosineDupPairsLshDistinct(
      reps.select(col("__rid").as(idCol), col("__rv").as(vecCol)),
      idCol, vecCol, minCosine, r, tables)
    val okGroups = reps.filter(col("__sz") > 1)
      .filter(cosine(col("__rv"), col("__rv")) >= minCosine)
      .select("__fp")
    val intraMembers = members.join(okGroups, "__fp")
    val intra = intraMembers.as("a").join(intraMembers.as("b"),
        col("a.__fp") === col("b.__fp") && col("a.__mid") < col("b.__mid"))
      .select(col("a.__mid").as("id_a"), col("b.__mid").as("id_b"))
    val repFp = reps.select("__rid", "__fp")
    val cross = repPairs
      .join(repFp.select(col("__rid").as("id_a"), col("__fp").as("__fpa")), "id_a")
      .join(repFp.select(col("__rid").as("id_b"), col("__fp").as("__fpb")), "id_b")
      .join(members.select(col("__mid").as("__xa"), col("__fp").as("__fpa")), "__fpa")
      .join(members.select(col("__mid").as("__xb"), col("__fp").as("__fpb")), "__fpb")
      .select(least(col("__xa"), col("__xb")).as("id_a"),
        greatest(col("__xa"), col("__xb")).as("id_b"))
    val out = intra.unionByName(cross)
    // Cache policy (see CacheScope): scoped reuse for repeated
    // same-corpus callers, materialize-then-release for one-shot callers,
    // lazy leak for stream-through consumers.
    if (scope != null) { scope.track(Seq(members, reps)); out }
    else if (eager) Dedup.materializedWith(out, members, reps)
    else out
  }

  /**
   * The LSH candidate + verification pipeline over DISTINCT vectors —
   * `tables` independent hash tables of `r` sign bits each; candidate
   * pairs come from same-bucket joins only (recall `1-(1-p^r)^tables` where
   * `p = 1 - angle/π`), then exact-cosine verification on candidates.
   */
  private def cosineDupPairsLshDistinct(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      r: Int,
      tables: Int): DataFrame = {
    val sig = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      explode(array((0 until tables).map(l =>
        struct(lit(l).as("tbl"),
          lshSignature(col(vecCol), r, planeOffset = l * r).as("bucket"))): _*)).as("__b"))
      .select(col("__id"), col("__v"), col("__b.tbl").as("__tbl"), col("__b.bucket").as("__bucket"))
    val cands = sig.as("a").join(sig.as("b"),
        col("a.__tbl") === col("b.__tbl") && col("a.__bucket") === col("b.__bucket") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__v").as("__va"), col("b.__v").as("__vb"))
      .dropDuplicates(Seq("id_a", "id_b"))
    cands.withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b")
  }

  /** Deterministic centroids via [[KMeans.fit]] (RNG-free: seeds are the
    * `nCells` smallest-id vectors, refined by Lloyd iterations). First-N
    * RAW vectors as centroids — the previous scheme — are skew-prone: on a
    * clustered corpus most vectors land in a few Voronoi cells and the
    * cell-bucket pruning that is the point of the persisted IVF layout at
    * 100 TB stops helping. Lloyd refinement spreads the centroids toward
    * the corpus's actual density modes, balancing cell occupancy. */
  private def seedCentroids(
      corpus: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame = {
    import org.apache.spark.sql.Row
    // KMeans.fit requires at least k vectors; a corpus smaller than nCells
    // must not be a runtime failure (first-N seeding degraded gracefully
    // here before) — cap k at the corpus size instead.
    val k = math.min(nCells.toLong, corpus.count()).toInt
    require(k > 0, "cannot seed IVF centroids from an empty corpus")
    val cents = KMeans.fit(corpus, idCol, vecCol, k = k, iters = 4).centroids
    val spark = corpus.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.zipWithIndex.toSeq.map { case (v, i) =>
          Row(i, v.map(_.toFloat).toSeq)
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cvec",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
  }

  /** Attach each row's `keep` nearest cells (by centroid cosine) as `cell`. */
  private def assignCells(df: DataFrame, cdf: DataFrame, vec: String, keep: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(cdf))
      .withColumn("__sim", cosine(col(vec), col("cvec"))).drop("cvec")
    val w = Window.partitionBy(df.columns.map(col): _*)
      .orderBy(desc("__sim"), asc("cell"))
    scored.withColumn("__cr", row_number().over(w))
      .filter(col("__cr") <= keep).drop("__cr", "__sim")
  }

  /** Candidate scoring shared by the IVF variants: probe×cell join → exact
    * cosine → top-k per query. */
  private def rankProbed(
      probes: DataFrame, cells: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(probes).join(cells, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "cosine").distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /**
   * IVF (inverted-file) approximate NN: the corpus is clustered into
   * `nCells` Voronoi cells around deterministic seed centroids; each query
   * probes only its `nProbe` nearest cells and exact-ranks inside them.
   * The cell assignment is one broadcast-centroid pass over the corpus,
   * recomputed per call — and since round 7 the seeding itself runs 4
   * Lloyd iterations (several Spark jobs + small driver collects) per
   * call, so the per-call cost is a short k-means fit, not just a scan.
   * Use [[persistIvf]] + [[ivfTopKPersisted]] to pay both once and reuse
   * the layout across queries.
   */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cdf = seedCentroids(corpus, idCol, vecCol, nCells)
    val cells = assignCells(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")), cdf, "__cv", keep = 1)
    val probes = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")), cdf, "__qv", keep = nProbe)
    rankProbed(probes, cells, k)
  }

  /**
   * Persist the IVF layout once: cell assignments as a CELL-BUCKETED
   * snapshot table (`<name>`) plus the nCells centroids (`<name>__centroids`).
   * At 100 TB the assignment pass over the corpus runs once here, not per
   * query; a probe then reads only its cells' buckets.
   * Returns (cells table, centroids table).
   */
  def persistIvf(
      catalog: graft.catalog.GraftCatalog,
      name: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int = 16,
      overwrite: Boolean = false): (graft.table.GraftTable, graft.table.GraftTable) = {
    val cdf = seedCentroids(corpus, idCol, vecCol, nCells)
    val assigned = assignCells(corpus.select(col(idCol), col(vecCol)), cdf, vecCol, keep = 1)
    val cells = catalog.materialized(name, overwrite)
    cells.overwriteBucketed(assigned, "cell", nCells)
    val cents = catalog.materialized(s"${name}__centroids", overwrite)
    cents.overwrite(cdf)
    (cells, cents)
  }

  /**
   * [[ivfTopK]] over a layout written by [[persistIvf]]: queries are
   * assigned to probe cells against the persisted centroids, the distinct
   * probe-cell set (small — |queries| × nProbe ints) is collected, and the
   * candidate read is a bucket-pruned [[graft.table.GraftTable.lookupKeys]]
   * over exactly those cells — no assignment pass over the corpus at query
   * time, and no scan of unprobed cells.
   */
  def ivfTopKPersisted(
      cells: graft.table.GraftTable,
      centroids: graft.table.GraftTable,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    val cdf = centroids.read()
    // Persisted: the assignment subtree feeds both the probe-cell collect
    // and the candidate ranking — uncached it would run twice (centroid
    // read + crossJoin + window per reference). Bounded by
    // |queries| × nProbe rows, the small side by contract.
    val probes = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")), cdf, "__qv", nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probeCells = probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val cand = cells.lookupKeys(probeCells)
      .select(col("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    rankProbed(probes, cand, k)
  }

  /**
   * Approximate NN: multi-table multi-probe hyperplane LSH. The corpus is
   * bucketed under `tables` INDEPENDENT `nPlanes`-bit signatures (disjoint
   * plane families via `planeOffset`); each query probes, in every table,
   * its own bucket plus all 1-bit flips, then exact-cosine-ranks the
   * candidate union. Per-neighbor recall is `1 - (1 - q)^tables` with
   * `q = p^r + r·p^(r-1)(1-p)` (`p = 1 - θ/π`, r = nPlanes) — a single
   * table with bit flips (the previous shape) measured 24-34% top-5 recall
   * on the synthetic corpus; 16 tables of 6 planes measure 96-100%.
   * Candidates per query ≈ tables × (nPlanes+1) × bucket size, deduped —
   * the join key is (table, bucket): one shuffle, never the n×m cartesian.
   */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 6,
      tables: Int = 8): DataFrame = {
    def sigs(vec: Column) = array((0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        lshSignature(vec, nPlanes, planeOffset = t * nPlanes).as("bkt"))): _*)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        explode(sigs(col(vecCol))).as("__b"))
      .select(col("neighbor_id"), col("__cv"),
        col("__b.tbl").as("__tbl"), col("__b.bkt").as("__bucket"))
    // per table: own bucket + every 1-bit flip of it
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        explode(sigs(col(vecCol))).as("__s"))
      .select(col("query_id"), col("__qv"), col("__s.tbl").as("__tbl"),
        explode(array(col("__s.bkt") +:
          (0 until nPlanes).map(p => col("__s.bkt").bitwiseXOR(lit(1L << p))): _*))
          .as("__bucket"))
    val scored = broadcast(probes).join(c, Seq("__tbl", "__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "cosine").distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
