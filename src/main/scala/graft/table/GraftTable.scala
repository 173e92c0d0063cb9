package graft.table

import java.nio.file.{Files, Path}
import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.dml.Merge
import graft.log.{CommitConflictException, Snapshot, SnapshotLog}

/**
 * A snapshot-versioned, keyed table: immutable Parquet data directories plus
 * a JSON snapshot log. This is the native stand-in for the Iceberg/Hudi
 * tables the reference orchestrates — same capability surface:
 *
 *  - latest-snapshot scan (`api_poc.py:372`)            → [[read]]
 *  - time travel `FOR VERSION AS OF` (`api_poc.py:374`) → [[readAsOf]]
 *  - `$snapshots` metadata relation (`api_poc.py:426`)  → [[snapshotsDF]]
 *  - append / replace ingest (`ingest_to_iceberg.py:52`)→ [[append]]/[[overwrite]]
 *  - Hudi COW upsert (`ingest_csv_hudi.py:80-99`)       → [[upsert]]
 *  - keyed delete (`delete_hudi.py:63-88`, `api_poc.py:803`) → [[deleteKeys]]/[[deleteWhere]]
 *  - single-row UPDATE/INSERT (`api_poc.py:728,763`)    → [[updateWhere]]/[[append]]
 *  - snapshot diff vs parent (`api_poc.py:420-487`)     → [[diff]]
 *
 * Scale notes: reads hand Catalyst a plain multi-directory Parquet relation
 * with an explicit schema, so vectorized scan, predicate pushdown, column
 * pruning and partition coalescing all apply untouched. Writes are
 * copy-on-write at data-directory granularity; at cluster scale the merge
 * output arrives pre-partitioned by key from the join shuffle (the analog of
 * the reference's `write.distribution-mode=hash`).
 */
/**
 * @param retainVersions  snapshot-log retention (reference keeps ≤100,
 *                        `cdc_merger_optimized.py:108,200`)
 * @param autoCompactAfter when > 0, an append that leaves more than this
 *                        many data dirs triggers an inline [[compact]] —
 *                        bounds the small-files accumulation of append-heavy
 *                        streams without an external maintenance job
 * @param statsColumns    columns to harvest manifest min/max statistics for
 *                        (plus, always, the bucket key and timestamp/date
 *                        columns). None = the default heuristic: id/key-named
 *                        columns and time columns — the ones range and point
 *                        reads actually prune on. Harvesting every column of
 *                        a wide table charged each merge commit a 16-column
 *                        statistics parse it never used; absence of stats
 *                        only disables skipping, never correctness.
 */
final class GraftTable(val spark: SparkSession, val root: Path, val name: String,
    retainVersions: Int = 100, autoCompactAfter: Int = 0,
    gcGraceMs: Long = 60L * 60 * 1000,
    statsColumns: Option[Set[String]] = None,
    val branchName: Option[String] = None) {

  val log = new SnapshotLog(root, retainVersions, gcGraceMs,
    branch = branchName)

  /**
   * Runs one of THIS table's data-directory writes with parquet timestamps
   * pinned to INT64 TIMESTAMP_MICROS. Spark's legacy INT96 encoding carries
   * no usable column-chunk statistics, which would leave the manifest-level
   * timestamp min/max pruning (readRange / dirFooterInfo) permanently inert
   * — reads stay correct via the always-read fallback, but every
   * time-window query would scan every dir.
   *
   * Scoped save/set/restore, NOT a constructor-time session mutation: round
   * 5 set this session-wide on table construction, which retagged every
   * LATER parquet write in the shared session (including ones that never
   * touch a GraftTable) from INT96 to adjusted-to-UTC micros — a visible
   * type change for any downstream naive-timestamp reader. Only the legacy
   * INT96 default is replaced even here: an application that deliberately
   * chose TIMESTAMP_MILLIS keeps its choice (MILLIS footers are safely
   * ignored by the harvest's unit check, so pruning stays off rather than
   * mis-firing). The window where the conf is altered is exactly the write
   * job of this table's own data. A concurrent writer on the same session
   * can interleave either way — planning inside the window picks up MICROS
   * (correct, statistics-bearing files), planning across a restore can
   * still pick up INT96 (correct files whose timestamp stats are absent,
   * so manifest skipping stays off for those dirs). Both outcomes preserve
   * correctness; stats harvesting is best-effort by design.
   */
  private def withMicrosFooters[T](body: => T): T = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key, "INT96")
    if (prev != "INT96") body
    else {
      spark.conf.set(key, "TIMESTAMP_MICROS")
      try body finally spark.conf.set(key, prev)
    }
  }

  // Shared by the serving lookups: building a fresh Hadoop conf per call
  // copies the whole session conf (~10 ms) — measurable against a
  // millisecond-class point read. Hadoop Configuration is thread-safe for
  // reads, and the serving path never mutates it.
  private lazy val servingConf = spark.sessionState.newHadoopConf()

  /** Fire-and-forget post-commit pre-warm of the serving caches for
    * freshly written dirs (relative paths) — see [[LocalPointRead
    * .prewarm]] for why. Queued on a single shared daemon thread so the
    * committing caller returns immediately. ONLY for tables something is
    * actually SERVING from (a point lookup in the last
    * [[GraftTable.PrewarmServeWindowMs]]): an interleaved bench A/B
    * showed unconditional post-commit warming costing 10-17% of
    * pure-ingest CDC throughput (the footer opens + per-file Hadoop conf
    * copies allocate enough to tax a 32-core saturated write via GC),
    * while a batch pipeline with no reader gains nothing from warm
    * footers. Kill switch: -Dgraft.serving.prewarm=false. */
  private def prewarmServing(rels: Seq[String]): Unit =
    // Dir cap: a commit fanning wider than this (a full rewrite of a huge
    // table) exceeds what the local serving path would read anyway (its
    // byte budget) — warming it would only churn the footer LRU. Serving
    //-scale tables stay fully covered.
    if (rels.nonEmpty && rels.size <= GraftTable.PrewarmMaxDirs &&
        LocalPointRead.enabled &&
        GraftTable.recentlyServed(rootKey) &&
        !sys.props.get("graft.serving.prewarm").contains("false")) {
      val abs = rels.map(r => root.resolve(r).toString)
      GraftTable.prewarmPool.execute(() =>
        LocalPointRead.prewarm(servingConf, abs))
    }

  private lazy val rootKey = root.toAbsolutePath.normalize.toString

  /** Record that this table is being point-served — gates the post-commit
    * pre-warm above. Called from the serving lookup entry points. */
  private def markServed(): Unit =
    GraftTable.servedTables.put(rootKey, System.currentTimeMillis())

  def schema: StructType =
    log.latest().map(s => DataType.fromJson(s.schemaJson).asInstanceOf[StructType])
      .getOrElse(new StructType())

  def latestVersion: Long = log.latest().map(_.snapshotId).getOrElse(0L)

  // ---------------------------------------------------------------- reads

  def read(): DataFrame =
    log.latest().map(readResolved).getOrElse(emptyDF(new StructType()))

  /** Base files plus, for merge-on-read snapshots, delta resolution. */
  private def readResolved(s: Snapshot): DataFrame = {
    val base = readSnapshot(s)
    val resolved =
      if (s.deltaDirs.isEmpty) base else resolveDeltas(s, base)
    // Physical -> logical at the API boundary (identity unless a column
    // was renamed; see [[ColumnIds]]). Everything upstream of this line —
    // file reads, delta resolution, stats — speaks physical names.
    ColumnIds.toLogical(resolved,
      DataType.fromJson(s.schemaJson).asInstanceOf[StructType])
  }

  /** The user-visible schema: logical column names (renames applied). */
  def logicalSchema: StructType = ColumnIds.logicalSchema(schema)

  /**
   * Merge-on-read resolution: base rows at sequence 0, each delta batch at
   * its position in the chain; latest sequence per key wins; a winning
   * delete tombstone (`__op = 'd'`) removes the key. The shuffle happens at
   * READ time — the write side of [[upsertDeferred]] only appends.
   */
  private def resolveDeltas(s: Snapshot, base: DataFrame): DataFrame =
    resolveDeltas(s, base, s.deltaDirs)

  /** [[resolveDeltas]] over a SUBSET of the delta chain (bucket-pruned
    * lookups): sequence positions still come from the FULL chain, so a
    * kept dir's rows rank exactly as they would in a complete resolution. */
  private def resolveDeltas(s: Snapshot, base: DataFrame,
      deltaSubset: Seq[String]): DataFrame = {
    val key = s.summary("mor_key")
    val all = base
      .withColumn("__op", lit(null).cast("string"))
      .withColumn("__seq", lit(0L))
      .unionByName(deltaFrame(s, deltaSubset))
    // latestAll (rank), not dedupLatest (row_number): delta batches are
    // pre-deduped per key, so sequences ≥ 1 never tie — but duplicate-key
    // BASE rows (plain appends) all sit at sequence 0, and a row_number
    // pick among them diverges between pruned and full candidate sets
    // (LookupProps caught exactly that). Rank keeps every tied seq-0 row,
    // which also matches what a copy-on-write read of the same appends
    // shows: resolution collapses superseded images, not duplicates.
    Merge.latestAll(all, key, "__seq")
      .filter(coalesce(col("__op") =!= "d", lit(true)))
      .drop("__op", "__seq")
  }

  /** The delta chain as one frame — snapshot schema plus `__op` (Debezium
    * op / null) and `__seq` (position in the chain, 1-based). Shared by
    * read-time resolution and bucket-partial compaction. */
  private def deltaFrame(s: Snapshot, deltaSubset: Seq[String]): DataFrame = {
    val st = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    val deltaSchema = StructType(st.fields :+
      org.apache.spark.sql.types.StructField("__op",
        org.apache.spark.sql.types.StringType, nullable = true))
    // ONE scan over every delta dir; each row's chain position is derived
    // from its file path. The previous shape — one scan subtree per delta
    // with a literal __seq — planned N scans whose generated code differs
    // only by embedded paths, so a 16-delta chain paid 16 codegen units and
    // 16 listings per read. Sequencing is ONE regexp extract of the
    // relative dir segment (everything after the table's "data/" up to the
    // file name) + one literal-map lookup — constant work per row
    // regardless of chain length, where the earlier when-fold ran one
    // contains() over the full path per delta. The key is the FULL relative
    // segment (e.g. "s3-abc/__bucket=2"): bucketed appends contribute
    // `__bucket=k` leaf dirs whose last path component repeats across
    // commits, so a leaf-name key would hand an older append a newer
    // commit's sequence. The greedy `.*` anchors on the LAST "/data/" so a
    // warehouse path that itself contains "/data/" cannot shift the match.
    val seqByDir: Map[String, Long] = s.deltaDirs.zipWithIndex.map {
      case (d, i) => d.stripPrefix("data/") -> (i + 1).toLong
    }.toMap
    val seqExpr = coalesce(
      element_at(typedLit(seqByDir),
        regexp_extract(input_file_name(), ".*/data/(.+)/[^/]+$", 1)),
      lit(0L))
    spark.read.schema(deltaSchema)
      .parquet(deltaSubset.map(d => root.resolve(d).toString): _*)
      .withColumn("__seq", seqExpr)
  }

  /** Time-travel read. Throws on unknown snapshot id. */
  def readAsOf(snapshotId: Long): DataFrame =
    readResolved(log.get(snapshotId).getOrElse(
      throw new NoSuchElementException(s"table $name has no snapshot $snapshotId")))

  /**
   * Time travel with the reference's expired-snapshot fallback
   * (`api_poc.py:462-468`): an unknown / expired id silently resolves to
   * the latest snapshot.
   */
  def readAsOfOrLatest(snapshotId: Long): DataFrame =
    log.get(snapshotId).map(readResolved).getOrElse(read())

  /**
   * Snapshot-cutoff time travel (P6, the Hudi `_hoodie_commit_time <= ts`
   * shape of `lake_shell.py:268`): newest snapshot committed at or before
   * `ts` (ISO-8601 UTC instant). Instants are PARSED before comparing —
   * `Instant.toString` emits variable fractional-second precision, so
   * lexicographic order can disagree with chronological order.
   */
  def readAsOfTimestamp(ts: String): DataFrame = {
    val cutoff = java.time.Instant.parse(ts)
    // Core-only scan to pick the cutoff snapshot (no detail inflation for
    // the N-1 rejected manifests), then one full read for the winner.
    // Candidates newest-first: if the winner EXPIRES between the core scan
    // and its log.get (retention GC racing this read), fall through to the
    // next-older retained snapshot instead of returning an empty frame —
    // the same next-best degradation the old full-materialize path had.
    log.snapshotsCore()
      .filter(s => !java.time.Instant.parse(s.committedAt).isAfter(cutoff))
      .sortBy(-_.snapshotId)
      .iterator.flatMap(c => log.get(c.snapshotId))
      .nextOption()
      .map(readResolved)
      .getOrElse(emptyDF(schema))
  }

  /**
   * Range scan with MANIFEST-LEVEL data skipping: data dirs whose recorded
   * [min, max] for `column` cannot intersect [lower, upper] are pruned
   * BEFORE any file is listed — the lakehouse data-skipping move. On an
   * append-heavy table whose commits are naturally range-correlated (a
   * time-series ingest, a monotonically keyed load), a window query plans
   * against the handful of matching dirs instead of every commit ever made;
   * parquet row-group min/max then skips within the surviving files. Dirs
   * without recorded stats are always read (skipping is an optimization,
   * never a filter), NULL never matches a range predicate so all-null
   * chunks are safely unrepresented, and pending MOR deltas fall back to
   * the resolving read. Numeric, string, timestamp and date columns prune;
   * other types read everything.
   */
  def readRange(column: String, lower: Any, upper: Any): DataFrame =
    readBox(Seq(column -> (lower, upper)))

  /**
   * Multi-column box scan: the conjunction of per-column ranges, with
   * manifest skipping on EVERY bounded column — a dir survives only if its
   * recorded [min, max] intersects ALL the windows. This is the read shape
   * Z-order clustering exists for: each clustered dir is a tight bounding
   * box on every cluster column, so a 2-D box prunes multiplicatively
   * where a single-column range read prunes on one dimension and filters
   * the rest row-by-row. Same semantics as [[readRange]] otherwise
   * (missing stats always read; NULL never matches; pending MOR deltas
   * resolve on top of the pruned base).
   */
  def readBox(bounds0: Seq[(String, (Any, Any))]): DataFrame = {
    require(bounds0.nonEmpty, "readBox needs at least one column range")
    val headOpt = log.latest()
    if (headOpt.isEmpty) return emptyDF(new StructType())
    val head = headOpt.get
    // The head manifest is already in hand — parse its schema directly
    // instead of re-listing and re-reading the log through `schema`.
    val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    // Bound columns arrive under their user-visible (logical) names.
    val bounds = bounds0.map { case (c, w) =>
      ColumnIds.physicalFor(st, c) -> w }
    bounds.foreach { case (c, _) =>
      require(st.fieldNames.contains(c), s"table $name has no column $c") }
    val between = bounds.map { case (c, (lower, upper)) =>
      col(c) >= lit(lower) && col(c) <= lit(upper)
    }.reduce(_ && _)
    val dirs = statPrunedDirs(head, st, bounds)
    // With pending merge-on-read deltas, base dirs STILL prune exactly like
    // the copy-on-write path — EVERY delta dir is read, and a delta image
    // always outranks a base row for its key, so dropping a base dir whose
    // stats exclude the window can never change a final image: a base-only
    // key there is out-of-window by its stats; a delta'd key's winner is in
    // the delta scan regardless. Without this, a streaming MOR table (the
    // CDC shape, queried by time window between compactions) would lose ALL
    // manifest skipping while any delta is pending. Deltas are bounded by
    // compactEvery, so the unpruned remainder stays small.
    val base =
      if (dirs.isEmpty) emptyDF(st)
      else spark.read.schema(st)
        .parquet(dirs.map(d => root.resolve(d).toString): _*)
    ColumnIds.toLogical(
      (if (head.deltaDirs.nonEmpty) resolveDeltas(head, base) else base)
        .filter(between), st)
  }

  /** Manifest-level data skipping shared by [[readBox]] and [[readPoint]]:
    * the head's data dirs whose recorded per-column [min, max] can
    * intersect EVERY bound. Dirs without stats always survive — skipping
    * is an optimization, never a filter.
    *
    * Per-column parsed-stats arrays are cached ON the snapshot instance
    * (same lifetime contract as [[Snapshot.dataDirsByBucket]]): the first
    * range/point plan against a head pays one O(dirs) parse of that
    * column's min/max strings; every later plan is two comparisons per
    * dir over the arrays. At 10⁶ dirs that is the difference between
    * ~200 ms and ~10 ms of driver planning per repeated range query —
    * the dashboard/serving shape. */
  private[graft] def statPrunedDirs(head: Snapshot, st: StructType,
      bounds: Seq[(String, (Any, Any))]): Seq[String] = {
    // Per-column stat-domain windows, resolved once outside the dir loop.
    // INVARIANT: dir-level skipping is a CORRECTNESS decision — rows in a
    // wrongly dropped dir are never read, so no re-filter above the scan
    // can restore them. Pruning on a column is sound only while its
    // recorded min/max strings live in the SAME stats domain statBound
    // maps query bounds into. A widened column breaks that: narrow-era
    // commits recorded stats in the OLD type's domain (DATE days vs
    // TIMESTAMP_NTZ micros) and dirStats carry no per-dir era marker, so
    // while the widened flag is set (i.e. narrow-era files may still
    // exist) the column must not stat-prune at all. Any full rewrite
    // clears the flag and re-records stats in the wide domain.
    val statWindows = bounds.map { case (c, (lower, upper)) =>
      val f = st(c)
      val dt = f.dataType
      if (ColumnIds.isWidened(f)) (c, dt, None, None)
      else (c, dt, statBound(lower, dt), statBound(upper, dt))
    }
    // A bound that cannot enter the stats domain (type mismatch, unknown
    // type, widened column) prunes nothing for that column; drop it
    // before array work.
    val active = statWindows.collect {
      case (c, dt, Some(lo), Some(hi)) => (c, dt, lo, hi)
    }
    if (active.isEmpty) return head.dataDirs
    val n = head.dataDirs.size
    val perCol = active.map { case (c, dt, lo, hi) =>
      val cached = head.statArrays(c, {
        val mns = new Array[AnyRef](n)
        val mxs = new Array[AnyRef](n)
        val minKey = s"$c:min"
        val maxKey = s"$c:max"
        def fillParsed(i: Int, mnS: String, mxS: String): Unit =
          if (mnS != null && mxS != null) {
            val mn = parseStat(mnS, dt)
            val mx = parseStat(mxS, dt)
            if (mn.isDefined && mx.isDefined) {
              mns(i) = mn.get.asInstanceOf[AnyRef]
              mxs(i) = mx.get.asInstanceOf[AnyRef]
            }
          }
        // Column-major access into packed stats (r18): a binary-parsed
        // dir's stats are dict-indexed ([[graft.log.PackedStatsMap]]);
        // resolving the column to its dict index ONCE per document turns
        // each dir's reads into int scans — no string hashing or compares
        // on the million-dir walk. Plain maps (fresh commits' dirs, legacy
        // JSON parses) take the string-keyed path.
        var lastDict: Array[String] = null
        var minIdx = -1
        var maxIdx = -1
        def fill(i: Int, s: Map[String, String]): Unit = s match {
          case p: graft.log.PackedStatsMap =>
            if (p.dict ne lastDict) {
              lastDict = p.dict
              minIdx = lastDict.indexOf(minKey)
              maxIdx = lastDict.indexOf(maxKey)
            }
            if (minIdx >= 0 && maxIdx >= 0)
              fillParsed(i, p.valueAt(minIdx), p.valueAt(maxIdx))
          case m =>
            fillParsed(i, m.getOrElse(minKey, null), m.getOrElse(maxKey, null))
        }
        // Optimistic ALIGNED merge-walk (r18): the binary detail codec
        // states dirs-with-stats in dataDirs order (extras after), so one
        // forward scan over both sequences fills the arrays with ZERO
        // hashing. The prior shape — dirStats.get(d) per dir — forced the
        // array-backed map's one-time string index (a 10⁶-entry hash
        // build) plus a hash probe per dir, most of the measured 755 ms
        // first-range-plan cost at 10⁶ dirs. Safety: a fill happens only
        // at an exact string match, and an unmatched entry merely leaves
        // nulls (dir kept — pruning stays conservative); a step budget
        // of 2n bounds misordered sources (legacy JSON maps), which
        // rebuild via the hash path below, correctness identical.
        val dirArr = new Array[String](n)
        locally { var i = 0
          head.dataDirs.foreach { d => dirArr(i) = d; i += 1 } }
        var cursor = 0
        var steps = 0L
        var aligned = true
        val entries = head.dirStats.iterator
        while (aligned && entries.hasNext) {
          val (d, s) = entries.next()
          var j = cursor
          while (j < n && steps <= 2L * n &&
              !((dirArr(j) eq d) || dirArr(j) == d)) {
            j += 1; steps += 1
          }
          if (steps > 2L * n) aligned = false
          else if (j < n) { fill(j, s); cursor = j + 1 }
          // j == n: an entry outside dataDirs (delta-dir stats ride the
          // extras section) — skip it, cursor unchanged.
        }
        if (!aligned) {
          java.util.Arrays.fill(mns, null)
          java.util.Arrays.fill(mxs, null)
          var i = 0
          head.dataDirs.foreach { d =>
            head.dirStats.get(d).foreach(s => fill(i, s))
            i += 1
          }
        }
        (mns, mxs)
      })
      (cached._1, cached._2, lo, hi)
    }
    val keep = Seq.newBuilder[String]
    var i = 0
    head.dataDirs.foreach { d =>
      var ok = true
      val it = perCol.iterator
      while (ok && it.hasNext) {
        val (mns, mxs, lo, hi) = it.next()
        val mn = mns(i)
        // null = no recorded/parsable stats for this dir+column: keep.
        if (mn != null && (statLt(mxs(i), lo) || statLt(hi, mn))) ok = false
      }
      if (ok) keep += d
      i += 1
    }
    keep.result()
  }

  /** User-supplied range bound → the stats domain (long / double / string). */
  private[graft] def statBound(v: Any, dt: DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => v match {
        case n: Number => Some(n.longValue)
        case _ => None
      }
      case FloatType | DoubleType => v match {
        case n: Number => Some(n.doubleValue)
        case _ => None
      }
      // Only a STRING bound prunes a string column: stringifying a numeric
      // bound would prune lexicographically while Spark's filter compares
      // numerically — type mismatches must mean "no pruning", like every
      // other branch.
      case StringType => v match {
        case s: String => Some(s)
        case _ => None
      }
      case TimestampType => v match {
        case t: java.sql.Timestamp =>
          Some(graft.functions.Coerce.timestampMicros(t))
        case i: java.time.Instant =>
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case s: String => scala.util.Try(java.time.Instant.parse(s)).toOption
          .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000)
        case _ => None
      }
      // NTZ stats live in the same micros domain: the footer records the
      // wall-clock value as micros-from-epoch with no zone adjustment, and
      // LocalDateTime-at-UTC reproduces exactly that number.
      case TimestampNTZType => v match {
        case t: java.time.LocalDateTime =>
          val i = t.toInstant(java.time.ZoneOffset.UTC)
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case _ => None
      }
      case DateType => v match {
        case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
        case d: java.time.LocalDate => Some(d.toEpochDay)
        case s: String =>
          scala.util.Try(java.time.LocalDate.parse(s)).toOption.map(_.toEpochDay)
        case _ => None
      }
      case _ => None
    }
  }

  /** Manifest stat string → the stats domain, per the column's type. */
  private[graft] def parseStat(s: String, dt: DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | TimestampType |
           TimestampNTZType | DateType =>
        s.toLongOption
      case FloatType | DoubleType => s.toDoubleOption
      case StringType => Some(s)
      case _ => None
    }
  }

  /**
   * Ordering over the stats domain. Strings compare as UNSIGNED UTF-8
   * BYTES — the order parquet's statistics comparator and Spark's
   * UTF8String both use; Java's native UTF-16 compareTo disagrees for
   * supplementary-plane text (surrogates sort below U+E000 in UTF-16 but
   * above it in UTF-8), which would mis-prune dirs containing emoji.
   */
  private[graft] def statLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Double, y: Double) => x < y
    case (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    case _ => false
  }

  // ------------------------------------------- bloom-filter skipping index

  /**
   * Per-dir bloom-filter index on `column` — equality skipping where
   * min/max stats cannot help (the Delta bloom-index / Hudi
   * metadata-bloom capability). The bucket layout prunes point reads on
   * the ONE bucket key; manifest min/max prunes columns the layout is
   * ordered/clustered by. A high-cardinality column that is neither (a
   * user id inside event payloads, a document hash, a URL) hits every dir
   * on both — at 10^5 dirs that is a full-table scan for a needle. A
   * per-dir bloom answers "definitely not in this dir" for ~10 bits per
   * distinct value, and [[readPoint]] reads only the dirs that might.
   *
   * Entries are DIR facts, not snapshot facts: a data dir is immutable
   * once committed, so `(dir, bloom-of-column-values)` can never go
   * stale — rewrites (compact/cluster/upsert) produce NEW dirs, which are
   * simply uncovered until the next [[refreshBloomIndex]] and are always
   * read meanwhile (skipping degrades, never lies). That also makes the
   * index branch-agnostic: branch reads prune with main's entries, because
   * both reference the same immutable dirs. Entries for dead dirs are
   * ignored (reads intersect with the head) and swept by [[buildBloomIndex]]
   * rebuilds.
   *
   * The index lives as a narrow parquet sidecar
   * (`_log/index/bloom_<col>/`: dir, items, bloom bytes) — O(dirs) rows.
   * Build is one distributed pass over the UNCOVERED dirs only: per-task
   * blooms via `mapPartitions` keyed by the row's dir (the input is
   * dir-partitioned parquet, so a task nearly always holds exactly one
   * dir), merged with `reduceByKey` — bloom bytes shuffle, values never
   * do. Values are xxhash64'd on the EXECUTOR by the same Spark expression
   * the probe side uses, so build and probe agree bit-for-bit by
   * construction. Expected items per dir come from the manifest's
   * `dirRecords` (no counting job), capped so one dir's bloom stays
   * shuffle-friendly; a capped bloom over-admits (higher fpp) but never
   * excludes a present value.
   *
   * Returns the number of dirs (re)indexed.
   */
  def buildBloomIndex(column: String, fpp: Double = 0.01,
      maxItemsPerDir: Long = 20_000_000L): Int =
    writeBloomEntries(ColumnIds.physicalFor(schema, column),
      fpp, maxItemsPerDir, rebuild = true)

  /** Extend the index to head dirs not yet covered (post-append/compact
    * maintenance) — covered dirs are immutable, so they are never re-read. */
  def refreshBloomIndex(column: String, fpp: Double = 0.01,
      maxItemsPerDir: Long = 20_000_000L): Int =
    writeBloomEntries(ColumnIds.physicalFor(schema, column),
      fpp, maxItemsPerDir, rebuild = false)

  /** Columns with a bloom index, from the table-lifetime props sidecar. */
  def bloomIndexedColumns: Seq[String] =
    log.props().get("bloom.columns")
      .map(_.split(",").iterator.filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)

  private def bloomIndexPath(column: String): Path =
    root.resolve("_log").resolve("index").resolve(s"bloom_$column")

  private def writeBloomEntries(column: String, fpp: Double,
      maxItemsPerDir: Long, rebuild: Boolean): Int = {
    val headOpt = log.latest()
    if (headOpt.isEmpty) return 0
    val head = headOpt.get
    val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    require(st.fieldNames.contains(column), s"table $name has no column $column")
    val path = bloomIndexPath(column)
    val covered: Set[String] =
      if (rebuild || !Files.exists(path)) Set.empty
      else spark.read.parquet(path.toString)
        .select("dir").collect().map(_.getString(0)).toSet
    val todo = head.dataDirs.filterNot(covered)
    if (todo.nonEmpty) {
      val expected = todo.map { d =>
        d.stripPrefix("data/") ->
          math.min(math.max(head.dirRecords.getOrElse(d, 65536L), 1024L),
            maxItemsPerDir)
      }.toMap
      val bExpected = spark.sparkContext.broadcast(expected)
      val hashed = spark.read.schema(st)
        .parquet(todo.map(d => root.resolve(d).toString): _*)
        .select(
          regexp_extract(input_file_name(), ".*/data/(.+)/[^/]+$", 1).as("__dir"),
          xxhash64(col(column)).as("__h"))
      val entries = hashed.rdd
        .map(r => (r.getString(0), r.getLong(1)))
        .mapPartitions { it =>
          val perDir = scala.collection.mutable.HashMap
            .empty[String, org.apache.spark.util.sketch.BloomFilter]
          it.foreach { case (d, h) =>
            perDir.getOrElseUpdate(d, org.apache.spark.util.sketch.BloomFilter
              .create(bExpected.value.getOrElse(d, 65536L), fpp)).putLong(h)
          }
          perDir.iterator.map { case (d, bf) =>
            val bos = new java.io.ByteArrayOutputStream()
            bf.writeTo(bos)
            (d, (bos.toByteArray, 0L))
          }
        }
        .reduceByKey { (a, b) =>
          val fa = org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(a._1))
          fa.mergeInPlace(org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(b._1)))
          val bos = new java.io.ByteArrayOutputStream()
          fa.writeTo(bos)
          (bos.toByteArray, 0L)
        }
        .map { case (d, (bytes, _)) => Row("data/" + d, bytes) }
      val idxSchema = StructType(Seq(
        org.apache.spark.sql.types.StructField("dir",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("bloom",
          org.apache.spark.sql.types.BinaryType, nullable = false)))
      spark.createDataFrame(entries, idxSchema).write
        .mode(if (rebuild) "overwrite" else "append").parquet(path.toString)
    } else if (rebuild && Files.exists(path)) {
      // nothing to index but a rebuild was asked: drop dead-dir entries
      spark.createDataFrame(new java.util.ArrayList[Row](), StructType(Seq(
        org.apache.spark.sql.types.StructField("dir",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("bloom",
          org.apache.spark.sql.types.BinaryType, nullable = false))))
        .write.mode("overwrite").parquet(path.toString)
    }
    val cols = (bloomIndexedColumns :+ column).distinct
    log.putProp("bloom.columns", cols.mkString(","))
    todo.size
  }

  /**
   * Equality read with BOTH skipping tiers: manifest min/max first (free,
   * driver-side), then the bloom index — one narrow job over the O(dirs)
   * sidecar that transfers a (dir, hit) boolean per entry, never the bloom
   * bytes. Only dirs that survive both are scanned; dirs the index does
   * not cover are always read. The probe hashes `lit(value)` CAST TO THE
   * COLUMN'S TYPE with the same `xxhash64` expression the build used, so
   * probe and build agree on the hash domain by construction (an int
   * probed against a long column would otherwise hash differently and
   * silently disable the index). Pending MOR deltas resolve on top of the
   * pruned base — sound for the same reason as [[readBox]]: every delta
   * dir is read, and a pruned base dir holds no row equal to `value`, so
   * its base-only keys fail the filter anyway and its delta'd keys resolve
   * from the delta scan.
   */
  def readPoint(column0: String, value: Any): DataFrame = {
    require(value != null, "readPoint probes equality; NULL never matches")
    val headOpt = log.latest()
    if (headOpt.isEmpty) return emptyDF(new StructType())
    val head = headOpt.get
    val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val column = ColumnIds.physicalFor(st, column0)
    require(st.fieldNames.contains(column), s"table $name has no column $column0")
    val dt = st(column).dataType
    val statDirs = statPrunedDirs(head, st, Seq(column -> (value, value)))
    val path = bloomIndexPath(column)
    val dirs =
      if (!Files.exists(path)) statDirs
      else {
        // Deserializing the bloom per entry is one readFrom per DIR — the
        // udf is justified like the corpus-bloom probe (Dedup.scala): no
        // Catalyst expression evaluates an arbitrary serialized sketch.
        val probe = udf((bytes: Array[Byte], h: Long) =>
          bytes == null || org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(bytes)).mightContainLong(h))
        val definiteMiss = spark.read.parquet(path.toString)
          .select(col("dir"),
            probe(col("bloom"), xxhash64(lit(value).cast(dt))).as("hit"))
          .collect().iterator
          .filter(!_.getBoolean(1)).map(_.getString(0)).toSet
        statDirs.filterNot(definiteMiss)
      }
    val base =
      if (dirs.isEmpty) emptyDF(st)
      else spark.read.schema(st)
        .parquet(dirs.map(d => root.resolve(d).toString): _*)
    ColumnIds.toLogical(
      (if (head.deltaDirs.nonEmpty) resolveDeltas(head, base) else base)
        .filter(col(column) === lit(value).cast(dt)), st)
  }

  /**
   * SERVING form of [[readPoint]]: materialized rows with ZERO Spark jobs
   * on the steady-state path — the non-bucket-column sibling of
   * [[lookupKeyRows]]. Dir pruning runs entirely on the driver: manifest
   * min/max from the head already in hand, then the bloom sidecar from a
   * driver-side cache (one small load job per sidecar version, then pure
   * in-memory probes — [[BloomIndexCache]]); the surviving dirs decode
   * through the same cached-footer stats-pruned reader the key-lookup
   * serving path uses. The driver-side probe hash is computed by the SAME
   * Catalyst expressions the build ran on executors (`Cast` to the column
   * type, then `XxHash64`), so serving, distributed probe and build agree
   * bit-for-bit. Falls back to the distributed [[readPoint]] whenever the
   * serving preconditions fail — pending MOR deltas (resolution needs the
   * rank cut), unsupported schema, byte budget exceeded — never silently
   * narrowing semantics.
   */
  def readPointRows(column0: String, value: Any): Seq[Row] = {
    markServed()
    val column = ColumnIds.physicalFor(schema, column0)
    val fast: Option[Seq[Row]] =
      try {
        val headOpt = log.latest()
        if (headOpt.isEmpty) return Seq.empty
        val head = headOpt.get
        if (head.deltaDirs.nonEmpty || !LocalPointRead.enabled) None
        else {
          val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
          require(st.fieldNames.contains(column),
            s"table $name has no column $column0")
          if (!LocalPointRead.supports(st)) None
          else {
            val dt = st(column).dataType
            val tz = spark.sessionState.conf.sessionLocalTimeZone
            import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
            val catKey = Cast(Literal(value), dt, Some(tz)).eval(null)
            if (catKey == null) Some(Seq.empty) // `= NULL` matches nothing
            else {
              val statDirs = statPrunedDirs(head, st, Seq(column -> (value, value)))
              val dirs = BloomIndexCache.bloomsFor(spark,
                  bloomIndexPath(column), LocalPointRead.budgetBytes) match {
                case Some(blooms) =>
                  val h = new XxHash64(Seq(Literal(catKey, dt)))
                    .eval(null).asInstanceOf[Long]
                  // uncovered dirs always survive — skipping never lies
                  statDirs.filter(d =>
                    blooms.get(d).forall(_.mightContainLong(h)))
                case None => statDirs
              }
              if (dirs.isEmpty) Some(Seq.empty)
              else {
                val abs = dirs.map(d => root.resolve(d).toString)
                LocalPointRead.totalBytes(servingConf, abs) match {
                  case Some(total) if total <= LocalPointRead.budgetBytes =>
                    LocalPointRead.lookupRows(spark, servingConf, abs, st,
                      column, value)
                  case _ => None
                }
              }
            }
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    // Fallback takes the ORIGINAL (logical) name — readPoint maps it itself.
    fast.getOrElse(readPoint(column0, value).collect().toSeq)
  }

  private def readSnapshot(s: Snapshot): DataFrame = {
    val st = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    if (s.dataDirs.isEmpty) emptyDF(st)
    else {
      // Explicit snapshot schema: files written before a schema evolution
      // lack the newer columns and the reader fills typed nulls — the
      // scan-time analog of unionByName(allowMissingColumns = true).
      val r = spark.read.schema(st)
      // Bucketed tables advertise their layout to the optimizer: with
      // GraftExtensions registered, a literal filter on the bucket key over
      // this scan is rewritten to read only the matching bucket dirs
      // (graft.plans.BucketPruneRule) — lookupKey semantics for plain reads.
      val withSpec = bucketSpecOf(s) match {
        case Some((bk, nb)) =>
          r.option(graft.plans.BucketPruneRule.KeyOption, bk)
            .option(graft.plans.BucketPruneRule.CountOption, nb.toString)
        case None => r
      }
      withSpec.parquet(s.dataDirs.map(d => root.resolve(d).toString): _*)
    }
  }

  private def emptyDF(st: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], st)

  /** The `$snapshots` metadata relation (`api_poc.py:490-492`). */
  def snapshotsDF: DataFrame = {
    // Core-only manifest reads: the metadata relation never needs the
    // O(dirs) detail files.
    val rows = log.snapshotsCore().map { s =>
      (s.snapshotId, s.parentId, s.committedAt, s.operation,
        s.summary.get("records").map(_.toLong))
    }
    import spark.implicits._
    rows.toDF("snapshot_id", "parent_id", "committed_at", "operation", "records")
  }

  /**
   * Commit history: distinct commit times + record counts
   * (`lake_shell.py:222`). Ordered by snapshot_id (monotonic by
   * construction) — `committed_at` is an ISO string whose fractional-second
   * precision varies, so lexicographic order can disagree with commit order.
   */
  def history: DataFrame =
    snapshotsDF.orderBy(desc("snapshot_id"))
      .select("committed_at", "operation", "records")

  // --------------------------------------------- metadata-only aggregates

  /**
   * Answer `count(*)` and per-column `min`/`max` from the MANIFEST alone —
   * no data file is opened (Iceberg's metadata-only scan). The manifest
   * already carries per-dir record counts and per-dir column min/max
   * harvested from parquet footers at write time, so the whole computation
   * is a driver-side fold over O(dirs) entries: on the 100 TB table this
   * answers in milliseconds where a scan is a full-table job. Returns None
   * when the metadata CANNOT give the exact answer, in which case callers
   * fall back to the distributed scan ([[statsSummary]]); decline cases:
   *
   *  - pending MOR deltas (updates/tombstones change counts and extremes
   *    in ways only resolution can see);
   *  - any data dir missing its record count (older write paths);
   *  - a requested column missing min/max stats on any non-empty dir
   *    (all-null dirs, or columns outside the harvest set) — a dir
   *    without the stat could hold the true extreme;
   *  - string columns: parquet MAY truncate binary statistics, which is
   *    sound for range PRUNING (bounds stay conservative) but not for
   *    reporting an exact min/max value.
   *
   * Extremes come back as Spark EXTERNAL types (java.sql.Date/Timestamp,
   * boxed numerics) matching the column's type, null for an empty table.
   */
  def statsFromMetadata(
      columns: Seq[String] = Seq.empty): Option[(Long, Seq[(String, Any, Any)])] = {
    val head = log.latest().getOrElse(
      return Some((0L, columns.map(c => (c, null, null)))))
    statsFromMetadataAt(head, columns)
  }

  /** [[statsFromMetadata]] folded at a SPECIFIC snapshot — the form the v2
    * connector's aggregate pushdown uses, so a scan pinned by
    * `VERSION AS OF` (or planned moments before a concurrent commit)
    * answers for ITS snapshot, never a newer head. */
  def statsFromMetadataAt(
      head: Snapshot,
      columns: Seq[String]): Option[(Long, Seq[(String, Any, Any)])] = {
    import org.apache.spark.sql.types._
    if (head.deltaDirs.nonEmpty) return None
    if (!head.dataDirs.forall(head.dirRecords.contains)) return None
    val cnt = head.dataDirs.map(head.dirRecords).sum
    val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val live = head.dataDirs.filter(d => head.dirRecords(d) > 0)
    def colStat(c: String): Option[(String, Any, Any)] = {
      val f = st.fields.find(_.name == c).getOrElse(return None)
      if (f.dataType == StringType) return None
      // A widened column's narrow-era dir stats live in the OLD type's
      // domain (DATE days vs TIMESTAMP_NTZ micros); folding them under
      // the wide type would return a WRONG pushed-down MIN/MAX answer.
      // Decline — the scan computes the aggregate from real rows instead.
      if (ColumnIds.isWidened(f)) return None
      if (live.isEmpty) return Some((c, null, null))
      val perDir = live.map { d =>
        val stats = head.dirStats.getOrElse(d, Map.empty)
        for {
          mn <- stats.get(s"$c:min").flatMap(parseStat(_, f.dataType))
          mx <- stats.get(s"$c:max").flatMap(parseStat(_, f.dataType))
        } yield (mn, mx)
      }
      if (perDir.exists(_.isEmpty)) None
      else {
        val vs = perDir.flatten
        val mn = vs.map(_._1).reduce((a, b) => if (statLt(b, a)) b else a)
        val mx = vs.map(_._2).reduce((a, b) => if (statLt(a, b)) b else a)
        Some((c, statExternal(mn, f.dataType), statExternal(mx, f.dataType)))
      }
    }
    val cols = columns.map(colStat)
    if (cols.exists(_.isEmpty)) None else Some((cnt, cols.flatten))
  }

  /** Stats domain (long / double) → the column's Spark EXTERNAL type. */
  private def statExternal(v: Any, dt: DataType): Any = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => v.asInstanceOf[Long].toByte
      case ShortType => v.asInstanceOf[Long].toShort
      case IntegerType => v.asInstanceOf[Long].toInt
      case LongType => v
      case FloatType => v.asInstanceOf[Double].toFloat
      case DoubleType => v
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Long]))
      case TimestampType =>
        val l = v.asInstanceOf[Long]
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000))
      case TimestampNTZType =>
        val l = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofInstant(java.time.Instant.ofEpochSecond(
          Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000),
          java.time.ZoneOffset.UTC)
      case _ => v
    }
  }

  /**
   * One-row summary `(cnt, <col>_min, <col>_max, ...)`: metadata-only when
   * [[statsFromMetadata]] can answer exactly, else the equivalent
   * distributed aggregate over [[read]] — same schema, same values, so
   * callers never need to know which path ran.
   */
  def statsSummary(columns: Seq[String] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.types._
    statsFromMetadata(columns) match {
      case Some((cnt, cols)) =>
        val st = DataType.fromJson(log.latest().map(_.schemaJson)
          .getOrElse(new StructType().json)).asInstanceOf[StructType]
        val fields = StructField("cnt", LongType, nullable = false) +:
          cols.flatMap { case (c, _, _) =>
            val dt = st.fields.find(_.name == c).map(_.dataType).getOrElse(NullType)
            Seq(StructField(s"${c}_min", dt), StructField(s"${c}_max", dt))
          }
        val row = Row.fromSeq(cnt +: cols.flatMap(c => Seq(c._2, c._3)))
        spark.createDataFrame(
          java.util.Collections.singletonList(row), StructType(fields))
      case None =>
        val aggs = count(lit(1)).as("cnt") +: columns.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
        read().agg(aggs.head, aggs.tail: _*)
    }
  }

  // ----------------------------------------------------- bucketed layout

  /** Hash-bucket spec `(key, numBuckets)` if this table is bucketed. */
  def bucketSpec: Option[(String, Int)] = log.latest().flatMap(bucketSpecOf)

  /** Default merge key for surfaces that identify rows without an explicit
    * pk (DML endpoints, `TABLE_CHANGES`, diff views): the DECLARED bucket
    * key when the table has one — it IS the table's merge key, and feeds
    * over delta commits reject any other pk — else the id-looking column.
    * The name heuristic alone is a trap on tables carrying several
    * `*_id` columns (an events table keyed `event_id` but carrying
    * `user_id` would default to the non-unique `user_id`). */
  def defaultPk: String = bucketSpec.map(_._1)
    .filter(schema.fieldNames.contains)
    .map(ColumnIds.logicalFor(schema, _)) // user-visible name of the key
    .getOrElse(graft.functions.Identifiers.findIdCol(
      logicalSchema.fieldNames.toSeq))

  private def bucketSpecOf(s: Snapshot): Option[(String, Int)] =
    for {
      k <- s.summary.get("bucket_key")
      n <- s.summary.get("bucket_count")
    } yield (k, n.toInt)

  private val BucketCol = "__bucket"

  private def bucketId(key: String, n: Int): Column =
    pmod(xxhash64(col(key)), lit(n)).cast("int")

  private def bucketOfDir(dir: String): Option[Int] = {
    val marker = BucketCol + "="
    val i = dir.lastIndexOf(marker)
    if (i < 0) None else Some(dir.substring(i + marker.length).toInt)
  }

  private def newDataRel(snapshotId: Long): String =
    s"data/s$snapshotId-${UUID.randomUUID().toString.take(8)}"

  /**
   * Write `df` hash-bucketed by `key` into one commit dir with
   * `__bucket=<k>` leaf dirs; returns per-leaf [[DirInfo]] in bucket
   * order. The partition column lives only in the directory name — leaf
   * dirs are read directly, so scans never see it.
   */
  private def writeBucketedDir(
      df: DataFrame, key: String, n: Int, rel: String): Seq[DirInfo] = {
    // Floating-point bucket keys are refused at the layout choke point:
    // xxhash64 hashes raw IEEE bits, so -0.0 and 0.0 — equal under SQL
    // `=` (Spark compares primitives) — would land in DIFFERENT buckets,
    // and a pruned lookup would miss rows the full scan finds. Same
    // philosophy as widenColumn's bucket-key guard: the hash layout only
    // admits types whose equality agrees with their bit patterns.
    df.schema.find(_.name == key).map(_.dataType).foreach { kt =>
      require(kt != org.apache.spark.sql.types.FloatType &&
        kt != org.apache.spark.sql.types.DoubleType,
        s"cannot bucket by $key: floating-point keys (${kt.simpleString}) " +
          "hash by IEEE bit pattern, so -0.0/0.0 — equal under SQL '=' — " +
          "would land in different buckets; use an exact-typed key")
    }
    val abs = root.resolve(rel).toString
    // Repartition on the bucket id before the partitioned write — the
    // analog of the reference's `write.distribution-mode=hash`
    // (`cdc_merger_optimized.py:107,201`). Without it every task writes a
    // file into every bucket dir (tasks × buckets small files per commit);
    // with it each bucket is one task's single file, which is also what
    // keeps later scans and partial merges one-file-per-bucket fast.
    // Sorted by key WITHIN each bucket: row-group and page min/max become
    // tight, non-overlapping key ranges, so point/range predicates inside a
    // bucket skip at the parquet level once files grow past one row group
    // (the 100 TB bucket) — and sorted columns compress better. The sort is
    // per-task over one bucket's rows, a trivial cost next to the write.
    // Small row groups (default 4 MB instead of parquet's 128 MB): a
    // key-sorted bucket file then carries MANY disjoint-key-range row
    // groups, and the serving point lookup — which prunes row groups
    // against the footer stats it already holds in cache — decodes ~4 MB
    // no matter how large the bucket grows. At 128 MB groups a dozens-MB
    // bucket is ONE group and stats pruning can skip nothing. The scan
    // cost of extra group boundaries on these serving tables is noise
    // next to that; deltas and unbucketed writes keep parquet defaults.
    // Fan-out cap: hash-partitioning on the bucket id keeps every bucket
    // wholly inside one task at ANY partition count (partition =
    // hash(bucket) % m), so one-file-per-bucket holds for m < n just as
    // for m = n — a task simply writes several bucket leaves. Scheduling
    // n tasks regardless of batch size made a 1-row append to a
    // 1024-bucket table pay ~4 s of empty-task overhead at local
    // parallelism; capped at 2× cluster parallelism the same append is
    // sub-second, while a real cluster (defaultParallelism >= buckets)
    // still fans out fully for the large rewrite case.
    val fan = math.min(n,
      math.max(16, spark.sparkContext.defaultParallelism * 2))
    withMicrosFooters {
      df.withColumn(BucketCol, bucketId(key, n))
        .repartition(fan, col(BucketCol))
        .sortWithinPartitions(col(BucketCol), col(key))
        .write.option("parquet.block.size", GraftTable.bucketRowGroupBytes)
        .partitionBy(BucketCol).mode("overwrite").parquet(abs)
    }
    val tF = System.nanoTime()
    val leaves = leafCounts(rel, statsKeep(Some(key)))
    GraftTable.lastFooterSec = (System.nanoTime() - tF) / 1e9
    leaves
  }


  /** One written data directory: relative path, exact row count, and the
    * per-column min/max harvested from the same footer pass (empty map for
    * columns whose physical type carries no usable statistics). */
  private case class DirInfo(rel: String, rows: Long, stats: Map[String, String])

  /**
   * Name-level predicate for which columns the footer pass harvests min/max
   * statistics for. Timestamp/date columns are ALWAYS kept (detected at the
   * parquet-annotation level inside [[dirFooterInfo]]); beyond those, the
   * explicit `statsColumns` set (if declared) or the id/key-name heuristic
   * decides. Parsing statistics for every column of a wide table on every
   * commit was measurable write-path cost that no read ever used.
   */
  private def statsKeep(bucketKey: Option[String]): String => Boolean =
    statsColumns match {
      case Some(set) => n => set.contains(n) || bucketKey.contains(n)
      case None => n => bucketKey.contains(n) || GraftTable.idLike(n)
    }

  /**
   * Row count + column min/max statistics for every parquet file in one
   * directory, from the FOOTERS of what was just written: driver-side
   * metadata reads (one listStatus + one footer per file), no Spark job and
   * no per-row work in the write itself — footer row counts and chunk
   * statistics are exact and already materialized by the writer. Stats are
   * kept for INT32/INT64/FLOAT/DOUBLE and UTF-8 BINARY chunks (timestamps
   * ride as INT64 micros); a column with any unreadable chunk is dropped
   * from the map — absence means "cannot prune", never "wrong bounds".
   * All-null chunks contribute nothing (a range predicate never selects
   * NULL, so the remaining bounds stay valid).
   */
  private def dirFooterInfo(
      fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      dirPath: org.apache.hadoop.fs.Path,
      keep: String => Boolean): (Long, Map[String, String]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    var rows = 0L
    val mins = scala.collection.mutable.Map.empty[String, Any]
    val maxs = scala.collection.mutable.Map.empty[String, Any]
    val bad = scala.collection.mutable.Set.empty[String]
    // Timestamp/date columns are prune-worthy regardless of name — detected
    // here from the parquet logical annotation, so `keep` stays a pure
    // name predicate.
    def timeAnnotated(tpe: org.apache.parquet.schema.PrimitiveType): Boolean =
      tpe.getLogicalTypeAnnotation match {
        case _: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => true
        case _: org.apache.parquet.schema.LogicalTypeAnnotation.DateLogicalTypeAnnotation => true
        case _ => false
      }
    fs.listStatus(dirPath).toSeq
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks.asScala.toSeq
          rows += blocks.map(_.getRowCount.toLong).sum
          blocks.flatMap(_.getColumns.asScala).foreach { cc =>
            val name = cc.getPath.toDotString
            if (!bad.contains(name) &&
                (keep(name) || timeAnnotated(cc.getPrimitiveType))) {
              val st: org.apache.parquet.column.statistics.Statistics[_] =
                cc.getStatistics
              if (st == null || st.isEmpty) bad += name
              else if (!st.hasNonNullValue) () // all-null chunk
              else {
                val tpe = cc.getPrimitiveType
                // An INT64 timestamp chunk is only usable when its unit is
                // MICROS (our readers' domain): a MILLIS-annotated writer
                // (spark.sql.parquet.outputTimestampType=TIMESTAMP_MILLIS)
                // would record values 1000x smaller than the query bounds
                // and mis-prune everything. Plain longs have no annotation
                // and pass through.
                def int64UnitOk: Boolean = tpe.getLogicalTypeAnnotation match {
                  case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS
                  case _ => true
                }
                val mnmx: Option[(Any, Any)] = tpe.getPrimitiveTypeName match {
                  case INT64 if int64UnitOk =>
                    Some((st.genericGetMin.asInstanceOf[Number].longValue,
                      st.genericGetMax.asInstanceOf[Number].longValue))
                  case INT32 => Some((st.genericGetMin.asInstanceOf[Number].longValue,
                    st.genericGetMax.asInstanceOf[Number].longValue))
                  case DOUBLE => Some((st.genericGetMin.asInstanceOf[Number].doubleValue,
                    st.genericGetMax.asInstanceOf[Number].doubleValue))
                  case FLOAT => Some((st.genericGetMin.asInstanceOf[Number].doubleValue,
                    st.genericGetMax.asInstanceOf[Number].doubleValue))
                  case BINARY
                    if tpe.getLogicalTypeAnnotation.isInstanceOf[
                      org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                    Some((
                      st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
                      st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8))
                  case _ => None
                }
                mnmx match {
                  case Some((mn, mx)) =>
                    if (!mins.contains(name) || statLt(mn, mins(name))) mins(name) = mn
                    if (!maxs.contains(name) || statLt(maxs(name), mx)) maxs(name) = mx
                  case None => bad += name
                }
              }
            }
          }
        } finally r.close()
      }
    val stats = mins.keys.filterNot(bad.contains).flatMap { c =>
      Seq(s"$c:min" -> mins(c).toString, s"$c:max" -> maxs(c).toString)
    }.toMap
    (rows, stats)
  }

  /**
   * Per-leaf [[DirInfo]] for a freshly written bucketed commit dir. Leaves
   * that received no rows are never created by the partitioned write, so
   * presence == non-empty. The footer opens are independent I/O — run
   * CONCURRENTLY instead of one leaf at a time: a 10-second CDC micro-batch
   * pays this per commit, and on an object store each sequential footer
   * round-trip would be tens of milliseconds.
   */
  private def leafCounts(rel: String, keep: String => Boolean,
      partCol: String = BucketCol): Seq[DirInfo] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(root.resolve(rel).toString)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Seq.empty
    val leaves = fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .sortBy(s => s.getPath.getName.stripPrefix(partCol + "=").toInt)
    val futures = leaves.map { leaf =>
      scala.concurrent.Future {
        // blocking{}: footer opens are synchronous filesystem I/O, and the
        // global pool is CPU-sized — without the marker a wide bucketed
        // commit would park every fork-join worker on I/O and starve any
        // other driver-side user of the pool. blocking{} lets the pool
        // spawn compensation threads for the duration.
        scala.concurrent.blocking {
          val (rows, stats) = dirFooterInfo(fs, conf, leaf.getPath, keep)
          DirInfo(s"$rel/${leaf.getPath.getName}", rows, stats)
        }
      }(scala.concurrent.ExecutionContext.global)
    }
    futures
      .map(scala.concurrent.Await.result(_, scala.concurrent.duration.Duration(120, "s")))
      .filter(_.rows > 0)
  }

  /**
   * Full replace with hash-bucketing — the layout that makes every later
   * keyed DML a PARTIAL rewrite: an upsert/delete touching k of n buckets
   * rewrites only those k leaf dirs and carries the other n-k forward
   * verbatim. At 100 TB this is the difference between a 10-second CDC
   * micro-batch rewriting gigabytes vs the full table.
   */
  def overwriteBucketed(df: DataFrame, key: String, numBuckets: Int): Snapshot = {
    val next = latestVersion + 1
    val leaves = writeBucketedDir(df, key, numBuckets, newDataRel(next))
    val total = leaves.map(_.rows).sum
    log.commit("overwrite", df.schema.json, leaves.map(_.rel),
      Map("records" -> total.toString,
        "bucket_key" -> key, "bucket_count" -> numBuckets.toString),
      dirRecords = leaves.map(l => l.rel -> l.rows).toMap,
      dirStats = leaves.filter(_.stats.nonEmpty).map(l => l.rel -> l.stats).toMap)
  }

  /** Partial-rewrite merge for bucketed tables: only touched buckets move.
   *
   * One cheap pre-pass over the RAW batch (keys only — dedup cannot change
   * the key set, so it is skipped here) yields the touched-bucket set and
   * the batch row count reused as the broadcast-gate hint. An
   * exchange-free variant (one scan subtree per touched bucket feeding a
   * partition-aligned write) was measured WORSE: each subtree's generated
   * code embeds its own file paths, so nothing hits the codegen cache and
   * every merge pays ~n compilations. One scan + one repartition of the
   * merged output is the plan that amortizes.
   */
  private def commitBucketedMerge(
      head: Snapshot,
      updates: DataFrame,
      key: String,
      n: Int,
      operation: String,
      mergeFn: (DataFrame, DataFrame, Option[Long]) => DataFrame,
      batchKey: Option[String],
      rebaseAppends: Boolean = false): Snapshot = {
    // `head` is the snapshot the CALLER derived its inputs from — the
    // upsert/delete guard checks (no pending deltas) and compact's chain
    // resolution all speak it. Re-reading log.latest() here instead used
    // to open a torn-read window: a delta/append landing between the
    // caller's read and this one joined the re-read head's chain, the CAS
    // then succeeded against THAT head, and the commit silently dropped
    // the interloper's rows (cleared deltaDirs / treated its chain dir as
    // already-resolved). One head, read once, end to end — anything that
    // lands after it must fail the CAS (or rebase, for compact).
    // Phase wall-clocks (a few nanoTime reads + one volatile write per
    // commit — always on): pre-pass / merge+write / footer listing / log
    // commit, published via [[GraftTable.lastMergePhases]] so a slow CDC
    // micro-batch is attributable to a NAMED phase from the bench trace.
    // For compact(), the pre-pass DELIBERATELY forces the cached chain
    // resolution: its time is the one-time rank-cut materialization the
    // merge's two references (anti-join keys + union rows) then reuse.
    // Measured r15 (sf0.1, 16 buckets, 8-delta chain): moving the
    // resolution out of the pre-pass behind a key-only distinct scan made
    // the trace prettier (prepass 19% instead of ~40-70%) and the TOTAL
    // 33% slower (4.37 s vs 3.28 s) — the chain was never read twice, so
    // the "cheap" precount was pure added work. Keep the forcing pre-pass.
    val tA = System.nanoTime()
    val (touched: Set[Int], updateRows: Long) = {
      val bucketCounts = updates.select(bucketId(key, n).as("__b"))
        .groupBy("__b").count().collect()
      (bucketCounts.map(_.getInt(0)).toSet,
        bucketCounts.map(_.getLong(1)).sum)
    }
    val tB = System.nanoTime()
    val (touchedDirs, untouchedDirs) =
      head.dataDirs.partition(d => bucketOfDir(d).exists(touched.contains))
    val st = schema
    val target =
      if (touchedDirs.isEmpty) emptyDF(st)
      else spark.read.schema(st).parquet(touchedDirs.map(d => root.resolve(d).toString): _*)
    val merged = mergeFn(target, updates, Some(updateRows))
    val next = latestVersion + 1
    val newLeaves = writeBucketedDir(merged, key, n, newDataRel(next))
    val tC = System.nanoTime()
    val carried = untouchedDirs.map(d => d -> carriedRecordCount(head, d))
    val allDirs = carried ++ newLeaves.map(l => l.rel -> l.rows)
    val total = allDirs.map(_._2).sum
    // Untouched dirs carry their stats forward verbatim; rewritten buckets
    // get the stats of what was just written.
    val allStats =
      head.dirStats.view.filterKeys(untouchedDirs.toSet).toMap ++
        newLeaves.filter(_.stats.nonEmpty).map(l => l.rel -> l.stats)
    // The merged output was computed against `head`'s data — if another
    // writer committed meanwhile, this result is stale and MUST NOT land.
    // commitExpecting fails it; DML writers are expected to serialize (or
    // catch CommitConflictException and re-run the merge). Concurrent
    // appends remain safe: they retry against the new head.
    // restoreMeta: merge transforms drop field metadata, and losing
    // graft.logical/graft.id here would silently revert renamed columns.
    val committedSchema = ColumnIds.restoreMeta(merged.schema, st).json
    val baseSummary = Map("bucket_key" -> key, "bucket_count" -> n.toString)
    val snap =
      if (rebaseAppends)
        commitRebasing(head, operation, committedSchema, allDirs,
          allStats.toMap, baseSummary, batchKey)
      else log.commitExpecting(Some(head.snapshotId), operation,
        committedSchema, allDirs.map(_._1),
        baseSummary + ("records" -> total.toString),
        batchKey, allDirs.toMap, dirStats = allStats.toMap)
    val tD = System.nanoTime()
    val footer = GraftTable.lastFooterSec
    GraftTable.lastMergePhases = Some(Seq(
      "prepass" -> (tB - tA) / 1e9, "merge_write" -> ((tC - tB) / 1e9 - footer),
      "footer" -> footer, "commit" -> (tD - tC) / 1e9))
    prewarmServing(newLeaves.map(_.rel)) // rewritten buckets, warm serving
    snap
  }

  /**
   * Commit a rewrite derived from `planned` while surviving interleaved
   * APPEND-ONLY commits — the availability story for compaction under
   * continuous ingest. A compact is single-attempt CAS by design (a stale
   * merge must never land over a commit that touched its inputs), but under
   * four racing appenders that meant the compactor could starve forever
   * while `morDeltaMaxBytes` marched the table toward refusing reads. The
   * rebase closes the gap without re-paying the chain resolution + bucket
   * rewrite: on a lost race, re-read the head and walk every interleaved
   * snapshot — if each one is purely ADDITIVE (same schema, data dirs a
   * superset of its parent's, delta chain extended by suffix only), then
   * none of them touched any dir this rewrite consumed OR carried, and the
   * rewrite's output is still a correct resolution of the state it read.
   * The interleaved dirs did not exist at plan time, so re-CASing the SAME
   * output with those dirs carried forward verbatim (records and stats from
   * the new head) produces a state identical to compact-then-append — the
   * legal serialization in which this compact committed first. Interleaved
   * DELTA commits carry forward as the new (shorter) pending chain: the
   * compacted base resolves at sequence 0 and every pending delta above it,
   * exactly the rank order those rows had against the longer pre-compact
   * chain, so read results are unchanged.
   *
   * Any non-additive interleaving (another rewrite, a delete, a schema
   * evolution) keeps today's refuse — that commit may have rewritten an
   * input this merge consumed, and only a full re-derive is sound. Attempts
   * are bounded; each retry is metadata-only (no data is re-read or
   * re-written), so losing 64 straight metadata races would mean the log
   * itself is unavailable.
   */
  private[graft] def commitRebasing(
      planned: Snapshot,
      operation: String,
      schemaJson: String,
      outDirs: Seq[(String, Long)],
      outStats: Map[String, Map[String, String]],
      baseSummary: Map[String, String],
      batchKey: Option[String],
      // false (chain-RESOLVING rewrites — compact): planned's chain was
      // folded into outDirs, only interleaved NEW deltas stay pending.
      // true (chain-PRESERVING rewrites — minor compaction): the full
      // chain at the new head carries forward verbatim.
      keepPendingDeltas: Boolean = false,
      maxAttempts: Int = 64): Snapshot = {
    val plannedSchema = DataType.fromJson(planned.schemaJson)
    var attempts = 0
    while (true) {
      attempts += 1
      val head = log.latest().getOrElse(throw new IllegalStateException(
        s"table $name lost its snapshot log mid-$operation"))
      if (head.snapshotId != planned.snapshotId) {
        var prev = planned
        ((planned.snapshotId + 1) to head.snapshotId).foreach { id =>
          val s = log.get(id).getOrElse(throw new CommitConflictException(
            s"$operation lost the commit race and snapshot $id expired " +
              "before the rebase could verify it was append-only"))
          // Parsed-schema equality (not JSON text): field METADATA matters
          // (graft.id / graft.logical), serialization key order does not.
          val sData = s.dataDirs.toSet
          val additive = DataType.fromJson(s.schemaJson) == plannedSchema &&
            prev.dataDirs.forall(sData) &&
            s.deltaDirs.startsWith(prev.deltaDirs)
          if (!additive) throw new CommitConflictException(
            s"$operation lost the commit race to non-append snapshot $id " +
              s"(${s.operation}); the rewrite must re-derive against the new head")
          prev = s
        }
      }
      val plannedData = planned.dataDirs.toSet
      val extraData = head.dataDirs.filterNot(plannedData)
      val extraDelta =
        if (keepPendingDeltas) head.deltaDirs
        else head.deltaDirs.drop(planned.deltaDirs.size)
      val allDirs = outDirs ++ extraData.map(d => d -> carriedRecordCount(head, d))
      val allStats = outStats ++
        head.dirStats.view.filterKeys(extraData.toSet).toMap
      val summary = baseSummary +
        ("records" -> allDirs.map(_._2).sum.toString) ++
        // Carried pending deltas keep the chain readable: resolution needs
        // the key, and the count mirrors what upsertDeferred would record.
        (if (extraDelta.nonEmpty)
          Map("mor_key" -> head.summary("mor_key"),
            "pending_deltas" -> extraDelta.size.toString)
        else Map.empty)
      try {
        return log.commitExpecting(Some(head.snapshotId), operation,
          schemaJson, allDirs.map(_._1), summary, batchKey,
          allDirs.toMap, extraDelta, allStats)
      } catch {
        case e: CommitConflictException => if (attempts >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // --------------------------------------------------------------- writes

  private def writeDataDir(df: DataFrame, snapshotId: Long): DirInfo = {
    val rel = s"data/s$snapshotId-${UUID.randomUUID().toString.take(8)}"
    val abs = root.resolve(rel).toString
    withMicrosFooters { df.write.mode("overwrite").parquet(abs) }
    // Record count AND column min/max come from the footers of what was
    // just written — one driver-side metadata pass, no read-back Spark job
    // (this replaced an observe() accumulator, which counted rows but could
    // not supply the statistics the manifest now carries for data skipping).
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(abs)
    val (rows, stats) = dirFooterInfo(p.getFileSystem(conf), conf, p, statsKeep(None))
    DirInfo(rel, rows, stats)
  }

  private def align(df: DataFrame, st: StructType,
      keep: Seq[String] = Nil): DataFrame = {
    // Case-insensitive resolution (analyzer semantics, locale-free — see
    // Merge.unionSchema/lc): an incoming "ID" lands in the table's "id",
    // written under the table's canonical spelling. `keep` columns ride
    // along untouched (feed tag columns).
    val have = df.columns
      .map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
    df.select(st.fields.toSeq.map { f =>
      have.get(f.name.toLowerCase(java.util.Locale.ROOT)) match {
        case Some(c) => col(c).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    } ++ keep.map(col): _*)
  }

  /** Full replace (`writeTo(t).createOrReplace()` in the reference).
    * `extraSummary` entries ride the commit's summary — state that must be
    * atomic with the data lands in the same manifest (e.g. the base version
    * a materialized-view refresh reflects). */
  def overwrite(df: DataFrame,
      extraSummary: Map[String, String] = Map.empty): Snapshot = {
    val next = latestVersion + 1
    val d = writeDataDir(df, next)
    log.commit("overwrite", df.schema.json, Seq(d.rel),
      Map("records" -> d.rows.toString) ++ extraSummary,
      dirRecords = Map(d.rel -> d.rows),
      dirStats = if (d.stats.nonEmpty) Map(d.rel -> d.stats) else Map.empty)
  }

  /**
   * Append with schema-union evolution (`ingest_csv_hudi.py:112-146`): the
   * table schema grows to the union; incoming rows are padded with typed
   * nulls for historical columns; existing files are NOT rewritten.
   */
  def append(df0: DataFrame, batchKey: Option[String] = None): Snapshot = {
    // The data is written ONCE (against the head's evolved schema); only
    // the head-derived commit content (dir list, evolved schema, totals)
    // is re-derived if a concurrent writer wins the commit race
    // (compare-and-swap via commitExpecting — see commitAppendDirs).
    if (batchKey.exists(log.contains)) return log.latest().get
    val head = log.latest()
    val df = ColumnIds.toPhysical(df0, head.map(s =>
      DataType.fromJson(s.schemaJson).asInstanceOf[StructType])
      .getOrElse(new StructType()))
    val evolved = head.map(s => Merge.unionSchema(
      DataType.fromJson(s.schemaJson).asInstanceOf[StructType], df.schema))
      .getOrElse(df.schema)
    val next = latestVersion + 1
    val aligned = align(df, evolved)
    val newDirs = bucketSpec match {
      // Bucketed table: appended rows must land in bucket leaf dirs, or
      // they would escape later partial-rewrite merges.
      case Some((bk, n)) if evolved.fieldNames.contains(bk) =>
        writeBucketedDir(aligned, bk, n, newDataRel(next))
      case _ =>
        Seq(writeDataDir(aligned, next))
    }
    commitAppendDirs(newDirs, evolved, batchKey)
  }

  /**
   * Commit already-written data dirs as an append — the metadata half of
   * [[append]], shared with writers that produced their files on the
   * executors (the v2 streaming sink's [[appendStaged]]): the CAS retry
   * loop, schema union, totals, and the pending-MOR-chain rule (a dir
   * appended while deltas pend joins the CHAIN, sequenced last, so its
   * rows win read-time resolution over earlier delta images).
   */
  private def commitAppendDirs(
      newDirs: Seq[DirInfo],
      writtenSchema: StructType,
      batchKey: Option[String]): Snapshot = {
    var attempts = 0
    while (true) {
      attempts += 1
      val head = log.latest()
      val appended = newDirs.map(_.rows).sum
      val prior = head.flatMap(_.summary.get("records")).map(_.toLong).getOrElse(0L)
      val dirs = head.map(_.dataDirs).getOrElse(Seq.empty) ++ newDirs.map(_.rel)
      val dirRecs = head.map(_.dirRecords).getOrElse(Map.empty) ++
        newDirs.map(l => l.rel -> l.rows)
      val schemaJson = head.map(s => Merge.unionSchema(
        DataType.fromJson(s.schemaJson).asInstanceOf[StructType], writtenSchema).json)
        .getOrElse(writtenSchema.json)
      val spec = bucketSpec.map { case (bk, n) =>
        Map("bucket_key" -> bk, "bucket_count" -> n.toString)
      }.getOrElse(Map.empty)
      // With MOR deltas pending, the appended dir joins the DELTA chain
      // (sequenced after the pending batches) instead of the base: a row
      // appended after an earlier delta for the same key must win the
      // read-time resolution, and base rows all sit at sequence 0.
      val pendingDeltas = head.map(_.deltaDirs).getOrElse(Seq.empty)
      val (commitDataDirs, commitDeltaDirs, morSummary) =
        if (pendingDeltas.nonEmpty)
          (head.map(_.dataDirs).getOrElse(Seq.empty),
            pendingDeltas ++ newDirs.map(_.rel),
            Map("mor_key" -> head.get.summary("mor_key"),
              "pending_deltas" -> (pendingDeltas.size + newDirs.size).toString))
        else (dirs, Seq.empty[String], Map.empty[String, String])
      // Stats only for dirs that are part of the base data set: delta dirs
      // are resolved at read time and ALWAYS read (readRange prunes base
      // dirs only), so their stats would never be consulted. Branch-local
      // O(added) construction — the head's stats keys are already confined
      // to its base dirs by this same rule on every prior commit (the same
      // invariant every other commit site that produces dirStats maintains:
      // commitRewrite, upsert/delete COW, compaction), so no O(dirs)
      // re-filter is needed: plain append extends the base (head stats
      // stay, new stats join); a pending-MOR append changes NO base dir
      // (head stats alone). One cheap repair path remains for the invariant
      // ever being violated upstream (an older-format table, a direct
      // SnapshotLog.commitExpecting caller passing unfiltered stats): a
      // stray key makes the stats map strictly LARGER than the base-dir
      // set, and only then do we pay the O(dirs) re-filter once — without
      // it the stray would propagate through every subsequent append
      // forever.
      val headBaseDirs = head.map(_.dataDirs).getOrElse(Seq.empty)
      val headStats = {
        val raw = head.map(_.dirStats).getOrElse(Map.empty)
        if (raw.size <= headBaseDirs.size) raw
        else { val base = headBaseDirs.toSet; raw.view.filterKeys(base).toMap }
      }
      val statsAll =
        if (pendingDeltas.nonEmpty) headStats
        else headStats ++
          newDirs.filter(_.stats.nonEmpty).map(l => l.rel -> l.stats)
      // The commit's base-dir delta is known outright here (fresh dir
      // names; nothing removed) — the hint lets the segmented-detail
      // encoder stay O(delta) instead of re-deriving added/removed from
      // the full dir sets (at 10^6 dirs: sub-second vs ~7 s per append).
      val deltaHint = graft.log.DirDelta(
        added = if (pendingDeltas.nonEmpty) Seq.empty else newDirs.map(_.rel))
      try {
        val snap = log.commitExpecting(head.map(_.snapshotId), "append", schemaJson,
          commitDataDirs,
          Map("records" -> (prior + appended).toString,
            "appended" -> appended.toString) ++ spec ++ morSummary,
          batchKey, dirRecs, commitDeltaDirs, statsAll, Some(deltaHint))
        // The most common served-table ingest verb (plain appends, the v2
        // streaming sink's epoch commits via appendStaged) warms like the
        // merge/rewrite paths — same served-gate, same cap.
        prewarmServing(newDirs.map(_.rel))
        return {
          if (autoCompactAfter > 0 && snap.dataDirs.size > autoCompactAfter) compact()
          else snap
        }
      } catch {
        case _: graft.log.CommitConflictException if attempts < 64 => // re-derive
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /**
   * Commit an EXECUTOR-WRITTEN staged dir as an append — the v2 streaming
   * sink's epoch commit ([[graft.connector]]): the tasks already wrote
   * `stagedRel` (bucket leaves on a bucketed table, plain files
   * otherwise); this runs the same footer pass every write path uses for
   * counts/stats and the shared [[commitAppendDirs]] CAS loop. Idempotent
   * under `batchKey`: an epoch replayed after a restart re-stages into a
   * fresh dir, the commit sees the key and returns the committed head, and
   * the replay's unreferenced dir is the orphan GC's normal diet.
   */
  private[graft] def appendStaged(
      stagedRel: String,
      writeSchema: StructType,
      batchKey: Option[String]): Snapshot = {
    if (batchKey.exists(log.contains)) return log.latest().get
    val newDirs: Seq[DirInfo] = stagedDirInfos(stagedRel, bucketSpec)
    if (newDirs.isEmpty)
      return log.latest().getOrElse(throw new IllegalStateException(
        s"table $name has no snapshots to append onto"))
    commitAppendDirs(newDirs, writeSchema, batchKey)
  }

  /**
   * Keyed COW upsert/merge; see [[graft.dml.Merge.merge]] for semantics.
   * On a bucketed table (when `key` is the bucket key) this is a PARTIAL
   * rewrite: only the buckets containing update keys are re-merged.
   */
  def upsert(
      updates: DataFrame,
      key: String,
      precombine: Option[String] = None,
      opCol: Option[String] = None,
      broadcastUpdates: Boolean = true,
      batchKey: Option[String] = None,
      preDeduped: Boolean = false): Snapshot = {
    if (batchKey.exists(log.contains)) return log.latest().get
    val head = log.latest()
    val st0 = head.map(s => DataType.fromJson(s.schemaJson)
      .asInstanceOf[StructType]).getOrElse(new StructType())
    val updatesP = ColumnIds.toPhysical(updates, st0)
    val keyP = ColumnIds.physicalFor(st0, key)
    val precombineP = precombine.map(ColumnIds.physicalFor(st0, _))
    val pendingDeltas = head.exists(_.deltaDirs.nonEmpty)
    bucketSpec match {
      // Bucketed partial rewrite reads raw bucket dirs — only valid when no
      // MOR deltas are pending (those need read-time resolution first).
      case Some((bk, n)) if bk == keyP && !pendingDeltas =>
        commitBucketedMerge(head.get, updatesP, keyP, n, "upsert",
          (t, u, hint) => Merge.merge(t, u, keyP, precombineP, opCol,
            broadcastUpdates, hint, preDeduped = preDeduped),
          batchKey)
      case _ =>
        val target = head.map(s => ColumnIds.toPhysical(readResolved(s), st0))
          .getOrElse(emptyDF(new StructType()))
        // A provably row-free target (fresh table's first batch) skips the
        // anti-join subtree inside the merge — two full extra passes over
        // the updates (distinct keys + the broadcast-gate count) for a
        // join that can keep nothing.
        val targetEmpty =
          head.forall(s => s.dataDirs.isEmpty && s.deltaDirs.isEmpty)
        commitRewrite(
          Merge.merge(target, updatesP, keyP, precombineP, opCol,
            broadcastUpdates, preDeduped = preDeduped,
            targetEmpty = targetEmpty),
          "upsert", batchKey, head.map(_.snapshotId))
    }
  }

  /**
   * Merge-on-read upsert: append the (deduped) batch as a DELTA commit —
   * no base data moves, so ingest cost is O(batch) regardless of table
   * size; readers resolve latest-per-key across base + deltas until
   * [[compact]] folds the chain back into base files. The Hudi-MOR-shaped
   * fast-ingest mode: use when even a partial bucket rewrite per 10-second
   * micro-batch is too much write amplification.
   *
   * Rows with `opCol = 'd'` become delete tombstones.
   *
   * `preDeduped = true` asserts the batch already holds AT MOST ONE row
   * per key, skipping the in-batch dedup shuffle — the CDC pipeline's
   * envelope transform ends in exactly that dedup, so re-deduplicating
   * here would shuffle every hot-path micro-batch a second time for a
   * no-op. The contract matters for correctness, not just speed: rows
   * sharing a key inside ONE delta dir have the same chain sequence, so
   * read-time resolution between them would be nondeterministic.
   *
   * `deltaPartitions > 0` repartitions the delta write to that many
   * files — the small-files control. Left at 0, each delta lands with
   * the batch's incoming partitioning (= total executor cores on a
   * cluster), so a 10-second trigger writes cores×8640 files/day of
   * kilobyte-sized deltas that every read-time resolution and compaction
   * must open. Size it so batchRows/deltaPartitions rows make a
   * reasonably-sized file. This is a deliberate `repartition`, not
   * `coalesce`: the batch is usually an un-materialized cached decode,
   * and a coalesce would pull the whole decode DOWN to this width (the
   * write is its first action) — the narrow extra shuffle is bounded by
   * the trigger size and preserves upstream parallelism.
   */
  def upsertDeferred(
      updates: DataFrame,
      key: String,
      precombine: Option[String] = None,
      opCol: Option[String] = None,
      batchKey: Option[String] = None,
      preDeduped: Boolean = false,
      deltaPartitions: Int = 0): Snapshot = {
    if (batchKey.exists(log.contains)) return log.latest().get
    val st0 = schema
    val updatesP = ColumnIds.toPhysical(updates, st0)
    val keyP = ColumnIds.physicalFor(st0, key)
    val precombineP = precombine.map(ColumnIds.physicalFor(st0, _))
    var written: Option[String] = None
    var attempts = 0
    while (attempts < 64) {
      attempts += 1
      val head = log.latest().getOrElse(
        throw new IllegalStateException(s"table $name has no snapshots; use overwrite first"))
      require(head.summary.get("mor_key").forall(_ == keyP),
        s"table $name has pending deltas keyed by ${head.summary("mor_key")}, not $keyP")
      val headSchema = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
      val deduped =
        if (preDeduped) updatesP
        else precombineP match {
          case Some(p) => Merge.dedupLatest(updatesP, keyP, p)
          case None => updatesP.dropDuplicates(Seq(keyP))
        }
      // Opt-in diagnosis split (-Dgraft.mor.diag=true): an extra count()
      // action separates "materialize + dedup" from "align + write" in the
      // phase trace. Off by default — the count is a full extra pass.
      val diag = sys.props.get("graft.mor.diag").contains("true")
      val t0 = System.nanoTime()
      val dedupSec = if (diag) { deduped.count(); (System.nanoTime() - t0) / 1e9 }
        else 0.0
      val dataCols = deduped.drop(opCol.toSeq: _*)
      val evolved = Merge.unionSchema(headSchema, dataCols.schema)
      val tW = System.nanoTime()
      val dir = written.getOrElse {
        val rel = s"data/m${head.snapshotId + 1}-${UUID.randomUUID().toString.take(8)}"
        val withOp = opCol match {
          case Some(c) => deduped.withColumnRenamed(c, "__op")
          case None => deduped.withColumn("__op", lit(null).cast("string"))
        }
        // One shared alignment (case-insensitive canonical spellings): the
        // delta schema is the evolved table schema plus the op marker.
        val evolvedPlusOp = StructType(evolved.fields :+
          org.apache.spark.sql.types.StructField("__op",
            org.apache.spark.sql.types.StringType, nullable = true))
        val aligned0 = align(withOp, evolvedPlusOp)
        val aligned =
          if (deltaPartitions > 0) aligned0.repartition(deltaPartitions)
          else aligned0
        withMicrosFooters {
          aligned.write.mode("overwrite").parquet(root.resolve(rel).toString)
        }
        written = Some(rel)
        rel
      }
      val tC = System.nanoTime()
      try {
        // Base dirs unchanged (the batch joins the delta chain, which the
        // detail carries inline) — the empty delta hint keeps this
        // high-frequency CDC commit O(1) in metadata CPU at any dir count.
        val snap = log.commitExpecting(Some(head.snapshotId), "upsert-deferred",
          evolved.json, head.dataDirs,
          head.summary ++ Map("mor_key" -> keyP,
            "pending_deltas" -> (head.deltaDirs.size + 1).toString),
          batchKey, head.dirRecords, head.deltaDirs :+ dir, head.dirStats,
          Some(graft.log.DirDelta(Seq.empty)))
        GraftTable.lastMergePhases = Some(
          (if (diag) Seq("dedup" -> dedupSec) else Nil) ++ Seq(
            "write" -> (tC - tW) / 1e9,
            "commit" -> (System.nanoTime() - tC) / 1e9))
        prewarmServing(Seq(dir)) // serving sees warm footers for the delta
        return snap
      } catch {
        case _: graft.log.CommitConflictException if attempts < 64 => // re-derive
      }
    }
    throw new IllegalStateException(s"upsertDeferred lost $attempts races")
  }

  /** Delete rows whose key matches any key in `keys` (keys-only DF sink, `delete_hudi.py`). */
  def deleteKeys(keys0: DataFrame, key0: String): Snapshot = {
    val head = log.latest()
    val st0 = head.map(s => DataType.fromJson(s.schemaJson)
      .asInstanceOf[StructType]).getOrElse(new StructType())
    val keys = ColumnIds.toPhysical(keys0, st0)
    val key = ColumnIds.physicalFor(st0, key0)
    bucketSpec match {
      case Some((bk, n)) if bk == key && !head.exists(_.deltaDirs.nonEmpty) =>
        commitBucketedMerge(head.get, keys, key, n, "delete",
          (t, k, hint) => Merge.deleteKeys(t, k, key, keysRowsHint = hint),
          batchKey = None)
      case _ =>
        val target = head.map(s => ColumnIds.toPhysical(readResolved(s), st0))
          .getOrElse(emptyDF(new StructType()))
        commitRewrite(Merge.deleteKeys(target, keys, key), "delete",
          batchKey = None, parent = head.map(_.snapshotId))
    }
  }

  /**
   * `DELETE FROM t WHERE cond` (`api_poc.py:803-826`). SQL three-valued
   * logic: only rows where the predicate is TRUE are deleted — rows where it
   * evaluates NULL are kept (plain `filter(!cond)` would silently drop them).
   */
  def deleteWhere(cond: Column): Snapshot = {
    val head = log.latest()
    val base = head.map(readResolved).getOrElse(emptyDF(new StructType()))
    // cond references LOGICAL names (readResolved serves them); the
    // filtered survivors convert back to physical before the rewrite so
    // files and manifest schema keep speaking physical names.
    commitRewrite(
      ColumnIds.toPhysical(base.filter(!coalesce(cond, lit(false))), schema),
      "delete", batchKey = None, parent = head.map(_.snapshotId))
  }

  /**
   * Single-row INSERT from raw form strings (`api_poc.py:763-801`): each
   * value is coerced to the table's column type via the reference's
   * `get_cast_val` rules ([[graft.functions.Coerce]]); unknown columns are
   * rejected, missing ones become NULL.
   */
  def insertRow(values0: Map[String, String], batchKey: Option[String] = None): Snapshot = {
    val st = schema
    val unknown = values0.keySet --
      st.fields.map(ColumnIds.logicalName).toSet -- st.fieldNames.toSet
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    val values = values0.map { case (k, v) =>
      ColumnIds.physicalFor(st, k) -> v }
    val row = Row.fromSeq(st.fields.toSeq.map { f =>
      values.get(f.name).map(v => graft.functions.Coerce.coerce(v, f.dataType)).orNull
    })
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), st)
    append(df, batchKey)
  }

  /**
   * Key-equality lookup with bucket pruning: on a bucketed table the key's
   * bucket is computed driver-side and ONLY that bucket's leaf dirs are
   * scanned — at 1000 executors × 100 TB this turns a point lookup into a
   * 1/numBuckets scan (plus parquet footer min/max skipping within it).
   *
   * Serving fast path: when the pruned bucket is small (≤ 64 MB by
   * default), the driver reads it directly with Spark's own vectorized
   * parquet reader — zero Spark jobs, no per-key codegen, millisecond
   * class ([[LocalPointRead]]). Larger buckets, nested schemas, or any
   * local-read failure fall back to the distributed scan below, which
   * remains the plan of record at scale.
   */
  /** The bucket-pruned lookup context when the fast path applies: schema,
    * the key's bucket dirs (absolute), and the bucket key column. ONE
    * manifest read for the whole call — re-deriving schema / bucketSpec /
    * head separately cost three log reads per point lookup, a measurable
    * slice of a millisecond-class serving call. None when the table is
    * unbucketed or MOR deltas pend (a delta could hold a newer image or
    * tombstone for the key — resolution must go through the full read). */
  private def prunedLookupCtx(value: Any): Option[(StructType, Seq[String], String)] =
    log.latest().flatMap { head =>
      bucketSpecOf(head) match {
        case Some((bk, n)) if head.deltaDirs.isEmpty =>
          val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
          val b = driverBucketId(value, st(bk).dataType, n)
          // Snapshot-cached bucket index: O(dirs-in-bucket) per lookup,
          // not an O(dirs) filter — the term that dominated warm serving
          // latency at 100k+ dirs.
          Some((st, head.dataDirsByBucket.getOrElse(b, Nil)
            .map(d => root.resolve(d).toString), bk))
        case _ => None
      }
    }

  /** The slow-path lookup. Bucketed tables route through [[lookupKeys]],
    * which stays bucket-pruned on both sides of a pending delta chain —
    * only an UNBUCKETED table pays the full resolving read here. */
  private def lookupViaRead(value: Any): DataFrame = bucketSpec match {
    case Some(_) => lookupKeys(Seq(value))
    case None =>
      val bk = graft.functions.Identifiers.findIdCol(schema.fieldNames.toSeq)
      read().filter(col(bk) === lit(value))
  }

  /**
   * Driver-side serving lookup under PENDING merge-on-read deltas — the
   * state a CDC-ingesting table is in almost all the time between
   * compactions, which previously demoted every point lookup to a Spark
   * job (~90 ms scheduler floor) exactly when serving matters most. Reads
   * the key's base bucket plus the (leaf-pruned where sound) delta chain
   * with the same [[LocalPointRead]] machinery, then applies
   * [[resolveDeltas]]'s algebra to the handful of materialized rows:
   * highest chain sequence wins, a winning `__op = 'd'` tombstone deletes.
   * Chain positions come from the FULL chain even for a pruned subset,
   * mirroring the distributed subset resolution.
   *
   * None = fall back to the distributed resolving lookup: table not
   * bucketed by the mor key (delta rows can't be bucket-matched), nested
   * schema, byte cap exceeded (the delta chain up front — bounded by
   * compactEvery — plus, later, only the still-unresolved keys' base
   * buckets), or any read failure.
   */
  private def morServingRows(head: Snapshot, value: Any): Option[Seq[Row]] =
    morServingRowsIn(head, Seq(value))

  /** Multi-key form of the pending-delta serving read: each key resolves
    * independently — a key drops out of the probe set at its FIRST
    * (newest) delta hit; keys no delta holds read their base buckets in
    * one final call. The answer set matches `resolveDeltas`' rank cut
    * filtered by `key IN (values)`. */
  private def morServingRowsIn(head: Snapshot, values: Seq[Any]): Option[Seq[Row]] =
    try {
      if (!LocalPointRead.enabled) return None
      bucketSpecOf(head) match {
        case Some((bk, n)) if head.summary.get("mor_key").contains(bk) =>
          val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
          if (!LocalPointRead.supports(st)) return None
          val dt = st(bk).dataType
          val tz = spark.sessionState.conf.sessionLocalTimeZone
          // Canonical EXTERNAL form of every key (cast through the column
          // type and back): row key values compare against these, so an
          // Int probe finds a Long column's rows. Binary keys normalize to
          // ArraySeq for value-equality set membership.
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToScalaConverter(dt)
          def norm(v: Any): Any = v match {
            case a: Array[Byte] =>
              scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
            case x => x
          }
          val extVals = values
            .map(v => org.apache.spark.sql.catalyst.expressions.Cast(
              org.apache.spark.sql.catalyst.expressions.Literal(v), dt,
              Some(tz)).eval(null))
            .filter(_ != null).map(conv) // `= NULL` matches nothing
          val extByNorm = extVals.map(v => norm(v) -> v).toMap
          var remaining = extByNorm.keySet
          if (remaining.isEmpty) return Some(Seq.empty)
          val buckets = extByNorm.values.map(driverBucketId(_, dt, n)).toSet
          // Leaf delta dirs (appends made under pending deltas) prune to
          // the keys' buckets — sound here because mor_key IS the bucket
          // key; flat upsertDeferred dirs are always read. Chain ORDER is
          // what resolution needs (newest-first iteration below); the
          // per-dir sequence number itself never is.
          val deltas = head.deltaDirs.collect {
            case d if bucketOfDir(d).forall(buckets.contains) =>
              root.resolve(d).toString
          }
          // Budget in two installments: the delta chain is decoded
          // unconditionally, so it must fit up front; the BASE side is
          // priced later against only the still-unresolved keys' buckets —
          // a probe where most keys resolve in the newest delta shouldn't
          // be pushed to the distributed path by base bytes it never reads.
          val deltaTotal = LocalPointRead.totalBytes(servingConf, deltas)
            .getOrElse(return None)
          if (deltaTotal > LocalPointRead.budgetBytes) return None
          val deltaSt = StructType(st.fields :+
            org.apache.spark.sql.types.StructField("__op",
              org.apache.spark.sql.types.StringType, nullable = true))
          val keyIdx = st.fieldIndex(bk)
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          // NEWEST delta first; a key leaves the probe set at its first
          // hit — that dir holds its highest-sequence rows (sequences are
          // unique per dir and a pruned-away leaf cannot hold a probed
          // key), so the hit IS the rank cut. A full-update CDC chain
          // resolves every key in ONE delta decode instead of the chain
          // (measured 379 ms -> the newest batch only, single-key case).
          for (dir <- deltas.reverseIterator if remaining.nonEmpty) {
            LocalPointRead.lookupRowsIn(spark, servingConf, Seq(dir),
                deltaSt, bk, remaining.toSeq.map(extByNorm)) match {
              case Some(rs) =>
                rs.groupBy(r => norm(r.get(keyIdx))).foreach { case (k, rows) =>
                  remaining -= k
                  rows.foreach { r =>
                    if (r.get(st.fields.length).asInstanceOf[String] != "d")
                      out += new org.apache.spark.sql.catalyst.expressions
                        .GenericRowWithSchema(
                          r.toSeq.dropRight(1).toArray[Any], st)
                  }
                }
              case None => return None
            }
          }
          // Keys no delta holds: every base row survives (all at sequence
          // 0 — resolveDeltas' rank cut keeps duplicates). Base dirs are
          // recomputed from the REMAINING keys' buckets: keys already
          // resolved in a delta never touch (or price) their base buckets.
          if (remaining.nonEmpty) {
            val remVals = remaining.toSeq.map(extByNorm)
            val remBuckets = remVals.map(driverBucketId(_, dt, n)).toSet
            val baseDirs = head.dataDirsInBuckets(remBuckets)
              .map(d => root.resolve(d).toString)
            val baseTotal = LocalPointRead.totalBytes(servingConf, baseDirs)
              .getOrElse(return None)
            if (deltaTotal + baseTotal > LocalPointRead.budgetBytes) return None
            LocalPointRead.lookupRowsIn(spark, servingConf, baseDirs, st,
                bk, remVals) match {
              case Some(rs) => out ++= rs
              case None => return None
            }
          }
          Some(out.toSeq)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def lookupKey(value: Any): DataFrame = { markServed(); prunedLookupCtx(value) } match {
    case Some((st, dirs, bk)) =>
      if (dirs.isEmpty) emptyDF(st)
      else LocalPointRead.lookupRows(spark, servingConf, dirs, st, bk, value) match {
        case Some(rows) =>
          import scala.jdk.CollectionConverters._
          // asNullable mirrors what a file scan of the same snapshot
          // reports (file sources force nullable): rows here can hold
          // legitimate nulls — evolution padding — even for columns the
          // stored schema believes non-nullable, and a LocalRelation trusts
          // the flag it is handed (a null under nullable=false reads as 0).
          spark.createDataFrame(rows.asJava,
            StructType(st.fields.map(_.copy(nullable = true))))
        case None =>
          spark.read.schema(st).parquet(dirs: _*).filter(col(bk) === lit(value))
      }
    case None =>
      // ONE head read serves both the resolution and the result schema —
      // a separate `schema` call could observe a different snapshot.
      val headOpt = log.latest().filter(_.deltaDirs.nonEmpty)
      headOpt.flatMap(h => morServingRows(h, value).map(h -> _)) match {
        case Some((h, rows)) =>
          import scala.jdk.CollectionConverters._
          val st = DataType.fromJson(h.schemaJson).asInstanceOf[StructType]
          spark.createDataFrame(rows.asJava,
            StructType(st.fields.map(_.copy(nullable = true))))
        case None => lookupViaRead(value)
      }
  }

  /**
   * Serving point lookup returning MATERIALIZED rows — the transport shape
   * a serving endpoint needs (the reference's serving tier returns rows,
   * not lazy plans). On the fast path this skips the per-call Dataset
   * construction + first-collect query-execution overhead (~20 ms) that
   * [[lookupKey]].collect() pays on top of the same driver-side read.
   */
  def lookupKeyRows(value: Any): Seq[Row] = { markServed(); prunedLookupCtx(value) } match {
    case Some((st, dirs, bk)) =>
      if (dirs.isEmpty) Seq.empty
      else LocalPointRead.lookupRows(spark, servingConf, dirs, st, bk, value)
        .getOrElse(spark.read.schema(st).parquet(dirs: _*)
          .filter(col(bk) === lit(value)).collect().toSeq)
    case None =>
      log.latest().filter(_.deltaDirs.nonEmpty)
        .flatMap(morServingRows(_, value))
        .getOrElse(lookupViaRead(value).collect().toSeq)
  }

  /**
   * Multi-key pruned lookup: the union of the keys' buckets is read in ONE
   * multi-dir scan, filtered by `isin`. For a small key set (an IVF probe's
   * cells, a semi-join against a driver-known id list) this scans
   * |distinct buckets|/numBuckets of the table instead of all of it.
   */
  def lookupKeys(values: Seq[Any]): DataFrame = {
    markServed()
    // ONE log read: bucket spec, schema, dirs and delta chain all come from
    // the same head snapshot — separate reads could observe different
    // snapshots across a concurrent commit (and each costs log I/O).
    val headOpt = log.latest()
    headOpt.flatMap(h => bucketSpecOf(h).map(h -> _)) match {
      case Some((head, (bk, n))) =>
        val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
        if (values.isEmpty) return emptyDF(st)
        val buckets = values.map(v => driverBucketId(v, st(bk).dataType, n)).toSet
        val dirs = head.dataDirsInBuckets(buckets)
        // Serving fast path, multi-key form: with the keys' buckets (plus,
        // under pending deltas, the chain) inside the byte cap, the driver
        // reads them itself — the search tier's postings fetch (a handful
        // of token buckets) and an IVF probe's cell fetch drop from a
        // Spark job to a local read, and a CDC-ingesting table keeps the
        // same path between compactions. A bounded key count keeps the IN
        // predicate + membership set sane; beyond it the distributed scan
        // is the right plan anyway.
        if (values.size <= 1024) {
          val served =
            if (head.deltaDirs.isEmpty)
              LocalPointRead.lookupRowsIn(spark, servingConf,
                dirs.map(d => root.resolve(d).toString), st, bk, values)
            else morServingRowsIn(head, values)
          served match {
            case Some(rows) =>
              import scala.jdk.CollectionConverters._
              return ColumnIds.toLogical(spark.createDataFrame(rows.asJava,
                StructType(st.fields.map(_.copy(nullable = true)))), st)
            case None => () // fall through to the distributed scan
          }
        }
        // Pending deltas: the lookup stays bucket-pruned on the BASE side
        // (the big one) and reads the bounded delta chain on top — falling
        // back to a full resolved scan would make every serving lookup
        // O(table) the moment one delta batch pends. Delta LEAF dirs
        // (appends made under pending deltas) may only be pruned when the
        // resolution key IS the bucket key: resolution dedups per mor_key,
        // and if mor_key differs, a leaf in another bucket can hold the
        // winning image for a looked-up key — pruning it would resurrect
        // the stale base row. Flat upsertDeferred dirs (no bucket segment)
        // are always kept.
        val deltaSub =
          if (head.summary.get("mor_key").contains(bk))
            head.deltaDirs.filter(d => bucketOfDir(d).forall(buckets.contains))
          else head.deltaDirs
        val base =
          if (dirs.isEmpty) emptyDF(st)
          else spark.read.schema(st)
            .parquet(dirs.map(d => root.resolve(d).toString): _*)
        ColumnIds.toLogical(
          (if (deltaSub.isEmpty) base else resolveDeltas(head, base, deltaSub))
            .filter(col(bk).isin(values: _*)), st)
      case None => // unbucketed (or empty) table: resolving scan + id filter
        val bk = graft.functions.Identifiers.findIdCol(
          logicalSchema.fieldNames.toSeq)
        read().filter(col(bk).isin(values: _*))
    }
  }

  /**
   * Bucket id of a literal key, evaluated DRIVER-SIDE
   * ([[graft.plans.BucketHash]]) — a point lookup (and each term of a
   * persisted-index search) costs zero Spark jobs before the pruned scan
   * itself. Previously this ran a 1-row `spark.range(1)` job per call: a
   * whole scheduler round-trip to hash one value.
   */
  private def driverBucketId(value: Any, dt: DataType, n: Int): Int =
    graft.plans.BucketHash.bucketId(value, dt, n,
      spark.sessionState.conf.sessionLocalTimeZone)

  /** `UPDATE t SET c = v WHERE cond` (`api_poc.py:728-761`), copy-on-write. */
  def updateWhere(cond: Column, set: Map[String, Column]): Snapshot = {
    val head = log.latest()
    val cur = head.map(readResolved).getOrElse(emptyDF(new StructType()))
    val lst = logicalSchema // cond/set and cur speak logical names
    val updated = cur.select(cur.columns.toSeq.map { c =>
      set.get(c) match {
        case Some(v) => when(cond, v.cast(lst(c).dataType)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    commitRewrite(ColumnIds.toPhysical(updated, schema), "update",
      batchKey = None, parent = head.map(_.snapshotId))
  }

  /**
   * Full-table copy-on-write commit. Arbitrary-predicate DML
   * (deleteWhere/updateWhere) lands here even on bucketed tables — the
   * predicate can touch any bucket — but the bucket layout is preserved so
   * later keyed DML stays partial. The rewritten content was derived from a
   * head snapshot, so the commit is compare-and-swap against THAT head
   * (`parent` must be the snapshot the caller derived `df` from — capturing
   * it here instead would let a commit landing between derivation and
   * commit be silently lost): a concurrent commit fails this one rather
   * than being overwritten.
   */
  private def commitRewrite(df: DataFrame, operation: String,
      batchKey: Option[String], parent: Option[Long],
      rebaseAppends: Boolean = false): Snapshot = {
    // Callers hand PHYSICAL-named frames; restoreMeta re-stamps identity
    // metadata (graft.id / graft.logical) that alias chains drop, so a
    // full rewrite cannot silently revert a renamed column. Widened
    // markers CLEAR here — a full rewrite leaves no narrow-typed file
    // alive, so parquet predicate pushdown returns for those columns.
    // (With rebaseAppends, carried interleaved appends were written at the
    // head's already-widened schema — align casts to the wide type — so
    // the clear stays sound: no narrow-typed file survives the rewrite.)
    val committed = ColumnIds.clearWidened(
      ColumnIds.restoreMeta(df.schema, schema)).json
    val plannedHead = if (rebaseAppends) parent.flatMap(log.get) else None
    val (snap, freshRels) = bucketSpec match {
      case Some((bk, n)) if df.columns.contains(bk) =>
        val next = latestVersion + 1
        val leaves = writeBucketedDir(df, bk, n, newDataRel(next))
        val total = leaves.map(_.rows).sum
        val dirs = leaves.map(l => l.rel -> l.rows)
        val stats = leaves.filter(_.stats.nonEmpty).map(l => l.rel -> l.stats).toMap
        val baseSummary = Map("bucket_key" -> bk, "bucket_count" -> n.toString)
        val s = plannedHead match {
          case Some(h) =>
            commitRebasing(h, operation, committed, dirs, stats, baseSummary, batchKey)
          case None =>
            log.commitExpecting(parent, operation, committed, dirs.map(_._1),
              baseSummary + ("records" -> total.toString),
              batchKey, dirs.toMap, dirStats = stats)
        }
        (s, dirs.map(_._1))
      case _ =>
        val next = latestVersion + 1
        val d = writeDataDir(df, next)
        val stats = if (d.stats.nonEmpty) Map(d.rel -> d.stats)
          else Map.empty[String, Map[String, String]]
        val s = plannedHead match {
          case Some(h) =>
            commitRebasing(h, operation, committed, Seq(d.rel -> d.rows),
              stats, Map.empty, batchKey)
          case None =>
            log.commitExpecting(parent, operation, committed, Seq(d.rel),
              Map("records" -> d.rows.toString), batchKey,
              dirRecords = Map(d.rel -> d.rows), dirStats = stats)
        }
        (s, Seq(d.rel))
    }
    // A full rewrite is the LARGEST post-commit cold event a served table
    // sees (compact() lands here): without this, the first lookup after a
    // compaction paid every rewritten dir's footer opens in its own
    // latency while the cheaper single-delta commits were warmed.
    prewarmServing(freshRels)
    snap
  }

  /**
   * Commit a group replacement produced by the v2 row-level-operation write
   * ([[graft.connector.GraftRowLevelOperation]] — SQL DELETE/UPDATE/MERGE
   * through the catalog). `stagedRel` holds the REPLACEMENT content for the
   * groups the copy-on-write scan read: `scanned = Some(buckets)` replaces
   * exactly those `__bucket=k` dirs, carrying every untouched bucket's dirs
   * forward verbatim — files, manifest records and stats alike, the same
   * partial-rewrite contract as [[commitBucketedMerge]]; `scanned = None`
   * means the scan was not bucket-grouped (unbucketed table, or a stray
   * pre-layout dir) and read EVERYTHING, so all data dirs are replaced.
   * MERGE-inserted rows may hash into buckets the scan never read — their
   * staged leaves land ALONGSIDE the carried dirs, the layout's normal
   * many-dirs-per-bucket shape.
   *
   * CAS against the head the scan planned from: a commit landing between
   * plan and write fails this one ([[graft.log.CommitConflictException]])
   * instead of being silently merged over.
   */
  /** [[DirInfo]]s for an EXECUTOR-WRITTEN staged dir: the footer pass over
    * bucket leaves when `spec` declares a layout, one flat-dir entry
    * otherwise (empty when nothing landed) — shared by [[replaceGroups]]
    * and [[appendStaged]] so their counting rules cannot diverge. */
  private def stagedDirInfos(
      stagedRel: String, spec: Option[(String, Int)]): Seq[DirInfo] =
    spec match {
      case Some((k, _)) => leafCounts(stagedRel, statsKeep(Some(k)))
      case None =>
        val conf = spark.sessionState.newHadoopConf()
        val p = new org.apache.hadoop.fs.Path(root.resolve(stagedRel).toString)
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) Seq.empty
        else {
          val (rows, stats) = dirFooterInfo(fs, conf, p, statsKeep(None))
          if (rows == 0L) Seq.empty else Seq(DirInfo(stagedRel, rows, stats))
        }
    }

  /** Record count for a dir carried forward unchanged into a new manifest.
    * A dir MISSING from `dirRecords` must fail loudly, not default to 0:
    * the new manifest's `records` summary feeds the metadata-only count(*)
    * pushdown, which would serve the laundered 0 as an exact wrong answer
    * (statsFromMetadataAt declines only on absent keys, not wrong values).
    */
  private def carriedRecordCount(head: Snapshot, d: String): Long =
    head.dirRecords.getOrElse(d, throw new IllegalStateException(
      s"table $name snapshot ${head.snapshotId} carries dir $d with no " +
        "dirRecords entry; refusing to record an unknown count as 0"))

  private[graft] def replaceGroups(
      expectedHeadId: Long,
      operation: String,
      stagedRel: String,
      scanned: Option[Set[Int]]): Snapshot = {
    val head = log.get(expectedHeadId).getOrElse(throw new IllegalStateException(
      s"table $name has no snapshot $expectedHeadId to replace groups against"))
    require(head.deltaDirs.isEmpty,
      s"row-level rewrite over ${head.deltaDirs.size} pending merge-on-read " +
        "delta commits would strand their images; compact() first")
    val spec = bucketSpecOf(head)
    val leaves: Seq[DirInfo] = stagedDirInfos(stagedRel, spec)
    val untouched: Seq[String] = scanned match {
      case None => Seq.empty
      case Some(bs) => head.dataDirs.filterNot(d => bucketOfDir(d).exists(bs.contains))
    }
    val carried = untouched.map(d => d -> carriedRecordCount(head, d))
    val allDirs = carried ++ leaves.map(l => l.rel -> l.rows)
    val total = allDirs.map(_._2).sum
    val allStats = head.dirStats.view.filterKeys(untouched.toSet).toMap ++
      leaves.filter(_.stats.nonEmpty).map(l => l.rel -> l.stats)
    val summary = Map("records" -> total.toString) ++
      spec.map { case (k, n) =>
        Map("bucket_key" -> k, "bucket_count" -> n.toString) }.getOrElse(Map.empty)
    val snap = log.commitExpecting(Some(expectedHeadId), operation,
      head.schemaJson, allDirs.map(_._1), summary, None, allDirs.toMap,
      dirStats = allStats)
    prewarmServing(leaves.map(_.rel)) // replaced groups, warm serving
    snap
  }

  /**
   * Compaction for append-heavy tables: rewrite the current state into one
   * fresh commit (one dir, or one leaf per bucket on bucketed tables),
   * collapsing the one-dir-per-append accumulation that degrades scans with
   * thousands of small files. Old dirs become unreferenced and are GC'd
   * when their manifests expire.
   */
  /**
   * Fold the merge-on-read delta chain back into base files.
   *
   * On a bucketed table whose bucket key IS the MOR key, compaction is a
   * PARTIAL rewrite: the chain is resolved to one winning row per key
   * (latest sequence; tombstones delete), and only the base buckets those
   * keys hash into are merged and rewritten — the others carry forward
   * untouched, files, manifest records and stats alike. This is what makes
   * compaction affordable at scale: a chain of micro-batches touches the
   * buckets its keys land in, not the table — a 100 TB table with a 1%-hot
   * key space compacts 1% of its bytes, where the full-rewrite fallback
   * would move all of them.
   *
   * Falls back to the full resolve-and-rewrite when the table is not
   * bucketed by the MOR key (delta rows then cannot be mapped to base
   * buckets without consulting every base row) or any base dir predates
   * bucketing. With no pending deltas it stays the full rewrite on
   * purpose: "compact" then means file consolidation — folding the
   * small-file debt of many appends into one sized dir.
   */
  def compact(): Snapshot = {
    val headOpt = log.latest()
    require(headOpt.isDefined, s"table $name has no snapshots")
    val head = headOpt.get
    bucketSpec match {
      case Some((bk, n)) if head.deltaDirs.nonEmpty &&
          head.summary.get("mor_key").contains(bk) &&
          head.dataDirs.forall(d => bucketOfDir(d).isDefined) =>
        // Resolve the chain ONCE (latest __seq per key, one window over
        // delta rows only — base never enters), then merge the winners
        // into their buckets; Merge.merge skips its own dedup
        // (preDeduped) and applies winning tombstones as deletes. The
        // resolved set is cached across its two references (bucket
        // pre-pass materializes it, the merge reads it back) — bounded by
        // the chain, i.e. compactEvery micro-batches.
        //
        // latestAll (rank), not dedupLatest (row_number) — the SAME cut
        // read-time resolution uses (resolveDeltas). Ties at one sequence
        // are real: a plain append landing while deltas pend joins the
        // chain as one dir, duplicate keys and all. A row_number pick
        // would keep one arbitrary survivor where every read before the
        // compact returned all of them — compaction must never change
        // query results. Merge.merge tolerates the multi-row winning
        // image (anti join removes the key's base rows once; the union
        // adds every winner).
        val resolved = Merge.latestAll(
            deltaFrame(head, head.deltaDirs), bk, "__seq").drop("__seq")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // NOTE (r15 investigation): the compact "prepass" in the phase
        // trace is NOT a duplicate chain read — it is the one-time
        // materialization of this cached resolution, which the merge's two
        // references then reuse. An attempted split (key-only distinct
        // precount + resolution deferred into merge+write) measured 33%
        // SLOWER overall; see the pre-pass comment in commitBucketedMerge.
        try {
          commitBucketedMerge(head, resolved, bk, n, "compact",
            (t, u, hint) => Merge.merge(t, u, bk, None, Some("__op"),
              broadcastUpdates = true, updatesRowsHint = hint,
              preDeduped = true),
            batchKey = None, rebaseAppends = true)
        } finally resolved.unpersist(blocking = false)
      case _ =>
        commitRewrite(ColumnIds.toPhysical(readResolved(head), schema),
          "compact", batchKey = None, parent = Some(head.snapshotId),
          rebaseAppends = true)
    }
  }

  /**
   * MINOR compaction for append-heavy tables (streaming state tables, the
   * curation corpus): fold every data dir holding at most `maxRows` rows
   * into ONE fresh commit dir (bucketed when the table is), leaving the
   * already-consolidated dirs untouched. Unlike [[compact]]'s full
   * rewrite, the cost is bounded by the small-dir debt, not the table:
   * a consolidated dir grows until it graduates past `maxRows` and is
   * then never rewritten again, so total write amplification over a
   * stream's life is O(maxRows / batchRows) per row, not O(batches).
   *
   * Returns None when there is nothing to fold (fewer than two small
   * dirs) or the table has no snapshots. CAS commit with append-only
   * rebase ([[commitRebasing]], chain-preserving): interleaved appends —
   * the stream this maintenance runs under — carry forward verbatim
   * instead of starving the fold; any non-additive interleaving throws
   * and the caller retries at its next maintenance cadence.
   */
  def compactSmallDirs(maxRows: Long = 1L << 20): Option[Snapshot] = {
    val headOpt = log.latest()
    if (headOpt.isEmpty) return None
    val head = headOpt.get
    val small = head.dataDirs.filter(d =>
      head.dirRecords.getOrElse(d, Long.MaxValue) <= maxRows)
    if (small.size < 2) return None
    val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    // Explicit head schema: pre-evolution dirs pad their missing columns
    // with typed nulls, same as every other subset read of mixed commits.
    val df = spark.read.schema(st)
      .parquet(small.map(d => root.resolve(d).toString): _*)
    val next = latestVersion + 1
    val folded = bucketSpec match {
      case Some((bk, n)) if st.fieldNames.contains(bk) =>
        writeBucketedDir(df, bk, n, newDataRel(next))
      case _ => Seq(writeDataDir(df, next))
    }
    val smallSet = small.toSet
    val kept = head.dataDirs.filterNot(smallSet)
    val dirStats = (head.dirStats -- smallSet) ++
      folded.filter(_.stats.nonEmpty).map(l => l.rel -> l.stats)
    // Minor compaction runs at a maintenance cadence UNDER the very
    // append stream that creates its small-dir debt, so it takes the same
    // append-only rebase as compact(): interleaved appends carry forward
    // verbatim, and the UNRESOLVED delta chain is preserved in full
    // (keepPendingDeltas — this fold never touches chain state). A kept
    // dir without a record count (legacy manifest) keeps the old
    // single-attempt commit: the rebase recomputes the records summary
    // and must not launder an unknown count.
    val snap =
      if (kept.forall(head.dirRecords.contains)) {
        val out = kept.map(d => d -> head.dirRecords(d)) ++
          folded.map(l => l.rel -> l.rows)
        commitRebasing(head, "compact_minor", head.schemaJson, out,
          dirStats, head.summary - "records" - "mor_key" - "pending_deltas",
          None, keepPendingDeltas = true)
      } else {
        val dataDirs = kept ++ folded.map(_.rel)
        val dirRecords = (head.dirRecords -- smallSet) ++
          folded.map(l => l.rel -> l.rows)
        log.commitExpecting(Some(head.snapshotId), "compact_minor",
          head.schemaJson, dataDirs, head.summary, None, dirRecords,
          head.deltaDirs, dirStats)
      }
    prewarmServing(folded.map(_.rel)) // folded dirs, warm serving
    Some(snap)
  }

  // ------------------------------------------------------ lifecycle / layout

  /**
   * Roll the table back to an earlier snapshot by committing a NEW snapshot
   * whose content (schema, data dirs, pending deltas, statistics, layout
   * summary) is the target's — history is preserved, the head moves back
   * (Iceberg's `rollback_to_snapshot`). Metadata-only: no data is read or
   * rewritten, so the cost is one manifest commit regardless of table size.
   * The rollback manifest re-references the target's full dir set, which is
   * exactly what keeps those dirs alive through later retention/expiry.
   * Retries the CAS against a moving head — the commit's content derives
   * from the TARGET, not the head, so a re-read is all a retry needs.
   *
   * Each attempt runs under the table's maintenance mutex: the target is
   * RE-READ and the CAS issued inside one locked span, so an expiry pass
   * (which deletes under the same lock) can never reclaim the target's dirs
   * between this commit deciding to reference them and publishing. A
   * rollback racing an expiry that wins therefore fails with
   * NoSuchElementException ("snapshot expired"), never with a head that
   * points at deleted data.
   */
  /**
   * `ALTER TABLE ... ADD COLUMNS` as a METADATA-ONLY commit: the schema
   * widens, every data dir (and any pending delta chain) carries forward
   * verbatim — existing files simply null-fill the new columns on read,
   * which is identical to how append-time evolution already treats
   * pre-evolution files, so no data moves at any table size. New columns
   * must be nullable (old rows have no value to give) and must not
   * collide case-insensitively with existing ones.
   */
  def addColumns(cols: Seq[org.apache.spark.sql.types.StructField]): Snapshot = {
    require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
    require(cols.forall(_.nullable), "added columns must be nullable")
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      try {
        val head = log.latest().getOrElse(
          throw new IllegalStateException(s"table $name has no snapshots"))
        val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
        val existing = st.fields
          .flatMap(f => Seq(f.name, ColumnIds.logicalName(f)))
          .map(_.toLowerCase).toSet
        val dup = cols.find(c => existing.contains(c.name.toLowerCase))
        require(dup.isEmpty, s"column ${dup.map(_.name).getOrElse("")} already exists")
        // Stable id assignment + physical-name tombstones: a column DROPPED
        // in retained history left its bytes in carried data files under
        // its physical name — a new column reusing that name would decode
        // the old values. Scan retained manifests for every physical name
        // and id ever used; colliding adds get a uniquified physical name
        // (`<name>__fid<id>`) with the requested name as their logical.
        val history = log.snapshotsCore()
        val usedPhys = history.flatMap(c =>
          DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
            .fields.map(_.name.toLowerCase)).toSet
        val maxId = (0L +: history.flatMap(c =>
          DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
            .fields.flatMap(ColumnIds.fieldId))).max
        val stamped = cols.zipWithIndex.map { case (c, i) =>
          val id = maxId + 1 + i
          val f = ColumnIds.withId(c, id)
          if (usedPhys.contains(c.name.toLowerCase))
            ColumnIds.withLogical(
              f.copy(name = s"${c.name}__fid$id"), c.name)
          else f
        }
        return log.commitExpecting(Some(head.snapshotId), "add-columns",
          StructType(st.fields ++ stamped).json, head.dataDirs, head.summary,
          None, head.dirRecords, head.deltaDirs, head.dirStats,
          Some(graft.log.DirDelta(Seq.empty)))
      } catch { case _: CommitConflictException => } // head moved — re-read
    }
    throw new IllegalStateException(
      s"addColumns on $name lost $attempts consecutive races")
  }

  /**
   * Metadata-only column RENAME (Iceberg `ALTER TABLE ... RENAME COLUMN`):
   * a CAS commit that changes ONE field's `graft.logical` metadata — zero
   * data dirs touched, so on a 100 TB table this is a one-manifest write.
   * The field's physical name (the name in every data file) is unchanged;
   * reads map physical -> logical at the API boundary ([[ColumnIds]]).
   * Time travel stays consistent: each snapshot's schemaJson carries the
   * mapping as of that commit, so pre-rename snapshots serve the old name.
   */
  def renameColumn(from: String, to: String): Snapshot = {
    require(graft.functions.Identifiers.isValidIdent(to),
      s"'$to' is not a valid column name")
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      try {
        val head = log.latest().getOrElse(
          throw new IllegalStateException(s"table $name has no snapshots"))
        val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
        val idx = st.fields.indexWhere(f => ColumnIds.logicalName(f) == from)
        require(idx >= 0, s"table $name has no column $from")
        require(!st.fields.zipWithIndex.exists { case (f, i) =>
          i != idx && ColumnIds.logicalName(f).equalsIgnoreCase(to) },
          s"table $name already has a column $to")
        val fields = st.fields.clone()
        // Renamed fields acquire a stable id on first rename if creation
        // didn't stamp one — the provenance anchor the mapping hangs off.
        val withIdF =
          if (ColumnIds.fieldId(fields(idx)).isDefined) fields(idx)
          else {
            val maxId = (0L +: log.snapshotsCore().flatMap(c =>
              DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
                .fields.flatMap(ColumnIds.fieldId))).max
            ColumnIds.withId(fields(idx), maxId + 1)
          }
        fields(idx) = ColumnIds.withLogical(withIdF, to)
        return log.commitExpecting(Some(head.snapshotId), "rename-column",
          StructType(fields).json, head.dataDirs, head.summary,
          None, head.dirRecords, head.deltaDirs, head.dirStats,
          Some(graft.log.DirDelta(Seq.empty)))
      } catch { case _: CommitConflictException => } // head moved — re-read
    }
    throw new IllegalStateException(
      s"renameColumn on $name lost $attempts consecutive races")
  }

  /**
   * Metadata-only column DROP: the field leaves the manifest schema; every
   * data dir is carried forward verbatim (files keep the column bytes, the
   * explicit-schema read simply never decodes them). Time travel to a
   * pre-drop snapshot still sees the column. The bucket key and the
   * pending-MOR key refuse — the layout and delta resolution need them.
   */
  def dropColumn(colName: String): Snapshot = {
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      try {
        val head = log.latest().getOrElse(
          throw new IllegalStateException(s"table $name has no snapshots"))
        val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
        val idx = st.fields.indexWhere(f => ColumnIds.logicalName(f) == colName)
        require(idx >= 0, s"table $name has no column $colName")
        require(st.fields.length > 1,
          s"cannot drop the last column of table $name")
        val phys = st.fields(idx).name
        require(!head.summary.get("bucket_key").contains(phys),
          s"column $colName is the bucket key of $name; " +
            "re-layout (overwriteBucketed/cluster) before dropping it")
        require(!(head.deltaDirs.nonEmpty &&
            head.summary.get("mor_key").contains(phys)),
          s"column $colName keys ${head.deltaDirs.size} pending merge-on-read " +
            s"deltas on $name; compact() first")
        val fields = st.fields.patch(idx, Nil, 1)
        return log.commitExpecting(Some(head.snapshotId), "drop-column",
          StructType(fields).json, head.dataDirs, head.summary,
          None, head.dirRecords, head.deltaDirs, head.dirStats,
          Some(graft.log.DirDelta(Seq.empty)))
      } catch { case _: CommitConflictException => } // head moved — re-read
    }
    throw new IllegalStateException(
      s"dropColumn on $name lost $attempts consecutive races")
  }

  /**
   * Metadata-only column type WIDENING (Iceberg `ALTER COLUMN ... TYPE`):
   * the manifest schema's type widens in one CAS commit; data files keep
   * the narrower physical type and Spark's parquet readers promote on read
   * (vectorized AND row-based, Spark 4 type widening — probed on this
   * build for int->long, int->double, float->double before shipping).
   * Only lossless widenings are accepted. Guards: the bucket key refuses
   * (the xxhash layout is type-width-sensitive — a widened key would hash
   * into different buckets than the files were written under), a pending
   * MOR chain keyed by the column refuses, and a bloom sidecar on the
   * column refuses (its hashes were taken at the narrow width; rebuild
   * after — see [[dropBloomIndex]]). While narrow files are live
   * ([[ColumnIds.isWidened]]) the column goes dark for every
   * stats-derived decision: parquet row-group predicates stop pushing
   * (type-strict filters would fail the task), manifest dir skipping
   * declines ([[statPrunedDirs]] — narrow-era dirStats are in the OLD
   * type's domain, e.g. DATE days vs TIMESTAMP_NTZ micros, and dropping
   * a dir is unrecoverable by re-filtering), and metadata MIN/MAX agg
   * pushdown declines ([[statsFromMetadataAt]] — it would fold days as
   * micros into a wrong answer). Any full rewrite clears the marker and
   * re-records wide-domain stats.
   */
  def widenColumn(colName: String, to: DataType): Snapshot = {
    import org.apache.spark.sql.types.{ByteType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
    val widenable: Map[DataType, Set[DataType]] = Map(
      ByteType -> Set(ShortType, IntegerType, LongType),
      ShortType -> Set(IntegerType, LongType),
      IntegerType -> Set(LongType, DoubleType),
      FloatType -> Set(DoubleType))
    // Probed on this build (r16), vectorized AND row-based readers:
    // decimal precision growth promotes ACROSS parquet physical encodings
    // (int32 -> int64 -> binary), scale growth promotes when the integer
    // part keeps its headroom (values rescale on read), and date promotes
    // to TIMESTAMP_NTZ (midnight, no zone shift). date -> TIMESTAMP (local
    // TZ) fails both readers — refuse with the fix in the message.
    def promotable(from: DataType, t: DataType): Boolean = (from, t) match {
      case (f0, t0) if widenable.get(f0).exists(_.contains(t0)) => true
      case (d1: DecimalType, d2: DecimalType) =>
        val (p, s, p2, s2) = (d1.precision, d1.scale, d2.precision, d2.scale)
        (p2 != p || s2 != s) && s2 >= s && (p2 - s2) >= (p - s)
      case (DateType, TimestampNTZType) => true
      case _ => false
    }
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      try {
        val head = log.latest().getOrElse(
          throw new IllegalStateException(s"table $name has no snapshots"))
        val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
        val idx = st.fields.indexWhere(f => ColumnIds.logicalName(f) == colName)
        require(idx >= 0, s"table $name has no column $colName")
        val f = st.fields(idx)
        require(!(f.dataType == DateType && to == TimestampType),
          s"cannot widen $colName: date -> timestamp (local-TZ) is not " +
            "parquet-promotable; widen to TIMESTAMP_NTZ instead")
        require(promotable(f.dataType, to),
          s"cannot widen $colName: ${f.dataType.simpleString} -> " +
            s"${to.simpleString} is not a lossless parquet-promotable widening")
        require(!head.summary.get("bucket_key").contains(f.name),
          s"column $colName is the bucket key of $name; the hash layout is " +
            "type-width-sensitive — re-layout (overwriteBucketed) to widen it")
        require(!(head.deltaDirs.nonEmpty &&
            head.summary.get("mor_key").contains(f.name)),
          s"column $colName keys pending merge-on-read deltas; compact() first")
        require(!Files.exists(bloomIndexPath(f.name)),
          s"column $colName carries a bloom index hashed at the narrow " +
            "width; dropBloomIndex and rebuild after widening")
        val fields = st.fields.clone()
        fields(idx) = ColumnIds.markWidened(f.copy(dataType = to))
        return log.commitExpecting(Some(head.snapshotId), "widen-column",
          StructType(fields).json, head.dataDirs, head.summary,
          None, head.dirRecords, head.deltaDirs, head.dirStats,
          Some(graft.log.DirDelta(Seq.empty)))
      } catch { case _: CommitConflictException => } // head moved — re-read
    }
    throw new IllegalStateException(
      s"widenColumn on $name lost $attempts consecutive races")
  }

  /** Delete a column's bloom sidecar (see [[buildBloomIndex]]) — the
    * maintenance verb type widening points at. */
  def dropBloomIndex(column: String): Unit = {
    val p = bloomIndexPath(ColumnIds.physicalFor(schema, column))
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(p)) { s =>
        s.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
          .foreach(Files.deleteIfExists(_))
      }
    }
  }

  def rollback(snapshotId: Long): Snapshot = {
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      try {
        return log.withMaintenanceLock {
          val target = log.get(snapshotId).getOrElse(
            throw new NoSuchElementException(
              s"table $name has no snapshot $snapshotId (missing or expired)"))
          val head = log.latest().get
          if (head.snapshotId == snapshotId) head // already there
          else log.commitExpecting(Some(head.snapshotId), "rollback",
            target.schemaJson, target.dataDirs,
            target.summary + ("rollback_of" -> snapshotId.toString),
            None, target.dirRecords, target.deltaDirs, target.dirStats)
        }
      } catch { case _: CommitConflictException => } // head moved — re-read
    }
    throw new IllegalStateException(
      s"rollback of $name to $snapshotId lost $attempts consecutive races")
  }

  /**
   * Explicit snapshot retention + immediate storage reclaim: keep the newest
   * `keepLast` snapshots, drop the rest, and DELETE data dirs no retained
   * snapshot references (Iceberg `expire_snapshots` + Delta `VACUUM` in one
   * call — see [[graft.log.SnapshotLog.expire]] for why this path can skip
   * the orphan sweep's GC grace). Returns the number of snapshots expired.
   * Time travel to an expired id throws; [[readAsOfOrLatest]] falls back.
   */
  def expireSnapshots(keepLast: Int): Int = log.expire(keepLast)

  /** Age-based retention: expire snapshots committed before `cutoff`
    * (ISO-8601 instant), always keeping the head. Same immediate reclaim
    * as [[expireSnapshots]]. */
  def expireSnapshotsOlderThan(cutoff: String): Int = log.expireOlderThan(cutoff)

  // ------------------------------------------------- branches, tags, WAP

  private def requireMain(verb: String): Unit =
    require(branchName.isEmpty,
      s"$verb must be called on the main table handle, not branch " +
        s"'${branchName.getOrElse("")}'")

  /**
   * Handle onto a named branch of this table: same root, same data
   * directory pool, but reads/writes/commits go to the branch's own
   * snapshot log (`_log/branches/<name>/`). Every table verb — append,
   * upsert, MOR, compact, time travel, serving lookups — works on the
   * branch handle unchanged, because all of them only speak to `log`.
   */
  def branch(b: String): GraftTable = {
    requireMain("branch()")
    require(log.branches().contains(b), s"table $name has no branch '$b'")
    new GraftTable(spark, root, name, retainVersions, autoCompactAfter,
      gcGraceMs, statsColumns, Some(b))
  }

  /**
   * Create a branch at the current head (Iceberg branch / the staging half
   * of write-audit-publish): ONE metadata commit copying the head's
   * self-contained state (schema, dir list, pending deltas, statistics)
   * into the branch log's v1 — no data is read or copied, so the cost is
   * O(manifest) regardless of table size. The base snapshot id is recorded
   * in the v1 summary; [[publishBranch]] uses it for its fast-forward
   * check. Create-if-absent via the commit CAS: racing creates of the same
   * branch name resolve to one winner.
   */
  def createBranch(b: String): Snapshot = {
    requireMain("createBranch")
    require(graft.functions.Identifiers.isValidIdent(b),
      s"invalid branch name '$b'")
    val head = log.latest().getOrElse(
      throw new IllegalArgumentException(s"cannot branch empty table $name"))
    try {
      log.branchLog(b).commitExpecting(None, "branch", head.schemaJson,
        head.dataDirs,
        head.summary + ("branch_base" -> head.snapshotId.toString),
        None, head.dirRecords, head.deltaDirs, head.dirStats)
    } catch {
      case _: CommitConflictException =>
        throw new IllegalArgumentException(
          s"branch '$b' of table $name already exists")
    }
  }

  /**
   * Publish a branch to main — the commit half of write-audit-publish: one
   * CAS commit on MAIN carrying the branch head's full content. Audited
   * writes therefore become visible to main readers ATOMICALLY, after any
   * validation ran against the branch, which is the whole point of WAP:
   * bad batches never transit through a readable main state.
   *
   * Fast-forward rule: publish requires main's head to still be the
   * branch's base snapshot. If main advanced since the branch was created,
   * the branch content no longer includes those commits, and publishing it
   * would silently drop them — that case throws [[CommitConflictException]]
   * unless `force = true` (an explicit overwrite, recorded as such). The
   * branch log is left intact; [[dropBranch]] is the caller's cleanup.
   */
  def publishBranch(b: String, force: Boolean = false): Snapshot = {
    requireMain("publishBranch")
    val bl = log.branchLog(b)
    val bh = bl.latest().getOrElse(
      throw new IllegalArgumentException(s"table $name has no branch '$b'"))
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      val head = log.latest()
      val base = log.branchBase(b)
      if (!force && (base.isEmpty || head.map(_.snapshotId) != base))
        throw new CommitConflictException(
          s"non-fast-forward publish of branch '$b': main is at " +
            s"${head.map(_.snapshotId)}, branch base is $base; " +
            "pass force = true to overwrite main")
      try {
        return log.commitExpecting(head.map(_.snapshotId), "publish",
          bh.schemaJson, bh.dataDirs,
          (bh.summary - "branch_base") + ("published_branch" -> b) ++
            (if (force) Map("publish_forced" -> "true") else Map.empty),
          None, bh.dirRecords, bh.deltaDirs, bh.dirStats)
      } catch { case _: CommitConflictException if force => } // head moved
    }
    throw new IllegalStateException(
      s"publish of branch '$b' lost $attempts consecutive races")
  }

  /** Delete a branch's log. Its exclusively-referenced data dirs become
    * orphans and are reclaimed by the grace-gated background sweep. */
  def dropBranch(b: String): Unit = { requireMain("dropBranch"); log.dropBranch(b) }

  def branches(): Seq[String] = log.branches()

  /**
   * Pin a snapshot under an immutable name (Iceberg tag): the manifest is
   * exempt from retention and [[expireSnapshots]], so [[readTag]] works
   * no matter how far the log advances — the audit/repro handle ("the
   * exact corpus release we trained on") that a bare snapshot id cannot
   * give, because untagged ids expire.
   */
  def createTag(tag: String, snapshotId: Option[Long] = None): Long = {
    requireMain("createTag")
    require(graft.functions.Identifiers.isValidIdent(tag),
      s"invalid tag name '$tag'")
    val id = snapshotId.getOrElse(latestVersion)
    require(log.addTag(tag, id), s"tag '$tag' of table $name already exists")
    id
  }

  def dropTag(tag: String): Unit = { requireMain("dropTag"); log.dropTag(tag) }

  def tags(): Map[String, Long] = log.tags()

  def readTag(tag: String): DataFrame = {
    requireMain("readTag")
    val id = log.tags().getOrElse(tag,
      throw new NoSuchElementException(s"table $name has no tag '$tag'"))
    readAsOf(id)
  }

  // ------------------------------------------------ expectations (CHECK)

  /** The table's CHECK constraint (a Spark/ANSI SQL boolean expression over
    * the row), if one was declared. Stored in the log's props sidecar —
    * table-lifetime, survives snapshot retention. */
  def checkConstraint: Option[String] = log.props().get("check")

  /** Declare (or replace) the CHECK constraint. Validated by resolving it
    * against the current schema so a typo fails at DDL time, not mid-ingest. */
  def setCheckConstraint(conditionSql: String): Unit = {
    requireMain("setCheckConstraint")
    if (log.latest().isDefined)
      emptyDF(schema).filter(expr(conditionSql)) // analyzer-resolves or throws
    log.putProp("check", conditionSql)
  }

  /** Side table collecting rows a guarded write rejected: same warehouse
    * directory, `<name>__quarantine`, schema = data schema + `__rule`
    * (the constraint text that rejected the row). Lazily created on the
    * first rejected batch. */
  def quarantineTable: GraftTable = {
    requireMain("quarantineTable")
    new GraftTable(spark, root.resolveSibling(name + "__quarantine"),
      name + "__quarantine", retainVersions, autoCompactAfter, gcGraceMs)
  }

  /**
   * Split a batch by the CHECK constraint with ANSI semantics: a row is
   * rejected only when the condition is FALSE — NULL passes, exactly like
   * a SQL CHECK constraint (`coalesce(cond, true)`). Returns
   * (accepted, rejected); with no constraint declared, everything is
   * accepted. Both sides are lazy single filters over `df`, so Catalyst
   * pushes them into the source scan — the split adds no shuffle and no
   * materialization at any scale.
   */
  def expectSplit(df: DataFrame): (DataFrame, DataFrame) = checkConstraint match {
    case None => (df, emptyDF(df.schema))
    case Some(c) =>
      val pass = coalesce(expr(c), lit(true))
      (df.filter(pass), df.filter(!pass))
  }

  /**
   * Guarded append — the expectations ingest (Delta constraints + DLT
   * expectations in one verb): rows passing the CHECK constraint are
   * appended to this table; violating rows are appended to
   * [[quarantineTable]] with the violated rule attached, so bad records
   * are INSPECTABLE and replayable instead of silently dropped or batch-
   * fatally rejected. Returns (data snapshot, rows quarantined). The
   * quarantined count is read from the quarantine commit's own summary —
   * no extra count job. Batch idempotence (`batchKey`) covers the DATA
   * table; a retried batch re-quarantines nothing because its data commit
   * is a no-op and the quarantine write only runs when the data commit
   * was fresh.
   */
  def appendExpect(df: DataFrame,
      batchKey: Option[String] = None): (Snapshot, Long) = {
    requireMain("appendExpect")
    checkConstraint match {
      case None => (append(df, batchKey), 0L)
      case Some(c) =>
        val (ok, bad) = expectSplit(df)
        val before = log.latest().map(_.snapshotId)
        val snap = append(ok, batchKey)
        val fresh = before != Some(snap.snapshotId) // idempotent replay check
        val n =
          if (!fresh) 0L
          else {
            val qs = quarantineTable
              .append(bad.withColumn("__rule", lit(c)))
            qs.summary.get("appended").map(_.toLong).getOrElse(0L)
          }
        (snap, n)
    }
  }

  private val RangeCol = "__range"

  /**
   * Layout rewrite for RANGE locality — the OPTIMIZE ZORDER move: rewrite
   * the table (pending MOR deltas folded, like [[compact]]) as `targetDirs`
   * range-contiguous data dirs, sorted within each, and harvest per-dir
   * min/max for the cluster columns into the manifest. [[readRange]] then
   * plans ~1/targetDirs of the table for a narrow window instead of every
   * dir — on the 100 TB table this is the difference between a window query
   * listing a handful of dirs and scanning the full history, and inside each
   * surviving file the sort makes parquet row-group stats selective too.
   *
   *  - ONE column: a straight range sort (equi-depth via Spark's range
   *    partitioner sampling). Works for any orderable type.
   *  - MULTIPLE columns: Z-ORDER — each column is equi-depth-quantized to
   *    2^8 buckets (driver-side approxQuantile boundaries, numeric columns),
   *    bucket ids bit-interleaved into a Z-value, rows range-partitioned and
   *    sorted by it. Each dir's bounding box is then tight on EVERY cluster
   *    column, so [[readRange]] prunes on any of them — the multi-dimensional
   *    locality a single-column sort cannot give.
   *
   * The write is one shuffle (the range exchange) + one sort, the same cost
   * shape as [[compact]]. Replaces a hash-bucket layout if one existed:
   * clustering optimizes scans-by-range, bucketing optimizes point lookups —
   * a table declares one primary layout at a time.
   */
  def cluster(columns0: Seq[String], targetDirs: Int = 16): Snapshot = {
    require(columns0.nonEmpty, "cluster needs at least one column")
    require(targetDirs >= 2, s"targetDirs must be >= 2, got $targetDirs")
    val headOpt = log.latest()
    require(headOpt.isDefined, s"table $name has no snapshots")
    val head = headOpt.get
    val st = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val columns = columns0.map(ColumnIds.physicalFor(st, _))
    columns.zip(columns0).foreach { case (c, c0) =>
      require(st.fieldNames.contains(c), s"table $name has no column $c0") }
    val df = ColumnIds.toPhysical(readResolved(head), st)
    val zk = "__zk"
    val sortKey = if (columns.size == 1) col(columns.head) else zValue(df, columns)
    val rel = newDataRel(head.snapshotId + 1)
    val abs = root.resolve(rel).toString
    withMicrosFooters {
      // Sort AFTER adding the partition id: the partitioned write requires
      // an ordering on RangeCol, and (RangeCol, zk) satisfies it as a
      // prefix — no second writer-inserted sort to scramble the zk order
      // that makes row-group stats tight inside each file.
      df.withColumn(zk, sortKey)
        .repartitionByRange(targetDirs, col(zk))
        .withColumn(RangeCol, spark_partition_id())
        .sortWithinPartitions(col(RangeCol), col(zk))
        .drop(zk)
        .write.partitionBy(RangeCol).mode("overwrite").parquet(abs)
    }
    val keep = statsKeep(None)
    val leaves = leafCounts(rel, n => columns.contains(n) || keep(n), RangeCol)
    val total = leaves.map(_.rows).sum
    log.commitExpecting(Some(head.snapshotId), "cluster", head.schemaJson,
      leaves.map(_.rel),
      Map("records" -> total.toString,
        "cluster_columns" -> columns.mkString(",")),
      None, leaves.map(l => l.rel -> l.rows).toMap,
      dirStats = leaves.filter(_.stats.nonEmpty).map(l => l.rel -> l.stats).toMap)
  }

  /**
   * Z-value column: each column equi-depth-quantized against driver-side
   * approxQuantile boundaries (one lightweight sample pass per column — the
   * same "boundaries on the driver, assignment in the plan" split as
   * KMeans' centroids), then the 8-bit bucket ids are bit-interleaved, bit i
   * of column j landing at position `i*k + (k-1-j)`. The whole thing is a
   * static tree of shiftleft/and/or over ONE projected bucket id per
   * column — no UDF, fully codegen'd. NULL quantizes to bucket 0 (sorts
   * first, standard NULLS FIRST locality).
   */
  private def zValue(df: DataFrame, columns: Seq[String]): Column = {
    val bits = 8
    val nb = 1 << bits // 256 equi-depth buckets per column
    val k = columns.size
    require(bits * k <= 62, s"too many Z-order columns: $k")
    // Z-order quantizes through a double cast; a non-castable column would
    // silently quantize every row to bucket 0 (its dimension contributing
    // nothing) — refuse loudly instead. Single-column clustering has no
    // such restriction (a plain range sort orders any comparable type).
    columns.foreach { c =>
      val ok = df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType |
          org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType |
          org.apache.spark.sql.types.DateType => true
        case _ => false
      }
      require(ok, s"Z-order column $c is ${df.schema(c).dataType.simpleString}: " +
        "multi-column clustering needs numeric/timestamp/date columns " +
        "(use a single-column cluster for string sort order)")
    }
    // Quantize input per type: timestamps/dates ride their (monotonic)
    // epoch value — date and NTZ don't cast to double directly.
    def asDouble(c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType |
        org.apache.spark.sql.types.TimestampNTZType =>
        col(c).cast("timestamp").cast("double")
      case _ => col(c).cast("double")
    }
    val bucketIds = columns.map { c =>
      val probs = (1 until nb).map(_.toDouble / nb).toArray
      // approxQuantile needs a numeric column; cast once in a throwaway
      // projection (timestamps/dates quantize via their epoch value).
      val bounds = df.select(asDouble(c).as(c))
        .stat.approxQuantile(c, probs, 0.001)
        .distinct.sorted
      val v = asDouble(c)
      // Bucket id = #boundaries <= v, found by a BINARY-SEARCH decision
      // tree of when()s over the sorted literal boundaries: per-row cost is
      // the depth (<= 8 comparisons for 255 bounds) instead of the O(256)
      // per-row fold an `aggregate` over the literal array paid. The tree
      // holds ~2n expression nodes, but codegen'd CaseWhen evaluates only
      // the taken path. A NULL v fails every >= (null-valued predicate
      // falls to otherwise), walks the left spine, and lands in bucket 0 —
      // the documented NULLS FIRST behavior. Invariant: the answer is in
      // [lo, hi]; v >= bounds(mid) puts it in [mid+1, hi], else [lo, mid].
      def search(lo: Int, hi: Int): Column =
        if (lo >= hi) lit(lo.toLong)
        else {
          val mid = (lo + hi) / 2
          when(v >= lit(bounds(mid)), search(mid + 1, hi))
            .otherwise(search(lo, mid))
        }
      val raw = search(0, bounds.length)
      // A low-cardinality column dedupes to few boundaries and would only
      // occupy the LOW interleave bits, letting the other dimension dominate
      // the Z-order entirely — rescale every column's id onto the full
      // 2^bits range so each contributes at the same bit significance.
      if (bounds.length + 1 >= nb) raw
      else floor(raw * lit(nb.toLong) / lit((bounds.length + 1).toLong)).cast("long")
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      bucketIds.zipWithIndex.foldLeft(acc) { case (a, (bid, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bid, i).bitwiseAND(lit(1L)), i * k + (k - 1 - j)))
      }
    }
  }

  // ----------------------------------------------------------------- diff

  /**
   * Snapshot diff: classify rows of version `v2` against version `v1`
   * (usually its parent) as NEW / MODIFIED / DELETED / UNCHANGED, with the
   * list of changed columns — the engine-side generalization of the
   * reference's page diff (`api_poc.py:443-487` classify, `:552-557`
   * cell-level old→new).
   */
  def diff(v2: Long, v1: Long, pk: String): DataFrame = {
    val (j, dataCols) = diffJoin(v2, v1, pk)
    val changed = array_compact(array(dataCols.map { cc =>
      when(!(col(s"__c.$cc") <=> col(s"__p.$cc")), lit(cc)).otherwise(lit(null).cast("string"))
    }: _*))
    j.select(
      col("__pk").as(pk),
      when(col("__p").isNull, "NEW")
        .when(col("__c").isNull, "DELETED")
        .when(!(col("__c") <=> col("__p")), "MODIFIED")
        .otherwise("UNCHANGED").as("change_type"),
      when(col("__c").isNotNull && col("__p").isNotNull, changed)
        .otherwise(array().cast("array<string>")).as("changed_columns"))
  }

  /**
   * Cell-level diff: one row per (pk, changed column) with old → new values
   * (stringified for a uniform schema), exactly the reference's per-cell
   * change payload (`api_poc.py:552-557`). Covers only rows present in both
   * versions (MODIFIED); NEW/DELETED rows are whole-row changes reported by
   * [[diff]].
   */
  def diffCells(v2: Long, v1: Long, pk: String): DataFrame = {
    val (j, dataCols) = diffJoin(v2, v1, pk)
    val cells = array_compact(array(dataCols.map { cc =>
      when(!(col(s"__c.$cc") <=> col(s"__p.$cc")),
        struct(lit(cc).as("column"),
          col(s"__p.$cc").cast("string").as("old_value"),
          col(s"__c.$cc").cast("string").as("new_value")))
        .otherwise(lit(null))
    }: _*))
    j.filter(col("__c").isNotNull && col("__p").isNotNull && !(col("__c") <=> col("__p")))
      .select(col("__pk").as(pk), explode(cells).as("__cell"))
      .select(col(pk), col("__cell.column").as("column"),
        col("__cell.old_value").as("old_value"), col("__cell.new_value").as("new_value"))
  }

  /** Shared full-outer diff join over the schema union of two versions. */
  private def diffJoin(v2: Long, v1: Long, pk: String): (DataFrame, Seq[String]) = {
    val cur = readAsOf(v2)
    val par = readAsOf(v1)
    // Versions may have different schemas (evolution between v1 and v2):
    // compare over the union, padding the missing side with typed nulls.
    val dataCols = (cur.columns ++ par.columns).distinct.filterNot(_ == pk).toSeq
    def side(df: DataFrame, other: DataFrame, as: String) = {
      val have = df.columns.toSet
      df.select(col(pk).as("__pk"), struct(dataCols.map { cc =>
        if (have.contains(cc)) col(cc).as(cc)
        else {
          val dt = other.schema.find(_.name == cc).map(_.dataType)
            .getOrElse(org.apache.spark.sql.types.StringType)
          lit(null).cast(dt).as(cc)
        }
      }: _*).as(as))
    }
    val c = side(cur, par, "__c")
    val p = side(par, cur, "__p")
    (c.join(p, Seq("__pk"), "full_outer"), dataCols)
  }

  // --------------------------------------------------------- change feed

  /**
   * Commit-granular change feed over `(fromSnapshotId, toSnapshotId]` — the
   * incremental-consumption read (the Delta CDF / Hudi incremental-query
   * capability): one row per changed row per commit, tagged `_change_type`
   * (`insert` | `update_pre` | `update_post` | `delete`) and
   * `_commit_version`. `update_pre`/`delete` rows carry the PRE-image,
   * `insert`/`update_post` the post-image, so a consumer can replay the
   * feed to reconstruct the table, or maintain any distributive aggregate
   * with a signed weight (+1 for insert/update_post, −1 for
   * update_pre/delete) — see [[MaterializedAgg]]. `pk` is the merge key
   * change rows are identified by (same contract as [[diff]]). The signed
   * net is exact even when `pk` is NOT unique: rewrite commits diff as a
   * per-(pk, image) multiset (see [[rewriteChanges]]), with the
   * `update_pre`/`update_post` tagging reserved for the unambiguous
   * one-pre/one-post case and everything else degrading to insert/delete
   * images of identical net effect.
   *
   * Cost is proportional to the CHANGES, not the table, on every hot path —
   * the property that makes a downstream consumer at 100 TB incremental
   * instead of a nightly full recompute:
   *
   *  - append/insert commits read only the commit's NEW dirs — no join;
   *  - merge-on-read delta commits read the new delta dirs and resolve
   *    pre-images with broadcast-keys semi joins against the parent view
   *    (the parent scan shuffles nothing and only ≤|delta| rows survive);
   *  - copy-on-write rewrites diff only the dirs the commit removed/added:
   *    carried dirs are the SAME immutable files on both sides and cannot
   *    produce a change, so they are skipped — for a bucketed upsert that
   *    is exactly the touched buckets;
   *  - compact/cluster are layout-only (read-equality is property-held by
   *    MorSpec/LookupProps) and emit nothing.
   *
   * overwrite/rollback/publish replace content wholesale; their feed is the
   * full old-vs-new diff, which is inherent to the operation, not a plan
   * artifact. Rewrite-family changes are NET effects (a rewrite that lands
   * an identical row emits nothing); merge-on-read delta commits record the
   * WRITE, so an upsert that re-states the current image emits an
   * update_pre/update_post pair with equal images — both conventions cancel
   * in any signed-weight consumer.
   *
   * Row images are aligned to the `to` snapshot's schema (typed-null
   * padding for columns that did not exist yet). Every manifest in the
   * window must still be retained: a feed across expired history throws
   * `IllegalStateException` (consumers fall back to a full recompute — see
   * [[MaterializedAgg.refresh]]).
   */
  def changesBetween(fromSnapshotId: Long, toSnapshotId: Long,
      pk0: String): DataFrame = {
    require(toSnapshotId >= fromSnapshotId,
      s"change feed window is (from, to]: from=$fromSnapshotId to=$toSnapshotId")
    val pk = ColumnIds.physicalFor(schema, pk0)
    // Driver-side lineage walk (metadata only): child-to-parent from `to`
    // until `from`, oldest first. parentId — not version arithmetic —
    // because rollback/publish commits parent onto whatever head they saw.
    var chain = List.empty[Snapshot]
    var floor: Option[Snapshot] = None // the `from` snapshot, if composed
    if (toSnapshotId > fromSnapshotId) {
      var at = Option(log.get(toSnapshotId).getOrElse(throw new NoSuchElementException(
        s"table $name has no snapshot $toSnapshotId")))
      while (at.exists(_.snapshotId != fromSnapshotId)) {
        val s = at.get
        chain ::= s
        at = s.parentId match {
          case Some(p) => Some(log.get(p).getOrElse(throw new IllegalStateException(
            s"change feed over table $name needs snapshot $p, but it has " +
              "been expired — fall back to a full read/recompute")))
          case None if fromSnapshotId <= 0 => None // reached table creation
          case None => throw new NoSuchElementException(
            s"snapshot $fromSnapshotId is not an ancestor of $toSnapshotId " +
              s"in table $name")
        }
      }
      floor = at
    }
    val toSchema = chain.lastOption
      .map(s => DataType.fromJson(s.schemaJson).asInstanceOf[StructType])
      .getOrElse(schema)
    // Each commit's parent is the previous chain entry (the first one's is
    // the window floor) — the walk composed every snapshot ONCE; without
    // threading it, commitChanges would re-compose each parent a second
    // time through log.get.
    val parents: Seq[Option[Snapshot]] =
      if (chain.isEmpty) Nil else floor +: chain.init.map(Option(_))
    val tagged = chain.zip(parents).flatMap { case (s, p) =>
      commitChanges(s, p, pk).map { df =>
        align(df, toSchema, keep = Seq("_change_type"))
          .withColumn("_commit_version", lit(s.snapshotId))
      }
    }
    val out =
      if (tagged.isEmpty)
        emptyDF(StructType(toSchema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType, nullable = false))))
      else tagged.reduce(_.unionByName(_))
    // Change rows serve the window-END schema's LOGICAL names.
    ColumnIds.toLogical(out, toSchema)
  }

  /** [[changesBetween]] from `fromSnapshotId` to the current head. */
  def changesSince(fromSnapshotId: Long, pk: String): DataFrame =
    changesBetween(fromSnapshotId, latestVersion, pk)

  /** One commit's changes: image columns plus a `_change_type` tag. Each
    * source side appears ONCE in the returned plan — change types are
    * fanned out by a per-row explode over when()-built entries, not by
    * per-type filters that would re-scan the join (exchange reuse does not
    * fire across differently-pruned consumers of one frame). */
  private def commitChanges(s: Snapshot, p: Option[Snapshot],
      pk: String): Option[DataFrame] = {
    // O(delta) dir attribution when the log can prove it from the commit's
    // own detail (round 17); the O(live-dirs) set diff is the fallback for
    // legacy manifests, folds, and rollback re-adds. On a 10⁶-dir table
    // this is the difference between a feed tick pricing the CHANGES and
    // pricing the table.
    val (added, removed, newDeltas) = log.commitDirDelta(s.snapshotId) match {
      case Some(t) => t
      case None =>
        val pData = p.map(_.dataDirs).getOrElse(Seq.empty)
        (s.dataDirs.filterNot(pData.toSet),
          pData.filterNot(s.dataDirs.toSet),
          s.deltaDirs.filterNot(p.map(_.deltaDirs).getOrElse(Seq.empty).toSet))
    }
    s.operation match {
      // Layout-only: logical content is unchanged by construction
      // (compaction read-equality is property-held in MorSpec/LookupProps).
      case "compact" | "cluster" => None
      // Pure additive commit: the new dirs ARE the inserted rows.
      case "append" | "insert" if removed.isEmpty && newDeltas.isEmpty =>
        if (added.isEmpty) None
        else Some(readDirsAs(s, added)
          .withColumn("_change_type", lit("insert")))
      // Keyed delta commit: a deferred upsert, or an append that landed on
      // a pending chain (its rows join the chain and supersede same-key
      // images, so it is semantically a keyed batch too, and the O(batch)
      // path applies — NOT the full-view diff).
      case "upsert-deferred" | "append" | "insert"
          if removed.isEmpty && newDeltas.nonEmpty && added.isEmpty =>
        require(s.summary.get("mor_key").contains(pk),
          s"change feed pk '$pk' must equal the MOR merge key " +
            s"'${s.summary.getOrElse("mor_key", "?")}' for delta commits")
        Some(morChanges(s, p.get, newDeltas, pk))
      // Rewrite family (upsert/update/delete/overwrite/create/rollback/
      // publish, and anything unrecognized — correctness never depends on
      // the operation label): old-vs-new keyed diff, dir-restricted when
      // no delta chains are involved on either side.
      case _ => Some(rewriteChanges(s, p, added, removed, pk))
    }
  }

  /** Subset-of-dataDirs read with the snapshot's schema (typed-null pad
    * for pre-evolution files, same as [[readSnapshot]]). */
  private def readDirsAs(s: Snapshot, dirs: Seq[String]): DataFrame = {
    val st = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    if (dirs.isEmpty) emptyDF(st)
    else spark.read.schema(st)
      .parquet(dirs.map(d => root.resolve(d).toString): _*)
  }

  /** Pack a side's data columns (union of both sides, typed-null padding —
    * the diffJoin evolution rule) into one struct, keyed by `__pk`. */
  private def packSide(df: DataFrame, other: DataFrame, pk: String,
      dataCols: Seq[String], as: String, extra: Seq[String] = Nil): DataFrame = {
    val have = df.columns.toSet
    df.select(Seq(col(pk).as("__pk"), struct(dataCols.map { cc =>
      if (have.contains(cc)) col(cc).as(cc)
      else {
        val dt = other.schema.find(_.name == cc).map(_.dataType)
          .getOrElse(org.apache.spark.sql.types.StringType)
        lit(null).cast(dt).as(cc)
      }
    }: _*).as(as)) ++ extra.map(col): _*)
  }

  /** Explode `(change type, image struct)` entries into tagged rows —
    * the single-plan fan-out shared by both feed join shapes. `entries`
    * elements are null for non-applicable types; array_compact drops them,
    * and a row with no applicable entry (e.g. rewritten unchanged) emits
    * nothing. */
  private def explodeChanges(j: DataFrame, pk: String,
      entries: Column): DataFrame =
    j.select(col("__pk"), explode(array_compact(entries)).as("__e"))
      .select(Seq(col("__pk").as(pk), col("__e.__img.*"),
        col("__e.__ct").as("_change_type")): _*)

  /** Changes carried by a merge-on-read delta commit: the delta rows are
    * the post-images (plus `__op = 'd'` tombstones); pre-images resolve
    * against the PARENT view via ONE broadcast-keys semi join — the parent
    * scan shuffles nothing, appears once in the plan, and only ≤|delta|
    * rows survive it. The surviving pre rows then join the delta batch
    * (both small) and one explode classifies each pair. Tied duplicate-key
    * parent rows each emit their own update_pre/delete, but only the
    * first emits the (single) update_post — superseding N images is one
    * write. */
  private def morChanges(s: Snapshot, p: Snapshot, newDeltas: Seq[String],
      pk: String): DataFrame = {
    val d0 = deltaFrame(s, newDeltas).drop("__seq")
    // Pre-image source, restricted to the delta's keys BEFORE resolution:
    //  - dir level: when the parent is bucketed by pk, a key's rows can
    //    only live in its hash bucket's dirs, so the scan plans just the
    //    delta keys' buckets (the serving-lookup prune applied to the
    //    feed); one tiny distinct-bucket-ids job over the delta decides
    //    the dir list, unmarked dirs are kept conservatively.
    //  - row level: the broadcast-keys semi join lands on the BASE side
    //    before any delta resolution — the per-key rank window then
    //    shuffles O(batch + chain) rows, never the table (a semi join
    //    does not push through a window, so joining after resolution
    //    would shuffle everything).
    val keys = broadcast(d0.select(col(pk)).distinct())
    val touched: Option[Set[Int]] = bucketSpecOf(p) match {
      case Some((bk, nb)) if bk == pk =>
        Some(d0.select(pmod(xxhash64(col(pk)), lit(nb)).cast("int").as("__b"))
          .distinct().collect().map(_.getInt(0)).toSet)
      case _ => None
    }
    def prune(dirs: Seq[String]): Seq[String] = touched match {
      case Some(ts) => dirs.filter(d => bucketOfDir(d).forall(ts.contains))
      case None => dirs
    }
    // Row-group-level prune: every pre-image key lies in the delta's
    // [min, max] key range, and bucketed dirs are written KEY-SORTED, so a
    // pushed between() lets parquet footer stats skip the row groups a
    // semi join alone would decode (a broadcast semi join pushes nothing
    // into the scan). Key-local batches — CDC bursts, backfills, point
    // fixes — then decode a sliver of each touched bucket; a uniformly
    // scattered batch degrades gracefully to the full bucket scan this
    // replaces. One tiny min/max job over the delta pays for it.
    val kb = d0.agg(min(col(pk)).as("__lo"), max(col(pk)).as("__hi")).head
    val rBase = readDirsAs(p, prune(p.dataDirs))
      .filter(col(pk).between(lit(kb.get(0)), lit(kb.get(1))))
      .join(keys, Seq(pk), "left_semi")
    val pre0 =
      if (p.deltaDirs.isEmpty) rBase
      // resolve over the restricted base plus the (bucket-pruned) chain,
      // then drop chain rows whose keys the batch does not touch
      else resolveDeltas(p, rBase, prune(p.deltaDirs))
        .join(keys, Seq(pk), "left_semi")
    val dataCols =
      (d0.columns ++ pre0.columns).distinct
        .filterNot(c => c == pk || c == "__op").toSeq
    // Both sides carry a per-key row_number so ties stay exact: N batch
    // rows superseding M tied parent rows must emit M update_pre (from the
    // first batch row) and N update_post (against the first parent row),
    // not N×M of each (the join pairs them all). Both windows run over
    // BATCH-sized frames.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__pk"))
    val d = packSide(d0, pre0, pk, dataCols, "__post", extra = Seq("__op"))
      .withColumn("__dn", row_number().over(w.orderBy(col("__post"))))
    val pre = packSide(pre0, d0, pk, dataCols, "__pre")
      .withColumn("__pn", row_number().over(w.orderBy(col("__pre"))))
    val j = d.join(pre, Seq("__pk"), "left")
    val isDel = coalesce(col("__op") === "d", lit(false))
    val hasPre = col("__pre").isNotNull
    val firstPre = coalesce(col("__pn") === 1, lit(true))
    val firstPost = col("__dn") === 1
    explodeChanges(j, pk, array(
      when(isDel && hasPre && firstPost,
        struct(lit("delete").as("__ct"), col("__pre").as("__img"))),
      when(!isDel && hasPre && firstPost,
        struct(lit("update_pre").as("__ct"), col("__pre").as("__img"))),
      when(!isDel && hasPre && firstPre,
        struct(lit("update_post").as("__ct"), col("__post").as("__img"))),
      when(!isDel && !hasPre,
        struct(lit("insert").as("__ct"), col("__post").as("__img")))))
  }

  /** Changes carried by a rewrite commit: MULTISET diff of the removed
    * dirs against the added dirs — rows rewritten unchanged cancel and
    * emit nothing, so only the touched content is read when neither side
    * has pending delta chains (the fast path; for a bucketed upsert that
    * is exactly the touched buckets). With deltas in play, dir restriction
    * is unsound (the logical view is not a dir union) and the diff runs
    * over the two RESOLVED views.
    *
    * Why a multiset diff and not a pk full-outer join: a join on a
    * NON-unique pk pairs every pre-row with every post-row of the key —
    * c×c' "update" pairs whose signed-weight net (`+post −pre` per pair)
    * is WRONG (pre {A} → post {A, B} would feed −A +A +B... as −A +B +A
    * pairs netting −A +B +unchanged-A churn instead of the true +B), and
    * the blow-up is quadratic in the key's multiplicity. Counting
    * distinct (pk, image) groups on each side and emitting the COUNT
    * DIFFERENCE is exact for any multiplicity, costs one map-side-partial
    * aggregation per side (identical rows collapse before the shuffle —
    * strictly less data than the join it replaces moved), and the join
    * keys are null-safe, so unchanged rows with a NULL pk no longer emit
    * spurious delete+insert churn. The `update_pre`/`update_post` tagging
    * is kept exactly where it is unambiguous — a key with ONE pre image
    * and ONE post image that differ; any other multiplicity degrades to
    * insert/delete images, which every signed-weight consumer
    * ([[MaterializedAgg]], feed replay) treats identically. */
  private def rewriteChanges(s: Snapshot, p: Option[Snapshot],
      added: Seq[String], removed: Seq[String], pk: String): DataFrame = {
    val noDeltas = s.deltaDirs.isEmpty && p.forall(_.deltaDirs.isEmpty)
    val cur = if (noDeltas) readDirsAs(s, added) else readResolved(s)
    val par = p match {
      case Some(pp) => if (noDeltas) readDirsAs(pp, removed) else readResolved(pp)
      case None => emptyDF(
        DataType.fromJson(s.schemaJson).asInstanceOf[StructType])
    }
    val dataCols = (cur.columns ++ par.columns).distinct.filterNot(_ == pk).toSeq
    val c1 = packSide(cur, par, pk, dataCols, "__img")
      .groupBy(col("__pk"), col("__img")).agg(count(lit(1)).as("__cn"))
    val p1 = packSide(par, cur, pk, dataCols, "__img")
      .groupBy(col("__pk"), col("__img")).agg(count(lit(1)).as("__pn"))
    val m = c1.as("c").join(p1.as("p"),
        col("c.__pk") <=> col("p.__pk") && col("c.__img") <=> col("p.__img"),
        "full_outer")
      .select(
        coalesce(col("c.__pk"), col("p.__pk")).as("__pk"),
        coalesce(col("c.__img"), col("p.__img")).as("__img"),
        coalesce(col("c.__cn"), lit(0L)).as("__cn"),
        coalesce(col("p.__pn"), lit(0L)).as("__pn"))
    // Per-key totals decide whether the 1-pre/1-post update classification
    // applies. A window, not a second join: the frame at this point holds
    // DISTINCT images only, so the extra pk shuffle moves at most the
    // changed content once more — and only the changed dirs' content is
    // in the plan at all.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__pk"))
    val k = m.withColumn("__kc", sum(col("__cn")).over(w))
      .withColumn("__kp", sum(col("__pn")).over(w))
    val uniquePair = col("__kc") === 1 && col("__kp") === 1 &&
      col("__cn") =!= col("__pn") // same single image on both sides ⇒ cn=pn=1 ⇒ no change
    def tagged(ct: String) =
      struct(lit(ct).as("__ct"), col("__img").as("__img"))
    val net = col("__cn") - col("__pn")
    explodeChanges(k, pk,
      when(uniquePair && col("__pn") === 1, array(tagged("update_pre")))
        .when(uniquePair && col("__cn") === 1, array(tagged("update_post")))
        .when(net > 0, array_repeat(tagged("insert"), net.cast("int")))
        .when(net < 0, array_repeat(tagged("delete"), (-net).cast("int")))
        .otherwise(array_repeat(tagged("insert"), lit(0))))
  }
}

object GraftTable {
  /** One daemon thread for post-commit serving pre-warms: warming runs
    * strictly BEHIND the commit (never in its latency), one at a time —
    * a burst of commits queues warms rather than spawning threads. */
  private[table] lazy val prewarmPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-serving-prewarm")
      t.setDaemon(true)
      t
    })

  /** How long after a point lookup a table still counts as "being
    * served": post-commit pre-warms run only inside this window, so a
    * pure batch pipeline (no reader) never pays the warm's footer I/O
    * against its own ingest throughput. */
  private[table] val PrewarmServeWindowMs: Long = 10L * 60 * 1000

  /** Widest commit (in fresh dirs) the post-commit pre-warm will touch —
    * see the cap note at [[GraftTable#prewarmServing]]. */
  private[table] val PrewarmMaxDirs: Int = 1024

  /** Absolute table root -> last point-lookup wall millis (process-wide:
    * serving and ingest commonly run through distinct GraftTable
    * instances over the same root). Bounded by the number of distinct
    * table roots a process touches. */
  private[table] val servedTables =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[table] def recentlyServed(rootKey: String): Boolean = {
    val t = servedTables.get(rootKey)
    if (t == null) false
    else if (System.currentTimeMillis() - t <= PrewarmServeWindowMs) true
    else {
      // Expired: drop the entry so a long-lived process looking up many
      // ephemeral tables doesn't accrete one root string per table forever
      // (remove(k, v) so a racing fresh markServed is never lost).
      servedTables.remove(rootKey, t)
      false
    }
  }

  /**
   * Default prune-worthy heuristic for manifest statistics: id/key-named
   * columns — the ones equality lookups and range reads target (timestamp/
   * date columns are kept separately by parquet annotation). A false
   * positive costs a few bytes of manifest; a false negative only disables
   * skipping for that column (reads stay correct), and a table that prunes
   * on an unusual column name declares it via `statsColumns`.
   */
  private[table] def idLike(name: String): Boolean = {
    val l = name.toLowerCase(java.util.Locale.ROOT)
    l.endsWith("id") || l.endsWith("key")
  }

  /**
   * NAMED phase wall-clock split of the most recent merge-family commit on
   * this JVM — an ordered (phaseName -> seconds) sequence rather than a
   * positional tuple, because the copy-on-write and merge-on-read commit
   * paths have different phase structures:
   *
   *  - COW bucketed merge: `prepass` (touched-bucket pre-pass — for a CDC
   *    micro-batch this is also where the cached envelope decode
   *    materializes, its first action), `merge_write` (merge compute +
   *    bucketed parquet write), `footer` (post-write footer/stat harvest —
   *    synchronous driver-side I/O, the phase an OS page flush would
   *    stall), `commit` (manifest/log commit)
   *  - MOR deferred append: `write` (cache materialize + in-batch dedup +
   *    align + delta parquet write — one action), `commit`
   *
   * Always on: the cost is a handful of nanoTime reads per commit. The CDC
   * bench trace snapshots it after every micro-batch, so a sporadic slow
   * wave lands in a NAMED phase instead of "body time, cause unknown".
   */
  @volatile var lastMergePhases: Option[Seq[(String, Double)]] = None
  private[table] var lastFooterSec: Double = 0.0

  /** Parquet row-group byte target for bucketed BASE files (see
    * [[GraftTable.writeBucketedDir]]'s layout rationale). Overridable via
    * `-Dgraft.bucket.rowGroupBytes=` for tables that are never point-read. */
  private[table] def bucketRowGroupBytes: Long =
    sys.props.get("graft.bucket.rowGroupBytes").flatMap(_.toLongOption)
      .getOrElse(4L << 20)
}
