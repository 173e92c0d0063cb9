package graft.log

import scala.collection.immutable.{AbstractMap, HashMap, Map}

/** `++`/`concat` as an O(|suffix|) fold over [[Map.updated]]. The generic
  * default rebuilds the WHOLE map into a fresh HashMap — measured 1.5 s
  * for a one-key `++` on a 10⁶-entry composed map (LogScaleBench), paid on
  * the first append and first head re-read after every cold open. The
  * overlay's own collapse threshold still bounds pathological suffixes. */
private[log] trait FoldConcat[V] extends Map[String, V] {
  override def concat[V2 >: V](
      suffix: scala.collection.IterableOnce[(String, V2)]): Map[String, V2] = {
    var out: Map[String, V2] = this
    val it = suffix.iterator
    while (it.hasNext) { val kv = it.next(); out = out.updated(kv._1, kv._2) }
    out
  }
}

/**
 * Array-backed and layered immutable Maps for million-entry dir metadata
 * (`Snapshot.dirRecords` / `Snapshot.dirStats`).
 *
 * Why they exist: the 10⁶-dir cold open used to spend its seconds building
 * immutable HashMaps nobody had asked a question of yet — each fold shard
 * parsed into a 62k-entry hash map, then the compose rebuilt one
 * 10⁶-entry map per field (ComposeBench: ~0.4-3 s warm-to-cold for the
 * merges alone, similar again inside the shard parses). These classes keep
 * the full `immutable.Map` contract while deferring ALL hashing:
 *
 *  - [[ArrayDirMap]] — the parse-time leaf: parallel key/value arrays,
 *    zero hashing at construction. Iteration walks the arrays; `get`
 *    forces a one-time `java.util.HashMap` index (built at first ask,
 *    shared by every reader of the instance thereafter).
 *  - [[ConcatDirMap]] — the compose-time union of segment maps whose key
 *    sets are DISJOINT (the segmented-detail encoder's invariant: a commit
 *    adds only dirs absent from every prior segment; a re-added dir stays
 *    in its original segment). O(1) to build; `size` is the sum of part
 *    sizes; `get` forces one combined lazy index.
 *  - [[OverlayDirMap]] — O(delta) functional updates on top of either:
 *    `updated`/`removed`/`++`/`--` accumulate into a small eager overlay
 *    map and a dropped-key set, never touching (or copying) the big base.
 *    This is what keeps a 10⁶-dir APPEND O(delta): the child snapshot's
 *    maps share the parent's base physically.
 *
 * Thread-safety: instances are immutable; the lazy indexes are
 * idempotently built (worst case two threads build and one wins — same
 * contract as the segment cache).
 */
private[graft] final class ArrayDirMap[V](
    private[log] val ks: Array[String],
    // AnyRef (boxed) on purpose: a generic Array[V] erases to Object[] at
    // use sites outside this class and a primitive Long[] then fails the
    // cast; one boxed Long per record entry is noise next to the strings.
    private[log] val vs: Array[AnyRef])
    extends AbstractMap[String, V] with FoldConcat[V] with Serializable {

  private def v(i: Int): V = vs(i).asInstanceOf[V]

  @transient @volatile private var idx: java.util.HashMap[String, AnyRef] = _

  private[log] def index: java.util.HashMap[String, AnyRef] = {
    var m = idx
    if (m == null) {
      m = new java.util.HashMap[String, AnyRef](
        math.max(16, ks.length * 4 / 3 + 1))
      var i = 0
      while (i < ks.length) { m.put(ks(i), vs(i)); i += 1 }
      idx = m
    }
    m
  }

  override def size: Int = ks.length
  override def knownSize: Int = ks.length
  override def isEmpty: Boolean = ks.length == 0

  override def get(key: String): Option[V] = {
    val r = index.get(key)
    // Values are never null in this domain (boxed Long / Map); a null
    // therefore distinguishes absence without a second containsKey probe.
    if (r == null) None else Some(r.asInstanceOf[V])
  }

  override def contains(key: String): Boolean = index.containsKey(key)

  override def iterator: Iterator[(String, V)] = new Iterator[(String, V)] {
    private var i = 0
    override def hasNext: Boolean = i < ks.length
    override def next(): (String, V) = { val t = (ks(i), v(i)); i += 1; t }
  }

  override def foreachEntry[U](f: (String, V) => U): Unit = {
    var i = 0
    while (i < ks.length) { f(ks(i), v(i)); i += 1 }
  }

  override def updated[V1 >: V](key: String, value: V1): Map[String, V1] =
    new OverlayDirMap[V1](this, HashMap(key -> value), Set.empty)

  override def removed(key: String): Map[String, V] =
    if (!contains(key)) this
    else new OverlayDirMap[V](this, HashMap.empty, Set(key))
}

/** Union of maps with pairwise-disjoint key sets (caller's invariant —
  * violated, `size`/`iterator` double-count where a plain merge would
  * dedup). O(1) construction; one combined lazy index serves `get`. */
private[graft] final class ConcatDirMap[V](
    private[log] val parts: IndexedSeq[Map[String, V]])
    extends AbstractMap[String, V] with FoldConcat[V] with Serializable {

  @transient @volatile private var idx: java.util.HashMap[String, AnyRef] = _

  private def index: java.util.HashMap[String, AnyRef] = {
    var m = idx
    if (m == null) {
      m = new java.util.HashMap[String, AnyRef](
        math.max(16, size * 4 / 3 + 1))
      parts.foreach {
        case a: ArrayDirMap[V @unchecked] =>
          var i = 0
          while (i < a.ks.length) { m.put(a.ks(i), a.vs(i)); i += 1 }
        case p => p.foreachEntry((k, v) => m.put(k, v.asInstanceOf[AnyRef]))
      }
      idx = m
    }
    m
  }

  override val size: Int = parts.iterator.map(_.size).sum
  override def knownSize: Int = size
  override def isEmpty: Boolean = size == 0

  override def get(key: String): Option[V] = {
    val r = index.get(key)
    if (r == null) None else Some(r.asInstanceOf[V])
  }

  override def contains(key: String): Boolean = index.containsKey(key)

  override def iterator: Iterator[(String, V)] =
    parts.iterator.flatMap(_.iterator)

  override def foreachEntry[U](f: (String, V) => U): Unit =
    parts.foreach(_.foreachEntry(f))

  override def updated[V1 >: V](key: String, value: V1): Map[String, V1] =
    new OverlayDirMap[V1](this, HashMap(key -> value), Set.empty)

  override def removed(key: String): Map[String, V] =
    new OverlayDirMap[V](this, HashMap.empty, Set(key))
}

/** O(delta) functional layer over a big base map: `over` wins, `dropped`
  * hides base keys, the base is shared untouched. `over` and `dropped` are
  * kept disjoint by the update ops. Collapses to a plain map if the delta
  * ever rivals the base (pathological churn without a fold). */
private[graft] final class OverlayDirMap[V](
    private[log] val base: Map[String, V],
    private[log] val over: Map[String, V],
    private[log] val dropped: Set[String])
    extends AbstractMap[String, V] with FoldConcat[V] with Serializable {

  override def get(key: String): Option[V] = {
    val o = over.get(key)
    if (o.isDefined) o
    else if (dropped.contains(key)) None
    else base.get(key)
  }

  override def contains(key: String): Boolean =
    over.contains(key) || (!dropped.contains(key) && base.contains(key))

  // Exact regardless of whether dropped/over keys actually exist in the
  // base (a removed dir may legitimately lack a records/stats entry).
  // Probing forces the base's lazy index ONCE per underlying base — every
  // descendant overlay sharing it gets O(small) sizes thereafter.
  override lazy val size: Int =
    base.size - dropped.count(base.contains) -
      over.count(kv => base.contains(kv._1)) + over.size

  override def isEmpty: Boolean = over.nonEmpty match {
    case true => false
    case false => size == 0
  }

  override def iterator: Iterator[(String, V)] =
    base.iterator.filter(kv =>
      !dropped.contains(kv._1) && !over.contains(kv._1)) ++ over.iterator

  override def foreachEntry[U](f: (String, V) => U): Unit = {
    base.foreachEntry((k, v) =>
      if (!dropped.contains(k) && !over.contains(k)) f(k, v))
    over.foreachEntry(f)
  }

  private def maybeCollapsed[V1 >: V](
      b: Map[String, V], o: Map[String, V1], d: Set[String]): Map[String, V1] =
    if (o.size + d.size <= math.max(1024, b.size / 2))
      new OverlayDirMap[V1](b, o, d)
    else { // delta rivals the base: pay O(n) once, drop the indirection
      val hb = HashMap.newBuilder[String, V1]
      b.foreachEntry((k, v) => if (!d.contains(k) && !o.contains(k)) hb += k -> v)
      o.foreachEntry((k, v) => hb += k -> v)
      hb.result()
    }

  override def updated[V1 >: V](key: String, value: V1): Map[String, V1] =
    maybeCollapsed[V1](base, over.updated(key, value),
      if (dropped.contains(key)) dropped - key else dropped)

  override def removed(key: String): Map[String, V] =
    if (over.contains(key)) new OverlayDirMap[V](base, over - key, dropped + key)
    else if (dropped.contains(key) || !base.contains(key)) this
    else maybeCollapsed[V](base, over, dropped + key)
}

/**
 * ONE dir's stats, decoded from the binary detail's dictionary-coded
 * entries (r18): keys are indices into the document's shared stat-key
 * dictionary, values strings. The previous shape built an eager Scala Map
 * per dir at parse time — at 10⁶ dirs those inner maps were the dominant
 * remaining parse cost (SnapshotLog's codec doc) and forced every
 * stats-array build into string-keyed gets. This keeps the full
 * `immutable.Map` contract with ZERO hashing: `get` is a linear scan over
 * the handful of entries a dir carries (faster than a tiny HashMap), and
 * the range planner's fast path (GraftTable.statPrunedDirs) resolves a
 * column to a dict index ONCE per document and then reads each dir's
 * value by INT comparison — column-major access without a format change.
 * `updated`/`removed` copy out to a plain map (stats maps are read-only
 * in practice; the copies keep the contract for tests/tooling).
 */
private[graft] final class PackedStatsMap(
    private[graft] val dict: Array[String],
    private[graft] val keyIdx: Array[Int],
    private[graft] val vals: Array[String])
    extends AbstractMap[String, String] with Serializable {

  override def size: Int = keyIdx.length
  override def knownSize: Int = keyIdx.length
  override def isEmpty: Boolean = keyIdx.length == 0

  /** Value for a dictionary index, or null — the planner's int-keyed read. */
  private[graft] def valueAt(di: Int): String = {
    var i = 0
    while (i < keyIdx.length) {
      if (keyIdx(i) == di) return vals(i)
      i += 1
    }
    null
  }

  override def get(key: String): Option[String] = {
    var i = 0
    while (i < keyIdx.length) {
      val k = dict(keyIdx(i))
      if ((k eq key) || k == key) return Some(vals(i))
      i += 1
    }
    None
  }

  override def iterator: Iterator[(String, String)] =
    keyIdx.indices.iterator.map(i => dict(keyIdx(i)) -> vals(i))

  override def foreachEntry[U](f: (String, String) => U): Unit = {
    var i = 0
    while (i < keyIdx.length) { f(dict(keyIdx(i)), vals(i)); i += 1 }
  }

  override def updated[V1 >: String](key: String, value: V1): Map[String, V1] = {
    val b = HashMap.newBuilder[String, V1]
    foreachEntry((k, v) => b += k -> v)
    b.result().updated(key, value)
  }

  override def removed(key: String): Map[String, String] = {
    val b = HashMap.newBuilder[String, String]
    foreachEntry((k, v) => if (k != key) b += k -> v)
    b.result()
  }
}
