package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * A deliberate lifetime for the corpus-derived frames the near-duplicate
 * operators persist internally (exact-dup members/reps, LSH candidate
 * pairs, candidate shingle sets).
 *
 * The operators offer three cache policies, picked by the caller:
 *
 *  - one-shot (`eager = true`): materialize the result, release the
 *    intermediates immediately — for a single call whose result is
 *    consumed more than once and then dropped;
 *  - scoped (`scope` passed): the intermediates stay persisted and
 *    register here, so REPEATED calls over the same corpus (the
 *    gate/bench wave pattern, an interactive session re-querying one
 *    corpus, a pipeline that runs pairs THEN clusters) are served from
 *    cache — Spark's CacheManager keys cached data by analyzed plan, so
 *    the plan-equal frames a second call builds hit the first call's
 *    entries — and one `release()` drops everything when the corpus is
 *    done;
 *  - lazy default: nothing is materialized or released; the result can be
 *    STREAMED (it is quadratic in duplication by definition) but the
 *    internal caches survive until the session ends — the documented
 *    trade-off for one-pass stream-through consumers.
 *
 * Tracking the same plan twice is harmless: a re-persist of an
 * already-cached plan reuses the existing entry (Spark logs "already
 * cached"), and the duplicate unpersist at release is a no-op.
 */
final class CacheScope {
  private val frames = scala.collection.mutable.Buffer.empty[DataFrame]

  private[ops] def track(dfs: Seq[DataFrame]): Unit =
    synchronized { frames ++= dfs }

  /** Number of tracked frame references (not distinct cache entries). */
  def size: Int = synchronized(frames.size)

  /** Unpersist every tracked frame and forget them. Idempotent. */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}
