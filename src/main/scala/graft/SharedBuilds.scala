package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Session-scoped registry of shared materializations.
  *
  * Several operator families reuse expensive intermediates — the
  * distinct-shingle arrays (dedup + decontamination), the (doc, term,
  * tf) aggregate (tf-idf / BM25 / diversity), the verified minhash
  * representative pairs (every minhash consumer) — each memoized per
  * (session, sf-dir) so one cached build serves every consumer, the
  * role a materialized staging table plays in a production pipeline.
  *
  * Before round 5 those memos were three private ConcurrentHashMaps in
  * two files, plus per-invocation `.cache()` calls that were never
  * unpersisted — exactly where a stale-cache bug would eventually live.
  * This object is the single home for all of them:
  *
  *  - [[getOrBuild]] memoizes a build per (kind, session, dir) and
  *    records every DataFrame the build cached (via [[CacheScope]]).
  *  - [[invalidate]] drops a dir's builds and unpersists their cached
  *    frames — the hook to call when the data under a dir changes.
  *  - Entries keyed by stopped sessions are purged on each access, so
  *    a long-lived JVM cycling sessions (test suites, notebooks) never
  *    accumulates unreachable cached plans.
  *
  * Keys include the session so concurrent sessions never cross-share,
  * and the dir so two corpora never cross-read (SharedBuildsSpec pins
  * both properties).
  */
object SharedBuilds {

  /** Passed to each build function; every frame the build caches must
    * go through [[CacheScope.cached]] so [[invalidate]] can unpersist
    * it later.
    */
  final class CacheScope private[SharedBuilds] () {
    private[SharedBuilds] val frames = ArrayBuffer[DataFrame]()
    def cached(df: DataFrame): DataFrame = { val c = df.cache(); frames += c; c }
  }

  /** A scope whose frames are NOT memoized or lifecycle-managed —
    * for spec-only builds that must bypass the (session, dir) memo
    * (e.g. a forced banding tier over a dir whose production index is
    * also live). Caller owns the frames; tiny test fixtures only.
    */
  def unmanagedScope: CacheScope = new CacheScope

  private final case class Key(kind: String, session: SparkSession, dir: String)
  private final case class Entry(value: AnyRef, frames: Seq[DataFrame])

  private val memo = new java.util.concurrent.ConcurrentHashMap[Key, Entry]()

  /** Maximum distinct dirs with live builds. Entries used to live until
    * session stop or an explicit [[invalidate]] — a long-lived session
    * sweeping many dirs (stress sweeps do exactly this) accumulated
    * cached frames without bound. Every access touches its dir; when a
    * new dir pushes the live-dir count over this cap, the least-
    * recently-used dir's builds are invalidated and its frames
    * unpersisted. 4 covers every real working set (the three fixture
    * scale factors plus one stress dir) while bounding storage at
    * O(MaxDirs x builds-per-dir).
    */
  val MaxDirs = 4

  // access-ordered: iteration starts at the least-recently-used dir
  private val dirLru = new java.util.LinkedHashMap[String, AnyRef](16, 0.75f, true)

  private def touchDir(dir: String): Unit = {
    val evicted = dirLru.synchronized {
      dirLru.put(dir, java.lang.Boolean.TRUE)
      if (dirLru.size > MaxDirs) {
        val it = dirLru.keySet.iterator
        val eldest = it.next()
        it.remove()
        Some(eldest)
      } else None
    }
    // unpersist outside the lock: eviction touches Spark state
    evicted.foreach(d => remove(_.dir == d))
  }

  /** The memoized value for (kind, session, dir), building it on first
    * access; the value may be a DataFrame or any tuple of frames —
    * callers cast back via the type parameter.
    *
    * The build runs OUTSIDE the map's bin lock — builds here NEST
    * (minhashReps' build reads sharedShingles, semDedup's reads the
    * IVF index), and `computeIfAbsent` re-entered on the same map
    * throws IllegalStateException("Recursive update") whenever the
    * two keys collide into one bin. That made two dedup queries fail
    * intermittently (identity-hash-dependent, so only on some JVMs) —
    * the round-5 flake. The cost of the fix: two threads racing the
    * same cold key may both run the build; putIfAbsent keeps the
    * winner and the loser's entry is dropped (its frames ARE the
    * winner's — CacheManager dedups same-plan caches). Sequential
    * driver/test usage never races, so in practice the build still
    * runs once. A build that re-enters its OWN key would recurse
    * forever — don't.
    */
  def getOrBuild[T <: AnyRef](kind: String, spark: SparkSession, dir: String)(
      build: CacheScope => T): T = {
    purgeStopped()
    touchDir(dir)
    val key = Key(kind, spark, dir)
    val existing = memo.get(key)
    if (existing != null) return existing.value.asInstanceOf[T]
    val scope = new CacheScope
    val t0 = System.nanoTime()
    val entry =
      try Entry(build(scope), scope.frames.toSeq)
      catch { case e: Throwable =>
        // a build that throws after some scope.cached() calls must not
        // strand persisted frames with no invalidate() handle
        scope.frames.foreach(_.unpersist())
        throw e
      }
    // one stderr line per actual build: cold-cost attribution (which
    // query paid for which shared materialization) is invisible in
    // per-query wall times alone
    System.err.println(
      f"[shared-build] $kind%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs dir=$dir")
    val prev = memo.putIfAbsent(key, entry)
    if (prev != null) {
      // Lost a cold-key race. When both builds are plan-deterministic
      // (the contract here), their plans are sameResult and Spark's
      // CacheManager deduplicated them into ONE cache entry —
      // unpersisting "ours" would uncache the winner's frames too,
      // silently degrading every consumer to recompute. GUARD the
      // contract rather than trusting it: a loser frame whose plan
      // matches NO winner frame is a nondeterministic stray that would
      // otherwise stay persisted with no invalidate() handle —
      // unpersist exactly those.
      scope.frames.foreach { f =>
        val shared = prev.frames.exists(
          _.queryExecution.analyzed.sameResult(f.queryExecution.analyzed))
        if (!shared) f.unpersist()
      }
      prev.value.asInstanceOf[T]
    } else entry.value.asInstanceOf[T]
  }

  /** Drop every build keyed by `dir` (all kinds, all sessions) and
    * unpersist its cached frames. Call when the data under `dir`
    * changes; the next access rebuilds from the new data.
    */
  def invalidate(dir: String): Unit = {
    dirLru.synchronized { dirLru.remove(dir) }
    remove(_.dir == dir)
  }

  /** Drop and unpersist everything (test teardown). */
  def invalidateAll(): Unit = {
    dirLru.synchronized { dirLru.clear() }
    remove(_ => true)
  }

  private def remove(p: Key => Boolean): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (p(e.getKey)) {
        if (!e.getKey.session.sparkContext.isStopped)
          e.getValue.frames.foreach(_.unpersist())
        it.remove()
      }
    }
  }

  private def purgeStopped(): Unit =
    memo.keySet.removeIf(k => k.session.sparkContext.isStopped)
}
