package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared-relation memoization infrastructure: per-(session, input)
  * persisted DataFrames, the warmup registry Bench iterates, and the
  * purge hook the scale gate uses between phases.
  *
  * STANDALONE — this object's class init references no other graft
  * object, by design (the only cross-object call, Migrate.tempDir,
  * runs at memo-build time, never at init). It used to live inside [[Dedup]], whose class init
  * references [[TextAnalysis]], whose init calls back into the memo
  * infrastructure: under a Dedup-first initialization order the
  * re-entrant call observed a null registry (NPE), and under
  * concurrent first-touch of the two objects the cyclic class-init
  * was a deadlock. A dependency-free host removes both hazards
  * structurally instead of by source-position convention.
  */
object Memo {

  /** Every memo map that has ever flowed through [[cachedPerSession]],
    * so [[purgeAllCaches]] can find them without each owner object
    * registering by hand. IDENTITY-keyed: mutable TrieMaps compare
    * structurally, so a plain Set would consider two empty caches
    * equal, skip the second registration, and leave its persisted
    * relations invisible to the purge (and mutating a hash-set member
    * corrupts the set's invariant besides). Registration happens
    * OUTSIDE any cache monitor — taking the registry lock while
    * holding a cache lock, with the purge nesting them the other way
    * round, was an ABBA deadlock waiting for the first concurrent
    * purge (Check's report sections run memoized queries on a pool).
    */
  private val cacheRegistry: java.util.Set[
      scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(new java.util.IdentityHashMap))

  /** Memoize a persisted DataFrame per (session, input dir). Entries
    * of STOPPED sessions are purged on every access (the strong
    * reference would otherwise pin dead sessions and their plans for
    * the JVM's lifetime), and the compute runs under the map's lock
    * so concurrent first calls cannot double-persist.
    */
  private[functions] def cachedPerSession(
      cache: scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame],
      s: SparkSession, d: String)(build: => DataFrame): DataFrame = {
    cacheRegistry.add(cache)
    cache.synchronized {
      cache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      cache.getOrElseUpdate((s, d),
        build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
  }

  /** Every memoized shared-relation accessor created through
    * [[memoized]], keyed by a stable name. Bench's untimed warmup
    * iterates THIS map instead of a hand-maintained query-name list,
    * so every shared persisted relation is warmed by construction and
    * a newly added memo can never reintroduce the first-consumer
    * drift finding (round-8: the driver's first ann2/d7 samples
    * absorbed one-time builds the name list didn't cover).
    *
    * Registration happens at the OWNING OBJECT's init (the accessor
    * vals are built through [[memoized]]); Bench forces init of
    * every module by touching `SparkEntry.queries` before iterating —
    * any object that registers a memo also registers its queries
    * there, or it wouldn't be on the benched surface at all.
    */
  private[graft] val memoWarmers = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, String) => DataFrame]

  /** Extra cleanup steps [[purgeAllCaches]] runs besides the memo
    * maps themselves — owners with non-DataFrame memo state (e.g.
    * Dedup's stream-feed path cache) register one at class init.
    */
  private[graft] val purgeHooks = scala.collection.concurrent.TrieMap
    .empty[String, () => Unit]

  /** Wrap a shared-relation builder in a per-(session, input) memo
    * (its own cache, registered with [[purgeAllCaches]] via
    * [[cachedPerSession]]) AND in the warmup registry above. All
    * memoized relations flow through here — creating a bare TrieMap
    * cache by hand would opt the relation out of warmup.
    */
  private[graft] def memoized(name: String)(
      build: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = {
    val cache = scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]
    val fn = (s: SparkSession, d: String) =>
      cachedPerSession(cache, s, d)(build(s, d))
    memoWarmers.put(name, fn)
    fn
  }

  /** Memoize a DRIVER value (a feed/blob/root path, a trained merge
    * table) per (session, input dir) — the non-DataFrame sibling of
    * [[memoized]], folding the hand-rolled TrieMap pattern its six
    * owners used to copy (cache + purge hook + stopped-session
    * eviction + monitor-guarded build). Registers a purge hook under
    * `name` that runs `onEvict` on every entry before dropping it
    * (the default keeps any on-disk artifact, matching
    * [[memoizedTable]]'s files-stay policy; pipe15 passes a tree
    * delete because a purged root is never re-entered). Stopped
    * sessions' entries are evicted — through the same `onEvict` — on
    * every access, so dead sessions are neither pinned nor leak their
    * artifacts. Does NOT register a warmer: a value memo has no
    * canonical DataFrame to warm, so owners whose build cost must be
    * kept out of first-consumer figures register one explicitly.
    */
  private[graft] def memoizedValue[T](name: String)(
      build: (SparkSession, String) => T): (SparkSession, String) => T =
    memoizedValue[T](name, onEvict = (_: T) => ())(build)

  private[graft] def memoizedValue[T](name: String,
      onEvict: T => Unit)(
      build: (SparkSession, String) => T)
      : (SparkSession, String) => T = {
    val cache = scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), T]
    def evict(v: T): Unit =
      try onEvict(v) catch { case _: Throwable => () }
    // a duplicate name would silently REPLACE the prior cache's purge
    // hook, orphaning that cache from purgeAllCaches — fail at init
    require(!purgeHooks.contains(name),
      s"memoizedValue: purge-hook name '$name' is already registered")
    purgeHooks.put(name, () => cache.synchronized {
      cache.values.foreach(evict)
      cache.clear()
    })
    (s: SparkSession, d: String) => cache.synchronized {
      cache.filterInPlace { (k, v) =>
        val live = !k._1.sparkContext.isStopped
        if (!live) evict(v)
        live
      }
      cache.getOrElseUpdate((s, d), build(s, d))
    }
  }

  /** Like [[memoized]], but MATERIALIZES the relation through a
    * parquet round-trip before persisting: the returned DataFrame's
    * plan is a plain file scan, so a consumer joining against it sees
    * an equi-joinable table, not the builder's lineage (ann1's
    * broadcast brute-force scan, the IVF centroid cross) — and the
    * plan audit holds the consumer to the no-BNL contract instead of
    * whitelisting inherited noise. This is also the honest 100 TB
    * shape for these relations: the exact-truth baseline and the IVF
    * cell assignment are INDEXES — built once, served from storage —
    * not sub-plans re-derived inside every consumer. The write runs
    * eagerly at first access (a bounded build job, like chunk
    * planning); like the stream feeds, purge drops only the memo —
    * files stay on disk and a rebuild writes a fresh temp dir.
    */
  private[graft] def memoizedTable(name: String)(
      build: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame =
    memoized(name) { (s, d) =>
      val df = build(s, d)
      val path = graft.operators.Migrate.tempDir(
        name.replace('.', '_')) + "/data"
      df.write.mode("overwrite").parquet(path)
      // explicit schema: an EMPTY build (the empty-input sweep) can
      // write zero part-files, and schema inference would fail there
      s.read.schema(df.schema).parquet(path)
    }

  /** Unpersist and drop every memoized relation (all families, all
    * input dirs). Benchmark/test hook: a long-lived JVM that has run
    * many suites carries a storage pool full of unrelated persisted
    * relations; a scale measurement taken in that state times
    * eviction and GC, not the operator. Purging returns the session
    * to a cold, clean-storage state; the next access re-builds and
    * re-persists. Iterates over a SNAPSHOT of the registry and takes
    * each cache's monitor without holding any other lock (see
    * cacheRegistry's doc for the lock-order rationale).
    *
    * ASSUMES QUIESCENCE: cold-clean-storage is guaranteed only when
    * no query is concurrently building (the hook's actual use — a
    * bench/test pausing between phases). A cachedPerSession call
    * racing the purge can register its cache after the snapshot, or
    * re-populate a cache the loop already passed, leaving that
    * relation resident — by design: the alternative (re-running the
    * snapshot loop until every cache is empty) never terminates
    * against a steady query stream, and blocking builds for the
    * purge's duration would trade a measurement hook for a global
    * pause. Under concurrency the purge is best-effort.
    */
  private[graft] def purgeAllCaches(): Unit = {
    purgeHooks.values.foreach(h =>
      try h() catch { case _: Throwable => () })
    val snapshot = cacheRegistry.synchronized {
      new java.util.ArrayList(cacheRegistry)
    }
    snapshot.forEach { cache =>
      cache.synchronized {
        cache.values.foreach(df =>
          try df.unpersist(blocking = true)
          catch { case _: Throwable => () })
        cache.clear()
      }
    }
  }
}
