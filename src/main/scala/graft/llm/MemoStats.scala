package graft.llm

/** Eviction/rebuild diagnostics for the heavy LRU memos (VERDICT r17
  * wrong-#2 — the CacheOnce counter discipline applied to the memos
  * whose entries are 50–94 s slab/graph rebuilds): an EVICTION is an
  * LRU removal past the memo's cap; a REBUILD is a later build of a
  * key that was previously evicted — the silent-thrash event the
  * counters exist to surface. Both stay zero across the bench suite
  * and any within-cap serving mix (LookupIndexSpec pins); a past-cap
  * serving mix turns entries over oldest-first, and every turn is
  * logged WITH THE KEY so an operator sees which (dataset, param)
  * combo is thrashing instead of an unexplained 50 s stall per query
  * (the r16 lesson: a bare counter delta beats silence, a named key
  * beats a bare delta).
  */
final class MemoStats(name: String) {
  val evictions = new java.util.concurrent.atomic.AtomicLong(0L)
  val rebuilds = new java.util.concurrent.atomic.AtomicLong(0L)
  // keys seen evicted and not yet rebuilt — bounded by the distinct
  // evicted-key population (small strings; removed on rebuild)
  private val evicted: java.util.Set[String] =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[MemoStats])

  def onEvict(key: String): Unit = {
    evictions.incrementAndGet()
    evicted.add(key)
    log.warn(s"$name: LRU-evicting memo entry '$key' — " +
      "its next use pays a full rebuild")
  }

  /** Call at the top of every (re)build with the memo key. */
  def onBuild(key: String): Unit =
    if (evicted.remove(key)) {
      rebuilds.incrementAndGet()
      log.warn(s"$name: REBUILDING previously-evicted memo entry '$key' — " +
        "the serving mix exceeds the memo cap; raise it or pin fewer combos")
    }
}

/** Access-ordered LRU memo with instrumented eviction (the slab-memo
  * structure LookupIndex/SimilarityOps share): at most `cap` live
  * entries, inserting past the cap drops the least-recently-USED entry
  * through `onDrop` (unpersist, for the RDD/plan memos) and counts it
  * in [[stats]]; a later build of a dropped key is a counted, logged
  * REBUILD. Extracted to its own class so the LRU mechanics are
  * spec-testable on an isolated instance — the GLOBAL memos are shared
  * by concurrently-running suites and queries, which makes their
  * counters meaningful only as whole-run pins (the bench artifact's
  * `memo_evictions`), not as per-test assertions.
  */
private[graft] final class LruMemo[V](name: String, cap: Int,
    onDrop: V => Unit) {
  val stats = new MemoStats(name)
  private val map: java.util.Map[String, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, V](8, 0.75f, /* accessOrder */ true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, V]): Boolean = {
          val evict = size() > cap
          if (evict) { stats.onEvict(e.getKey); onDrop(e.getValue) }
          evict
        }
      })

  /** Memoized fetch: builds (and counts a rebuild for previously-
    * evicted keys) at most once per key per liveness; computeIfAbsent
    * serializes concurrent first-builds per key.
    */
  def get(key: String)(build: => V): V =
    map.computeIfAbsent(key, { k => stats.onBuild(k); build })

  /** Drop (and onDrop) every entry whose key starts with `prefix`. */
  def release(prefix: String): Unit = map.synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) { it.remove(); onDrop(e.getValue) }
    }
  }

  def releaseAll(): Unit = release("")
}
