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
