package graft.engine

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.DataFrame

/** Bounded query-scratch caching. persist() pins blocks in the
  * CacheManager until an explicit unpersist — a query that caches an
  * intermediate relation would leak one copy per invocation on a
  * long-lived serving session. CacheOnce keeps AT MOST ONE live cached
  * copy per key: re-running the query releases the previous run's
  * blocks (lazily — in-flight readers of the old copy just lose the
  * cache and recompute from lineage, they don't break).
  */
object CacheOnce {
  private val live = new ConcurrentHashMap[String, DataFrame]()

  def apply(key: String, df: DataFrame): DataFrame = {
    val cached = df.persist()
    Option(live.put(key, cached))
      .filter(_ ne cached)
      // Spark's CacheManager is keyed by PLAN, not by DataFrame handle:
      // when the new run builds an identical plan, persist() above was a
      // no-op on the existing entry, and unpersisting the old handle
      // would drop the cache we just returned. Only release when the
      // plan actually changed.
      .filterNot(old =>
        try old.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed)
        catch { case _: Throwable => false })
      .foreach(_.unpersist(blocking = false))
    cached
  }
}
