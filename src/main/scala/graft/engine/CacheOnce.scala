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
      .foreach(_.unpersist(blocking = false))
    cached
  }
}
