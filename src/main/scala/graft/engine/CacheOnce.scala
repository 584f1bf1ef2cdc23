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
  *
  * Entries are deliberately SESSION-lifetime, not query-lifetime: the
  * expensive entries (shingle sets, band tables) are plan-identical
  * across the dedup family, so Spark's plan-keyed CacheManager stores
  * ONE copy that every statement and every re-run shares — a derived
  * index in all but name. Releasing them at query end was measured in
  * round 6 to DOUBLE the bench suite (49.6s vs ~25s): each statement
  * and each pass re-derived the same scratch. The per-key bound keeps
  * the footprint constant either way.
  *
  * What must NOT be session-lifetime is fixpoint checkpoint blocks
  * (localCheckpoint RDDs are per-invocation, never shared, and
  * otherwise wait on GC+ContextCleaner — on a big idle heap that can
  * be minutes, which is exactly the round-5 pass-2 degradation).
  * `scoped`/`deferRelease` give those a query lifetime.
  */
object CacheOnce {
  private val live = new ConcurrentHashMap[String, DataFrame]()

  private final class Scope {
    val rdds = new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]()
  }
  private val scopeTL = new ThreadLocal[Scope]()

  private def samePlan(a: DataFrame, b: DataFrame): Boolean =
    try a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed)
    catch { case _: Throwable => false }

  def apply(key: String, df: DataFrame): DataFrame = {
    val cached = df.persist()
    Option(live.put(key, cached))
      .filter(_ ne cached)
      // Spark's CacheManager is keyed by PLAN, not by DataFrame handle:
      // when the new run builds an identical plan, persist() above was a
      // no-op on the existing entry, and unpersisting the old handle
      // would drop the cache we just returned. Only release when the
      // plan actually changed.
      .filterNot(old => samePlan(old, cached))
      .foreach(_.unpersist(blocking = false))
    cached
  }

  /** Register an independently persisted RDD (a fixpoint's
    * localCheckpoint blocks) for release when the current scope closes.
    * No active scope → no-op: spec/serving callers keep the GC-driven
    * lifetime.
    */
  def deferRelease(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    val scope = scopeTL.get()
    if (scope != null) scope.rdds.add(rdd)
  }

  /** Run `body` (one statement's plan build + execution) with query
    * lifetime for its deferRelease'd checkpoint blocks. Nested scopes
    * fold into the outermost one.
    */
  def scoped[T](body: => T): T = {
    if (scopeTL.get() != null) return body
    val scope = new Scope
    scopeTL.set(scope)
    try body
    finally {
      scopeTL.remove()
      scope.rdds.forEach(_.unpersist(blocking = false))
    }
  }
}
