package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.CacheOnce

/** Lifetime semantics of the bounded scratch cache — the round-6 bench
  * fix depends on exactly these: CacheOnce entries are SESSION-lifetime
  * (plan-keyed sharing across statements), while deferRelease'd
  * checkpoint RDDs die with the enclosing scope.
  */
class CacheOnceSpec extends AnyFunSuite {
  import TestSpark._

  private def storageLevelOf(df: org.apache.spark.sql.DataFrame) =
    spark.sharedState.cacheManager.lookupCachedData(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])

  test("entries persist across scopes (session lifetime, one copy per key)") {
    val df = spark.range(100).toDF("n").selectExpr("n * 7 AS m")
    CacheOnce.scoped {
      CacheOnce("spec/sess", df).count()
    }
    // still cached after the scope closed
    assert(storageLevelOf(df).isDefined, "scope must NOT release CacheOnce entries")
    // re-keying the same plan keeps ONE CacheManager entry alive
    val again = spark.range(100).toDF("n").selectExpr("n * 7 AS m")
    CacheOnce("spec/sess", again).count()
    assert(storageLevelOf(df).isDefined)
    // a CHANGED plan under the same key releases the old copy
    val changed = spark.range(100).toDF("n").selectExpr("n * 11 AS m")
    CacheOnce("spec/sess", changed).count()
    assert(storageLevelOf(changed).isDefined)
    changed.unpersist(blocking = true)
  }

  test("touchLive: liveness probe bumps the LRU tick; false after release (hnsw memo contract)") {
    val df = spark.range(64).toDF("n").selectExpr("n * 13 AS m")
    CacheOnce("spec/touch", df).count()
    // live: true, and the probe counts as a USE (the hnsw edge memo
    // consults liveness instead of re-putting — a served key must not
    // age out under its readers)
    assert(CacheOnce.touchLive("spec/touch"))
    CacheOnce.release("spec/touch")
    // released: the memoized-plan caller must re-register, not trust
    // the stale handle (the r16 ADVICE eviction hole)
    assert(!CacheOnce.touchLive("spec/touch"))
    assert(!CacheOnce.touchLive("spec/never-registered"))
  }

  test("deferRelease'd RDDs are unpersisted when the scope closes") {
    var rdd: org.apache.spark.rdd.RDD[_] = null
    CacheOnce.scoped {
      val cp = spark.range(50).toDF("n").localCheckpoint()
      rdd = org.apache.spark.sql.GraftPlans.checkpointRdd(cp).get
      assert(rdd.getStorageLevel.useMemory, "localCheckpoint must be persisted")
      CacheOnce.deferRelease(rdd)
      // still alive INSIDE the scope (the query may still read it)
      assert(rdd.getStorageLevel.useMemory)
    }
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "scope close must release deferred checkpoint blocks")
  }

  test("deferRelease outside any scope is a no-op (serving/spec callers)") {
    val cp = spark.range(10).toDF("n").localCheckpoint()
    val rdd = org.apache.spark.sql.GraftPlans.checkpointRdd(cp).get
    CacheOnce.deferRelease(rdd) // no scope active
    assert(rdd.getStorageLevel.useMemory, "no scope → GC-driven lifetime keeps blocks")
    rdd.unpersist(blocking = false)
  }

  test("nested scopes fold into the outermost (release happens once, at the end)") {
    var rdd: org.apache.spark.rdd.RDD[_] = null
    CacheOnce.scoped {
      CacheOnce.scoped {
        val cp = spark.range(20).toDF("n").localCheckpoint()
        rdd = org.apache.spark.sql.GraftPlans.checkpointRdd(cp).get
        CacheOnce.deferRelease(rdd)
      }
      // inner scope closed but the OUTER scope owns the release
      assert(rdd.getStorageLevel.useMemory, "inner scope must not release")
    }
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("LRU bound holds across many distinct keys (multi-root serving lifetime)") {
    // a month-long serving session registering many dataset roots mints
    // per-root keys (pq:codes:<dir>, …) — the map must stay bounded at
    // MaxEntries with the least-recently-used entry evicted AND its
    // storage released (round-7 VERDICT item 7)
    val before = CacheOnce.liveCount
    val dfs = (0 until CacheOnce.MaxEntries + 40).map { i =>
      val df = spark.range(10).toDF("n").selectExpr(s"n + $i AS m")
      CacheOnce(s"spec/lru/root$i", df).count()
      df
    }
    assert(CacheOnce.liveCount <= CacheOnce.MaxEntries,
      s"live=${CacheOnce.liveCount} exceeds cap ${CacheOnce.MaxEntries}")
    // the earliest roots were evicted and unpersisted; the newest live
    assert(storageLevelOf(dfs.last).isDefined, "newest entry must stay cached")
    assert(storageLevelOf(dfs.head).isEmpty,
      "oldest entry past the cap must be evicted and released")
    // cleanup: drop this test's keys from the shared session's cache
    // AND the CacheOnce map — leaving ~MaxEntries synthetic entries in
    // the map would turn every later insert in the suite into an
    // eviction (the two-dataset test below pins evictions == 0)
    dfs.foreach(_.unpersist(blocking = false))
    CacheOnce.release("spec/lru/")
    assert(before <= CacheOnce.MaxEntries)
  }

  test("two live datasets populate every keyed site with zero thrash and zero eviction") {
    // The bench's shape: a warm dir (sf0.001) and a served fixture stay
    // live in ONE JVM, alternating queries. Before the r16 dsKey sweep,
    // un-prefixed keys (dd_minhash_lsh/sh, pipe_compact/*, …) alternated
    // one slot between two plans — every dataset switch unpersisted the
    // other dataset's relation (r15 VERDICT finding 1). Dataset B is a
    // byte-identical copy of sf0.001 under a different root: same
    // compute, different dsKey prefix, exactly the collision class.
    val dirB = {
      val src = java.nio.file.Paths.get(TestSpark.sf)
      val dst = java.nio.file.Paths.get("target/spec-dsb")
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(src).forEach { p =>
        val t = dst.resolve(p.getFileName)
        if (!java.nio.file.Files.exists(t)) java.nio.file.Files.copy(p, t)
      }
      dst.toAbsolutePath.toString
    }
    // every declared query whose implementation holds CacheOnce slots
    val keyed = Seq(
      "dd_minhash_lsh", "dd_semantic", "dd_components",
      "dd_incremental", "dd_incremental_indexed",
      "tx_decontaminate", "tx_bigram_lm", "tx_dup_coverage",
      "tx_span_dedup", "pipe_compact", "pipe_embed_dedup",
      "pipe_leakage", "pipe_span_clean", "mm_phash_dedup",
      "nn_pq_topk", "nn_ivfpq_topk", "nn_label_knn_hnsw")
    keyed.foreach(q => assert(SparkEntry.queries.contains(q), s"unknown keyed query $q"))
    val thrash0 = CacheOnce.thrashCount.get
    val evict0 = CacheOnce.evictCount.get
    for (dir <- Seq(TestSpark.sf, dirB); q <- keyed)
      SparkEntry.queries(q)(spark, dir).count()
    // alternate back to dataset A: with prefixed keys its entries are
    // still live, so the pass re-uses them — zero replacements
    for (q <- keyed) SparkEntry.queries(q)(spark, TestSpark.sf).count()
    assert(CacheOnce.thrashCount.get == thrash0,
      "a keyed site replaced a live entry with a different plan — un-prefixed per-dataset key; " +
        s"thrashed keys so far: ${CacheOnce.thrashKeys}")
    assert(CacheOnce.evictCount.get == evict0,
      s"LRU evicted under two live datasets (live=${CacheOnce.liveCount}, cap=${CacheOnce.MaxEntries})")
    // headroom: the next keyed-site addition must not silently start
    // thrashing — two full datasets use at most half the bound
    assert(CacheOnce.liveCount <= CacheOnce.MaxEntries / 2,
      s"two-dataset working set ${CacheOnce.liveCount} leaves no headroom under ${CacheOnce.MaxEntries}")
  }
}
