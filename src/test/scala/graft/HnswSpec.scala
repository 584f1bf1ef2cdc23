package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 graph-index label-kNN path (SimilarityOps.labelKnnHnsw /
  * llm.Hnsw): fixture-scale oracle equality BY VALUE against the exact
  * spelling, forced-graph differentials (the declared query's small
  * cells take the exact arm, so the graph arm needs its own pin), and
  * kernel-level determinism.
  */
class HnswSpec extends AnyFunSuite {
  import TestSpark._

  private def edges(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3), r.getInt(4))).toSeq

  test("declared query equals the exact kNN graph at fixture scale (oracle posture)") {
    val exact = edges(SparkEntry.queries("nn_label_knn")(spark, sf))
    val hnsw = edges(SparkEntry.queries("nn_label_knn_hnsw")(spark, sf))
    assert(hnsw == exact)
  }

  test("forced graph path: near-exact on fixture cells, sims oracle-rounded") {
    graft.engine.Tables.register(spark, sf)
    val exact = edges(SparkEntry.queries("nn_label_knn")(spark, sf))
    val g = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark, exactBelow = 0))
    // with ef far above the ~50-vector cells the beam covers the whole
    // connected component; tiny residual misses are tolerated, silent
    // drift is not
    val exactSet = exact.map(e => (e._1, e._3)).toSet
    val gSet = g.map(e => (e._1, e._3)).toSet
    val recall = gSet.intersect(exactSet).size.toDouble / exactSet.size
    assert(recall >= 0.98, s"graph-path recall@3 $recall")
    // sims on agreeing edges must be IDENTICAL (same double arithmetic,
    // same rounding) — approximate recall never excuses approximate sims
    val exactSim = exact.map(e => (e._1, e._3) -> e._4).toMap
    g.foreach { e =>
      exactSim.get((e._1, e._3)).foreach(s => assert(s == e._4, e))
    }
  }

  test("graph build + query is deterministic across runs and partitionings") {
    graft.engine.Tables.register(spark, sf)
    val a = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark, exactBelow = 0))
    val b = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark, exactBelow = 0))
    assert(a == b)
  }

  test("kernel: graph arm equals exact arm when ef covers the cell") {
    val rnd = new scala.util.Random(13)
    val n = 300
    val ids = Array.tabulate(n)(i => (i * 7 + 3).toLong)
    val vecs = Array.fill(n)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val exact = graft.llm.Hnsw.cellTopK(ids, vecs, 3, Int.MaxValue, 16, 128, 96).toSeq
    val graph = graft.llm.Hnsw.cellTopK(ids, vecs, 3, 0, 16, 128, n + 8).toSeq
    assert(graph == exact)
  }

  test("sharded composition, full coverage: EQUALS the single-graph path") {
    graft.engine.Tables.register(spark, sf)
    // nShards=2 with shardProbes=2 ⇒ every vector is emitted to BOTH
    // shards ⇒ each (label, shard) cell is the whole label cell ⇒ the
    // merge must reproduce the unsharded output EXACTLY (bit-identical
    // sims, same rn) — this pins the emission/dedup/merge plumbing
    // with zero approximation in play
    val un = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark))
    val sh = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark,
      cellShardThreshold = 30, shardProbes = 2, nShardsOverride = 2))
    assert(sh == un)
  }

  test("sharded composition, partial coverage: recall bounded, sims exact on agreement") {
    graft.engine.Tables.register(spark, sf)
    val un = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark))
    // auto-sized shards (threshold 40 < every fixture cell ⇒ all labels
    // shard; ceil(63·2·1.25/40) = 4 shards, 2 probes): candidates are
    // confined to co-probed shards, so this arm is APPROXIMATE — the
    // differential bounds catastrophe and pins sim arithmetic; the
    // scale recall contract is measured in SCALE.md tier 3
    val sh = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark,
      cellShardThreshold = 40, shardProbes = 2))
    val unSet = un.map(e => (e._1, e._3)).toSet
    val shSet = sh.map(e => (e._1, e._3)).toSet
    val recall = shSet.intersect(unSet).size.toDouble / unSet.size
    assert(recall >= 0.5, s"sharded recall@3 $recall")
    val unSim = un.map(e => (e._1, e._3) -> e._4).toMap
    sh.foreach { e =>
      unSim.get((e._1, e._3)).foreach(s => assert(s == e._4, e))
    }
    // every vector still answers (each is a member of its own shards)
    assert(sh.map(_._1).toSet == un.map(_._1).toSet)
  }

  test("sharded composition is deterministic, incl. forced-graph shards") {
    graft.engine.Tables.register(spark, sf)
    val a = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark,
      exactBelow = 0, cellShardThreshold = 40, shardProbes = 2))
    val b = edges(graft.llm.SimilarityOps.labelKnnHnsw(spark,
      exactBelow = 0, cellShardThreshold = 40, shardProbes = 2))
    assert(a == b)
  }

  test("zero-norm vectors fail loudly (NaN would silently break the total order)") {
    val v = Array(1.0f, 2.0f, 3.0f)
    val z = Array(0.0f, 0.0f, 0.0f)
    // graph arm (build) and exact arm both enforce the precondition —
    // cosine of the zero vector is NaN, NaN compares false under every
    // predicate, and the deterministic (sim DESC, idx ASC) order (and
    // oracle agreement: DuckDB/Spark sort NaN greatest under DESC)
    // would break structurally rather than visibly
    val e1 = intercept[IllegalArgumentException] {
      graft.llm.Hnsw.build(Array(v, z))
    }
    assert(e1.getMessage.contains("zero-norm"))
    val e2 = intercept[IllegalArgumentException] {
      graft.llm.Hnsw.cellTopK(Array(1L, 2L), Array(v, z), 3, Int.MaxValue,
        16, 128, 96).toSeq
    }
    assert(e2.getMessage.contains("zero-norm"))
  }

  test("shardProbesFor: probe budget follows the measured co-occurrence decay") {
    import graft.llm.SimilarityOps.{shardProbesFor, ShardMissBase, ShardMissDecay}
    // calibration sanity: the model reproduces the two tier-3 anchors
    // (p=2 loses ~19% of unsharded recall, p=3 ~4% — SCALE.md §r14)
    assert(math.abs(ShardMissBase * math.pow(ShardMissDecay, 2) - 0.189) < 0.01)
    assert(math.abs(ShardMissBase * math.pow(ShardMissDecay, 3) - 0.042) < 0.01)
    // default 0.95 target lands past the p=2→3 cliff
    assert(shardProbesFor() == 3)
    // looser / tighter targets move the budget monotonically
    assert(shardProbesFor(0.80) == 2)
    assert(shardProbesFor(0.99) == 4)
    assert(shardProbesFor(0.50) <= shardProbesFor(0.95))
  }

  test("kernel: duplicate vectors and tiny cells") {
    val v = Array(1.0f, 2.0f, 3.0f)
    // three identical vectors: ties broken by id ASC everywhere
    val ids = Array(10L, 20L, 30L)
    val out = graft.llm.Hnsw.cellTopK(ids, Array(v, v, v), 3, Int.MaxValue,
      16, 128, 96).toSeq
    assert(out == Seq(
      (10L, 20L, 1.0, 1), (10L, 30L, 1.0, 2),
      (20L, 10L, 1.0, 1), (20L, 30L, 1.0, 2),
      (30L, 10L, 1.0, 1), (30L, 20L, 1.0, 2)))
    // single-vector cell: no edges
    assert(graft.llm.Hnsw.cellTopK(Array(1L), Array(v), 3, 0, 16, 128, 96).isEmpty)
  }
}
