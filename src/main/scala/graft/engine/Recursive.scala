package graft.engine

import org.apache.spark.sql.DataFrame

/** Recursive CTE execution — SURVEY.md §2.9 T6. The reference reaches
  * `WITH RECURSIVE` by delegating to DuckDB (/root/reference/main.go:229);
  * Spark has no recursive plan node, so the engine runs the standard
  * semi-naive fixpoint loop on the driver: each round joins only the NEW
  * frontier rows against the step, dedupes against everything seen, and
  * stops when the frontier is empty.
  *
  * Scale notes: each round is a distributed join + anti-join with NO
  * driver-side data movement — the only driver value is the per-round
  * count, which rides the same job that materializes the delta cache.
  * On a cluster with deep recursions, swap the per-round persist for
  * `checkpoint` on a cluster-visible dir to make rounds
  * failure-independent. Iterations are capped: recursion depth on real
  * data is bounded (path queries ~graph diameter), and an unbounded
  * loop is a correctness bug, not a feature.
  */
object Recursive {

  /** UNION-semantics fixpoint (matches `WITH RECURSIVE … UNION`):
    * accumulated = seed ∪ step(frontier) ∪ …, all distinct; rows already
    * accumulated never re-enter the frontier (cycle-safe).
    *
    * `unroll` composes that many step applications LAZILY between
    * materializations — s₁ = step(f), s₂ = step(s₁), … — then ONE
    * `(s₁ ∪ … ∪ sᵤ) EXCEPT acc` + ONE materialization job covers u
    * logical iterations. Per-round fixed cost (job submit, AQE stage
    * scheduling) dominates deep fixpoints on all but huge frontiers, so
    * this cuts wall time ≈u×. The next frontier is the
    * whole materialized delta: new rows surfaced by early sub-steps are
    * re-expanded next round and EXCEPT discards the re-derivations —
    * correct, mildly redundant. Pick unroll > 1 when frontiers are small
    * relative to per-job overhead (path/graph closures); use unroll = 1
    * when a single expansion is already a large distributed job.
    *
    * CONTRACT: with unroll > 1 the frontier passed to `step` keeps plan
    * lineage, so `step` must resolve columns BY NAME (col("x"), Seq-key
    * joins) — parent-bound refs like capturedDf("x") become ambiguous
    * self-joins once capturedDf also appears inside the frontier plan.
    */
  def fixpoint(seed: DataFrame, maxIter: Int = 100, unroll: Int = 4)(
      step: DataFrame => DataFrame): DataFrame = {
    // Tiny deltas — the common fixpoint case — coalesce to one
    // partition before the checkpoint, so a round materializes as a
    // single one-task job and the emptiness take(1) touches one
    // partition; the gate is the optimizer's size estimate, accurate
    // here because the plan's leaves are already-materialized
    // checkpoints. localCheckpoint (not persist): persist would
    // register every round's delta in the context-shared CacheManager,
    // whose plan-canonicalization lookups grow with entries and plan
    // depth — measured 3.7→13s on the FINAL round across repeated runs
    // — while the checkpoint cuts lineage to a LogicalRDD with no
    // registry at all.
    def materialize(df: DataFrame): (DataFrame, Boolean) = {
      val sizeEst = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val shaped = if (sizeEst < (64L << 20)) df.coalesce(1) else df
      val cp = shaped.localCheckpoint()
      (cp, cp.isEmpty)
    }
    val (first, e0) = materialize(seed.distinct())
    var acc = first
    var frontier = first
    var iters = 0
    var converged = e0
    while (!converged && iters < maxIter) {
      val u = math.max(1, math.min(unroll, maxIter - iters))
      // u lazy step compositions; plan depth grows linearly in u
      val chain = Iterator.iterate(step(frontier))(step).take(u).toSeq
      val (delta, empty) = materialize(
        chain.reduce(_ union _).except(acc)) // EXCEPT is distinct by definition
      iters += u
      if (empty) converged = true
      else {
        acc = acc.union(delta)
        frontier = delta
      }
    }
    if (!converged) {
      // a silently truncated fixpoint is a wrong answer, not a result
      throw new IllegalStateException(
        s"Recursive.fixpoint did not converge within $maxIter iterations " +
          s"(frontier still non-empty); raise maxIter or bound the recursion")
    }
    acc
  }
}
