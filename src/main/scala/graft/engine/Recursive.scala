package graft.engine

import org.apache.spark.sql.DataFrame

/** Recursive CTE execution — SURVEY.md §2.9 T6. The reference reaches
  * `WITH RECURSIVE` by delegating to DuckDB (/root/reference/main.go:229);
  * Spark has no recursive plan node, so the engine runs the standard
  * semi-naive fixpoint loop on the driver: each round joins only the NEW
  * frontier rows against the step, dedupes against everything seen, and
  * stops when the frontier is empty.
  *
  * Scale notes: each round is a distributed join + anti-join (no
  * driver-side data movement — only the emptiness check collects, and it
  * collects a take(1)). `localCheckpoint` cuts the lineage every round so
  * the plan doesn't grow exponentially with depth; at 100 TB the same
  * loop runs with `checkpoint` on a cluster-visible dir. Iterations are
  * capped: recursion depth on real data is bounded (path queries ~graph
  * diameter), and an unbounded loop is a correctness bug, not a feature.
  */
object Recursive {

  /** UNION-semantics fixpoint (matches `WITH RECURSIVE … UNION`):
    * accumulated = seed ∪ step(frontier) ∪ …, all distinct; rows already
    * accumulated never re-enter the frontier (cycle-safe).
    *
    * `unroll` composes that many step applications LAZILY between
    * materializations — s₁ = step(f), s₂ = step(s₁), … — then ONE
    * `(s₁ ∪ … ∪ sᵤ) EXCEPT acc` + ONE checkpoint job covers u logical
    * iterations. Per-round fixed cost (job submit, AQE stage scheduling,
    * checkpoint blocks) dominates deep fixpoints on all but huge
    * frontiers, so this cuts wall time ≈u×. The next frontier is the
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
    val first = seed.distinct().localCheckpoint()
    var acc = first
    var frontier = first
    var iters = 0
    var converged = frontier.isEmpty
    while (!converged && iters < maxIter) {
      val u = math.max(1, math.min(unroll, maxIter - iters))
      // u lazy step compositions; plan depth grows linearly in u
      val chain = Iterator.iterate(step(frontier))(step).take(u).toSeq
      val delta = chain.reduce(_ union _)
        .except(acc) // EXCEPT is distinct by definition
        .localCheckpoint()
      iters += u
      if (delta.isEmpty) converged = true
      else {
        acc = acc.union(delta)
        frontier = delta
      }
    }
    if (!converged && !frontier.isEmpty) {
      // a silently truncated fixpoint is a wrong answer, not a result
      throw new IllegalStateException(
        s"Recursive.fixpoint did not converge within $maxIter iterations " +
          s"(frontier still non-empty); raise maxIter or bound the recursion")
    }
    acc
  }
}
