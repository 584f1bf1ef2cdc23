package graft.engine

import org.apache.spark.sql.DataFrame

/** Recursive CTE execution — SURVEY.md §2.9 T6. The reference reaches
  * `WITH RECURSIVE` by delegating to DuckDB (/root/reference/main.go:229);
  * Spark has no recursive plan node, so the engine runs the standard
  * semi-naive fixpoint loop on the driver: each iteration joins only the
  * NEW frontier rows against the step, dedupes against everything seen,
  * and stops when the frontier is empty.
  *
  * Scale notes: each iteration is a distributed join + anti-join (no
  * driver-side data movement — only the emptiness check collects, and it
  * collects a count). `localCheckpoint` cuts the lineage every iteration
  * so the plan doesn't grow exponentially with depth; at 100 TB the same
  * loop runs with `checkpoint` on a cluster-visible dir. Iterations are
  * capped: recursion depth on real data is bounded (path queries ~graph
  * diameter), and an unbounded loop is a correctness bug, not a feature.
  */
object Recursive {

  /** UNION-semantics fixpoint (matches `WITH RECURSIVE … UNION`):
    * accumulated = seed ∪ step(frontier) ∪ …, all distinct; rows already
    * accumulated never re-enter the frontier (cycle-safe).
    */
  def fixpoint(seed: DataFrame, maxIter: Int = 100)(
      step: DataFrame => DataFrame): DataFrame = {
    val first = seed.distinct().localCheckpoint()
    // acc stays a lazy union of ALREADY-checkpointed frontiers: each leaf
    // is a materialized LogicalRDD, so the plan neither recomputes nor
    // deepens pathologically, and we skip a full re-materialization of
    // acc per iteration (one distributed job per loop, not three)
    var acc = first
    var frontier = first
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      val next = step(frontier)
        .except(acc) // EXCEPT is distinct by definition
        .localCheckpoint()
      acc = acc.union(next)
      frontier = next
      i += 1
    }
    if (i == maxIter && !frontier.isEmpty) {
      // a silently truncated fixpoint is a wrong answer, not a result
      throw new IllegalStateException(
        s"Recursive.fixpoint did not converge within $maxIter iterations " +
          s"(frontier still non-empty); raise maxIter or bound the recursion")
    }
    acc
  }
}
