package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed band/range joins — SURVEY.md §2.3 J6 [shim, perf-only].
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin:
  * correct, but O(|L|·|R|) work and broadcast-bound — a scaling cliff
  * for large-large range joins (DuckDB has a dedicated IEJoin operator
  * for these; the reference reaches it via /root/reference/main.go:229).
  *
  * The banded form restores shuffle-bound execution: bucket both sides
  * on floor(value/width); a pair within `width` can only land in the
  * same or adjacent buckets, so replicating the right side ×3 turns the
  * predicate into an equi-join Catalyst shuffles on the bucket key. Work
  * drops from |L|·|R| to Σ_b |L_b|·|R_b±1| — proportional to the true
  * candidate count when values are spread, and each pair is produced
  * exactly once (the left row has one bucket; the three replicas of a
  * right row carry distinct bucket keys).
  */
object RangeJoin {

  /** Pairs with |left(lv) − right(rv)| ≤ width, as an equi-join on the
    * band bucket. Additional predicates compose on the result. Both
    * value columns must be non-null numeric; name-collision handling is
    * the caller's (alias before joining).
    */
  def distanceBand(
      left: DataFrame,
      lv: String,
      right: DataFrame,
      rv: String,
      width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val lb = left.withColumn("__band", floor(col(lv) / width).cast(LongType))
    val rb = right
      .withColumn("__rb", floor(col(rv) / width).cast(LongType))
      .withColumn("__band",
        explode(array(col("__rb") - 1, col("__rb"), col("__rb") + 1)))
      .drop("__rb")
    lb.join(rb, "__band")
      .where(abs(col(lv) - col(rv)) <= width)
      .drop("__band")
  }

  /** Interval join: left value within [right lo, right hi], for
    * bounded-length intervals (maxLen = the largest hi−lo). Buckets of
    * size maxLen: a matching interval's lo lands in the value's bucket
    * or the one below, so the right side replicates ×2 per covered
    * bucket step. Degenerates gracefully: point intervals ⇒ ×2.
    */
  def intervalJoin(
      left: DataFrame,
      lv: String,
      right: DataFrame,
      lo: String,
      hi: String,
      maxLen: Double): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    val lb = left.withColumn("__band", floor(col(lv) / maxLen).cast(LongType))
    val rb = right
      .withColumn("__rb", floor(col(lo) / maxLen).cast(LongType))
      .withColumn("__band", explode(array(col("__rb"), col("__rb") + 1)))
      .drop("__rb")
    lb.join(rb, "__band")
      .where(col(lv) >= col(lo) && col(lv) <= col(hi))
      .drop("__band")
  }
}
