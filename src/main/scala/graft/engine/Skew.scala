package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY §7: "salting for skew").
  *
  * A hash-partitioned join sends every row of a hot key to ONE reducer;
  * at 100 TB a single key holding 1% of a fact table turns into a
  * straggler task holding 1% of the data. Salting splits each hot key's
  * rows across `salt` sub-partitions: the large side tags rows with a
  * uniform salt in [0, salt), the small side is replicated once per salt
  * value, and the join key becomes (key, salt) — same result, `salt`-way
  * parallel hot keys. The cost is deliberate: the SMALL side is
  * duplicated `salt` times (choose the side accordingly — this is the
  * mid-ground between a broadcast join, which replicates to every
  * executor, and a plain shuffle join, which replicates nothing).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * covers sort-merge joins adaptively; explicit salting remains the tool
  * when AQE can't see the skew (aggregations-before-join, hash joins,
  * pre-AQE planners) or when the salt must be deterministic.
  */
object Skew {

  /** Salted inner/left equi-join on a single key column.
    *
    * The salt is derived from `spark_partition_id` + a per-row sequence
    * (deterministic modulo partitioning; result-set equality never
    * depends on salt placement). NULL keys behave exactly like the
    * unsalted equi-join: they never match.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltCol = "__graft_salt"
    val tagged = large.withColumn(
      saltCol, pmod(hash(monotonically_increasing_id()), lit(salt)))
    val replicated = small.withColumn(
      saltCol, explode(array((0 until salt).map(lit): _*)))
    tagged.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
