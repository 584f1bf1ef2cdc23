package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers for the DuckDB-oracle hash gate (SURVEY.md §5.2).
  *
  * Double-typed money columns in the fixtures are 2-decimal values
  * (FIXTURES.md); summing them as DOUBLE is order-dependent, so both
  * engines route sums through exact DECIMAL arithmetic and cast the final
  * scalar back to DOUBLE — bit-identical on both sides, with no rounding
  * fudge. This is also the at-scale answer: decimal partial aggregation is
  * exact and associative, so 1000-executor partial/final aggs stay correct.
  */
object Det {
  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact average: exact decimal sum, one IEEE division — identical in
    * both engines (no rounding needed).
    */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)))

  def davgSql(col: String): String =
    s"(CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))"
}
