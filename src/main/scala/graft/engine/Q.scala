package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: a Spark implementation plus (usually) an
  * equivalent DuckDB oracle SQL for the driver's differential gate
  * (SURVEY.md §5.2). `oracle = None` → driver records a weaker rows-only
  * check (for ops whose exact results aren't SQL-expressible in DuckDB,
  * e.g. approx sketches, sampling).
  *
  * Determinism contract for every oracle-checked query (SURVEY.md §7.4):
  *  - fully ORDER BY-ed with explicit null ordering on both sides;
  *  - double sums routed through DECIMAL so both engines compute the
  *    identical exact value (then cast back to double);
  *  - column names aliased identically on both sides;
  *  - no first/any_value/random without a deterministic rewrite.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Build a query that just registers the fixture views then runs `body`. */
  def apply(name: String, oracle: String)(
      body: SparkSession => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => {
      Tables.register(s, dir); body(s)
    }, Some(oracle))

  def noOracle(name: String)(body: SparkSession => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => {
      Tables.register(s, dir); body(s)
    }, None)
}
