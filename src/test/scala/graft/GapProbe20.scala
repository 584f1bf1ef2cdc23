package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-9 dialect gap probe, batch 20 — statement/date/string tails,
  * swept DIFFERENTIALLY against DuckDB 1.0; graduated fixes pinned in
  * GatewaySpec "probe batch 20": FETCH FIRST/NEXT n ROWS ONLY → LIMIT,
  * dayofweek/weekday Sunday-0 numbering (internal Monday-0 helpers now
  * construct Spark's WeekDay kernel directly, never the dialect name),
  * strlen as BYTE length, 1-arg make_timestamp (epoch micros),
  * current_localtime/current_localtimestamp, timezone_hour/minute.
  *
  * Documented residuals (deliberate):
  *  - POSITIONAL JOIN client SQL: DuckDB's operator depends on INPUT
  *    ROW ORDER, which Spark's optimizer does not preserve through
  *    subqueries (an inner ORDER BY under a projection is legally
  *    eliminated) — a text rewrite would be silently order-unstable at
  *    any parallelism. The engine serves the semantics through the
  *    DataFrame zip form with an EXPLICIT order key (j10, JoinQueries),
  *    which is the only shape that survives a cluster anyway.
  *  - substring_grapheme: JDK BreakIterator predates extended grapheme
  *    clusters (ZWJ emoji split differently than utf8proc) — a partial
  *    shim would silently diverge exactly where the function matters.
  *  - to_years/to_months render as year-month intervals (DuckDB's
  *    python client approximates them as 360-day timedeltas; the SQL
  *    VARCHAR casts agree).
  */
class GapProbe20 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "fetch_first" -> "SELECT r_name FROM region ORDER BY r_regionkey FETCH FIRST 2 ROWS ONLY",
    "day_numbering" -> "SELECT dayofweek(DATE '2024-03-05') AS d, weekday(DATE '2024-03-03') AS w, isodow(DATE '2024-03-03') AS i",
    "strlen_bytes" -> "SELECT strlen('abc') AS a, length('abc') AS b",
    "mk_ts_micros" -> "SELECT make_timestamp(1700000000000000) AS v",
    "localtime" -> "SELECT current_localtime() IS NOT NULL AS v",
    "tz_components" -> "SELECT timezone_hour(TIMESTAMP '2024-01-01 00:00:00') AS h, timezone_minute(TIMESTAMP '2024-01-01 00:00:00') AS m",
    "offset_only" -> "SELECT r_name FROM region ORDER BY r_regionkey OFFSET 3",
    "interval_cmp" -> "SELECT INTERVAL 1 DAY > INTERVAL 23 HOUR AS v",
    "to_intervals" -> "SELECT CAST(to_days(30) AS VARCHAR) AS d, CAST(to_hours(5) AS VARCHAR) AS h",
    "distinct_on" -> "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name DESC",
    "case_form" -> "SELECT CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END AS v",
    "mod_signs" -> "SELECT mod(-7, 3) AS a, (-7) % 3 AS b",
    "round_half" -> "SELECT round(2.5) AS a, round(-2.5) AS b, round(2.345, -1) AS c")

  test("probe batch 20 (exploratory — records gaps, never fails)") {
    probes.foreach { case (name, sql) =>
      try {
        val r = gw.sql(sql).collect()
        info(s"OK   $name: ${r.take(2).mkString(" | ").take(120)}")
      } catch {
        case e: Throwable =>
          info(s"GAP  $name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(140)}")
      }
    }
  }
}
