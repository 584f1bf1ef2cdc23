package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-8 dialect gap probe, batch 9 — ordered-set aggregates (WITHIN
  * GROUP), percentage LIMIT, interval constructors, the math/string
  * tail, struct/row ops, and operator sugar batches 2-8 never touched.
  * Exploratory contract as always: OK/GAP per candidate, never fails.
  *
  * All batch-9 candidates are OK as of round 8: the gaps it found
  * became the Gateway percentage-LIMIT handler (two-pass count+limit,
  * like DuckDB's own), the rewriteIntervalExpr / rewriteAtAbs dialect
  * passes, and round_even/trunc-1-arg/row Functions shims; values
  * pinned against DuckDB 1.0 in GatewaySpec. WITHIN GROUP ordered-set
  * aggregates, struct comparison/dot-paren access, hyperbolic
  * inverses, damerau/editdist3 etc. resolved natively or through
  * existing shims.
  */
class GapProbe9 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    // ordered-set aggregates
    "within_group_cont" -> "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) IS NOT NULL AS ok FROM orders",
    "within_group_disc" -> "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) IS NOT NULL AS ok FROM orders",
    "mode_within" -> "SELECT mode() WITHIN GROUP (ORDER BY o_orderstatus) AS m FROM orders",
    // LIMIT sugar
    "limit_percent" -> "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 20%",
    "limit_expr" -> "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 2+3",
    // interval constructors
    "to_days_fn" -> "SELECT DATE '2024-01-01' + to_days(3) AS d",
    "to_hours_fn" -> "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_hours(5) AS t",
    "to_years_months" -> "SELECT DATE '2024-01-01' + to_years(1) AS y, DATE '2024-01-01' + to_months(2) AS m",
    "interval_literal_n" -> "SELECT INTERVAL (n_nationkey) DAY IS NOT NULL AS ok FROM nation LIMIT 1",
    "make_time_fn" -> "SELECT make_time(12, 30, 15.5) IS NOT NULL AS ok",
    // math tail
    "abs_at_op" -> "SELECT @(-7) AS a",
    "isfinite_nan" -> "SELECT isfinite(1.0) AS f, isnan('nan'::DOUBLE) AS n, isinf('inf'::DOUBLE) AS i",
    "hyperbolic_inv" -> "SELECT round(asinh(1), 6) AS a, round(acosh(2), 6) AS b, round(atanh(0.5), 6) AS c",
    "nextafter_fn" -> "SELECT nextafter(1.0, 2.0) > 1.0 AS ok",
    // 2-arg like DuckDB's own round_even macro
    "round_even_fn" -> "SELECT round_even(2.5, 0) AS a, round_even(3.5, 0) AS b",
    "trunc_fn" -> "SELECT trunc(2.7) AS a, trunc(-2.7) AS b",
    "bit_length_fn" -> "SELECT bit_length('ab') AS b, octet_length('ab') AS o",
    // string tail
    "damerau_fn" -> "SELECT damerau_levenshtein('ca', 'abc') AS d",
    "editdist3_fn" -> "SELECT editdist3('kitten', 'sitting') AS d",
    "regexp_extract_all" -> "SELECT regexp_extract_all('a1b2', '[0-9]') AS l",
    "string_to_array_fn" -> "SELECT string_to_array('a,b,c', ',') AS l",
    "str_concat_null" -> "SELECT 'a' || NULL IS NULL AS ok",
    "char_fn" -> "SELECT concat('a', chr(10), 'b') LIKE 'a%b' AS ok",
    // struct/row ops
    "row_constructor" -> "SELECT ROW(1, 'x') IS NOT NULL AS ok",
    "struct_compare" -> "SELECT {'a': 1} = {'a': 1} AS eq, [1,2] < [1,3] AS lt",
    "struct_dot_paren" -> "SELECT ({'a': 7}).a AS v",
    "struct_update" -> "SELECT struct_insert({'a': 1}, b := 2) AS s",
    // misc operators / predicates
    "in_list_fn" -> "SELECT 2 IN (1, 2, 3) AS a, 5 NOT IN (1, 2) AS b",
    "between_not" -> "SELECT 5 NOT BETWEEN 1 AND 3 AS ok",
    "is_true_false" -> "SELECT (1 = 1) IS TRUE AS t, (1 = 2) IS NOT FALSE AS f",
    "nullif_ifnull" -> "SELECT nullif(1, 1) IS NULL AS a, ifnull(NULL, 7) AS b, coalesce(NULL, NULL, 3) AS c",
    "distinct_count_star" -> "SELECT count(DISTINCT (o_orderstatus, o_orderpriority)) AS c FROM orders",
    "grouping_fn" -> "SELECT o_orderstatus, GROUPING(o_orderstatus) AS g FROM orders GROUP BY ROLLUP (o_orderstatus) ORDER BY 1 NULLS LAST, 2 LIMIT 3",
    "having_without_group" -> "SELECT count(*) AS c FROM orders HAVING count(*) > 0",
    "select_no_from_math" -> "SELECT 1 + 2 AS x, 'a' AS y")

  test("probe batch 9 (exploratory — records gaps, never fails)") {
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
