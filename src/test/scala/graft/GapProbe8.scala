package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-8 dialect gap probe, batch 8 — surfaces not yet probed by
  * batches 2-7: raw-SQL window EXCLUDE frames (the DataFrame-side w6b
  * emulation existed, but a CLIENT sending EXCLUDE got a parse error),
  * the quantile/stat-aggregate tail (product, entropy, mad,
  * approx_quantile, quantile_cont/disc scalar+list, first/last with
  * in-aggregate ORDER BY), the list-HOF tail (filter/reduce/
  * has_any/has_all/position/unique), SUMMARIZE/DESCRIBE-SELECT
  * statements, and assorted scalars. Same exploratory contract as the
  * earlier batches: prints OK/GAP per candidate, never fails; findings
  * graduate into shims + GatewaySpec pins.
  *
  * All batch-8 candidates are OK as of round 8: the window EXCLUDE gaps
  * became the rewriteExcludeFrames subtraction rewrite (GatewaySpec
  * pins DuckDB-matching values incl. NULL discipline), fixed/list
  * array-type casts became rewriteArrayTypeSuffix, and
  * array_concat/array_length/generate_subscripts/length-on-lists became
  * Functions shims over LenAny. Everything else resolved natively.
  */
class GapProbe8 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    // --- window EXCLUDE in raw client SQL ---
    "win_excl_current" -> "SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM (VALUES (1),(2),(3)) t(x)",
    "win_excl_group" -> "SELECT sum(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS s FROM (VALUES (1),(1),(2)) t(x)",
    "win_excl_ties" -> "SELECT sum(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) AS s FROM (VALUES (1),(1),(2)) t(x)",
    "win_excl_none" -> "SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE NO OTHERS) AS s FROM (VALUES (1),(2),(3)) t(x)",
    // --- window function tail ---
    "nth_value" -> "SELECT nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS n FROM orders LIMIT 3",
    "first_ignore_nulls" -> "SELECT first_value(x IGNORE NULLS) OVER (ORDER BY i) AS f FROM (VALUES (1, NULL), (2, 7), (3, 8)) t(i, x)",
    "lead_default" -> "SELECT lead(o_orderkey, 1, -1) OVER (ORDER BY o_orderkey) AS l FROM orders LIMIT 3",
    // --- aggregate tail ---
    "product_agg" -> "SELECT product(x) AS p FROM (VALUES (2.0),(3.0),(4.0)) t(x)",
    "entropy_agg" -> "SELECT ROUND(entropy(x), 6) AS e FROM (VALUES (1),(1),(2),(3)) t(x)",
    "mad_agg" -> "SELECT mad(x) AS m FROM (VALUES (1.0),(2.0),(9.0)) t(x)",
    "approx_quantile" -> "SELECT approx_quantile(o_totalprice, 0.5) IS NOT NULL AS ok FROM orders",
    "quantile_cont" -> "SELECT quantile_cont(x, 0.5) AS q FROM (VALUES (1.0),(2.0),(4.0)) t(x)",
    "quantile_cont_list" -> "SELECT quantile_cont(x, [0.25, 0.75]) AS q FROM (VALUES (1.0),(2.0),(4.0)) t(x)",
    "quantile_disc" -> "SELECT quantile_disc(x, 0.5) AS q FROM (VALUES (1),(2),(4)) t(x)",
    "first_order_by" -> "SELECT first(x ORDER BY y DESC) AS f, last(x ORDER BY y DESC) AS l FROM (VALUES (1, 10),(2, 20),(3, 5)) t(x, y)",
    "arg_min_max" -> "SELECT arg_min(o_orderpriority, o_totalprice) AS a, arg_max(o_orderpriority, o_totalprice) AS b FROM orders",
    "bool_xor_variants" -> "SELECT bit_xor(x) AS x FROM (VALUES (5),(3)) t(x)",
    "favg_agg" -> "SELECT favg(x) AS a FROM (VALUES (1.5),(2.5)) t(x)",
    // --- list HOF tail ---
    "list_filter" -> "SELECT list_filter([1,2,3,4], x -> x % 2 = 0) AS l",
    "list_reduce" -> "SELECT list_reduce([1,2,3,4], (a, b) -> a + b) AS s",
    "list_has_any" -> "SELECT list_has_any([1,2], [2,3]) AS a, list_has_all([1,2,3], [1,3]) AS b",
    "list_position" -> "SELECT list_position([7,8,9], 8) AS p, list_contains([7,8], 7) AS c",
    "list_unique" -> "SELECT list_unique([1,1,2,3,3]) AS u",
    "list_transform_idx" -> "SELECT list_transform([10,20], (x, i) -> x + i) AS l",
    "list_concat_fn" -> "SELECT list_concat([1,2], [3]) AS l, array_concat([1], [2]) AS a",
    "list_reverse" -> "SELECT list_reverse([1,2,3]) AS l",
    "list_intersect_fn" -> "SELECT list_sort(list_intersect([1,2,3], [2,3,4])) AS l",
    // --- statements ---
    "summarize_stmt" -> "SUMMARIZE nation",
    "describe_select" -> "DESCRIBE SELECT n_nationkey, n_name FROM nation",
    // --- scalar tail ---
    "ts_minus_ts" -> "SELECT (TIMESTAMP '2024-01-02 00:00:00' - TIMESTAMP '2024-01-01 12:00:00') IS NOT NULL AS ok",
    "concat_ws_fn" -> "SELECT concat_ws('-', 'a', 'b', 'c') AS s",
    "format_fn" -> "SELECT format('{} and {}', 1, 'x') AS s",
    "fixed_array_cast" -> "SELECT [1,2,3]::INT[3] AS a",
    "map_from_lists" -> "SELECT map(['a','b'], [1,2]) AS m",
    "generate_subscripts" -> "SELECT generate_subscripts([9,8,7], 1) AS g",
    "to_hex_from_hex" -> "SELECT to_hex(255) AS h, from_hex('ff') IS NOT NULL AS f",
    "string_agg_sep" -> "SELECT string_agg(n_name, '; ' ORDER BY n_nationkey) AS s FROM nation WHERE n_nationkey < 3",
    "len_vs_length" -> "SELECT len('abc') AS a, length([1,2]) AS b, array_length([1,2,3]) AS c",
    "least_greatest_null" -> "SELECT least(1, NULL) AS l, greatest(2, NULL) AS g")

  test("probe batch 8 (exploratory — records gaps, never fails)") {
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
