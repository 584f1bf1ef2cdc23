package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-8 dialect gap probe, batch 10 — top-n aggregate variants
  * (DuckDB's `min(x, n)`/`max(x, n)` return LISTS of the n extremes),
  * stepped list slicing, list membership/extraction edges, and the
  * string-predicate tail. Exploratory contract: OK/GAP per candidate,
  * never fails.
  *
  * All batch-10 candidates are OK as of round 8: min/max/arg_min/
  * arg_max with n became Functions shims over sort_array+slice /
  * in-aggregate ORDER BY collection; stepped slices `l[a:b:s]` extend
  * the bracket rewrite; the rest resolved natively.
  */
class GapProbe10 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    // top-n aggregate variants (list results)
    "min_n" -> "SELECT min(n_nationkey, 3) AS l FROM nation",
    "max_n" -> "SELECT max(n_nationkey, 3) AS l FROM nation",
    "arg_max_n" -> "SELECT arg_max(n_name, n_nationkey, 2) AS l FROM nation",
    "first_n" -> "SELECT min(x, 2) AS l FROM (VALUES (3),(1),(2)) t(x)",
    // stepped list slicing
    "list_slice_step" -> "SELECT ([1,2,3,4,5,6])[1:5:2] AS l",
    "list_slice_fn3" -> "SELECT list_slice([1,2,3,4,5,6], 1, 5, 2) AS l",
    // list membership / extraction edges
    "list_extract_neg" -> "SELECT list_extract([1,2,3], -1) AS a, ([1,2,3])[-1] AS b",
    "element_at_neg" -> "SELECT element_at([1,2,3], -1) AS a",
    "array_pop" -> "SELECT array_pop_back([1,2,3]) AS a, array_pop_front([1,2,3]) AS b",
    "list_append_prepend" -> "SELECT list_append([1,2], 3) AS a, list_prepend(0, [1,2]) AS b",
    "array_push" -> "SELECT array_push_back([1,2], 3) AS a, array_push_front([1,2], 0) AS b",
    "contains_list" -> "SELECT contains([1,2], 2) AS a, contains('abc', 'b') AS s",
    "map_extract_fn" -> "SELECT map_extract(MAP {'k': 7}, 'k') AS v",
    // string predicate tail
    "ends_with_fn" -> "SELECT ends_with('hello', 'llo') AS a, startswith('hello', 'he') AS b",
    "like_any" -> "SELECT 'abc' LIKE ANY ('a%', 'x%') AS ok",
    "not_ilike" -> "SELECT 'ABC' NOT ILIKE '%z%' AS ok",
    "regexp_fn_forms" -> "SELECT regexp_full_match('abc', 'a.c') AS f",
    "substr_forms" -> "SELECT substr('hello', 2) AS a, substring('hello' FROM 2 FOR 3) AS b",
    // misc
    "list_sort_flags" -> "SELECT list_sort([3,1,2], 'DESC') AS d, list_sort([3,NULL,1], 'ASC', 'NULLS FIRST') AS nf",
    "list_cum" -> "SELECT list_transform([1,2,3], x -> x * 2) AS l",
    "array_agg_fn" -> "SELECT array_agg(n_nationkey ORDER BY n_nationkey) AS l FROM nation WHERE n_nationkey < 3",
    "histogram_named" -> "SELECT histogram(n_regionkey) IS NOT NULL AS ok FROM nation")

  test("probe batch 10 (exploratory — records gaps, never fails)") {
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
