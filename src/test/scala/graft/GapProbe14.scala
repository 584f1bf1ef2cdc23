package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Dialect gap probe, batch 14 — regex semantics (DuckDB
  * regexp_replace is FIRST-match unless the 'g' flag is given — Spark's
  * replaces all, a silent value divergence; flags args; named-group
  * extract to struct; numbered-group extract), ordered aggregate forms
  * (`agg(x ORDER BY y)` for string_agg/list/first/any_value),
  * grouping_id, printf/format (fmt `{}` syntax incl. positional
  * `{1}{0}`), bar(), strftime's %-specifier tail (%j/%W/%U/%u/%w/%y/
  * %G/%V/%-d/%A/%B), strptime, aggregate-as-window forms
  * (mode/median/quantile_cont OVER), chained list subscripts,
  * unnest(struct) / unnest(recursive := true), and date/timestamp
  * series. Every candidate verified accepted by DuckDB 1.0 first.
  * Exploratory contract: OK/GAP per candidate, never fails.
  */
class GapProbe14 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "re_replace_first" -> "SELECT regexp_replace('aaa', 'a', 'b') AS s",
    "re_replace_g" -> "SELECT regexp_replace('aaa', 'a', 'b', 'g') AS s",
    "re_matches_flag_i" -> "SELECT regexp_matches('ABC', 'abc', 'i') AS ok",
    "re_extract_named" -> "SELECT regexp_extract('2024-06', '(?P<y>\\d+)-(?P<m>\\d+)', ['y','m']) AS s",
    "re_extract_group" -> "SELECT regexp_extract('ab12', '([a-z]+)(\\d+)', 2) AS g",
    "string_agg_ordered" -> "SELECT string_agg(x, ',' ORDER BY x DESC) AS s FROM (VALUES ('a'),('b')) t(x)",
    "list_ordered" -> "SELECT list(x ORDER BY x DESC) AS l FROM (VALUES (1),(2)) t(x)",
    "first_ordered" -> "SELECT first(x ORDER BY x DESC) AS f FROM (VALUES (1),(2)) t(x)",
    "any_value_ordered" -> "SELECT any_value(x ORDER BY x) AS a FROM (VALUES (3),(1)) t(x)",
    "grouping_id_fn" -> "SELECT grouping_id(x) AS g FROM (VALUES (1)) t(x) GROUP BY ROLLUP(x) ORDER BY 1",
    "printf_fn" -> "SELECT printf('%d-%s', 7, 'x') AS s",
    "format_braces" -> "SELECT format('{}-{}', 1, 'a') AS s",
    "format_positional" -> "SELECT format('{1}{0}', 'a', 'b') AS s",
    "bar_fn" -> "SELECT bar(5, 0, 10, 4) AS b",
    "strftime_tail" -> "SELECT strftime(TIMESTAMP '2024-06-01 10:20:30', '%j|%W|%U|%u|%w|%y|%G|%V|%-d|%A|%B') AS s",
    "strptime_my" -> "SELECT CAST(strptime('04/2024', '%m/%Y') AS VARCHAR) AS t",
    "mode_window" -> "SELECT mode(x) OVER () AS m FROM (VALUES (1),(1),(2)) t(x) LIMIT 1",
    "median_window" -> "SELECT median(x) OVER () AS m FROM (VALUES (1),(2),(3)) t(x) LIMIT 1",
    "quantile_window" -> "SELECT quantile_cont(x, 0.5) OVER () AS q FROM (VALUES (1),(2)) t(x) LIMIT 1",
    "chained_subscript" -> "SELECT ([[1,2],[3,4]])[2][1] AS x",
    "unnest_struct" -> "SELECT unnest({'a': 1, 'b': 2}) AS u",
    "unnest_recursive" -> "SELECT unnest([{'a':1}], recursive := true) AS u",
    "series_ts_step" -> "SELECT generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02', INTERVAL 12 HOUR) AS s",
    "range_date_step" -> "SELECT range(DATE '2024-01-01', DATE '2024-01-04', INTERVAL 1 DAY) AS r")

  test("probe batch 14 (exploratory — records gaps, never fails)") {
    probes.foreach { case (name, sql) =>
      try {
        val r = gw.sql(sql).collect()
        info(s"OK   $name: ${r.take(3).mkString(" | ").take(120)}")
      } catch {
        case e: Throwable =>
          info(s"GAP  $name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(140)}")
      }
    }
  }
}
