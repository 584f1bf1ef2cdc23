package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-9 dialect gap probe, batch 11 — statement-level dialect forms
  * (FROM-first queries, GROUP/ORDER BY ALL, SEMI/ANTI join keywords,
  * top-level unnest, FILTER without WHERE, dollar-quoted strings,
  * trailing commas) plus expression tail (list_reduce two-arg lambda,
  * list_zip, struct-literal dot access). Every candidate verified
  * accepted by DuckDB 1.0 first. Exploratory contract: OK/GAP per
  * candidate, never fails.
  */
class GapProbe11 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "from_first" -> "FROM nation SELECT n_name WHERE n_nationkey < 3",
    "from_bare" -> "FROM nation",
    "group_by_all" -> "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY ALL ORDER BY ALL",
    "order_by_all" -> "SELECT n_nationkey, n_name FROM nation ORDER BY ALL LIMIT 3",
    "semi_join" -> "SELECT n_name FROM nation SEMI JOIN region ON n_regionkey = r_regionkey ORDER BY n_name LIMIT 2",
    "anti_join" -> "SELECT n_name FROM nation ANTI JOIN region ON n_regionkey = r_regionkey + 10 ORDER BY n_name LIMIT 2",
    "try_cast" -> "SELECT TRY_CAST('x' AS INT) AS a",
    "unnest_select" -> "SELECT unnest([1,2,3]) AS u",
    "list_reduce" -> "SELECT list_reduce([1,2,3], (a,b) -> a+b) AS r",
    "list_zip" -> "SELECT list_zip([1,2],[30,40]) AS z",
    "struct_dot" -> "SELECT ({'a': 1, 'b': 2}).a AS a",
    "filter_no_where" -> "SELECT count(*) FILTER (n_nationkey > 5) AS c FROM nation",
    "dollar_quote" -> "SELECT $$it's$$ AS s",
    "eqeq" -> "SELECT 1 == 1 AS ok",
    "trailing_comma" -> "SELECT 1 AS a, 2 AS b, FROM nation LIMIT 1",
    "between_sym" -> "SELECT 5 BETWEEN 10 AND 1 AS ok",
    "grouping_sets_empty" -> "SELECT count(*) AS n FROM nation GROUP BY ()",
    "values_alias_cols" -> "SELECT t.a FROM (VALUES (1, 'x')) t(a, b)",
    "is_distinct" -> "SELECT 1 IS NOT DISTINCT FROM NULL AS ok")

  test("probe batch 11 (exploratory — records gaps, never fails)") {
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
