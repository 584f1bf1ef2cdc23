package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-9 dialect gap probe, batch 12 — sampling clauses (USING
  * SAMPLE), OFFSET without LIMIT, quantified subqueries (ANY/ALL), row
  * values (tuple IN / comparison), multi-column DISTINCT counts, string
  * subscripts, date±int arithmetic, indexed lambdas (DuckDB's lambda
  * index is 1-BASED vs Spark's 0-based), struct_insert named args,
  * UNION ALL BY NAME, and CTE/CASE edges. Every candidate verified
  * accepted by DuckDB 1.0 first. Exploratory contract: OK/GAP per
  * candidate, never fails.
  */
class GapProbe12 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "using_sample" -> "SELECT count(*) > 0 AS ok FROM nation USING SAMPLE 50%",
    "using_sample_rows" -> "SELECT count(*) AS n FROM nation USING SAMPLE 5 ROWS",
    "offset_only" -> "SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 23",
    "any_subq" -> "SELECT 3 > ANY (SELECT n_nationkey FROM nation) AS ok",
    "all_subq" -> "SELECT 100 > ALL (SELECT n_nationkey FROM nation) AS ok",
    "count_multi_distinct" -> "SELECT COUNT(DISTINCT (n_regionkey, n_nationkey % 2)) AS n FROM nation",
    "str_subscript" -> "SELECT ('abcdef')[2:4] AS s",
    "date_int_add" -> "SELECT DATE '2024-01-01' + 5 AS d",
    "interval_mult" -> "SELECT CAST(3 * INTERVAL 2 DAY AS VARCHAR) AS i",
    "in_tuple" -> "SELECT (1, 2) IN ((1, 2), (3, 4)) AS ok",
    "row_compare" -> "SELECT (1, 2) < (1, 3) AS ok",
    "exists_agg" -> "SELECT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = 3) AS ok",
    // DuckDB lambda index is 1-based: keeps elements 1 and 3
    "lambda_filter_idx" -> "SELECT list_filter([10,20,30], (x, i) -> i % 2 = 1) AS l",
    "struct_insert_named" -> "SELECT struct_insert({'a': 1}, b := 2) AS s",
    "union_byname_sql" -> "SELECT 1 AS a UNION ALL BY NAME SELECT 2 AS a",
    "grouping_fn" -> "SELECT n_regionkey, GROUPING(n_regionkey) AS g FROM nation GROUP BY ROLLUP(n_regionkey) ORDER BY 1 NULLS LAST LIMIT 2",
    "distinct_order_expr" -> "SELECT DISTINCT n_regionkey + 0 AS r FROM nation ORDER BY r",
    "case_no_else" -> "SELECT CASE WHEN 1=2 THEN 'x' END AS c",
    "nested_cte" -> "WITH a AS (WITH b AS (SELECT 1 AS x) SELECT x FROM b) SELECT x FROM a")

  test("probe batch 12 (exploratory — records gaps, never fails)") {
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
