package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-5 dialect gap probe, batch 4 — exploratory harness: prints
  * OK/ERR per candidate DuckDB statement through the gateway. Converted
  * findings graduate into GatewaySpec/Dialect shims; this file stays as
  * the probe record (same pattern as GapProbe2/3).
  */
class GapProbe4 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "order_by_all" -> "SELECT 2 AS a, 'x' AS b UNION ALL SELECT 1, 'y' ORDER BY ALL",
    "gen_series_date" -> "SELECT * FROM generate_series(DATE '2024-01-01', DATE '2024-01-05', INTERVAL 2 DAY)",
    "range_ts" -> "SELECT * FROM range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-03', INTERVAL 1 DAY)",
    "semi_join" -> "SELECT 1 AS x FROM (SELECT 1 AS k) a SEMI JOIN (SELECT 1 AS k) b USING (k)",
    "anti_join" -> "SELECT count(*) AS c FROM (SELECT 1 AS k) a ANTI JOIN (SELECT 1 AS k) b USING (k)",
    "median" -> "SELECT median(o_totalprice) AS m FROM orders",
    "position_in" -> "SELECT position('ll' IN 'hello') AS p",
    "list_reduce" -> "SELECT list_reduce([1,2,3], (a,b) -> a+b) AS r",
    "list_zip" -> "SELECT list_zip([1,2],['a','b']) AS z",
    "list_reverse" -> "SELECT list_reverse([1,2,3]) AS r",
    "list_unique" -> "SELECT list_unique([1,1,2]) AS u",
    "flatten" -> "SELECT flatten([[1,2],[3]]) AS f",
    "list_sort_desc" -> "SELECT list_sort([2,1,3], 'DESC') AS s",
    "lag_ignore_nulls" -> "SELECT x, lag(y IGNORE NULLS) OVER (ORDER BY x) AS l FROM (VALUES (1,10),(2,NULL),(3,30)) t(x,y)",
    "date_part_dow" -> "SELECT date_part('dow', DATE '2024-01-07') AS d",
    "date_part_list" -> "SELECT date_part(['year','month'], DATE '2024-02-01') AS p",
    "struct_pack" -> "SELECT struct_pack(a := 1, b := 'x') AS s",
    "struct_insert" -> "SELECT struct_insert({'a': 1}, b := 2) AS s",
    "map_keys" -> "SELECT map_keys(MAP {'k': 1, 'j': 2}) AS k, map_values(MAP {'k': 1}) AS v",
    "map_bracket" -> "SELECT (MAP {'k': 7})['k'] AS v",
    "unnest_recursive" -> "SELECT unnest([[1,2],[3]], recursive := true) AS u",
    "filter_where" -> "SELECT count(*) FILTER (WHERE o_totalprice > 1000) AS c FROM orders",
    "age_fn" -> "SELECT age(TIMESTAMP '2024-03-15', TIMESTAMP '2024-01-01') AS a",
    "list_ordered_agg" -> "SELECT list(x ORDER BY y DESC) AS l FROM (VALUES (1,1),(2,2)) t(x,y)",
    "neg_index" -> "SELECT ([1,2,3])[-1] AS lastel",
    "prepare_exec" -> "PREPARE q1 AS SELECT $1 + 1 AS v")

  test("probe batch 4 (exploratory — records gaps, never fails)") {
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
