package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-6 dialect gap probe, batch 5 — exploratory harness: prints
  * OK/ERR per candidate DuckDB statement through the gateway. Converted
  * findings graduate into GatewaySpec/Dialect shims; this file stays as
  * the probe record (same pattern as GapProbe2/3/4).
  *
  * No expected residual GAPs. bitstring_agg / union_type flipped OK in
  * round 7 (BIT as '0'/'1' STRING kernels, UNION as struct(tag, member)
  * encoding, GatewaySpec "round-7"); checkpoint_stmt flipped OK in
  * round 8 — DuckDB 1.0 RUNS CHECKPOINT on a read-only database as an
  * empty-Success no-op (verified against the oracle), so the gateway
  * now answers it the same way instead of rejecting.
  */
class GapProbe5 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "string_slice" -> "SELECT 'abcdef'[2:4] AS s",
    "list_slice_br" -> "SELECT ([1,2,3,4,5])[2:4] AS l",
    "list_neg_slice" -> "SELECT ([1,2,3,4,5])[-2:-1] AS l",
    "struct_star" -> "SELECT s.* FROM (SELECT {'a': 1, 'b': 2} AS s) t",
    "list_aggregate" -> "SELECT list_aggregate([1,2,3], 'sum') AS s",
    "list_avg" -> "SELECT list_avg([1.0,2.0,3.0]) AS a, list_sum([1,2,3]) AS s, list_min([3,1,2]) AS mn, list_max([3,1,2]) AS mx",
    "arg_min_n" -> "SELECT arg_min(o_orderpriority, o_totalprice, 2) AS a FROM orders",
    "strftime" -> "SELECT strftime(DATE '2024-02-01', '%Y/%m/%d') AS s",
    "strptime" -> "SELECT strptime('2024-02-01', '%Y-%m-%d') AS t",
    "epoch_fns" -> "SELECT epoch(TIMESTAMP '2024-01-01 00:00:00') AS e, epoch_ms(TIMESTAMP '2024-01-01 00:00:00') AS ms",
    "week_iso" -> "SELECT week(DATE '2024-01-07') AS w, isodow(DATE '2024-01-07') AS d, dayofyear(DATE '2024-02-01') AS doy",
    "last_day" -> "SELECT last_day(DATE '2024-02-10') AS d, date_trunc('month', DATE '2024-02-10') AS m",
    "time_bucket2" -> "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 00:22:00') AS b",
    "make_date" -> "SELECT make_date(2024, 2, 1) AS d, make_timestamp(2024, 2, 1, 12, 30, 0) AS t",
    "regexp_matches" -> "SELECT regexp_matches('hello', 'l+') AS m",
    "printf" -> "SELECT printf('%d-%s', 7, 'x') AS s",
    "md5_hash" -> "SELECT md5('abc') AS h, hash('abc') AS n",
    "bitstring_agg" -> "SELECT bit_count(7::BIT) IS NOT NULL AS ok",
    "to_base" -> "SELECT to_base(255, 16) AS h",
    "bar_chart" -> "SELECT bar(3, 0, 5, 5) AS b",
    "repeat_str" -> "SELECT repeat('ab', 3) AS s, reverse('abc') AS r",
    "chr_ord" -> "SELECT chr(65) AS c, ord('A') AS o, unicode('A') AS u",
    "translate_fn" -> "SELECT translate('abc', 'ab', 'xy') AS s",
    "greatest_mixed" -> "SELECT greatest(1, 2.5) AS g, least('b', 'a') AS l",
    "map_entries" -> "SELECT map_entries(MAP {'k': 1}) AS e, cardinality(MAP {'k': 1}) AS c",
    "map_from" -> "SELECT map_from_entries([{'k': 'a', 'v': 1}]) AS m",
    "element_at_map" -> "SELECT element_at(MAP {'k': 7}, 'k') AS v",
    "union_type" -> "SELECT union_value(num := 2) AS u",
    "enum_like" -> "SELECT 'small' IN ('small','medium','large') AS ok",
    "interval_mul" -> "SELECT DATE '2024-01-01' + 3 * INTERVAL 1 DAY AS d",
    "timestamptz" -> "SELECT TIMESTAMPTZ '2024-01-01 00:00:00+00' AS t",
    "at_time_zone" -> "SELECT TIMESTAMP '2024-01-01 12:00:00' AT TIME ZONE 'UTC' AS t",
    "current_fns" -> "SELECT current_date IS NOT NULL AS a, now() IS NOT NULL AS b, current_schema() AS s",
    "txn_stmts" -> "BEGIN TRANSACTION",
    "checkpoint_stmt" -> "CHECKPOINT",
    "analyze_stmt" -> "ANALYZE",
    "vacuum_stmt" -> "VACUUM",
    "explain_analyze" -> "EXPLAIN ANALYZE SELECT 1 AS x",
    "show_all_tables" -> "SHOW ALL TABLES",
    "pragma_version" -> "PRAGMA version",
    "set_stmt" -> "SET threads = 4",
    "reset_stmt" -> "RESET threads",
    "comment_syntax" -> "SELECT 1 AS x -- trailing comment",
    "grouping_id" -> "SELECT o_orderstatus, o_orderpriority, GROUPING(o_orderstatus) AS g FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) ORDER BY 1,2 LIMIT 3",
    "count_if" -> "SELECT count_if(o_totalprice > 1000) AS c FROM orders",
    "suffix_fns" -> "SELECT suffix('hello', 'llo') AS s, prefix('hello', 'he') AS p",
    "string_agg_distinct" -> "SELECT string_agg(DISTINCT o_orderstatus, ',') AS s FROM orders",
    "quantile_multi" -> "SELECT quantile_cont(o_totalprice, [0.25, 0.75]) AS q FROM orders",
    "corr_fn" -> "SELECT round(corr(o_totalprice, o_custkey), 6) IS NOT NULL AS ok FROM orders",
    "regr_fns" -> "SELECT regr_slope(o_totalprice, o_custkey) IS NOT NULL AS ok FROM orders",
    "distinct_on2" -> "SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey FROM orders ORDER BY o_orderstatus, o_orderkey",
    "exists_subq" -> "SELECT count(*) AS c FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey)",
    "values_order" -> "VALUES (2, 'b'), (1, 'a') ORDER BY 1",
    "table_stmt" -> "TABLE region",
    "from_first" -> "FROM region SELECT r_name ORDER BY r_regionkey LIMIT 2",
    "bare_from" -> "FROM region")

  test("probe batch 5 (exploratory — records gaps, never fails)") {
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
