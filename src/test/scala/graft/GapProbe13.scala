package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Dialect gap probe, batch 13 — pattern-match OPERATOR spellings
  * (`~~*` ILIKE, `~~~` GLOB, `~`/`!~` regex, COLLATE NOCASE), list
  * comprehensions (incl. nested + IF filter), the string-distance
  * function tail (mismatches/hamming/damerau_levenshtein/jaccard on
  * words), zero-divisor NULL semantics (DuckDB: x/0, x//0, x%0 are
  * NULL, never an error even under our ANSI default), datetime name/
  * epoch helpers (week/yearweek/dayname/monthname/century/julian/
  * epoch_ns/timezone), math tail (gcd/lcm/even/cot/nextafter/gamma/
  * bit_count), string helpers (prefix/suffix/ord/unicode/to_hex/
  * from_hex/instr/array_slice-on-string/negative subscript), split
  * variants, session introspection (current_setting/txid_current),
  * and make_time. Every candidate verified accepted by DuckDB 1.0
  * first. Exploratory contract: OK/GAP per candidate, never fails.
  */
class GapProbe13 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "ilike_op" -> "SELECT 'Apple' ~~* '%app%' AS ok",
    "not_ilike_op" -> "SELECT 'Apple' !~~* '%zzz%' AS ok",
    "glob_op" -> "SELECT 'abc' ~~~ 'a*' AS ok",
    "regex_op" -> "SELECT 'abc' ~ 'a.c' AS ok",
    "not_regex_op" -> "SELECT 'abc' !~ 'x' AS ok",
    "collate_nocase" -> "SELECT 'Apple' COLLATE NOCASE = 'apple' AS ok",
    "list_compr_if" -> "SELECT [x*2 FOR x IN [1,2,3] IF x > 1] AS l",
    "nested_compr" -> "SELECT [[y+1 FOR y IN x] FOR x IN [[1],[2,3]]] AS l",
    "div_zero_null" -> "SELECT 1.0/0.0 IS NULL AS ok",
    "int_div_zero_null" -> "SELECT 7//0 IS NULL AS ok",
    "mod_zero_null" -> "SELECT 7%0 IS NULL AS ok",
    "mismatches" -> "SELECT mismatches('hello','heLLo') AS n",
    "hamming" -> "SELECT hamming('duck','luck') AS h",
    "damerau" -> "SELECT damerau_levenshtein('duck','ducks') AS d",
    "jaccard_str" -> "SELECT round(jaccard('duck','luck'), 3) AS j",
    "map_from_entries" -> "SELECT CAST(map_from_entries([{'k':'a','v':1}]) AS VARCHAR) AS m",
    "list_intersect" -> "SELECT list_sort(list_intersect([1,2,3],[2,3,4])) AS l",
    "array_slice_str" -> "SELECT array_slice('hello', 2, 4) AS s",
    "instr_alias" -> "SELECT instr('hello','ll') AS i",
    "str_neg_idx" -> "SELECT ('abc')[-1] AS c",
    "concat_num_str" -> "SELECT 1 || 'a' AS s",
    "week_fn" -> "SELECT week(DATE '2024-06-01') AS w",
    "yearweek_fn" -> "SELECT yearweek(DATE '2024-06-01') AS yw",
    "dayname_fn" -> "SELECT dayname(DATE '2024-06-01') AS d",
    "monthname_fn" -> "SELECT monthname(DATE '2024-06-01') AS m",
    "century_fn" -> "SELECT century(DATE '2024-06-01') AS c",
    "julian_fn" -> "SELECT julian(DATE '2024-01-01') AS j",
    "epoch_ns_fn" -> "SELECT epoch_ns(TIMESTAMP '2024-01-01 00:00:00') AS n",
    "timezone_fn" -> "SELECT CAST(timezone('UTC', TIMESTAMP '2024-01-01 00:00:00') AS VARCHAR) AS t",
    "make_time_fn" -> "SELECT CAST(make_time(12, 30, 1.5) AS VARCHAR) AS t",
    "to_centuries_fn" -> "SELECT CAST(to_centuries(2) AS VARCHAR) AS i",
    "bit_count_fn" -> "SELECT bit_count(7) AS n",
    "gcd_fn" -> "SELECT gcd(12, 18) AS g",
    "lcm_fn" -> "SELECT lcm(4, 6) AS l",
    "even_fn" -> "SELECT even(2.5) AS e",
    "cot_fn" -> "SELECT round(cot(1.0), 6) AS c",
    "nextafter_fn" -> "SELECT nextafter(1.0, 2.0) > 1.0 AS ok",
    "gamma_fn" -> "SELECT round(gamma(5), 6) AS g",
    "split_regex" -> "SELECT string_split_regex('a1b2c', '[0-9]') AS l",
    "regexp_split_arr" -> "SELECT regexp_split_to_array('a1b2c', '[0-9]') AS l",
    "str_split_alias" -> "SELECT str_split('a b', ' ') AS l",
    "prefix_fn" -> "SELECT prefix('hello', 'he') AS p",
    "suffix_fn" -> "SELECT suffix('hello', 'lo') AS s",
    "ord_fn" -> "SELECT ord('a') AS o",
    "unicode_fn" -> "SELECT unicode('a') AS u",
    "to_hex_fn" -> "SELECT to_hex(255) AS h",
    "from_hex_fn" -> "SELECT CAST(from_hex('ff') AS VARCHAR) AS b",
    "list_reduce" -> "SELECT list_reduce([1,2,3], (a,b) -> a+b) AS s",
    "current_setting" -> "SELECT current_setting('threads') IS NOT NULL AS ok",
    "txid_current" -> "SELECT txid_current() >= 0 AS ok")

  test("probe batch 13 (exploratory — records gaps, never fails)") {
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
