package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-9 dialect gap probe, batch 17 — exploratory harness (same
  * pattern as GapProbe2-16): OK/GAP per candidate statement. The batch
  * was first swept DIFFERENTIALLY against DuckDB 1.0 (values, not just
  * acceptance); the divergences it found graduated into fixes pinned by
  * GatewaySpec "probe batch 17":
  *   left/right negative n, concat() NULL-skipping (|| keeps NULL),
  *   parse_dirname/dirpath/filename(trim_ext), md5_number_* endianness,
  *   typeof → DuckDB spellings, printf decimal args, format {:spec}
  *   subset, list_resize/array_reverse/list_apply/2-arg reduce,
  *   epoch-of-interval, mixed-unit INTERVAL strings → make_interval,
  *   group_concat (incl. ORDER BY form), strptime format lists.
  *
  * Documented residuals (deliberate, none silent value traps):
  *  - typeof over unsigned carriers reports the WIDENED signed type
  *    (UTINYINT → SMALLINT): the dialect's documented carrier widening.
  *  - DuckDB types strptime-with-list / to_timestamp / timezone() as
  *    TIMESTAMP WITH TIME ZONE; the engine answers the naive kind in
  *    the UTC session — same instant, different type tag.
  *  - a bare mixed interval's DISPLAY ('1 months 2 days 3 hours' vs
  *    '1 month 2 days 03:00:00') differs only in the test harness's
  *    canon; the client-visible VARCHAR cast matches (IntervalText).
  */
class GapProbe17 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "neg_left" -> "SELECT left('hello', -2) AS v",
    "concat_null" -> "SELECT concat('abc', NULL) AS v",
    "parse_paths" -> "SELECT parse_dirname('/a/b/c'), parse_dirpath('a/b/c'), parse_filename('a/b.tar.gz', true)",
    "md5_halves" -> "SELECT md5_number_lower('abc'), md5_number_upper('abc')",
    "typeof_duck" -> "SELECT typeof('x'), typeof(1::BIGINT), typeof([1])",
    "printf_float" -> "SELECT printf('%5.2f', 3.14159) AS v",
    "format_spec" -> "SELECT format('{:.2f}|{:,}', 3.14159, 1234567) AS v",
    "list_tails" -> "SELECT list_resize([1,2], 4, 0), array_reverse([1,2]), list_apply([1], x -> x + 1), reduce([1,2,3], (a, b) -> a + b)",
    "epoch_interval" -> "SELECT extract(epoch FROM INTERVAL '1 month'), date_part('epoch', INTERVAL '2 days 3 hours')",
    "mixed_interval" -> "SELECT CAST(INTERVAL '1 month 2 days 3 hours' AS VARCHAR) AS v",
    "strptime_list" -> "SELECT CAST(strptime('03/07/2024', ['%Y-%m-%d', '%d/%m/%Y']) AS VARCHAR) AS v",
    "group_concat" -> "SELECT group_concat(r_name, '|' ORDER BY r_name) AS v FROM region",
    "similar_to" -> "SELECT 'abc' SIMILAR TO 'a.c' AS v",
    "substring_from" -> "SELECT substring('hello' FROM 2 FOR 3) AS v",
    "trim_spec" -> "SELECT trim(BOTH 'x' FROM 'xxaxx') AS v",
    "date_plus_int" -> "SELECT DATE '2024-01-01' + 5 AS v",
    "bit_shifts" -> "SELECT 1 << 5 AS a, 64 >> 2 AS b, 2 ** 8 AS c, 2 ^ 8 AS d",
    "bin_fn" -> "SELECT bin(10) AS v",
    "to_timestamp_fn" -> "SELECT CAST(to_timestamp(86400) AS VARCHAR) AS v",
    "make_time_fn" -> "SELECT CAST(make_time(1, 2, 3.5) AS VARCHAR) AS v")

  test("probe batch 17 (exploratory — records gaps, never fails)") {
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
