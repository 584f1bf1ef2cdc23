package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-6 dialect gap probe, batch 6 — string/stat/datetime function
  * surface. Same exploratory contract as GapProbe2-5: prints OK/GAP per
  * candidate, never fails; findings graduate into shims + GatewaySpec.
  *
  * Notable catches this batch (fixed): DuckDB log(x) is log10 while
  * Spark's is ln — a silent VALUE divergence; `^` parses in Spark as
  * xor but means power in DuckDB; bare VARCHAR/TEXT/BLOB cast type
  * names. nfc_normalize / format_bytes are served since batch 8
  * (`expressions/JsonIntrospect` kernels). No expected residual GAPs
  * since round 8: postfix `5!` rewrites to factorial() (only `!`
  * immediately followed by `=` is not-equals — DuckDB's own lexer
  * split), and GROUPS window frames run as RANGE over an injected
  * dense_rank (beyond-reference: DuckDB 1.0 itself rejects GROUPS).
  */
class GapProbe6 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "split_part" -> "SELECT split_part('a,b,c', ',', 2) AS s",
    "left_right" -> "SELECT left('hello', 2) AS l, right('hello', 2) AS r",
    "lpad_rpad" -> "SELECT lpad('7', 3, '0') AS l, rpad('7', 3, '0') AS r",
    "trim_chars" -> "SELECT trim('xxhixx', 'x') AS t, ltrim('xxhi', 'x') AS l, rtrim('hixx', 'x') AS r",
    "levenshtein" -> "SELECT levenshtein('kitten', 'sitting') AS d",
    "hamming" -> "SELECT hamming('abc', 'abd') AS h, mismatches('abc', 'abd') AS m",
    "jaccard_str" -> "SELECT round(jaccard('duck', 'luck'), 3) AS j",
    "nfc_normalize" -> "SELECT nfc_normalize('café') AS s",
    "strip_accents" -> "SELECT strip_accents('café') AS s",
    "format_bytes" -> "SELECT format_bytes(1048576) AS s",
    "to_binary_hex" -> "SELECT bin(5) AS b, hex(255) AS h, unhex('ff') IS NOT NULL AS u",
    "skew_kurt" -> "SELECT round(skewness(o_totalprice), 6) IS NOT NULL AS s, round(kurtosis(o_totalprice), 6) IS NOT NULL AS k FROM orders",
    "covar" -> "SELECT covar_pop(o_totalprice, o_custkey) IS NOT NULL AS c, covar_samp(o_totalprice, o_custkey) IS NOT NULL AS s FROM orders",
    "bool_aggs" -> "SELECT bool_and(o_totalprice > 0) AS a, bool_or(o_totalprice > 500000) AS o FROM orders",
    "bit_aggs" -> "SELECT bit_and(o_custkey) IS NOT NULL AS a, bit_or(o_custkey) IS NOT NULL AS o, bit_xor(o_custkey) IS NOT NULL AS x FROM orders",
    "gsum_prod" -> "SELECT fsum(x) AS s FROM (VALUES (1.5),(2.5)) t(x)",
    "lcm_gcd" -> "SELECT lcm(4, 6) AS l, gcd(12, 18) AS g",
    "factorial" -> "SELECT factorial(5) AS f, 5! AS f2",
    "pow_variants" -> "SELECT pow(2, 10) AS p, power(2, 10) AS p2, 2 ** 10 AS p3",
    "xor_op" -> "SELECT xor(5, 3) AS x",
    "shift_ops" -> "SELECT 1 << 4 AS l, 256 >> 4 AS r",
    "bitwise_ops" -> "SELECT 5 & 3 AS a, 5 | 3 AS o, ~5 AS n",
    "date_add_fn" -> "SELECT date_add(DATE '2024-01-01', INTERVAL 3 DAY) AS d",
    "dayname" -> "SELECT dayname(DATE '2024-01-07') AS d, monthname(DATE '2024-02-01') AS m",
    "timezone_fns" -> "SELECT timezone('UTC', TIMESTAMP '2024-01-01 00:00:00') IS NOT NULL AS ok",
    "julian" -> "SELECT julian(DATE '2024-01-01') AS j",
    "to_ts_variants" -> "SELECT to_timestamp(1704067200) AS t, make_timestamptz(2024,1,1,0,0,0) IS NOT NULL AS z",
    "century_decade" -> "SELECT century(DATE '2024-01-01') AS c, decade(DATE '2024-01-01') AS d, era(DATE '2024-01-01') IS NOT NULL AS e",
    "quarter_fn" -> "SELECT quarter(DATE '2024-05-01') AS q, weekofyear(DATE '2024-01-07') AS w",
    "list_grade_up" -> "SELECT list_grade_up([30,10,20]) AS g",
    "list_dot" -> "SELECT list_dot_product([1.0,2.0], [3.0,4.0]) AS d, list_cosine_similarity([1.0,0.0], [1.0,0.0]) AS c",
    "list_distance" -> "SELECT round(list_distance([0.0,0.0], [3.0,4.0]), 3) AS d",
    "setseed_rand" -> "SELECT setseed(0.5) IS NULL OR true AS ok",
    "uuid_fn" -> "SELECT length(CAST(uuid() AS VARCHAR)) AS n, length(CAST(gen_random_uuid() AS VARCHAR)) AS m",
    "txid" -> "SELECT txid_current() >= 0 AS ok",
    "current_setting" -> "SELECT current_setting('threads') IS NOT NULL AS ok",
    "typeof_fns" -> "SELECT typeof(1) AS a, typeof('x') AS b, typeof([1]) AS c",
    "can_cast" -> "SELECT TRY_CAST('x' AS INT) IS NULL AS bad, TRY_CAST('7' AS INT) AS ok",
    "constant_pi" -> "SELECT round(pi(), 6) AS p, round(exp(1), 6) AS e",
    "cot_fn" -> "SELECT round(cot(1), 6) AS c, round(atan2(1, 1), 6) AS a",
    "log_variants" -> "SELECT log(100) AS l10, ln(2.718281828) IS NOT NULL AS ln2, log2(8) AS l2, log(2, 8) AS lb",
    "divide_ops" -> "SELECT fdiv(7, 2) AS f, fmod(7, 2) AS m, 7 % 3 AS pct",
    "string_split_regex" -> "SELECT string_split_regex('a1b2c', '[0-9]') AS l",
    "like_escape" -> "SELECT 'a_b' LIKE 'a!_b' ESCAPE '!' AS ok",
    "ilike_op" -> "SELECT 'ABC' ILIKE '%b%' AS ok",
    "similar_to" -> "SELECT 'abc' SIMILAR TO 'a.c' AS ok",
    "between_sym" -> "SELECT 5 BETWEEN 1 AND 10 AS ok",
    "is_distinct" -> "SELECT 1 IS DISTINCT FROM NULL AS a, NULL IS NOT DISTINCT FROM NULL AS b",
    "window_exclude_tie" -> "SELECT sum(x) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s FROM (VALUES (1),(2),(3)) t(x)",
    "ntile_fn" -> "SELECT ntile(2) OVER (ORDER BY o_orderkey) AS n FROM orders LIMIT 3",
    "cume_dist" -> "SELECT round(cume_dist() OVER (ORDER BY o_orderkey), 6) AS c, round(percent_rank() OVER (ORDER BY o_orderkey), 6) AS p FROM orders LIMIT 3")

  test("probe batch 6 (exploratory — records gaps, never fails)") {
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
