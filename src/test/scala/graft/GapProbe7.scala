package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-6 dialect gap probe, batch 7 — JSON + list set ops + misc.
  *
  * All 36 probes OK since batch 8: the JSON-introspection family
  * (json_type / json_structure / json_merge_patch / json_contains) and
  * from_json's structure-literal second argument are served by the
  * Jackson-backed `expressions/JsonIntrospect` kernels with
  * DuckDB-pinned semantics (GatewaySpec "batch 8" asserts the
  * boundary cases; f_json_introspect oracle-gates them per round).
  * Since round 7, TIME is served as Spark 4.1's native TimeType
  * (gateway sessions enable spark.sql.timeType.enabled): the probes
  * below assert get_current_time / TIME literals / ts::TIME come back
  * TYPED, closing the round-6 "TIME round-trips as VARCHAR" divergence.
  */
class GapProbe7 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "json_extract" -> "SELECT json_extract('{\"a\": {\"b\": 7}}', '$.a.b') AS v",
    "json_extract_string" -> "SELECT json_extract_string('{\"a\": \"x\"}', '$.a') AS v",
    "json_arrow_deep" -> "SELECT '{\"a\": {\"b\": 7}}' -> 'a' ->> 'b' AS v",
    "json_array_length" -> "SELECT json_array_length('[1,2,3]') AS n",
    "json_valid" -> "SELECT json_valid('{\"a\":1}') AS ok, json_valid('nope{') AS bad",
    "json_structure" -> "SELECT json_structure('{\"a\":1}') IS NOT NULL AS ok",
    "json_merge" -> "SELECT json_merge_patch('{\"a\":1}', '{\"b\":2}') AS m",
    "to_json_row" -> "SELECT to_json({'a': 1, 'b': 'x'}) AS j",
    "from_json" -> "SELECT from_json('{\"a\": 1}', '{\"a\": \"BIGINT\"}') IS NOT NULL AS ok",
    "json_type" -> "SELECT json_type('[1,2]') AS t",
    "json_contains" -> "SELECT json_contains('{\"a\":1}', '1') AS c",
    "list_intersect" -> "SELECT list_intersect([1,2,3], [2,3,4]) AS l",
    "list_union_like" -> "SELECT list_distinct(list_concat([1,2], [2,3])) AS l",
    "list_except_like" -> "SELECT list_filter([1,2,3], x -> NOT list_contains([2], x)) AS l",
    "array_overlap" -> "SELECT array_has_any([1,2], [2,9]) AS a",
    "list_pack" -> "SELECT list_pack(1, 2, 3) AS l",
    "list_where" -> "SELECT list_where([10,20,30], [true,false,true]) AS l",
    "list_select" -> "SELECT list_select([10,20,30], [3,1]) AS l",
    "repeat_list" -> "SELECT repeat([7], 2) AS l",
    "range_neg_step" -> "SELECT range(5, 1, -2) AS r",
    "string_bytes" -> "SELECT octet_length('héllo') AS n, bit_length('a') AS b",
    "ascii_fn" -> "SELECT ascii('A') AS a",
    "instr_fn" -> "SELECT instr('hello', 'll') AS i, strpos('hello', 'll') AS p",
    "substring_neg" -> "SELECT substring('hello', -3) AS s",
    "char_index" -> "SELECT 'hello'[2] AS c",
    "md5_number_half" -> "SELECT md5_number_lower('abc') IS NOT NULL AS ok",
    "regexp_replace_g" -> "SELECT regexp_replace('aaa', 'a', 'b', 'g') AS s",
    "regexp_extract_grp" -> "SELECT regexp_extract('ab12', '([a-z]+)([0-9]+)', 2) AS g",
    "parse_path" -> "SELECT parse_filename('/x/y/z.txt') AS f, parse_dirname('/x/y/z.txt') IS NOT NULL AS d",
    "url_encode" -> "SELECT url_encode('a b') AS e, url_decode('a%20b') AS d",
    "base64_fns" -> "SELECT base64(CAST('hi' AS BLOB)) AS b, from_base64('aGk=') IS NOT NULL AS f",
    "interval_parts" -> "SELECT EXTRACT(DAY FROM INTERVAL 3 DAY) IS NOT NULL AS ok",
    "age_one_arg" -> "SELECT age(TIMESTAMP '2024-01-01') IS NOT NULL AS ok",
    "generate_uuid_v7" -> "SELECT uuidv7() IS NOT NULL AS ok",
    "current_ts_alias" -> "SELECT get_current_timestamp() IS NOT NULL AS a, transaction_timestamp() IS NOT NULL AS b",
    "today_fn" -> "SELECT today() IS NOT NULL AS t, get_current_time() IS NOT NULL AS n")

  test("probe batch 7 (exploratory — records gaps, never fails)") {
    probes.foreach { case (name, sql) =>
      try {
        val r = gw.sql(sql).collect()
        info(s"OK   $name: ${r.take(2).mkString(" | ").take(110)}")
      } catch {
        case e: Throwable =>
          info(s"GAP  $name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(130)}")
      }
    }
  }

  test("TIME probes return TYPED values (round-7: native TimeType)") {
    import org.apache.spark.sql.types.TimeType
    for (sql <- Seq(
        "SELECT get_current_time() AS t",
        "SELECT TIME '23:59:59.999999' AS t",
        "SELECT CAST(TIMESTAMP '2024-06-01 08:30:00' AS TIME) AS t",
        "SELECT make_time(1, 2, 3.5) AS t")) {
      val df = gw.sql(sql)
      assert(df.schema.head.dataType.isInstanceOf[TimeType],
        s"$sql -> ${df.schema.head.dataType}")
      assert(df.collect().head.get(0) != null, sql)
    }
  }
}
