package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Round-9 dialect gap probe, batch 19 — JSON/nested-type tails, swept
  * DIFFERENTIALLY against DuckDB 1.0 first (values, not acceptance);
  * graduated fixes are value-pinned in GatewaySpec "probe batch 19":
  *   json()/json_quote/json_array/json_object constructors,
  *   json_group_array/json_group_object aggregates, JSON-POINTER paths
  *   ('/a/1' indexes arrays 0-based), negative slice ends on lists AND
  *   strings ([2:-2]), NULL-skipping list concat (all-NULL → NULL),
  *   list_unique counting distinct non-NULL, 2-arg array_length,
  *   regexp_escape (RE2 QuoteMeta), BLOB '…' typed literals,
  *   full-Unicode chr/char, and BIGINT length() on every input kind
  *   (typeof exposed Spark's INT on strings).
  *
  * Documented residuals (deliberate):
  *  - json_group_structure / json_transform: DuckDB's structure-merge /
  *    cast-by-template machinery — unimplemented, errors loudly.
  *  - list/struct/map CANON rendering differs only in the test
  *    harness's textual canon (python repr vs Row.toString); the typed
  *    Arrow/parquet client surface is identical.
  */
class GapProbe19 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "json_ctor" -> "SELECT json(' {\"b\" : 2, \"a\":1} ') AS v",
    "json_quote" -> "SELECT json_quote('he\"llo') AS v",
    "json_array" -> "SELECT json_array(1, 'a', NULL) AS v",
    "json_object" -> "SELECT json_object('k', 1) AS v",
    "json_group" -> "SELECT json_group_array(x) AS a, json_group_object(CAST(x AS VARCHAR), x) AS o FROM (VALUES (1),(2)) t(x)",
    "json_pointer" -> "SELECT json_extract('{\"a\":[1,2]}', '/a/1') AS v",
    "neg_slice" -> "SELECT list_slice([1,2,3,4,5], 2, -2) AS l, ('abcdef')[2:-2] AS s",
    "null_list_cat" -> "SELECT list_cat([1], NULL) AS a, list_cat(NULL, NULL) IS NULL AS b",
    "list_unique_nn" -> "SELECT list_unique([1,1,2,NULL]) AS v",
    "array_length_dim" -> "SELECT array_length([1,2,3], 1) AS v",
    "regexp_escape" -> "SELECT regexp_escape('a.b*c') AS v",
    "blob_typed_lit" -> "SELECT base64(BLOB 'ab') AS v",
    "unicode_chr" -> "SELECT chr(8364) AS v",
    "bigint_length" -> "SELECT typeof(length('abc')) AS v",
    "map_fns" -> "SELECT map_keys(MAP {'x': 1}) AS k, cardinality(MAP {'a': 1, 'b': 2}) AS c",
    "like_escape" -> "SELECT 'a_b' LIKE 'a#_b' ESCAPE '#' AS v",
    "list_compare" -> "SELECT [1,2] < [1,3] AS v, {'a':1} = {'a':1} AS w")

  test("probe batch 19 (exploratory — records gaps, never fails)") {
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
