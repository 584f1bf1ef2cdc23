package graft

/** Round-5 gap probe 3: statement forms, table functions, literals, and
  * operator idioms a DuckDB client would type at the gateway. Run with
  * `Test/runMain graft.GapProbe3`; each GAP line is a dialect hole.
  */
object GapProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val gw = graft.engine.Gateway.open(spark, TestSpark.sf)
    val probes = Seq(
      // FROM-first syntax
      "FROM nation SELECT n_name LIMIT 2",
      "FROM nation LIMIT 2",
      "FROM nation",
      // direct file / table functions in FROM
      s"SELECT count(*) FROM '${TestSpark.sf}/nation.parquet'",
      s"SELECT count(*) FROM read_parquet('${TestSpark.sf}/nation.parquet')",
      "SELECT * FROM range(3)",
      "SELECT * FROM range(1, 4)",
      "SELECT * FROM generate_series(1, 3)",
      "SELECT * FROM unnest([1, 2, 3])",
      "SELECT u.x FROM unnest([1,2,3]) AS u(x)",
      // sampling
      "SELECT count(*) FROM orders USING SAMPLE 10 ROWS",
      "SELECT count(*) FROM orders USING SAMPLE 5%",
      "SELECT count(*) FROM orders TABLESAMPLE 5%",
      // ORDER BY ALL
      "SELECT n_regionkey, n_name FROM nation ORDER BY ALL LIMIT 3",
      // struct/map literals
      "SELECT {'a': 1, 'b': 'x'} AS s",
      "SELECT {'a': 1}.a AS v",
      "SELECT MAP {'k': 1, 'j': 2} AS m",
      "SELECT map_from_entries([('a', 1), ('b', 2)]) AS m",
      // casts / typeof
      "SELECT 1::DOUBLE, '2024-01-01'::DATE",
      "SELECT TRY_CAST('zzz' AS INTEGER) AS t",
      "SELECT typeof(1), typeof('x'), typeof(1.5)",
      // string ops
      "SELECT 'abcdef'[2:4]",
      "SELECT 'a' || 'b' AS c",
      "SELECT repeat('ab', 3)",
      "SELECT 'Hello' ILIKE 'h%' AS i",
      "SELECT 'abc' SIMILAR TO 'a.c' AS s",
      "SELECT regexp_extract('a1b2', '([a-z])(\\d)', 2) AS g",
      "SELECT 'abc' ~ 'a.c' AS m1, 'abc' !~ 'z' AS m2",
      // comparisons
      "SELECT 2 BETWEEN 1 AND 3, 1 IN (1, 2)",
      "SELECT o_orderkey FROM orders WHERE o_totalprice > ALL (SELECT 0.0) LIMIT 1",
      "SELECT o_orderkey FROM orders WHERE o_totalprice > ANY (SELECT 1e12) LIMIT 1",
      "SELECT EXISTS (SELECT 1 FROM nation) AS e",
      // PRAGMA surface
      "PRAGMA show_tables",
      "PRAGMA table_info('nation')",
      "PRAGMA database_size",
      "PRAGMA version",
      // misc statements
      "DESCRIBE nation",
      "SHOW nation",
      "EXPLAIN SELECT 1",
      "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) v(id, tag)",
      "VALUES (1, 'a'), (2, 'b')",
      // distinct / grouping
      "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name LIMIT 3",
      "SELECT count(DISTINCT n_regionkey) FROM nation",
      // null handling sugar
      "SELECT ifnull(NULL, 5), nvl(NULL, 6), nullif(1, 1)",
      "SELECT coalesce(NULL, NULL, 7)",
      // bit / blob
      "SELECT encode('abc'), decode(encode('abc'))",
      "SELECT '\\xAA'::BLOB",
      "SELECT to_base64('abc'::BLOB) AS b64",
      "SELECT hex(255), unhex('FF')",
      "SELECT bit_count(7)",
      // window sugar
      "SELECT n_name, row_number() OVER () AS rn FROM nation LIMIT 3",
      "SELECT n_name, lead(n_name, 1) OVER (ORDER BY n_name) FROM nation LIMIT 3",
      // union by name
      "SELECT 1 AS a, 2 AS b UNION ALL BY NAME SELECT 4 AS b, 3 AS a",
      // grouping sets shorthand
      "SELECT n_regionkey, count(*) FROM nation GROUP BY GROUPING SETS ((n_regionkey), ()) ORDER BY 1 NULLS LAST"
    )
    var fails = 0
    probes.foreach { q =>
      try { gw.sql(q).collect() }
      catch { case e: Throwable =>
        fails += 1
        println(s"GAP: $q  => ${Option(e.getMessage).getOrElse(e.toString).linesIterator.find(_.trim.nonEmpty).getOrElse("").take(110)}")
      }
    }
    println(s"GAPTOTAL: $fails of ${probes.length}")
    spark.stop()
  }
}
