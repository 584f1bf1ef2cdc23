package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Gateway

/** Dialect gap probe, batch 15 — the catalog/introspection surface BI
  * tools and ADBC fallbacks read: ANSI information_schema views,
  * duckdb_columns(), pragma_version() / version(), current_schema /
  * current_database / current_schemas, and the glob() table function.
  * Every candidate verified accepted by DuckDB 1.0 first. Exploratory
  * contract: OK/GAP per candidate, never fails.
  */
class GapProbe15 extends AnyFunSuite {
  import TestSpark._

  lazy val gw: Gateway = Gateway.open(spark, sf)

  val probes = Seq(
    "is_tables" -> "SELECT table_name, table_type FROM information_schema.tables WHERE table_name = 'nation'",
    "is_tables_view" -> ("SELECT count(*) > 0 AS ok FROM information_schema.tables " +
      "WHERE table_type = 'BASE TABLE'"),
    "is_columns" -> ("SELECT column_name, ordinal_position, is_nullable, data_type " +
      "FROM information_schema.columns WHERE table_name = 'region' ORDER BY ordinal_position"),
    "is_schemata" -> "SELECT count(*) > 0 AS ok FROM information_schema.schemata WHERE schema_name = 'main'",
    "duckdb_columns_fn" -> ("SELECT column_name, column_index, data_type, is_nullable " +
      "FROM duckdb_columns() WHERE table_name = 'region' ORDER BY column_index"),
    "pragma_version_fn" -> "SELECT library_version FROM pragma_version()",
    "version_fn" -> "SELECT version() AS v",
    "current_schema_fn" -> "SELECT current_schema() AS s",
    "current_database_fn" -> "SELECT current_database() AS d",
    "current_schemas_fn" -> "SELECT current_schemas(true) AS s",
    "glob_fn" -> "SELECT count(*) AS n FROM glob('/root/testdata/sf0.001/*.parquet')",
    "glob_col" -> "SELECT file FROM glob('/root/testdata/sf0.001/nation.*') LIMIT 1")

  test("probe batch 15 (exploratory — records gaps, never fails)") {
    probes.foreach { case (name, sql) =>
      try {
        val r = gw.sql(sql).collect()
        info(s"OK   $name: ${r.take(4).mkString(" | ").take(130)}")
      } catch {
        case e: Throwable =>
          info(s"GAP  $name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(140)}")
      }
    }
  }
}
