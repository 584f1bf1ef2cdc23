package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Q
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry re-expresses one capability row of SURVEY.md §2 (the DuckDB
  * 1.4 surface the reference delegates to at /root/reference/main.go:229)
  * as an idiomatic Spark plan, paired with DuckDB oracle SQL for the
  * driver's differential gate.
  */
object SparkEntry {

  /** Every declared operator query, in registration order. */
  def allQueries: Seq[Q] =
    AggQueries.all ++ FilterQueries.all ++ SortSetQueries.all ++
      JoinQueries.all ++ AsOfQueries.all ++ WindowQueries.all ++
      FunctionQueries.all ++ GeneratorQueries.all ++ TpchQueries.all ++
      graft.llm.TextOps.all ++ graft.llm.DedupOps.all ++
      graft.llm.SimilarityOps.all ++ graft.llm.MultimodalOps.all ++
      graft.llm.PipelineOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.q1Pricing.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracleValue.map(q.name -> _)).toMap
}
