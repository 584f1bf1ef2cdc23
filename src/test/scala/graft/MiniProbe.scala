package graft

/** Scratch probe for candidate Spark-side rewrite targets. */
object MiniProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val probes = Seq(
      "SELECT row_number() OVER (ORDER BY 1) FROM range(3)",
      "SELECT row_number() OVER (ORDER BY 'c') FROM range(3)",
      "SELECT row_number() OVER (ORDER BY null) FROM range(3)",
      "SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet` LIMIT 1",
      "SELECT count(*) FROM orders TABLESAMPLE (5 PERCENT)",
      "SELECT count(*) FROM orders TABLESAMPLE (10 ROWS)",
      "SELECT named_struct('a', 1).a",
      "SELECT map('k', 1, 'j', 2)",
      "SELECT 'abc' RLIKE '^(?:a.c)$'",
      "SELECT CAST('ab' AS BINARY)",
      "SELECT unhex('AA')",
      "SELECT o_orderkey FROM orders WHERE o_totalprice > (SELECT max(__qc) FROM (SELECT 0.0) AS __q(__qc)) LIMIT 1",
      "SELECT substring('abcdef', 2, 3)",
      "SELECT 1 WHERE 3 IN (SELECT * FROM range(5))"
    )
    graft.engine.Tables.register(spark, TestSpark.sf)
    probes.foreach { q =>
      try { spark.sql(q).collect(); println(s"OKP: $q") }
      catch { case e: Throwable =>
        println(s"GAP: $q  => ${Option(e.getMessage).getOrElse(e.toString).linesIterator.find(_.trim.nonEmpty).getOrElse("").take(100)}")
      }
    }
    spark.stop()
  }
}
