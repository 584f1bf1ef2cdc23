package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Det, Q}

/** Aggregation operators — SURVEY.md §2.4 (A1–A15). The reference reaches
  * these by delegating SQL text to DuckDB (/root/reference/main.go:229);
  * here each is a declarative DataFrame plan so Catalyst plans
  * partial/final HashAggregate with map-side combine — the shape that
  * scales to 100 TB (shuffle carries only group states, not rows).
  */
object AggQueries {

  /** A1+A3: TPC-H Q1 pricing summary — the flagship end-to-end slice
    * (SURVEY.md §7.1). Exercises scan, filter pushdown, grouped agg with
    * partial aggregation, exact decimal sums, ordered output.
    */
  val q1Pricing: Q = Q(
    "q1_pricing",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.dsumSql("l_quantity")} AS sum_qty,
       |  ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       |  ${Det.davgSql("l_quantity")} AS avg_qty,
       |  ${Det.davgSql("l_extendedprice")} AS avg_price,
       |  ${Det.davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin
  ) { s =>
    val d = (c: String) => col(c).cast(DecimalType(18, 2))
    s.table("lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(d("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - d("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
  }

  val all: Seq[Q] = Seq(q1Pricing)
}
