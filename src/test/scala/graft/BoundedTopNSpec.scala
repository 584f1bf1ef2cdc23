package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.expressions.BoundedTopNAgg

/** BoundedTopNAgg — the bounded-state spelling of the DuckDB ≥1.1
  * top-n aggregates (min/max(x, n), arg_min/arg_max(a, v, n)).
  * Differential against the collect+sort+slice form it replaced, over
  * randomized groups, several element types (the aggregate is generic —
  * ints, strings, structs), multiple partitionings (merge must be
  * order-insensitive), and n larger/smaller than the group. The SQL
  * routing (constant n → this aggregate) is value-pinned in
  * GatewaySpec; this spec owns the aggregate's own semantics.
  */
class BoundedTopNSpec extends AnyFunSuite {
  import TestSpark._

  private def agg(e: Column, n: Int, desc: Boolean): Column =
    org.apache.spark.sql.GraftColumn.column(
      BoundedTopNAgg(org.apache.spark.sql.GraftColumn.expression(e), n, desc)
        .toAggregateExpression())

  test("randomized differential vs collect+sort+slice across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = for {
      g <- 0 until 25
      _ <- 0 until rnd.nextInt(40)
    } yield (g, rnd.nextInt(12), f"s${rnd.nextInt(12)}%02d",
      rnd.nextInt(20) / 4.0)
    for (parts <- Seq(1, 5); n <- Seq(0, 1, 3, 100)) {
      val df = rows.toDF("g", "x", "s", "v").repartition(parts)
      val pair = struct(col("v").as("k"), col("s").as("x"))
      val got = df.groupBy(col("g")).agg(
        agg(col("x"), n, desc = false).as("a"),
        agg(col("s"), n, desc = true).as("b"),
        agg(pair, n, desc = false).as("c"))
        .orderBy("g").collect().toSeq
      val want = df.groupBy(col("g")).agg(
        slice(sort_array(collect_list(col("x"))), 1, n).as("a"),
        slice(sort_array(collect_list(col("s")), asc = false), 1, n).as("b"),
        slice(sort_array(collect_list(pair)), 1, n).as("c"))
        .orderBy("g").collect().toSeq
      assert(got == want, s"parts=$parts n=$n")
    }
  }

  test("nulls skipped like collect_list; empty result is [], not NULL") {
    import spark.implicits._
    val df = Seq((1, Some(3)), (1, None), (1, Some(1)), (2, None))
      .toDF("g", "x")
    val got = df.groupBy(col("g"))
      .agg(agg(col("x"), 2, desc = false).as("a"))
      .orderBy("g").collect().toSeq
    assert(got.map(r => (r.getInt(0), r.getSeq[Int](1))) ==
      Seq((1, Seq(1, 3)), (2, Seq())))
  }
}
