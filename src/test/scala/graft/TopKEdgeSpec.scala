package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKEdgeAgg — the fixed-width codegen top-k aggregate that replaces
  * the pair-relation sort in the kNN-graph reductions. Differential
  * against the window spelling it must equal
  * (`row_number() OVER (ORDER BY s DESC, id ASC) <= k`) on randomized
  * data with forced ties and tiny groups, across partitionings (merge
  * order must not matter).
  */
class TopKEdgeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(graft.engine.expressions.TopKEdgeAgg(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.s").as("s"), col("col.id").as("id"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("g", "rn").collect().toSeq

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("g"), col("s"), col("id"), col("rn"))
      .orderBy("g", "rn").collect().toSeq
  }

  test("randomized differential vs the window top-k, ties and small groups") {
    val rnd = new scala.util.Random(7)
    // 40 groups × up to 60 rows; scores drawn from 8 distinct values to
    // force score ties (tie-break must land on the LOWER id)
    val rows = for {
      g <- 0 until 40
      i <- 0 until rnd.nextInt(60)
    } yield (g.toLong, rnd.nextInt(8) / 7.0, rnd.nextInt(100000).toLong + i)
    for (parts <- Seq(1, 7); k <- Seq(1, 3, 5)) {
      val df = rows.toDF("g", "s", "id").repartition(parts)
      assert(viaAgg(df, k) == viaWindow(df, k), s"parts=$parts k=$k")
    }
  }

  test("groups smaller than k return the whole group; null scores never place") {
    val df = Seq((1L, Some(0.5), 10L), (1L, None, 11L), (2L, Some(0.1), 20L))
      .toDF("g", "s", "id")
    val got = viaAgg(df, 3)
    assert(got.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))) ==
      Seq((1L, 0.5, 10L, 1), (2L, 0.1, 20L, 1)))
  }

  test("genuine −∞ scores are kept and ranked exactly like the window spelling") {
    // the pre-r13 sentinel encoding truncated the emitted prefix at the
    // first −∞ slot, silently dropping real −∞ edges; the explicit
    // fill-count buffer slot must keep them — including the absolute
    // worst corner (−∞ score AND id == Long.MaxValue, the old padding
    // pair itself)
    val inf = Double.NegativeInfinity
    val rows = Seq(
      (1L, inf, 10L), (1L, 0.5, 11L), (1L, inf, 9L), (1L, -1.0, 12L),
      (2L, inf, 20L), (2L, inf, 21L),                 // all-−∞ group
      (3L, inf, Long.MaxValue),                        // old padding pair
      (4L, 0.3, 40L), (4L, inf, 41L), (4L, 0.3, 42L), (4L, 0.9, 43L),
      (4L, inf, 44L))
    for (parts <- Seq(1, 5); k <- Seq(1, 3)) {
      val df = rows.toDF("g", "s", "id").repartition(parts)
      assert(viaAgg(df, k) == viaWindow(df, k), s"parts=$parts k=$k")
    }
  }

  test("plan: aggregates inside HashAggregate (fixed-width, no ObjectHashAggregate)") {
    val df = Seq((1L, 0.5, 10L)).toDF("g", "s", "id")
      .groupBy(col("g"))
      .agg(graft.engine.expressions.TopKEdgeAgg(col("s"), col("id"), 3).as("top"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("ObjectHashAggregate") && !p.contains("SortAggregate"), p)
  }
}
