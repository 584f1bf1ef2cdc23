package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.expressions.VectorMath

/** Native vector expressions: correctness on known values, float/double
  * inputs, null handling, and agreement with the interpreted HOF fold
  * they replaced.
  */
class VectorMathSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val fl = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f), Array(2.0f, 0.0f, 0.0f)))

  test("dot/cosine on known float vectors") {
    val df = fl.toDF("id", "a", "b")
      .select(col("id"), VectorMath.dot(col("a"), col("b")).as("d"),
        VectorMath.cosine(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(df(0).getDouble(1) == 32.0) // 4+10+18
    assert(math.abs(df(0).getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(df(1).getDouble(1) == 0.0 && df(1).getDouble(2) == 0.0)
    assert(df(2).getDouble(2) == 1.0)
  }

  test("integer lists coerce like DuckDB") {
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
      .select(VectorMath.dot(col("a"), col("b")).as("d")).collect()
    assert(df(0).getDouble(0) == 11.0)
  }

  test("double arrays and mixed float×double work") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(VectorMath.dot(col("a"), col("b")).as("d")).collect()
    assert(df(0).getDouble(0) == 11.0)
    val mixed = fl.toDF("id", "a", "b")
      .select(VectorMath.dot(col("a"), array(lit(1.0), lit(1.0), lit(1.0))).as("d"))
      .orderBy("id").collect()
    assert(mixed(0).getDouble(0) == 6.0)
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
      .select(VectorMath.dot(col("a"), col("b")).as("d")).collect()
    assert(df(0).isNullAt(0))
  }

  test("matches the interpreted aggregate(zip_with) fold bit-for-bit") {
    graft.engine.Tables.register(spark, sf)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = spark.table("embeddings")
      .select(hof.as("h"), VectorMath.dot(col("embedding"), col("embedding")).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("SQL shim list_cosine_similarity resolves to the native expression") {
    // dialect registry on an isolated child session (shared test session
    // is frozen — TestSpark mirrors the Verify/Bench serving contract)
    val iso = graft.engine.Functions.isolated(spark, sf, "embeddings")
    val out = iso.sql(
      """SELECT list_cosine_similarity(embedding, embedding) AS c
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("DuckDB error semantics: length mismatch and null elements throw") {
    val mism = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(VectorMath.dot(col("a"), col("b")).as("d"))
    val e1 = intercept[Exception](mism.collect())
    assert(e1.getMessage != null)
    val withNull = Seq((Array(Some(1.0), None), Array(Some(1.0), Some(1.0))))
      .toDF("a", "b")
      .select(VectorMath.cosine(col("a"), col("b")).as("c"))
    val e2 = intercept[Exception](withNull.collect())
    assert(e2.getMessage != null)
  }
}
