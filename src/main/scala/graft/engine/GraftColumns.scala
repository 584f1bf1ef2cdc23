package graft.engine

import org.apache.spark.sql.{Column, GraftColumn}
import graft.engine.expressions._

/** Column-API facade over the engine's custom Catalyst expressions, for
  * the DataFrame path (the SQL path reaches them via Functions.register
  * shims).
  */
object GraftColumns {
  def jaro(a: Column, b: Column): Column =
    GraftColumn.column(
      JaroSimilarity(GraftColumn.expression(a), GraftColumn.expression(b)))

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumn.column(
      JaroWinklerSimilarity(GraftColumn.expression(a), GraftColumn.expression(b)))

  def dot(a: Column, b: Column): Column = VectorMath.dot(a, b)
  def cosine(a: Column, b: Column): Column = VectorMath.cosine(a, b)

  def minhashSig(text: Column, k: Int): Column =
    GraftColumn.column(MinHashSig(GraftColumn.expression(text), k))

  def shingles3(text: Column): Column =
    GraftColumn.column(Shingles3(GraftColumn.expression(text)))

  def topBigram(text: Column): Column =
    GraftColumn.column(TopBigram(GraftColumn.expression(text)))

  def charStats(text: Column): Column =
    GraftColumn.column(CharStats(GraftColumn.expression(text)))

  /** DuckDB-domain factorial (HUGEINT carrier DECIMAL(38,0), valid
    * through 33!) — the SQL path reaches it via the `factorial`
    * override in Functions.
    */
  def factorialHuge(n: Column): Column =
    GraftColumn.column(Factorial38(
      org.apache.spark.sql.catalyst.expressions.Cast(
        GraftColumn.expression(n), org.apache.spark.sql.types.LongType)))
}
