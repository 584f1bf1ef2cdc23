package graft.engine.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document top-bigram statistics — the hot loop of the Gopher-style
  * repetition filter (tx_repetition; the reference reaches it via
  * arbitrary SQL, /root/reference/main.go:229).
  *
  * Computes, natively, exactly what the declarative
  * `explode(bigrams) → groupBy(doc,bigram) count → top-1 window` chain
  * computes — bigram i = toks[i] + " " + (toks[i+1] | ""), i < max(n-1,1),
  * duplicates counted, winner = highest count then lexicographically
  * smallest — so the DuckDB oracle SQL is unchanged. But the signal is
  * per-document: hashing the doc's own bigrams in one loop replaces TWO
  * cluster-wide shuffles of every bigram string (and beats the
  * interpreted higher-order-function formulation, measured 8.5s → sub-1s
  * on the sf0.1 suite). Whole-query shape becomes a pure map — the
  * §2.11 promote-hot-paths-to-Expression tier.
  *
  * Returns struct(bg: string, c: long, total: long); null text → null.
  */
case class TopBigram(child: Expression) extends UnaryExpression {
  override def prettyName: String = "top_bigram"
  override def dataType: DataType = StructType(Seq(
    StructField("bg", StringType, nullable = false),
    StructField("c", LongType, nullable = false),
    StructField("total", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_bigram requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TopBigram.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.engine.expressions.TopBigram.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopBigram {
  /** Static target of the generated code (same pattern as MinHashSig).
    * split(" ", -1) keeps trailing empty tokens — Spark's split
    * semantics, and what the oracle's string_split produces.
    */
  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val m = math.max(toks.length - 1, 1)
    val counts = new java.util.HashMap[String, Long](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ')
      if (i + 1 < toks.length) sb.append(toks(i + 1))
      val bg = sb.toString
      counts.merge(bg, 1L, (a, b) => a + b)
      i += 1
    }
    var best: String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC && e.getKey.compareTo(best) < 0)) {
        best = e.getKey
        bestC = c
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(best), bestC, m.toLong))
  }
}
