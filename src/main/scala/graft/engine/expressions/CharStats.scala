package graft.engine.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character statistics — Shannon entropy (the CCNet-class
  * "is this text or noise" quality signal; the reference reaches the
  * same math via arbitrary SQL, /root/reference/main.go:229), distinct
  * character count, and the dominant character's mass fraction.
  *
  * Computes, natively in one pass, exactly what the declarative
  * `explode(per-char rows) → groupBy(doc, char) → entropy fold` chain
  * computes — but per-document: the declarative form would explode the
  * corpus into one row per CHARACTER (a 100 TB scan becomes a 100 TB+
  * shuffle), while this kernel keeps the whole query a pure map. Same
  * promote-hot-paths-to-Expression tier as [[TopBigram]]/[[MinHashSig]].
  *
  * Determinism contract (the tx_bigram_lm discipline): each entropy
  * term −p·ln(p) is rounded to 9 decimals and summed EXACTLY (decimal
  * arithmetic), so the value is independent of char iteration order
  * here and of aggregation order in the oracle's SQL spelling; ln is
  * used on both sides (the proven Math.log ↔ DuckDB ln pair), and the
  * bits conversion divides by ln(2) once AFTER the sum. Characters are
  * Unicode CODE POINTS (DuckDB's len/substr unit).
  *
  * Returns struct(n_chars: long, n_distinct: int, h_nats: double,
  * max_frac: double); null text → null; empty text → (0, 0, 0.0, 0.0).
  */
case class CharStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("h_nats", DoubleType, nullable = false),
    StructField("max_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_stats requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    CharStats.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.engine.expressions.CharStats.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStats {
  /** Static target of the generated code (same pattern as TopBigram). */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, java.lang.Long](64)
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L)
      return new GenericInternalRow(Array[Any](0L, 0, 0.0, 0.0))
    var hExact = java.math.BigDecimal.ZERO
    var maxCount = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > maxCount) maxCount = c
      val p = c.toDouble / n.toDouble
      // term −p·ln(p): the oracle spells it ROUND(-(n/N)*ln(n/N), 9)
      // and sums as DECIMAL(28,9) — negation is exact, so (−p)·ln(p)
      // and −(p·ln(p)) are bit-identical
      val term = -(p * Math.log(p))
      hExact = hExact.add(java.math.BigDecimal.valueOf(term)
        .setScale(9, java.math.RoundingMode.HALF_UP))
    }
    new GenericInternalRow(Array[Any](
      n, counts.size(), hExact.doubleValue(), maxCount.toDouble / n.toDouble))
  }
}
