package graft.engine.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler similarity (SURVEY.md §2.8 string family,
  * [custom] row: no Spark builtin; reference reaches DuckDB's
  * `jaro_similarity`/`jaro_winkler_similarity` via
  * /root/reference/main.go:229).
  *
  * Algorithm matches DuckDB exactly (verified against the oracle on
  * fixture data): match window max(|a|,|b|)/2 − 1, half-transposition
  * count, and the Winkler prefix bonus (≤4 units, weight 0.1) applied
  * only when jaro > 0.7. Like DuckDB, the units are UTF-8 BYTES, not
  * characters — a multi-byte 'é' counts as two positions, and oracle
  * comparisons on non-ASCII corpora depend on this.
  *
  * Codegen: the expressions emit a static call to [[StringSim]] — the
  * same pattern as Spark's own levenshtein — so they stay inside
  * whole-stage codegen instead of falling back to interpreted eval.
  */
object StringSim {

  def jaro(l: UTF8String, r: UTF8String): Double = {
    val a = l.getBytes
    val b = r.getBytes
    if (java.util.Arrays.equals(a, b)) return 1.0
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(n, m) / 2 - 1
    val ma = new Array[Boolean](n)
    val mb = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    (mm / n + mm / m + (mm - t / 2) / mm) / 3.0
  }

  /** FULL Damerau-Levenshtein (Lowrance-Wagner: transposed characters
    * may be separated by later edits) — matches DuckDB's
    * damerau_levenshtein, e.g. ('ca','abc') = 2 where the restricted
    * OSA form gives 3. Units are UTF-8 bytes, consistent with jaro.
    */
  def damerauLevenshtein(l: UTF8String, r: UTF8String): Int = {
    val a = l.getBytes
    val b = r.getBytes
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val da = new Array[Int](256)
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da(b(j - 1) & 0xff)
        val l0 = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l0) + (i - 1 - k) + 1 + (j - 1 - l0)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, tra))
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d(n + 1)(m + 1)
  }

  def jaroWinkler(l: UTF8String, r: UTF8String): Double = {
    val j = jaro(l, r)
    if (j <= 0.7) return j // Winkler boost threshold (DuckDB semantics)
    val a = l.getBytes
    val b = r.getBytes
    var p = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (p < max && a(p) == b(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}

abstract class StringSimExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  /** Fully-qualified static method this expression compiles to. */
  protected def staticCall: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$staticCall($a, $b)")
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends StringSimExpression {
  override def prettyName: String = "jaro_similarity"
  override protected def staticCall: String =
    "graft.engine.expressions.StringSim.jaro"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.engine.expressions.StringSim.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringSimExpression {
  override def prettyName: String = "jaro_winkler_similarity"
  override protected def staticCall: String =
    "graft.engine.expressions.StringSim.jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
