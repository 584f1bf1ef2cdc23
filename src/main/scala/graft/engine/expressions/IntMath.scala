package graft.engine.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, LongType}

/** Number-theory and gamma-family scalars of the DuckDB dialect
  * (reached through /root/reference/main.go:229) that Spark has no
  * builtin for. All compile to static calls on [[IntMath]], staying
  * inside whole-stage codegen like the StringSim family.
  */
object IntMath {

  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a)
    var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L else math.abs(a / gcd(a, b) * b)

  /** ln Γ(x) by the Lanczos approximation (g = 7, n = 9) — |rel err|
    * < 1e-13 for x > 0; NaN for x ≤ 0 (the real-valued domain DuckDB
    * exposes without reflection).
    */
  def lgamma(x: Double): Double = {
    if (x.isNaN || x <= 0.0) return Double.NaN
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgamma(1.0 - x)
    } else {
      val z = x - 1.0
      var sum = c(0)
      var i = 1
      while (i < c.length) { sum += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(sum)
    }
  }

  def gamma(x: Double): Double = math.exp(lgamma(x))

  /** DuckDB-domain factorial (`factorial(n)` / postfix `n!`): HUGEINT
    * result, so 21!..33! are real values, not the NULL Spark's BIGINT
    * builtin degrades to. n ≤ 1 — including negatives — is an empty
    * product = 1 (DuckDB 1.0 behavior); 34! overflows HUGEINT and
    * errors there, so it errors here instead of silently wrapping. The
    * dialect's HUGEINT carrier is DECIMAL(38,0) (castTypeMap), which
    * holds every representable result.
    */
  def factorial38(n: Long): org.apache.spark.sql.types.Decimal = {
    if (n > 33) throw new ArithmeticException(
      s"factorial($n): value out of range (HUGEINT holds up to 33!)")
    var acc = java.math.BigInteger.ONE
    var i = 2L
    while (i <= n) {
      acc = acc.multiply(java.math.BigInteger.valueOf(i)); i += 1
    }
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(acc), 38, 0)
  }
}

abstract class LongBinaryMath extends BinaryExpression {
  override def dataType: DataType = LongType
  protected def staticName: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.engine.expressions.IntMath.$staticName($a, $b)")
}

case class Gcd(left: Expression, right: Expression) extends LongBinaryMath {
  override def prettyName: String = "gcd"
  override protected def staticName: String = "gcd"
  override def nullSafeEval(a: Any, b: Any): Any =
    IntMath.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class Lcm(left: Expression, right: Expression) extends LongBinaryMath {
  override def prettyName: String = "lcm"
  override protected def staticName: String = "lcm"
  override def nullSafeEval(a: Any, b: Any): Any =
    IntMath.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `factorial(n)` with the dialect's HUGEINT semantics (DECIMAL(38,0)
  * carrier) — shadows Spark's BIGINT builtin, whose NULL-above-20!
  * degradation would be a silent value divergence. Codegen like the
  * rest of the family; the BigInteger product only runs per evaluated
  * row of a 34-value domain, so there is nothing to cache.
  */
case class Factorial38(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "factorial"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integer, got ${child.dataType.simpleString}")
  override def nullSafeEval(x: Any): Any =
    IntMath.factorial38(x.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.engine.expressions.IntMath.factorial38($x)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class LogGamma(child: Expression, exp: Boolean) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (exp) "gamma" else "lgamma"
  private def fn: String = if (exp) "gamma" else "lgamma"
  override def nullSafeEval(x: Any): Any =
    if (exp) IntMath.gamma(x.asInstanceOf[Double])
    else IntMath.lgamma(x.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.engine.expressions.IntMath.$fn($x)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
