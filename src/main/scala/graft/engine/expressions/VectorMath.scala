package graft.engine.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector math over `array<float>`/`array<double>`
  * embedding columns (SURVEY.md §7.5 similarity mandate; reference
  * reaches DuckDB's `list_dot_product`/`list_cosine_similarity` via
  * /root/reference/main.go:229).
  *
  * Why a custom Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions are interpreted (CodegenFallback) and allocate
  * an intermediate array per row; at 100 TB a per-pair O(dim) interpreted
  * fold is the hot loop of the whole pipeline. These expressions compile
  * to a tight primitive loop inside whole-stage codegen, read both float
  * and double arrays without a widening copy, and accumulate
  * left-to-right in double — the same order and type DuckDB uses, so
  * results stay oracle-exact.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType |
        ShortType | ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric array input, " +
          s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  /** Java source reading element i of `v` as double (any numeric
    * element type — DuckDB coerces integer lists, so do we).
    */
  protected def getter(e: Expression, v: String, i: String): String =
    elemType(e) match {
      case FloatType => s"(double) $v.getFloat($i)"
      case IntegerType => s"(double) $v.getInt($i)"
      case LongType => s"(double) $v.getLong($i)"
      case ShortType => s"(double) $v.getShort($i)"
      case ByteType => s"(double) $v.getByte($i)"
      case _ => s"$v.getDouble($i)"
    }

  protected def getElem(e: Expression, v: ArrayData, i: Int): Double =
    elemType(e) match {
      case FloatType => v.getFloat(i).toDouble
      case IntegerType => v.getInt(i).toDouble
      case LongType => v.getLong(i).toDouble
      case ShortType => v.getShort(i).toDouble
      case ByteType => v.getByte(i).toDouble
      case _ => v.getDouble(i)
    }

  /** DuckDB semantics: unequal lengths and NULL elements are errors, not
    * silently-wrong numbers (NULL *arrays* still yield NULL via the
    * null-safe wrapper). Runtime checks shared by eval and codegen.
    */
  protected def checkInputs(x: ArrayData, y: ArrayData): Unit =
    VectorBinaryExpression.check(prettyName, x, y)

  /** Java source for the same checks; element null-scan emitted only
    * when the schema says nulls are possible.
    */
  protected def checkCode(x: String, y: String): String = {
    val lenCheck =
      s"""if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: list dimensions must be equal, got " +
         |    $x.numElements() + " and " + $y.numElements());
         |}""".stripMargin
    def nullScan(v: String, side: String, emit: Boolean) =
      if (!emit) ""
      else
        s"""for (int __i = 0; __i < $v.numElements(); __i++) {
           |  if ($v.isNullAt(__i)) {
           |    throw new IllegalArgumentException(
           |      "$prettyName: $side argument can not contain NULL values");
           |  }
           |}""".stripMargin
    lenCheck + "\n" + nullScan(x, "left", elemNullable(left)) +
      "\n" + nullScan(y, "right", elemNullable(right))
  }
}

object VectorBinaryExpression {
  def check(name: String, x: ArrayData, y: ArrayData): Unit = {
    if (x.numElements() != y.numElements()) {
      throw new IllegalArgumentException(
        s"$name: list dimensions must be equal, got " +
          s"${x.numElements()} and ${y.numElements()}")
    }
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) throw new IllegalArgumentException(
        s"$name: left argument can not contain NULL values")
      if (y.isNullAt(i)) throw new IllegalArgumentException(
        s"$name: right argument can not contain NULL values")
      i += 1
    }
  }
}

/** dot(a, b): Σ aᵢ·bᵢ in input order. Shim target for DuckDB
  * `list_dot_product` / `list_inner_product`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "list_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    checkInputs(x, y)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += getElem(left, x, i) * getElem(right, y, i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |${checkCode(x, y)}
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(left, x, i)} * ${getter(right, y, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cos(a, b) = dot/(‖a‖·‖b‖), all three sums in ONE pass (DuckDB
  * `list_cosine_similarity` semantics, identical accumulation order to
  * three separate folds — doubles come out bit-equal).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "list_cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    checkInputs(x, y)
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = getElem(left, x, i)
      val yv = getElem(right, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |${checkCode(x, y)}
         |int $n = $x.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getter(left, x, i)};
         |  double $yv = ${getter(right, y, i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorMath {
  /** Column-API entry points for the DataFrame path. */
  def dot(a: Column, b: Column): Column =
    GraftColumn.column(
      DotProduct(GraftColumn.expression(a), GraftColumn.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftColumn.column(
      CosineSimilarity(GraftColumn.expression(a), GraftColumn.expression(b)))
}
