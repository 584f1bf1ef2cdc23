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
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, " +
          s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Java source reading element i of `v` as double. */
  protected def getter(e: Expression, v: String, i: String): String =
    elemType(e) match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }

  protected def getElem(e: Expression, v: ArrayData, i: Int): Double =
    elemType(e) match {
      case FloatType => v.getFloat(i).toDouble
      case _ => v.getDouble(i)
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
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
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
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
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
