package graft.engine.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder: vector → M codebook indices, one per
  * subspace (code_m = argmin_k ||x_m − c_{m,k}||², first-min ties —
  * deterministic). The codebook rides the expression as a REFERENCE
  * OBJECT, not as literal sub-expressions: an M×K codebook spelled as
  * K·M literal arrays costs seconds of analysis/canonicalization per
  * query on the driver (measured 1.7 s at M=8, K=256) and defeats
  * whole-stage codegen; here the plan carries ONE node per encode and
  * the generated code is a tight primitive loop.
  *
  * IMPORTANT for caching: pass the SAME codebook array instance on every
  * call (memoize it) — plan equality (and therefore CacheOnce hits) is
  * reference equality on the array.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val subDim = if (m == 0) 0 else books(0)(0).length

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float>/array<double>, got ${other.simpleString}")
    }

  // lazy: child.dataType resolves only after analysis; cached after that
  // (a def here re-ran the ArrayType cast M·K·subDim times per row on
  // the interpreted path)
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    PqEncode.checkLen(x.numElements(), m * subDim)
    if (elemNullable) {
      var i = 0
      while (i < x.numElements()) {
        if (x.isNullAt(i)) PqEncode.nullElement()
        i += 1
      }
    }
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      val book = books(mi)
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < book.length) {
        val c = book(k)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val xv = if (isFloat) x.getFloat(base + j).toDouble else x.getDouble(base + j)
          val diff = xv - c(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val book = ctx.freshName("book")
      val c = ctx.freshName("c")
      val diff = ctx.freshName("diff")
      val getX = if (isFloat) s"(double) $x.getFloat($mi * $subDim + $j)"
        else s"$x.getDouble($mi * $subDim + $j)"
      // ArrayData.getDouble on a null slot returns 0.0 silently — a NULL
      // element would encode as a zeroed coordinate and corrupt the code;
      // fail instead (same convention as VectorMath). Scan emitted only
      // when the schema admits nulls.
      val nullScan = if (!elemNullable) ""
        else {
          val ni = ctx.freshName("ni")
          s"""for (int $ni = 0; $ni < $x.numElements(); $ni++) {
             |  if ($x.isNullAt($ni)) graft.engine.expressions.PqEncode.nullElement();
             |}""".stripMargin
        }
      s"""
         |graft.engine.expressions.PqEncode.checkLen($x.numElements(), ${m * subDim});
         |$nullScan
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double[][] $book = $booksRef[$mi];
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $k = 0; $k < $book.length; $k++) {
         |    double[] $c = $book[$k];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      double $diff = ($getX) - $c[$j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $k; }
         |  }
         |  $codes[$mi] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def checkLen(n: Int, expected: Int): Unit =
    if (n != expected)
      throw new IllegalArgumentException(
        s"pq_encode: vector has $n dims, codebook covers $expected")

  def nullElement(): Unit =
    throw new IllegalArgumentException(
      "pq_encode: vector can not contain NULL elements")

  def apply(v: Column, books: Array[Array[Array[Double]]]): Column =
    GraftColumn.column(PqEncode(GraftColumn.expression(v), books))
}
