package graft.engine.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Coarse-quantizer assignment: vector → the `n` nearest centroid ids,
  * best-first (ties on the LOWER centroid id). Two scoring modes,
  * chosen to replicate [[graft.llm.KMeans]]'s assign arithmetic
  * BIT-FOR-BIT (same sequential dot fold as VectorMath.dot, same
  * norm/score expression shapes), so swapping the crossJoin+min_by
  * assign for this projection cannot move a single centroid:
  *
  *  - cosine (l2=false): minimize −(dot(x,c) / ||c||) — the IVF coarse
  *    quantizer's argmax of cosine (row norm constant under argmax)
  *  - L2 (l2=true): minimize ||c||² − 2·dot(x,c) — product-quantization
  *    codebook assignment (row norm constant under argmin)
  *
  * This is the zero-shuffle spelling of "nearest lists": the
  * corpus × centroids cross join + per-row argmin that KMeans/
  * nn_ivf_topk otherwise materialize copies corpus×k wide rows per
  * round (28 GB/iteration at the 512-list tier — measured 73 s/iter)
  * just to rank a per-row array that fits in registers; here the whole
  * assignment is ONE projection node inside whole-stage codegen. The
  * centroid matrix rides as a REFERENCE OBJECT, not literal
  * sub-expressions, for the same reasons as [[PqEncode]] (driver-side
  * analysis cost, codegen method-size limits) — and, like PqEncode,
  * plan equality (CacheOnce hits) is reference equality on the arrays:
  * memoize them per dataset.
  *
  * `cents(i)` is the RAW centroid for id `i`; `cn(i)` its L2 norm
  * (driver-precomputed with the same sequential fold + sqrt the engine
  * uses). Selection is repeated argmin with exclusion — n is
  * nprobe-sized (≤ tens), so n·k beats a sort.
  */
case class IvfNearest(child: Expression, cents: Array[Array[Double]],
    cn: Array[Double], l2: Boolean, n: Int)
    extends UnaryExpression {

  private val k = cents.length
  private val dim = if (k == 0) 0 else cents(0).length
  private val outN = math.min(n, k)

  override def prettyName: String = "ivf_nearest"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_nearest requires array<float>/array<double>, got ${other.simpleString}")
    }

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    PqEncode.checkLen(x.numElements(), dim)
    if (elemNullable) {
      var i = 0
      while (i < x.numElements()) {
        if (x.isNullAt(i)) PqEncode.nullElement()
        i += 1
      }
    }
    val scores = new Array[Double](k)
    var ci = 0
    while (ci < k) {
      val c = cents(ci)
      var d = 0.0
      var j = 0
      while (j < dim) {
        val xv = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
        d += xv * c(j)
        j += 1
      }
      scores(ci) = if (l2) cn(ci) * cn(ci) - 2.0 * d else -(d / cn(ci))
      ci += 1
    }
    val taken = new Array[Boolean](k)
    val out = new Array[Int](outN)
    var oi = 0
    while (oi < outN) {
      var best = -1
      var bestS = Double.PositiveInfinity
      var i = 0
      while (i < k) {
        // strict < : the ascending scan makes ties land on the lower id
        if (!taken(i) && scores(i) < bestS) { bestS = scores(i); best = i }
        i += 1
      }
      if (best < 0) { // all-NaN scores: fall back to the lowest id
        var f = 0
        while (best < 0 && f < k) { if (!taken(f)) best = f; f += 1 }
      }
      taken(best) = true
      out(oi) = best
      oi += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val cnRef = ctx.addReferenceObj("ivfNorms", cn, "double[]")
      val scores = ctx.freshName("scores")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val oi = ctx.freshName("oi")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val getX = if (isFloat) s"(double) $x.getFloat($j)" else s"$x.getDouble($j)"
      val score =
        if (l2) s"$cnRef[$ci] * $cnRef[$ci] - 2.0 * $d"
        else s"-($d / $cnRef[$ci])"
      val nullScan = if (!elemNullable) ""
        else {
          val ni = ctx.freshName("ni")
          s"""for (int $ni = 0; $ni < $x.numElements(); $ni++) {
             |  if ($x.isNullAt($ni)) graft.engine.expressions.PqEncode.nullElement();
             |}""".stripMargin
        }
      s"""
         |graft.engine.expressions.PqEncode.checkLen($x.numElements(), $dim);
         |$nullScan
         |double[] $scores = new double[$k];
         |for (int $ci = 0; $ci < $k; $ci++) {
         |  double[] $c = $centsRef[$ci];
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $d += ($getX) * $c[$j];
         |  }
         |  $scores[$ci] = $score;
         |}
         |boolean[] $taken = new boolean[$k];
         |int[] $out = new int[$outN];
         |for (int $oi = 0; $oi < $outN; $oi++) {
         |  int $best = -1;
         |  double $bestS = Double.POSITIVE_INFINITY;
         |  for (int $i = 0; $i < $k; $i++) {
         |    if (!$taken[$i] && $scores[$i] < $bestS) { $bestS = $scores[$i]; $best = $i; }
         |  }
         |  if ($best < 0) { // all-NaN scores: fall back to the lowest id
         |    for (int $i = 0; $best < 0 && $i < $k; $i++) {
         |      if (!$taken[$i]) $best = $i;
         |    }
         |  }
         |  $taken[$best] = true;
         |  $out[$oi] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfNearest {
  /** Driver-side L2 norms with the engine's exact fold order
    * (sequential += then sqrt — matches sqrt(VectorMath.dot(c, c))).
    */
  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var s = 0.0
      var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      math.sqrt(s)
    }

  def apply(v: Column, cents: Array[Array[Double]], cn: Array[Double],
      l2: Boolean, n: Int): Column =
    GraftColumn.column(IvfNearest(GraftColumn.expression(v), cents, cn, l2, n))

  /** Runtime guard for the blocked variant: a block index outside the
    * concatenated matrix means the label→block map and the centroid
    * build disagree — fail loudly, never rank a foreign slice.
    */
  def checkBlock(b: Int, blockLen: Int, k: Int): Unit =
    if (b < 0 || (b.toLong + 1L) * blockLen > k)
      throw new IllegalStateException(
        s"ivf_nearest_block: block $b out of range for $k centroids of block length $blockLen")
}

/** [[IvfNearest]] restricted to one BLOCK of a concatenated per-group
  * centroid matrix: ranks only the `blockLen` centroids at
  * `[block·blockLen, (block+1)·blockLen)` and returns GLOBAL centroid
  * ids. This is the per-label coarse quantizer's assignment: label-
  * correlated embeddings make a global quantizer's lists label-pure,
  * so probe budget ranked globally is wasted on other labels' lists —
  * ranking within the row's own label block makes every probed list
  * in-label by construction at the same budget. Same scoring
  * arithmetic, tie-break (lower id within the block), and reference-
  * object centroid transport as [[IvfNearest]]; one extra int child
  * selects the block.
  */
case class IvfNearestBlock(vec: Expression, block: Expression,
    cents: Array[Array[Double]], cn: Array[Double], l2: Boolean, n: Int,
    blockLen: Int) extends BinaryExpression {

  require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")

  private val k = cents.length
  private val dim = if (k == 0) 0 else cents(0).length
  private val outN = math.min(n, blockLen)

  override def left: Expression = vec
  override def right: Expression = block
  override def prettyName: String = "ivf_nearest_block"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, block.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (v, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_nearest_block requires (array<float|double>, int), got " +
            s"(${v.simpleString}, ${b.simpleString})")
    }

  private lazy val isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val elemNullable: Boolean =
    vec.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, blk: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val b = blk.asInstanceOf[Int]
    IvfNearest.checkBlock(b, blockLen, k)
    PqEncode.checkLen(x.numElements(), dim)
    if (elemNullable) {
      var i = 0
      while (i < x.numElements()) {
        if (x.isNullAt(i)) PqEncode.nullElement()
        i += 1
      }
    }
    val base = b * blockLen
    val scores = new Array[Double](blockLen)
    var ci = 0
    while (ci < blockLen) {
      val c = cents(base + ci)
      var d = 0.0
      var j = 0
      while (j < dim) {
        val xv = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
        d += xv * c(j)
        j += 1
      }
      scores(ci) = if (l2) cn(base + ci) * cn(base + ci) - 2.0 * d
        else -(d / cn(base + ci))
      ci += 1
    }
    val taken = new Array[Boolean](blockLen)
    val out = new Array[Int](outN)
    var oi = 0
    while (oi < outN) {
      var best = -1
      var bestS = Double.PositiveInfinity
      var i = 0
      while (i < blockLen) {
        // strict < : the ascending scan makes ties land on the lower id
        if (!taken(i) && scores(i) < bestS) { bestS = scores(i); best = i }
        i += 1
      }
      if (best < 0) { // all-NaN scores: fall back to the lowest id
        var f = 0
        while (best < 0 && f < blockLen) { if (!taken(f)) best = f; f += 1 }
      }
      taken(best) = true
      out(oi) = base + best
      oi += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, blk) => {
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val cnRef = ctx.addReferenceObj("ivfNorms", cn, "double[]")
      val base = ctx.freshName("base")
      val scores = ctx.freshName("scores")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val oi = ctx.freshName("oi")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val getX = if (isFloat) s"(double) $x.getFloat($j)" else s"$x.getDouble($j)"
      val score =
        if (l2) s"$cnRef[$base + $ci] * $cnRef[$base + $ci] - 2.0 * $d"
        else s"-($d / $cnRef[$base + $ci])"
      val nullScan = if (!elemNullable) ""
        else {
          val ni = ctx.freshName("ni")
          s"""for (int $ni = 0; $ni < $x.numElements(); $ni++) {
             |  if ($x.isNullAt($ni)) graft.engine.expressions.PqEncode.nullElement();
             |}""".stripMargin
        }
      s"""
         |graft.engine.expressions.IvfNearest.checkBlock($blk, $blockLen, $k);
         |graft.engine.expressions.PqEncode.checkLen($x.numElements(), $dim);
         |$nullScan
         |int $base = $blk * $blockLen;
         |double[] $scores = new double[$blockLen];
         |for (int $ci = 0; $ci < $blockLen; $ci++) {
         |  double[] $c = $centsRef[$base + $ci];
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $d += ($getX) * $c[$j];
         |  }
         |  $scores[$ci] = $score;
         |}
         |boolean[] $taken = new boolean[$blockLen];
         |int[] $out = new int[$outN];
         |for (int $oi = 0; $oi < $outN; $oi++) {
         |  int $best = -1;
         |  double $bestS = Double.POSITIVE_INFINITY;
         |  for (int $i = 0; $i < $blockLen; $i++) {
         |    if (!$taken[$i] && $scores[$i] < $bestS) { $bestS = $scores[$i]; $best = $i; }
         |  }
         |  if ($best < 0) { // all-NaN scores: fall back to the lowest id
         |    for (int $i = 0; $best < 0 && $i < $blockLen; $i++) {
         |      if (!$taken[$i]) $best = $i;
         |    }
         |  }
         |  $taken[$best] = true;
         |  $out[$oi] = $base + $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, block = newRight)
}

object IvfNearestBlock {
  def apply(v: Column, block: Column, cents: Array[Array[Double]],
      cn: Array[Double], l2: Boolean, n: Int, blockLen: Int): Column =
    GraftColumn.column(IvfNearestBlock(GraftColumn.expression(v),
      GraftColumn.expression(block), cents, cn, l2, n, blockLen))
}
