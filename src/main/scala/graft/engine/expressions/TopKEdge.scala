package graft.engine.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Bounded top-k (score DESC, id ASC) as a FIXED-WIDTH declarative
  * aggregate: `k` (score: DOUBLE, id: LONG) slots kept best-first in 2k
  * primitive buffer fields, so the whole aggregation runs inside
  * whole-stage-codegen HashAggregateExec — no sort of the input, no
  * object state, no ObjectHashAggregate fallback cliff.
  *
  * This is the scale-path spelling of the kNN-graph reduction
  * (`row_number() OVER (PARTITION BY id ORDER BY sim DESC, nb ASC) <= k`):
  * the window form must SORT every candidate pair before the rank
  * filter — measured 1.02e9 pair rows / 10.5 GB of sort spill / ~170 s
  * at the 100× tier for nn_label_knn_ivf — while this aggregate folds
  * each pair into a 3-slot state in O(k) compares, partial-aggregates
  * map-side inside the join's partitioning (the exchange then carries
  * one ≤k-slot state per vector, not the pair relation), and keeps the
  * EXACT window ordering semantics: ties on score go to the LOWER id,
  * merge order cannot matter because the comparator is total.
  *
  * Empty slots carry (score = −∞, id = Long.MaxValue); real cosine
  * scores are finite, so −∞ doubles as the presence marker. The result
  * is array<struct<s: double, id: bigint>> best-first, length ≤ k —
  * callers posexplode it to recover (rn, nb, sim).
  *
  * PRECONDITION — finite scores only. A genuine −∞ input score is
  * indistinguishable from the empty-slot sentinel, so `eval` truncates
  * the emitted prefix at the first −∞ slot: an edge whose score is −∞
  * (e.g. a dot product of overflowing raw doubles) would be silently
  * dropped where the window spelling keeps it. Every current feeder
  * (SimilarityOps.topKEdges) passes cosine similarities in [−1, 1];
  * any new call site feeding unbounded scores must clamp or pre-filter
  * non-finite values first, or this aggregate needs an explicit
  * fill-count buffer slot instead of the −∞ presence marker.
  */
case class TopKEdgeAgg(score: Expression, id: Expression, k: Int)
    extends DeclarativeAggregate {

  // merge trees have 2^j leaves per slot — fine to 8, not beyond
  require(k >= 1 && k <= 8, s"top-k agg is for small fixed k, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_edge"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_edge requires (double, bigint), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  private val ss: Seq[AttributeReference] =
    (0 until k).map(i => AttributeReference(s"s$i", DoubleType, nullable = false)())
  private val ids: Seq[AttributeReference] =
    (0 until k).map(i => AttributeReference(s"i$i", LongType, nullable = false)())

  override val aggBufferAttributes: Seq[AttributeReference] = ss ++ ids

  override val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(Double.NegativeInfinity)) ++
      Seq.fill(k)(Literal(Long.MaxValue))

  /** (s, id) beats slot (si, idi) under (score DESC, id ASC). NULL
    * inputs never beat (GreaterThan/And are null-rejecting and the
    * caller wraps in the outer If below).
    */
  private def beats(s: Expression, i: Expression,
      si: Expression, ii: Expression): Expression =
    Or(GreaterThan(s, si), And(EqualTo(s, si), LessThan(i, ii)))

  /** One insertion of (s, id) into the slot lists: returns the new
    * (scores, ids) expression vectors. b(j) = lands at slot j.
    */
  private def insert(s: Expression, i: Expression,
      curS: Seq[Expression], curI: Seq[Expression])
      : (Seq[Expression], Seq[Expression]) = {
    // bRaw(j) = beats slot j; the landing slot is the FIRST beaten one
    val bRaw = (0 until k).map(j => beats(s, i, curS(j), curI(j)))
    val lands = (0 until k).map { j =>
      (0 until j).foldLeft(bRaw(j))((e, p) => And(Not(bRaw(p)), e))
    }
    // slot j after insert: s if it lands at j; shifted j-1 value if the
    // insert landed at or above j-1; else unchanged
    val above = (0 until k).map { j =>
      if (j == 0) Literal(false)
      else (0 until j).map(lands).reduce(Or(_, _))
    }
    val newS = (0 until k).map { j =>
      if (j == 0) If(lands(0), s, curS(0))
      else If(lands(j), s, If(above(j), curS(j - 1), curS(j)))
    }
    val newI = (0 until k).map { j =>
      if (j == 0) If(lands(0), i, curI(0))
      else If(lands(j), i, If(above(j), curI(j - 1), curI(j)))
    }
    (newS, newI)
  }

  override val updateExpressions: Seq[Expression] = {
    val (nS, nI) = insert(score, id, ss, ids)
    // NULL score/id: keep the buffer unchanged (window rows with NULL
    // sort keys can't displace real ones under DESC NULLS LAST either)
    val skip = Or(IsNull(score), IsNull(id))
    nS.zip(ss).map { case (n, c) => If(skip, c, n) } ++
      nI.zip(ids).map { case (n, c) => If(skip, c, n) }
  }

  override val mergeExpressions: Seq[Expression] = {
    // merge two SORTED slot lists (left/right buffers) as a merge-path
    // walk: output slot j is reached through a state (i, l), i + l = j,
    // where i elements came from the left list. Every comparison is
    // between bare buffer ATTRIBUTES, so the If-tree for slot j has 2^j
    // leaves of O(1) nodes — successive-insert expressions (each level
    // re-substituting the previous level's slot trees) grow
    // exponentially in TREE SIZE instead and OOM'd codegen at k=5.
    // Empty slots (−∞, MaxValue) tie only against empties and lose to
    // real entries, so the walk needs no fill-count bookkeeping.
    val lS = ss.map(_.left); val lI = ids.map(_.left)
    val rS = ss.map(_.right); val rI = ids.map(_.right)
    def c(i: Int, l: Int): Expression = beats(lS(i), lI(i), rS(l), rI(l))
    // (two structurally-identical trees: one yielding scores, one ids)
    def slot(j: Int, leftV: Seq[Expression], rightV: Seq[Expression])
        : Expression = {
      def go(i: Int, l: Int): Expression =
        if (i + l == j) If(c(i, l), leftV(i), rightV(l))
        else If(c(i, l), go(i + 1, l), go(i, l + 1))
      go(0, 0)
    }
    (0 until k).map(j => slot(j, lS, rS)) ++
      (0 until k).map(j => slot(j, lI, rI))
  }

  override val evaluateExpression: Expression = {
    val structs = (0 until k).map(j =>
      CreateNamedStruct(Seq(Literal("s"), ss(j), Literal("id"), ids(j))))
    // filled prefix only: slot j is real iff its score > −∞ (a bare
    // CreateArray(Nil) types as ARRAY<VOID>; the prefix arrays must be
    // typed empty/partial literals of the result element type)
    def prefix(j: Int): Expression =
      if (j == 0) Literal.create(Seq.empty[Any], dataType)
      else CreateArray(structs.take(j))
    (0 until k).foldRight(CreateArray(structs): Expression) { (j, full) =>
      If(EqualTo(ss(j), Literal(Double.NegativeInfinity)), prefix(j), full)
    }
  }
}

object TopKEdgeAgg {
  /** Column form: `topKEdges(sim, nb, 3)` → array<struct<s,id>>. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftColumn.column(TopKEdgeAgg(
      GraftColumn.expression(score), GraftColumn.expression(id), k)
      .toAggregateExpression())
}
