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
  * Slot occupancy is tracked by an EXPLICIT fill-count buffer slot `n`
  * (0 ≤ n ≤ k): slots [0, n) are real, [n, k) are padding whose values
  * are never compared (update short-circuits landing past n, merge
  * guards both sides' counts, eval emits exactly the n-prefix). This
  * replaces the earlier −∞ presence sentinel, so a genuine −∞ score
  * (e.g. a dot product of overflowing raw doubles) is now a
  * first-class edge, ranked and kept exactly like the window spelling
  * would. The result is array<struct<s: double, id: bigint>>
  * best-first, length = min(n, k) — callers posexplode it to recover
  * (rn, nb, sim).
  *
  * PRECONDITION — no NaN scores (unchanged): NaN compares false under
  * every ordering predicate, so a NaN edge would land at the tail
  * instead of sorting DESC-first the way Spark's window ORDER BY
  * places NaN. Current feeders pass cosine similarities in [−1, 1].
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
  // explicit fill count: slots [0, cnt) are real, [cnt, k) padding
  private val cnt: AttributeReference =
    AttributeReference("cnt", IntegerType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] = ss ++ ids :+ cnt

  // padding values are arbitrary (never compared, never emitted); keep
  // the old sentinel pair purely for debuggability of raw buffers
  override val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(Double.NegativeInfinity)) ++
      Seq.fill(k)(Literal(Long.MaxValue)) :+ Literal(0)

  /** (s, id) beats slot (si, idi) under (score DESC, id ASC). NULL
    * inputs never beat (GreaterThan/And are null-rejecting and the
    * caller wraps in the outer If below).
    */
  private def beats(s: Expression, i: Expression,
      si: Expression, ii: Expression): Expression =
    Or(GreaterThan(s, si), And(EqualTo(s, si), LessThan(i, ii)))

  /** One insertion of (s, id) into the slot lists: returns the new
    * (scores, ids) expression vectors. b(j) = lands at slot j. An
    * unfilled slot (j ≥ cnt) is beaten unconditionally — padding
    * values never enter a comparison, so −∞ scores insert correctly.
    */
  private def insert(s: Expression, i: Expression,
      curS: Seq[Expression], curI: Seq[Expression])
      : (Seq[Expression], Seq[Expression]) = {
    // bRaw(j) = beats slot j; the landing slot is the FIRST beaten one.
    // Filled slots are a prefix, so j ≥ cnt ⇒ every later slot is also
    // unfilled and the entry lands exactly at min(first beaten, cnt).
    val bRaw: Seq[Expression] = (0 until k).map(j =>
      Or(GreaterThanOrEqual(Literal(j), cnt), beats(s, i, curS(j), curI(j))))
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
    // a non-skipped row ALWAYS lands while cnt < k (the j ≥ cnt arm),
    // and past that a displacement keeps cnt at k — so the clamped
    // increment is correct whether or not the entry survived
    val newCnt = Least(Seq(Add(cnt, Literal(1)), Literal(k)))
    (nS.zip(ss).map { case (n, c) => If(skip, c, n) } ++
      nI.zip(ids).map { case (n, c) => If(skip, c, n) }) :+
      If(skip, cnt, newCnt)
  }

  override val mergeExpressions: Seq[Expression] = {
    // merge two SORTED slot lists (left/right buffers) as a merge-path
    // walk: output slot j is reached through a state (i, l), i + l = j,
    // where i elements came from the left list. Every comparison is
    // between bare buffer ATTRIBUTES, so the If-tree for slot j has 2^j
    // leaves of O(1) nodes — successive-insert expressions (each level
    // re-substituting the previous level's slot trees) grow
    // exponentially in TREE SIZE instead and OOM'd codegen at k=5.
    // "take left" ⇔ left slot filled AND (right slot unfilled OR left
    // beats right) — padding never wins a comparison, and slots past
    // the merged count are don't-care padding.
    val lS = ss.map(_.left); val lI = ids.map(_.left)
    val rS = ss.map(_.right); val rI = ids.map(_.right)
    def c(i: Int, l: Int): Expression = And(
      LessThan(Literal(i), cnt.left),
      Or(GreaterThanOrEqual(Literal(l), cnt.right),
        beats(lS(i), lI(i), rS(l), rI(l))))
    // (two structurally-identical trees: one yielding scores, one ids)
    def slot(j: Int, leftV: Seq[Expression], rightV: Seq[Expression])
        : Expression = {
      def go(i: Int, l: Int): Expression =
        if (i + l == j) If(c(i, l), leftV(i), rightV(l))
        else If(c(i, l), go(i + 1, l), go(i, l + 1))
      go(0, 0)
    }
    ((0 until k).map(j => slot(j, lS, rS)) ++
      (0 until k).map(j => slot(j, lI, rI))) :+
      Least(Seq(Add(cnt.left, cnt.right), Literal(k)))
  }

  override val evaluateExpression: Expression = {
    val structs = (0 until k).map(j =>
      CreateNamedStruct(Seq(Literal("s"), ss(j), Literal("id"), ids(j))))
    // exactly the cnt-prefix (a bare CreateArray(Nil) types as
    // ARRAY<VOID>; the prefix arrays must be typed empty/partial
    // literals of the result element type)
    def prefix(j: Int): Expression =
      if (j == 0) Literal.create(Seq.empty[Any], dataType)
      else CreateArray(structs.take(j))
    (0 until k).foldRight(CreateArray(structs): Expression) { (j, full) =>
      If(EqualTo(cnt, Literal(j)), prefix(j), full)
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
