package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator ASOF join — SURVEY.md §2.3 J7, tier (c) of the
  * custom-operator preference order: a Catalyst LogicalPlan +
  * SparkStrategy + SparkPlan, registered through
  * SparkSessionExtensions (graft.engine.GraftExtensions).
  *
  * Semantics (DuckDB `l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts`,
  * reached by the reference at /root/reference/main.go:229): every left
  * row joins the LATEST right row with equal key and right.ts ≤ left.ts;
  * unmatched left rows null-extend. NULL keys never match.
  *
  * Physical form: both sides hash-clustered on the key and sorted by
  * (key, ts) — Spark inserts the exchanges/sorts from
  * requiredChildDistribution/Ordering — then a single streaming merge
  * per partition holds ONE candidate right row. One shuffle per side,
  * O(1) state: strictly better than the union+window rewrite
  * (engine.AsOfJoin), which carries both sides through one union-wide
  * window with a held payload struct.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryExecNode {

  // keyOrd/tsOrd below are built from the LEFT side's types; mixed-type
  // sides would compare garbage (or throw ClassCastException mid-merge)
  require(leftKey.dataType == rightKey.dataType,
    s"ASOF key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"ASOF ts types differ: ${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // co-partition on the key, merge-order by (key, ts): Catalyst inserts
  // the shuffles and sorts to satisfy these
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lKeyGen = leftKey
    val lTsGen = leftTs
    val rKeyGen = rightKey
    val rTsGen = rightTs
    val payloadAttrs = payload
    // capture child outputs as plain locals: referencing left.output
    // inside the task closure would serialize the plan node itself,
    // whose output is empty after deserialization
    val leftOutput = left.output
    val rightOutput = right.output
    val outAttrs = output
    val numPayload = payloadAttrs.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind expressions to each side's schema inside the task
      val boundLk = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lKeyGen, leftOutput)
      val boundLts = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lTsGen, leftOutput)
      val boundRk = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rKeyGen, rightOutput)
      val boundRts = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rTsGen, rightOutput)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOutput)
      val nullPayload = new GenericInternalRow(numPayload)
      val joined = new JoinedRow
      // bind against the output attrs (payload forced nullable), NOT
      // the raw payload attrs: a non-nullable payload column would bind
      // a non-nullable BoundReference that reads the null-extension
      // row's null slot as 0
      val out = UnsafeProjection.create(outAttrs, outAttrs)

      val rBuf = rIter.buffered
      // held = payload of the latest right row ≤ current position, for
      // the key `heldKey`
      var heldKey: Any = null
      var heldPayload: InternalRow = null

      lIter.map { lRow =>
        val lk = boundLk.eval(lRow)
        val lts = boundLts.eval(lRow)
        if (lk == null || lts == null) {
          // NULL key or NULL ts never matches (DuckDB: l.ts >= NULL is
          // never true); don't enter the advance loop — tsOrd.compare
          // would NPE on a null lts
          joined(lRow, nullPayload)
        } else {
          // advance the right side to the last row with
          // (rk < lk) or (rk == lk && rts <= lts)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = boundRk.eval(rBuf.head)
            if (rk == null) { rBuf.next(); advancing = true } // never matches
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next() } // behind: drop, clear any held
              else if (c == 0) {
                val rts = boundRts.eval(rBuf.head)
                if (rts == null) {
                  // NULL ts never matches; nulls-first ordering puts these
                  // at the head of the key group, so consume — stopping
                  // here would stall the merge for the whole key
                  rBuf.next()
                } else if (tsOrd.compare(rts, lts) <= 0) {
                  heldKey = rk
                  heldPayload = payloadProj(rBuf.next()).copy()
                } else advancing = false
              } else advancing = false
            }
          }
          val matched = heldKey != null && keyOrd.compare(heldKey, lk) == 0
          joined(lRow, if (matched) heldPayload else nullPayload)
        }
        out(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** DataFrame API: left ASOF join with payload columns from the
    * matched right row (aliased). Requires the strategy to be
    * registered (GraftExtensions) — or injects it on the fly.
    */
  def asof(
      spark: SparkSession,
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      key: String,
      ts: String,
      payload: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftPlans
    import org.apache.spark.sql.functions.col
    val lPlan = GraftPlans.analyzed(left)
    // re-alias the right side so its attributes get FRESH exprIds: a
    // self-join (both sides from the same table) would otherwise share
    // exprIds across children, and downstream binding resolves the
    // right key against the wrong side (what DeduplicateRelations does
    // for built-in joins)
    val rPlan = GraftPlans.analyzed(
      right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*))
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val payloadAttrs = payload.map { case (src, alias) =>
      attr(rPlan, src).withName(alias)
    }
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts),
      attr(rPlan, key), attr(rPlan, ts),
      payloadAttrs)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      classic.experimental.extraStrategies =
        AsOfJoinStrategy +: classic.experimental.extraStrategies
    }
    GraftPlans.ofRows(spark, node)
  }
}
