package graft.engine.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer barrier: a zero-cost passthrough that reports
  * `deterministic = false`, so the optimizer treats the wrapped
  * expression as unmovable and uncopyable. Use it to pin an EXPENSIVE
  * projection (a per-row k-means assignment, a 64-dim dot product)
  * exactly where it is written, because several rewrites silently
  * multiply such work:
  *
  *  - InferFiltersFromGenerate + PushDownPredicates substitute the
  *    generator's child expression into an inferred
  *    `size(e) > 0 AND isnotnull(e)` filter — the expression then
  *    evaluates THREE times per row (measured on labelKnnIvf's probe
  *    side: the 26k-flop IvfNearestBlock scoring ran 3× per vector);
  *  - join-key not-null constraint inference substitutes through
  *    projections the same way;
  *  - projection collapse defers a pre-Generate computation to after
  *    the Generate, re-evaluating it once per EMITTED row instead of
  *    once per input row (measured: the pair dot product ran 1.35×).
  *
  * The wrapped value is still computed once per row by the projection
  * that names it; downstream operators reference the resulting
  * attribute. Codegen and interpreted eval are the child's own —
  * this node emits no code of its own.
  *
  * Trade-off, by design: a barriered projection is also opaque to
  * LEGITIMATE rewrites (CSE across plans, exchange reuse through
  * canonicalized subtrees), so wrap only hot per-row kernels whose
  * placement you have measured, not general expressions.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opt_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OptimizerBarrier {
  def apply(c: Column): Column =
    GraftColumn.column(OptimizerBarrier(GraftColumn.expression(c)))
}
