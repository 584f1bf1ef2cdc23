package graft.engine.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB `typeof(x)`: the DUCKDB spelling of the argument's static type
  * ('VARCHAR', 'BIGINT', 'DECIMAL(18,2)', 'INTEGER[]'…), where Spark's
  * builtin answers Spark names ('string', 'bigint') — a client-visible
  * divergence for every type-introspecting client (round-9 probe).
  * Shares the spelling table the duckdb_columns catalog view serves
  * (sources.LiveCatalog.duckTypeName), so typeof() and the catalog
  * always agree. The result is a plan-time constant (foldable, so the
  * optimizer folds it to a literal and the CodegenFallback never runs
  * hot); the child is never evaluated, like Spark's own TypeOf.
  */
final case class DuckTypeOf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  private lazy val name: UTF8String =
    UTF8String.fromString(graft.sources.LiveCatalog.duckTypeName(child.dataType))

  override def eval(input: InternalRow): Any = name

  override protected def withNewChildInternal(newChild: Expression): DuckTypeOf =
    copy(child = newChild)
}
