package graft.engine.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB `len(x)`: length of a string, blob, list, or map (SURVEY.md
  * §2.8; DuckDB's primary use is `len(list)`). Spark splits this across
  * `length` (string/binary) and `size`/`cardinality` (array/map), so the
  * dialect shim needs one expression dispatching on the input type —
  * resolved at analysis, branch-free in the generated code.
  */
case class LenAny(child: Expression) extends UnaryExpression {
  override def prettyName: String = "len"
  // BIGINT like DuckDB's len, so the gateway's result schema matches
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType | _: MapType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"len requires string/binary/array/map, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].numChars().toLong
    case BinaryType => v.asInstanceOf[Array[Byte]].length.toLong
    case _: ArrayType => v.asInstanceOf[ArrayData].numElements().toLong
    case _: MapType => v.asInstanceOf[MapData].numElements().toLong
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => child.dataType match {
      case StringType => s"(long) $v.numChars()"
      case BinaryType => s"(long) $v.length"
      case _ => s"(long) $v.numElements()"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
