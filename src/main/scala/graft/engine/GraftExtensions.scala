package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session extensions installing the DuckDB dialect at the PARSER level
  * (SparkSessionExtensions.injectParser), so every SQL entry point —
  * `spark.sql`, the Gateway, and Thrift/JDBC client sessions that never
  * pass through Gateway.sql — gets the same text rewrites (QUALIFY,
  * `//`, GLOB, `->>`, catalog table functions; Dialect.rewrite).
  *
  * Activate with
  * `spark.sql.extensions=graft.engine.GraftExtensions` (config-only, the
  * standard Catalyst extension mechanism), or rely on Gateway/Serve
  * which install it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // whole-operator ASOF join (SURVEY §2.3 J7): custom LogicalPlan +
    // Strategy + SparkPlan — graft.plans.AsOfJoinPlan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

/** Delegating parser that applies Dialect.rewrite to whole statements.
  * Identifier/expression/type fragments pass through untouched — the
  * dialect shims are statement-level constructs.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(Dialect.rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(Dialect.rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
