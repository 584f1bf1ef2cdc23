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
    // capture the owning session: ReadOnlyGuard reads ITS conf, not the
    // thread-local active-session conf (which is ambient state that can
    // point at a sibling session)
    ext.injectParser((session, delegate) => new GraftSqlParser(delegate, Some(session)))
    // whole-operator ASOF join (SURVEY §2.3 J7): custom LogicalPlan +
    // Strategy + SparkPlan — graft.plans.AsOfJoinPlan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // DuckDB `ts::TIME` (time-of-day of a timestamp): Spark 4.1 has the
    // TIME type but no timestamp→time cast — rewrite it at resolution
    ext.injectResolutionRule(_ => TimestampToTimeCast)
  }
}

/** Resolution rule serving `CAST(timestamp AS TIME)` — DuckDB's
  * time-of-day projection, which Spark's Cast does not cover: rewritten
  * to to_time(date_format(ts, µs pattern)), with a TIME(6)→TIME(p)
  * precision cast on top when the target precision differs. The guard
  * matches timestamp children only, so the emitted TIME-typed cast
  * cannot re-trigger the rule.
  */
object TimestampToTimeCast
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
  import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
  import org.apache.spark.sql.types.{TimeType, TimestampType, TimestampNTZType}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ Cast(child, t: TimeType, _, _) if child.resolved &&
          (child.dataType == TimestampType || child.dataType == TimestampNTZType) =>
        val asTime = UnresolvedFunction(Seq("to_time"),
          Seq(UnresolvedFunction(Seq("date_format"),
            Seq(child, Literal("HH:mm:ss.SSSSSS")), isDistinct = false)),
          isDistinct = false)
        if (t.precision == TimeType.MICROS_PRECISION) asTime
        else Cast(asTime, t, c.timeZoneId, c.evalMode)
    }
}

/** Read-only enforcement at the layer ALL SQL passes through (the
  * session parser), not just Gateway.sql: Thrift/JDBC client statements
  * go straight to `session.sql`, so a gateway-level check alone would
  * let any network client run INSERT OVERWRITE DIRECTORY / CREATE TABLE
  * (the reference serves its database access_mode=read_only,
  * /root/reference/main.go:61 — D8 of SURVEY §2.12).
  *
  * Classification is on the PARSED PLAN, not statement text: any
  * non-command plan is a query (allowed); commands are allowed only from
  * an explicit list (session/view/metadata commands, matching
  * Gateway.readOnlyAllowed). Gated per-session by the
  * `spark.graft.readOnly` conf, which Serve sets and clients cannot
  * unset (SET of the flag itself is rejected).
  */
object ReadOnlyGuard {
  val confKey = "spark.graft.readOnly"

  /** Conf namespaces a read-only client may not SET/RESET:
    * spark.graft.* are the enforcement flags themselves (readOnly, the
    * ATTACH allowlist), and spark.sql.catalog.* is what ATTACH binds —
    * a client SET of spark.sql.catalog.x=graft.sources.FlightCatalog
    * would bypass the Gateway's operator gate and point the server's
    * gRPC client at an arbitrary host:port (SSRF).
    */
  private val protectedConfPrefixes = Seq("spark.graft.", "spark.sql.catalog.")
  private def isProtected(key: String): Boolean = {
    val k = key.toLowerCase
    protectedConfPrefixes.exists(p => k.startsWith(p.toLowerCase))
  }

  private val allowedCommandPrefixes = Seq(
    "SetCommand", "ResetCommand", "Show", "Describe", "Explain",
    "CreateView", "DropView", "SetNamespace", "SetCatalog")

  /** DML writes parse to plain query-shaped plans, NOT Command /
    * ParsedStatement (InsertIntoDir is a bare UnaryNode; UPDATE/DELETE/
    * MERGE are v2 relation plans) — deny these by node type explicitly.
    */
  private val deniedPlanPrefixes = Seq(
    "InsertInto", "UpdateTable", "DeleteFrom", "MergeInto",
    "LoadData", "Truncate", "ReplaceData", "WriteDelta")

  /** Whether the given session (the one this parser instance was built
    * for) is read-only. Reads the session's own conf — NOT the
    * thread-local SQLConf.get, which tracks the ambient "active" session
    * and can point at a sibling session of the same context.
    */
  def active(session: Option[org.apache.spark.sql.SparkSession]): Boolean =
    session.exists { s =>
      try s.conf.get(confKey, "false").equalsIgnoreCase("true")
      catch { case _: Throwable => false }
    }

  def enforce(plan: LogicalPlan): Unit = {
    plan match {
      case s: org.apache.spark.sql.execution.command.SetCommand =>
        s.kv.foreach { case (k, _) =>
          if (isProtected(k))
            throw new GatewayException(
              s"read-only session: cannot modify $k")
        }
      // RESET (all) or RESET of a protected key would unset the
      // enforcement flags and disarm this guard for the rest of the
      // session — reject both; RESET of any other key stays allowed.
      case r: org.apache.spark.sql.execution.command.ResetCommand =>
        if (r.config.forall(isProtected))
          throw new GatewayException(
            "read-only session: cannot reset enforcement configuration")
      case _ =>
    }
    val n = plan.getClass.getSimpleName.stripSuffix("$")
    if (deniedPlanPrefixes.exists(n.startsWith))
      throw new GatewayException(
        s"read-only session: statement rejected ($n)")
    val isCommand = plan.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Command] ||
      plan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.ParsedStatement]
    if (isCommand && !allowedCommandPrefixes.exists(n.startsWith))
      throw new GatewayException(
        s"read-only session: statement rejected ($n)")
  }
}

/** Delegating parser that applies Dialect.rewrite to whole statements.
  * Identifier/expression/type fragments pass through untouched — the
  * dialect shims are statement-level constructs. Also the read-only
  * enforcement point (ReadOnlyGuard): every statement from every entry
  * path — spark.sql, Gateway, Thrift/JDBC — parses here.
  */
class GraftSqlParser(
    delegate: ParserInterface,
    session: Option[org.apache.spark.sql.SparkSession] = None)
  extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = delegate.parsePlan(Dialect.rewrite(sqlText))
    if (ReadOnlyGuard.active(session)) ReadOnlyGuard.enforce(plan)
    plan
  }
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
