package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{HybridParameterContext, NamedParameterContext, ParameterContext, ParserInterface, PositionalParameterContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** The full-dialect attach surface: a Catalyst parser FRONT that routes
  * statements arriving through `SparkSession.sql` — which is exactly how
  * the Spark Thrift Server executes client statements — through
  * [[Engine.sql]]'s statement layer, so an external hive-jdbc/beeline/BI
  * client gets the SAME dialect the REPL and API serve: `COPY ... TO`,
  * `FROM 'file'` scans, FROM-first, PIVOT/UNPIVOT statements, USING
  * SAMPLE, macros, PREPARE/EXECUTE, SUMMARIZE, the ASOF SQL spelling, and
  * the session DDL/DML (CTAS, INSERT ... ON CONFLICT, UPDATE/DELETE).
  *
  * The reference serves its full DuckDB dialect over its second JDBC
  * connection (KwackEngine.java:258-272) — sqlline speaks to the same
  * embedded database the ingest wrote. This front is the Spark-native
  * equivalent: `GraftExtensions.injectParser` installs it on the engine's
  * session, and it stays INERT until [[bind]] attaches an engine (which
  * `JdbcServe.start(engine, port)` does), so sessions that never serve
  * see stock Spark parsing.
  *
  * Mechanics: the front runs [[Engine.sql]] at parse time and returns the
  * resulting frame's logical plan — for query forms that is the lazy
  * plan (the thrift layer analyzes and executes it distributed, exactly
  * once); for the eager forms (DML, COPY) the side effect happens here
  * and the returned plan is the small result relation (row counts),
  * which re-executes trivially. A thread-local reentrancy guard makes
  * the nested `spark.sql` calls inside Engine.sql parse with the stock
  * parser, so the front terminates by construction.
  */
object GraftSqlFront {

  private val bound =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Engine]()
  private val inFront: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Serve `engine`'s dialect for statements parsed on `session`. */
  def bind(session: SparkSession, engine: Engine): Unit =
    bound.put(session, engine)

  /** Detach (only if `engine` is still the bound one). */
  def unbind(session: SparkSession, engine: Engine): Unit =
    bound.remove(session, engine)

  private[graft] def frontPlan(session: SparkSession,
      delegate: ParserInterface, sqlText: String): LogicalPlan = {
    val eng = bound.get(session)
    if (eng == null || inFront.get()) delegate.parsePlan(sqlText)
    else {
      inFront.set(true)
      try eng.sql(sqlText).queryExecution.logical
      finally inFront.set(false)
    }
  }

  private[graft] def noParams(ctx: ParameterContext): Boolean = ctx match {
    case h: HybridParameterContext => h.args.isEmpty && h.paramNames.isEmpty
    case n: NamedParameterContext => n.params.isEmpty
    case p: PositionalParameterContext => p.params.isEmpty
    case _ => false
  }
}

/** Injected by [[GraftExtensions]]; inert until [[GraftSqlFront.bind]]. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlFront.frontPlan(session, delegate, sqlText)

  /** `SparkSession.sql(text)` routes here with an empty parameter
    * context — front it like parsePlan. Parameterized SQL stays on the
    * stock parser (the engine dialect has its own PREPARE/EXECUTE). */
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    if (GraftSqlFront.noParams(ctx))
      GraftSqlFront.frontPlan(session, delegate, sqlText)
    else delegate.parsePlanWithParameters(sqlText, ctx)

  // pure delegation below: the front intercepts STATEMENTS only
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
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
