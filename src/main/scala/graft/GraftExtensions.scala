package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GraftFunctions

/** Session-extensions entry point: makes every graft native function
  * available to ANY session created with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), the
  * standard way a Spark library ships custom Catalyst expressions.
  * The imperative path (GraftFunctions.register) stays for sessions the
  * engine does not construct itself.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (GraftFunctions.builders ++ graft.functions.DuckAliases.builders ++
        graft.functions.DuckScalars.builders ++
        graft.functions.DuckListFns.builders ++
        graft.functions.DuckAggs.builders)
      .foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // custom whole-operator strategies (AS-OF join); the imperative path
    // (experimental.extraStrategies, registered on first use) stays for
    // sessions the engine does not construct itself
    ext.injectPlannerStrategy(_ => graft.operators.AsofJoinNative.AsofJoinStrategy)
    // full-dialect attach surface: inert until JdbcServe.start binds an
    // engine to the session (see GraftSqlFront)
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
  }
}
