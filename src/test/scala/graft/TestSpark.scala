package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (Test / fork := true). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf: JDBC sessions on the thrift attach surface share
      // this session's temp views (JdbcServeSpec; see JdbcServe.start)
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      // parser front for the full-dialect attach (inert until an engine
      // is bound by JdbcServe.start), functions, AS-OF strategy
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
