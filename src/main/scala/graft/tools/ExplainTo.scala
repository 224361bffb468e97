package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Round-13 evidence tool: write `.explain("formatted")` for named queries
  * into per-query files (plans/r13/<query>_<tag>.txt) WITHOUT executing
  * them — the before/after plan artifacts the optimization round commits.
  * Usage: runMain graft.tools.ExplainTo <tag> <query>[,query...] [sfDir]
  */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File("plans/r13").mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val w = new PrintWriter(s"plans/r13/${name}_$tag.txt", "UTF-8")
      try w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
      println(s"wrote plans/r13/${name}_$tag.txt")
    }
    spark.stop()
  }
}
