package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: write `.explain("formatted")` for named
  * queries into per-query files (plans/<round>/<query>_<tag>.txt) — the
  * before/after plan artifacts the optimization round commits.
  *
  * Caveat (ADVICE r13): DataFrame CONSTRUCTION is not free for every
  * registry entry — constructors that run eager work (DistributedRank's
  * approx-quantile/count jobs, eager localCheckpoints, streaming gates
  * whose build executes the whole streaming query before snapshotting)
  * execute real Spark jobs while this tool "only plans". The plan written
  * is still the final frame's plan; just don't assume the tool is
  * side-effect-free or cheap for streaming-gate names.
  * Usage: runMain graft.tools.ExplainTo <tag> <query>[,query...] [sfDir]
  * Output dir: $SPARK_GRAFT_PLANS_DIR (default plans/r14).
  */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r14")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val w = new PrintWriter(s"$outDir/${name}_$tag.txt", "UTF-8")
      try w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
