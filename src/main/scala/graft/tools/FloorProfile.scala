package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness for the per-query constant floor (VERDICT r3
  * item 8): splits a floor-dominated query's wall time into plan build,
  * analyze+optimize+physical-plan, and execute, across repetitions, with
  * optional session-conf overrides from -D style args `k=v`. */
object FloorProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq.filterNot(_.contains("="))
      else Seq("q44_exclude_replace")
    val confs = args.toSeq.filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "30000")
    val spark = confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup
      (1 to 3).foreach(_ => fn(spark, sfDir).count())
      val reps = 10
      var tBuild, tPlan, tExec = 0.0
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        tBuild += (t1 - t0) / 1e6; tPlan += (t2 - t1) / 1e6
        tExec += (t3 - t2) / 1e6
      }
      println(f"$name%-24s build=${tBuild / reps}%7.1fms plan=${tPlan / reps}%7.1fms exec=${tExec / reps}%7.1fms total=${(tBuild + tPlan + tExec) / reps}%7.1fms")
    }
    spark.stop()
  }
}
