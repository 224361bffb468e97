package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time (and optionally explain) individual SparkEntry queries.
  * Usage: runMain graft.Profile <sfDir> <query>[,query...] [reps] [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(SparkEntry.queries.keys.toSeq)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val doExplain = args.lift(3).contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "30000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job/stage accounting per rep: how much of the wall is dispatch floor
    // (many tiny jobs) vs actual task work
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          // failed/zombie stages can carry null metrics
          Option(sc.stageInfo.taskMetrics)
            .foreach(m => taskMs.addAndGet(m.executorRunTime))
        }
      })
    // listener events are delivered asynchronously on the bus: drain it
    // before sampling the counters so a rep's late stage completions are
    // not misattributed to the next rep (ADVICE r13). listenerBus is
    // private[spark] — reflective call, sleep fallback.
    def drainListenerBus(): Unit =
      try {
        val m = spark.sparkContext.getClass.getMethod("listenerBus")
        val bus = m.invoke(spark.sparkContext)
        bus.getClass.getMethods
          .find(x => x.getName == "waitUntilEmpty" && x.getParameterCount == 0)
          .fold(Thread.sleep(150L))(w => { w.invoke(bus); () })
      } catch { case _: Throwable => Thread.sleep(150L) }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { _ =>
        drainListenerBus()
        val (j0, s0, t0m) = (jobs.get(), stages.get(), taskMs.get())
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        drainListenerBus()
        f"$w%.2f (jobs ${jobs.get() - j0}, stages ${stages.get() - s0}, " +
          f"taskS ${(taskMs.get() - t0m) / 1e3}%.1f)"
      }
      println(s"[profile] $name: ${times.mkString(" | ")}")
    }
    spark.stop()
  }
}
