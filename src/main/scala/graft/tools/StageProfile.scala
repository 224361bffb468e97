package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Counts jobs/stages/tasks and summed task time for one measured run of
  * each named query — distinguishes scheduler overhead from real work in
  * the per-query floor investigation. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q24_string_fns")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "30000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val deserMs = new AtomicLong
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = sc.stageInfo
        val wall = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        stageRows.add(f"    stage ${si.stageId}%3d tasks=${si.numTasks}%3d wall=${wall.getOrElse(-1L)}%5dms ${si.name.takeWhile(_ != '\n').take(90)}")
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (te.taskMetrics != null) {
          taskMs.addAndGet(te.taskMetrics.executorRunTime)
          deserMs.addAndGet(te.taskMetrics.executorDeserializeTime)
        }
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 3).foreach(_ => fn(spark, sfDir).count())
      Thread.sleep(200)
      stages.set(0); tasks.set(0); taskMs.set(0); deserMs.set(0)
      stageRows.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let listener drain
      println(f"$name%-24s wall=$wall%7.1fms stages=${stages.get}%3d tasks=${tasks.get}%4d taskTime=${taskMs.get}%6dms deser=${deserMs.get}%5dms")
      stageRows.forEach(r => println(r))
    }
    spark.stop()
  }
}
