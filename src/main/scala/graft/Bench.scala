package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query and total seconds.
  *
  * Methodology mirrors the reference's JMH harness (reference:
  * AvroBenchmark.java:65-70 — one warmup iteration of the SAME workload
  * before measurement, BENCHMARK.md:44-45): a full untimed pass of the query
  * set at the target scale factor JIT-compiles generated code, initializes
  * Spark's execution machinery, and materializes the persisted index frames
  * (shingle index, LSH signatures) that a serving deployment builds once;
  * the timed pass then measures steady-state query execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // default 100-entry codegen cache thrashes at 86 queries x several
      // stages each: evicted classes recompile (janino) inside the TIMED
      // pass, inflating random queries by seconds. Static conf — must be
      // set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup iteration (JMH-style) on the target scale factor.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => }
    }
    System.gc() // settle broadcast/shuffle cleanup before measuring

    // Two measurement iterations per query (reference runs 2, JMH
    // annotations at AvroBenchmark.java:67-68); report the minimum of the
    // SUCCESSFUL iterations — a failed iteration's near-zero elapsed time
    // must neither shrink the query's min nor flatter the total. A query
    // with no successful iteration reports -1 and joins the errors array.
    // Each iteration rebuilds the DataFrame and replays the FULL query —
    // parse/analyze/optimize/plan/execute — exactly what the DuckDB
    // baseline loop does per execution, so the totals compare like for
    // like. (A build-once/execute-twice variant measures ~10% faster via
    // plan reuse, but re-running a shared Dataset can also silently reuse
    // completed shuffle map stages between iterations — a result-cache
    // effect the baseline never gets, so it is not used here.)
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable =>
          if (!failed.contains(name)) failed += name
          None
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    // Millisecond precision keeps the whole line ~2.5 KB: harnesses that
    // keep only a bounded stdout tail must still see the line START (a
    // truncated JSON line parses as nothing). build.sbt also suppresses
    // sbt's trailing "[success]" line so this stays the LAST stdout line.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
