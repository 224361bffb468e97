ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kwackspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forward sbt's stdin to the forked process so the Main REPL is usable
// through `sbt run` (it reads lines via JLine over System.in).
run / connectInput := true
// Pass the forked process's stdout straight through (no "[info] " prefix)
// so harnesses that parse Bench/Verify JSON lines from stdout see raw JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop sbt's trailing "[success] Total time: ..." line: harnesses that keep
// a bounded tail of stdout and parse the last JSON line must see Bench's
// output line last (both prior rounds' bench JSON failed to parse because
// the line start fell outside the tail window).
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 207-query suite: persisted index frames + codegen classes + per-query
  // shuffle buffers need headroom — 20g forced GC churn that inflated
  // unrelated queries mid-suite (observed 10x on d08/x12); the host has
  // 128 GB, so size the single local[32] JVM like the executor fleet it
  // stands in for.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // The 326-query suite JIT-compiles ~3.4k generated (janino) classes per
  // run; at the JVM's default 240 MB reserved code cache the sweeper's
  // cold-method FLUSHING silently evicts compiled loops that sit idle
  // while the other ~300 queries run, so a heavy query's timed pass can
  // re-enter interpreted/C1 code 10-20x slower than its steady state
  // (r13 measured d34's ~30 core-second intersect pass ballooning to
  // ~650 core-seconds on exactly the runs where flushing hit it — same
  // bytes, zero new codegen compiles, all cores busy). Size the cache so
  // the whole suite's compiled code stays resident.
  "-XX:ReservedCodeCacheSize=1g",
) ++ (if (sys.env.contains("SPARK_GRAFT_GCLOG"))
  Seq("-Xlog:gc*:file=/tmp/graft_gc.log:time,uptime") else Seq.empty) ++
  // ad-hoc conf experiments: SPARK_GRAFT_XOPTS="-Dspark.foo=bar -Dspark.baz=qux"
  sys.env.getOrElse("SPARK_GRAFT_XOPTS", "").split(" ").filter(_.nonEmpty).toSeq
