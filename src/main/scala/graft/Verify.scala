package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Gated-output lint: the driver's comparator sorts result frames
    * through pandas, which dies (`unhashable type`) on top-level
    * ARRAY/MAP/STRUCT columns BEFORE comparing anything — the query then
    * reads `err` in CORRECTNESS no matter how right its answer is
    * (r11 q130/q131). Every gated query must project scalar columns
    * (array_join/element/field projections); this check makes a nested
    * output fail fast at the local gate instead of shipping red. */
  def assertScalarOutput(name: String, df: DataFrame): Unit = {
    val nested = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
    if (nested.nonEmpty) throw new IllegalStateException(
      s"[verify-lint] $name emits top-level nested column(s) " +
        s"${nested.mkString("[", ", ", "]")} — the driver's pandas " +
        "comparator cannot hash these; project scalars " +
        "(array_join / struct-field / element_at) instead")
  }
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "30000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_OUTPUT_MERGED=false runs the whole dump in PRODUCTION
    // output mode (parallel range sorts at every presentation-sort site,
    // no 1-partition merges) — check.py's sorted-column hash is order-
    // insensitive, so the same oracle gate verifies both modes.
    sys.env.get("SPARK_GRAFT_OUTPUT_MERGED")
      .foreach(v => spark.conf.set("spark.graft.output.merged", v))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assertScalarOutput(name, df)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.streaming.StreamingOps.shutdownGates() // amortized suite-end teardown
    spark.stop()
  }
}
