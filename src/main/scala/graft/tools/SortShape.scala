package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness: global orderBy (range exchange + sampling pass) vs
  * repartition(1) + sortWithinPartitions (single shuffle, no sampling) for
  * the final PRESENTATION sort of a query — same total order, different
  * physical shape. Measures both on representative query tails. */
object SortShape {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "30000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def body(s: SparkSession): DataFrame = {
      val d = graft.Tables.load(s, sfDir, "documents")
      d.select(col("doc_id"),
        size(split(col("text"), " +")).as("ws_tokens"),
        length(col("text")).as("n_chars_measured"))
    }
    def agg(s: SparkSession): DataFrame = {
      val l = graft.Tables.load(s, sfDir, "lineitem")
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    }

    def time(label: String, reps: Int)(f: => Long): Unit = {
      (1 to 3).foreach(_ => f)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6 / reps}%7.1f ms")
    }

    time("map orderBy", 10) { body(spark).orderBy(col("doc_id")).count() }
    time("map rep1+sortWithin", 10) {
      body(spark).repartition(1).sortWithinPartitions(col("doc_id")).count()
    }
    time("map no-sort", 10) { body(spark).count() }
    time("agg orderBy", 10) { agg(spark).orderBy(col("l_returnflag"), col("l_linestatus")).count() }
    time("agg rep1+sortWithin", 10) {
      agg(spark).repartition(1).sortWithinPartitions(col("l_returnflag"), col("l_linestatus")).count()
    }
    time("agg no-sort", 10) { agg(spark).count() }
    spark.stop()
  }
}
