package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QueryHelpers.Q
import graft.queries.{Dedup, EngineSurface, Multimodal, Pipeline, Relational, RelationalExt, RelationalMore, RelationalStats, Similarity, Streaming, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 surfaces here as a named
  * query (Spark DataFrame plan) paired with ANSI SQL the driver runs in
  * DuckDB on the same parquet tables for a hash-match.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Relational.queries, Relational.oracleSql),
    (RelationalExt.queries, RelationalExt.oracleSql),
    (RelationalMore.queries, RelationalMore.oracleSql),
    (RelationalStats.queries, RelationalStats.oracleSql),
    (TextOps.queries, TextOps.oracleSql),
    (Dedup.queries, Dedup.oracleSql),
    (Similarity.queries, Similarity.oracleSql),
    (Multimodal.queries, Multimodal.oracleSql),
    (Streaming.queries, Streaming.oracleSql),
    (EngineSurface.queries, EngineSurface.oracleSql),
    (Pipeline.queries, Pipeline.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
