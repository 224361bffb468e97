package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet corpus (TESTDATA.md).
  *
  * Mirrors the reference's "one relational table per topic" model
  * (reference: KwackEngine.java:587-648 creates one DuckDB table per Kafka
  * topic): here every parquet table becomes a DataFrame registered as a temp
  * view, so `spark.sql("SELECT * FROM lineitem JOIN orders ...")` works the
  * same way kwack's delegated DuckDB SQL does.
  *
  * Scale notes: reads go through the vectorized parquet reader; filters and
  * column pruning push down to the scan (Catalyst). At 100 TB the same code
  * path holds — `spark.read.parquet` over a partitioned directory tree; no
  * driver-side materialization happens here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after the table. Idempotent. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
