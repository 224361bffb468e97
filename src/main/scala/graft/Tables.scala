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

  /** Timestamp columns whose parquet encoding has varied across driver
    * testdata generations: TIMESTAMP(NANOS) (which Spark can only read as a
    * raw nanos long — no nanosecond timestamp type, SURVEY.md §7.3) in
    * earlier drops, TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ)
    * since. Both are normalized to TimestampType at load: nanos truncate to
    * micros exactly as DuckDB truncates them, and an NTZ micros value under
    * the suite-wide UTC session timezone converts losslessly — so oracle
    * comparisons agree under either encoding.
    */
  private val tsCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** Memoized per (dir, table): re-listing parquet files and re-deriving
    * the schema per query is pure overhead (the DataFrame is a lazy plan —
    * this caches the plan, not data). */
  private val loaded =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.getOrElseUpdate((dir, name), load0(spark, dir, name))

  private def load0(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    tsCols.get(name) match {
      case None => spark.read.parquet(path)
      case Some(cols) =>
        val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try {
          cols.foldLeft(spark.read.parquet(path)) { (df, c) =>
            df.schema(c).dataType match {
              case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS)
                df.withColumn(c, org.apache.spark.sql.functions
                  .expr(s"timestamp_micros($c div 1000)"))
              case _ => // TIMESTAMP(MICROS), read as TIMESTAMP_NTZ
                df.withColumn(c, org.apache.spark.sql.functions
                  .col(c).cast(org.apache.spark.sql.types.TimestampType))
            }
          }
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
          case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        }
    }
  }

  /** Register every table as a temp view named after the table. Idempotent. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
