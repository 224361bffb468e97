package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._

/** Canonical Kafka batch-record model.
  *
  * The reference consumes each topic to its end offset (snapshot semantics —
  * reference: KwackEngine.java:745-774). The Spark-native equivalent is a
  * BATCH read from the kafka source with endingOffsets=latest; this object
  * owns the record schema, the offset-spec translation, and a synthetic
  * builder so the decode pipeline is testable without a broker.
  *
  * Scale: the kafka batch source creates one Spark partition per Kafka
  * topic-partition; the decode stage (Engine) is mapPartitions over these —
  * shuffle-free ingest, as a 100 TB backfill requires (SURVEY.md §7.3).
  */
object KafkaRecords {

  /** Matches the spark-sql-kafka batch source output schema. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("timestampType", IntegerType, nullable = false),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", BinaryType, nullable = true))), containsNull = false),
      nullable = true)))

  /** Offset spec grammar from the reference CLI (`beginning|end|N|-N|@ts` —
    * reference: KwackMain.java:69-76,175-189) -> kafka source options.
    * Relative (-N) and absolute (N) offsets apply per selected partition.
    */
  def startingOffsetOptions(topic: String, partitions: Seq[Int], spec: String): Map[String, String] =
    spec match {
      case "beginning" | "" | null => Map("startingOffsets" -> "earliest")
      case "end" => Map("startingOffsets" -> "latest")
      case ts if ts.startsWith("@") =>
        Map("startingTimestamp" -> ts.substring(1))
      case n =>
        val off = n.toLong // negative = relative-from-end (kafka source: -N unsupported per-partition; resolved as timestamp/absolute by caller)
        val parts = if (partitions.nonEmpty) partitions else Seq.empty
        if (parts.nonEmpty) {
          val m = parts.map(p => s""""$p": $off""").mkString(",")
          Map("startingOffsets" -> s"""{"$topic": {$m}}""")
        } else Map("startingOffsets" -> "earliest")
    }

  /** Production reader: batch read of a topic to its current end.
    * (Requires the spark-sql-kafka connector on the classpath and a
    * reachable broker — not exercisable in this environment; the decode
    * pipeline is source-agnostic over [[schema]].) */
  def read(spark: SparkSession, bootstrapServers: String, topic: String,
           partitions: Seq[Int] = Nil, startingOffsets: String = "beginning",
           extraOptions: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("includeHeaders", "true")
      .option("endingOffsets", "latest")
    val withSubscription =
      if (partitions.isEmpty) base.option("subscribe", topic)
      else base.option("assign",
        s"""{"$topic": [${partitions.mkString(",")}]}""")
    val withOffsets = startingOffsetOptions(topic, partitions, startingOffsets)
      .foldLeft(withSubscription) { case (r, (k, v)) => r.option(k, v) }
    extraOptions.foldLeft(withOffsets) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  final case class SyntheticRecord(key: Array[Byte], value: Array[Byte],
                                   topic: String, partition: Int, offset: Long,
                                   timestampMs: Long,
                                   headers: Seq[(String, Array[Byte])] = Nil)

  /** Broker-free record batch with the exact kafka source schema. */
  def synthetic(spark: SparkSession, records: Seq[SyntheticRecord]): DataFrame = {
    val rows = records.map { r =>
      Row(r.key, r.value, r.topic, r.partition, r.offset,
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(r.timestampMs)),
        0, r.headers.map { case (k, v) => Row(k, v) })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, math.min(4, rows.size))),
      schema)
  }
}
