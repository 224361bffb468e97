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

  /** End-offset lookup: (bootstrapServers, topic) -> partition -> end offset.
    * Needed to resolve relative (`-N`) offsets and to enumerate partitions
    * for absolute offsets when no explicit partition list was given (the
    * kafka source's `startingOffsets` JSON must name every partition).
    * Injectable for tests; production default reflects kafka-clients'
    * KafkaConsumer, which ships with the spark-sql-kafka connector. */
  type EndOffsetLookup = (String, String) => Map[Int, Long]

  /** Reflection-based [[EndOffsetLookup]] over kafka-clients (not on this
    * build's classpath — the connector bundles it in real deployments).
    * Only invoked when an offset spec actually requires end offsets. */
  val consumerEndOffsets: EndOffsetLookup = (bootstrap, topic) => {
    val consumerCls =
      try Class.forName("org.apache.kafka.clients.consumer.KafkaConsumer")
      catch {
        case _: ClassNotFoundException => throw new IllegalStateException(
          "resolving this offset spec requires end-offset metadata, but " +
            "kafka-clients is not on the classpath (it is bundled with the " +
            "spark-sql-kafka connector); add the connector or pass an " +
            "explicit endOffsets lookup")
      }
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    val deser = "org.apache.kafka.common.serialization.ByteArrayDeserializer"
    props.put("key.deserializer", deser)
    props.put("value.deserializer", deser)
    val consumer = consumerCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    try {
      val infos = consumerCls.getMethod("partitionsFor", classOf[String])
        .invoke(consumer, topic).asInstanceOf[java.util.List[AnyRef]]
      val tpCls = Class.forName("org.apache.kafka.common.TopicPartition")
      val tpCtor = tpCls.getConstructor(classOf[String], classOf[Int])
      val tps = new java.util.ArrayList[AnyRef]()
      infos.forEach { pi =>
        val p = pi.getClass.getMethod("partition").invoke(pi)
          .asInstanceOf[Integer]
        tps.add(tpCtor.newInstance(topic, p).asInstanceOf[AnyRef])
      }
      val ends = consumerCls
        .getMethod("endOffsets", classOf[java.util.Collection[_]])
        .invoke(consumer, tps).asInstanceOf[java.util.Map[AnyRef, java.lang.Long]]
      val out = Map.newBuilder[Int, Long]
      ends.forEach { (tp, off) =>
        val p = tpCls.getMethod("partition").invoke(tp).asInstanceOf[Integer]
        out += (p.toInt -> off.toLong)
      }
      out.result()
    } finally consumerCls.getMethod("close").invoke(consumer)
  }

  /** Offset spec grammar from the reference CLI (`beginning|end|N|-N|@ts` —
    * reference: KwackMain.java:69-76,175-189) -> kafka source options.
    * Relative (-N) and absolute (N) offsets apply per selected partition;
    * `endOffsets` is consulted only for `-N` (needs per-partition ends) and
    * for absolute `N` with no explicit partition list (the source's JSON
    * grammar requires every partition be named). */
  def startingOffsetOptions(topic: String, partitions: Seq[Int], spec: String,
                            endOffsets: => Map[Int, Long]): Map[String, String] = {
    def offsetsJson(perPartition: Seq[(Int, Long)]): Map[String, String] = {
      val m = perPartition.sortBy(_._1)
        .map { case (p, o) => s""""$p": $o""" }.mkString(",")
      Map("startingOffsets" -> s"""{"$topic": {$m}}""")
    }
    spec match {
      case "beginning" | "" | null => Map("startingOffsets" -> "earliest")
      case "end" => Map("startingOffsets" -> "latest")
      case ts if ts.startsWith("@") =>
        Map("startingTimestamp" -> ts.substring(1))
      case n =>
        val off = n.toLong
        if (off >= 0) {
          val parts =
            if (partitions.nonEmpty) partitions else endOffsets.keys.toSeq
          offsetsJson(parts.map(_ -> off))
        } else {
          // relative-from-end: resolve against current end offsets, floored
          // at 0 (reference semantics: KafkaCacheConfig.Offset relative)
          val ends = endOffsets
          val parts = if (partitions.nonEmpty) partitions else ends.keys.toSeq
          offsetsJson(parts.map { p =>
            p -> math.max(0L, ends.getOrElse(p,
              throw new IllegalArgumentException(
                s"partition $p of topic '$topic' not found when resolving " +
                  s"relative offset $n")) + off)
          })
        }
    }
  }

  /** Full kafka source option map for a snapshot read — pure given an
    * [[EndOffsetLookup]], so the subscribe/assign + offset translation is
    * contract-testable without a broker. */
  def readOptions(bootstrapServers: String, topic: String,
                  partitions: Seq[Int] = Nil,
                  startingOffsets: String = "beginning",
                  extraOptions: Map[String, String] = Map.empty,
                  endOffsets: EndOffsetLookup = consumerEndOffsets): Map[String, String] = {
    val subscription =
      if (partitions.isEmpty) Map("subscribe" -> topic)
      else Map("assign" -> s"""{"$topic": [${partitions.mkString(",")}]}""")
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "includeHeaders" -> "true",
      "endingOffsets" -> "latest") ++
      subscription ++
      startingOffsetOptions(topic, partitions, startingOffsets,
        endOffsets(bootstrapServers, topic)) ++
      extraOptions
  }

  /** Production reader: batch read of a topic to its current end.
    * (Requires the spark-sql-kafka connector on the classpath and a
    * reachable broker — not exercisable in this environment; the decode
    * pipeline is source-agnostic over [[schema]].) */
  def read(spark: SparkSession, bootstrapServers: String, topic: String,
           partitions: Seq[Int] = Nil, startingOffsets: String = "beginning",
           extraOptions: Map[String, String] = Map.empty,
           endOffsets: EndOffsetLookup = consumerEndOffsets): DataFrame =
    readOptions(bootstrapServers, topic, partitions, startingOffsets,
      extraOptions, endOffsets)
      .foldLeft(spark.read.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
      .load()

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
