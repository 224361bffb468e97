package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.sources.KafkaRecords.SyntheticRecord

/** In-memory Kafka broker MODEL (mirror of the reference's embedded-broker
  * harness shape, ClusterTestHarness.java:252-272, minus the sockets —
  * kafka-clients is not on this build's classpath, documented in SURVEY
  * §1.1): a partitioned offset-ordered log per topic, an end-offset lookup,
  * and an INTERPRETER of the spark-sql-kafka option map that serves
  * exactly the records a real broker batch read would. Because the serve
  * side parses the same `subscribe`/`assign`/`startingOffsets`/
  * `startingTimestamp` grammar the connector documents, a malformed or
  * mis-nested option produced by [[KafkaRecords.readOptions]] fails these
  * specs rather than only failing against a live cluster.
  */
object SimulatedBroker {
  final case class Log(records: Seq[SyntheticRecord]) {
    def partitions(topic: String): Seq[Int] =
      records.filter(_.topic == topic).map(_.partition).distinct.sorted
    /** endOffsets contract: last offset + 1 per partition. */
    def endOffsets(topic: String): Map[Int, Long] =
      records.filter(_.topic == topic).groupBy(_.partition)
        .map { case (p, rs) => p -> (rs.map(_.offset).max + 1) }
  }

  /** Interpret a kafka-source option map against the log — the simulated
    * `spark.read.format("kafka").options(opts).load()`. */
  def serve(spark: SparkSession, log: Log,
            opts: Map[String, String]): DataFrame = {
    require(opts.contains("kafka.bootstrap.servers"),
      "connector contract: kafka.bootstrap.servers is mandatory")
    val (topic, parts): (String, Seq[Int]) =
      (opts.get("subscribe"), opts.get("assign")) match {
        case (Some(t), None) => (t, log.partitions(t))
        case (None, Some(a)) =>
          // {"topic": [0,2]}
          val m = """\{\s*"([^"]+)"\s*:\s*\[([0-9,\s]*)\]\s*\}""".r
          a match {
            case m(t, ps) =>
              (t, ps.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
            case _ => throw new IllegalArgumentException(
              s"connector contract: malformed assign JSON '$a'")
          }
        case _ => throw new IllegalArgumentException(
          "connector contract: exactly one of subscribe/assign")
      }
    val visible = log.records
      .filter(r => r.topic == topic && parts.contains(r.partition))
    val fromStart: SyntheticRecord => Boolean =
      (opts.get("startingOffsets"), opts.get("startingTimestamp")) match {
        case (Some("earliest") | None, None) => _ => true
        case (Some("latest"), None) => _ => false
        case (Some(json), None) =>
          // {"topic": {"0": 5, "1": 0}} — EVERY selected partition must be
          // named (the documented connector requirement)
          val outer =
            s"""\\{\\s*"${java.util.regex.Pattern.quote(topic)}"\\s*:\\s*\\{(.*)\\}\\s*\\}""".r
          val body = json.trim match {
            case outer(b) => b
            case _ => throw new IllegalArgumentException(
              s"connector contract: startingOffsets JSON must nest under " +
                s"the topic name, got '$json'")
          }
          val perPart = """"(\d+)"\s*:\s*(-?\d+)""".r.findAllMatchIn(body)
            .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
          val missing = parts.toSet -- perPart.keySet
          require(missing.isEmpty, s"connector contract: startingOffsets " +
            s"JSON must name every selected partition; missing $missing")
          r => r.offset >= perPart(r.partition)
        case (None, Some(ts)) => r => r.timestampMs >= ts.toLong
        case _ => throw new IllegalArgumentException(
          "connector contract: startingOffsets and startingTimestamp are " +
            "mutually exclusive")
      }
    opts.get("endingOffsets").foreach(e => require(e == "latest",
      s"snapshot reads end at latest, got '$e'"))
    KafkaRecords.synthetic(spark, visible.filter(fromStart))
  }
}

class SimulatedBrokerSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val topic = "sim-topic"
  private def rec(p: Int, off: Long, v: Int,
                  hdrs: Seq[(String, Array[Byte])] = Nil,
                  tsMs: Long = 0L) =
    SyntheticRecord(null, java.nio.ByteBuffer.allocate(4).putInt(v).array(),
      topic, p, off, if (tsMs != 0) tsMs else 1700000000000L + off * 1000,
      hdrs)
  // 3 partitions x 10 offsets, values encode (partition*100 + offset)
  private val log = SimulatedBroker.Log(
    for (p <- 0 until 3; o <- 0L until 10L) yield rec(p, o, p * 100 + o.toInt))

  private def served(partitions: Seq[Int], starting: String): Seq[(Int, Long)] = {
    val opts = KafkaRecords.readOptions("sim:9092", topic, partitions,
      starting, endOffsets = (_, t) => log.endOffsets(t))
    SimulatedBroker.serve(spark, log, opts).collect()
      .map(r => (r.getInt(3), r.getLong(4))).sorted.toSeq
  }

  test("offset grammar 'beginning' serves the full log on all partitions") {
    served(Nil, "beginning") shouldBe
      (for (p <- 0 until 3; o <- 0L until 10L) yield (p, o)).sorted
  }

  test("offset grammar 'end' serves nothing (snapshot is already at end)") {
    served(Nil, "end") shouldBe Seq.empty
  }

  test("absolute offset N starts every selected partition at N") {
    served(Nil, "7") shouldBe
      (for (p <- 0 until 3; o <- 7L until 10L) yield (p, o)).sorted
  }

  test("relative offset -N resolves per-partition against end offsets") {
    served(Nil, "-3") shouldBe
      (for (p <- 0 until 3; o <- 7L until 10L) yield (p, o)).sorted
  }

  test("@ts starts at the record-timestamp watermark") {
    // record ts = 1700000000000 + off*1000; @...5000 → offsets >= 5
    served(Nil, "@" + (1700000000000L + 5000L)) shouldBe
      (for (p <- 0 until 3; o <- 5L until 10L) yield (p, o)).sorted
  }

  test("partition subset translates to assign JSON and filters the log") {
    served(Seq(0, 2), "beginning") shouldBe
      (for (p <- Seq(0, 2); o <- 0L until 10L) yield (p, o)).sorted
    // subset + relative offset: only the named partitions, each from end-2
    served(Seq(2), "-2") shouldBe Seq((2, 8L), (2, 9L))
  }

  test("relative offset deeper than a partition's log floors at 0") {
    val opts = KafkaRecords.readOptions("sim:9092", topic, Nil, "-100",
      endOffsets = (_, t) => log.endOffsets(t))
    SimulatedBroker.serve(spark, log, opts).count() shouldBe 30L
  }

  test("end-to-end: Engine.init over the simulated broker — offsets, " +
      "headers, tombstones, sync()") {
    import graft.{Engine, Tables}
    import graft.serde.Serde
    val t2 = "sim-e2e"
    var live = (0L until 6L).map { o =>
      SyntheticRecord(
        java.nio.ByteBuffer.allocate(4).putInt(o.toInt).array(),
        if (o == 3) null // tombstone
        else java.nio.ByteBuffer.allocate(4).putInt(o.toInt * 10).array(),
        t2, (o % 2).toInt, o / 2, 1700000000000L + o,
        Seq("src" -> s"h$o".getBytes("UTF-8")))
    }
    val engine = new Engine(spark)
    def source(spec: Engine.TopicSpec): DataFrame = {
      val lg = SimulatedBroker.Log(live)
      SimulatedBroker.serve(spark, lg, KafkaRecords.readOptions(
        "sim:9092", spec.topic, Nil, "beginning",
        endOffsets = (_, tt) => lg.endOffsets(tt)))
    }
    engine.init(Seq(Engine.TopicSpec(t2, keySerde = Serde.IntSerde,
      valueSerde = Serde.IntSerde,
      rowAttrs = Set("rowkey", "par", "off", "hdr"))), source)
    val rows = spark.sql(
      s"SELECT rowkey, rowval, rowinfo.par, rowinfo.off, rowinfo.hdr['src'] " +
        s"FROM `$t2` ORDER BY rowkey").collect()
    // 6 records, 1 tombstone skipped (append-only semantics)
    rows.length shouldBe 5
    rows.map(_.getInt(0)).toSeq shouldBe Seq(0, 1, 2, 4, 5)
    rows.map(_.getInt(1)).toSeq shouldBe Seq(0, 10, 20, 40, 50)
    rows.map(_.getString(4)).toSeq shouldBe
      Seq("h0", "h1", "h2", "h4", "h5")
    // produce two more records, sync() must pick up ONLY the delta
    live = live ++ Seq(
      SyntheticRecord(java.nio.ByteBuffer.allocate(4).putInt(6).array(),
        java.nio.ByteBuffer.allocate(4).putInt(60).array(),
        t2, 0, 3L, 1700000000006L, Nil),
      SyntheticRecord(java.nio.ByteBuffer.allocate(4).putInt(7).array(),
        java.nio.ByteBuffer.allocate(4).putInt(70).array(),
        t2, 1, 3L, 1700000000007L, Nil))
    engine.sync { spec =>
      // production sync shape: per-partition startingOffsets JSON built
      // from the engine's saved end offsets, interpreted by the broker
      val lg = SimulatedBroker.Log(live)
      val ends = engine.endOffsets(spec.topic)
      val body = ends.toSeq.sortBy(_._1)
        .map { case (p, o) => s""""$p": $o""" }.mkString(",")
      SimulatedBroker.serve(spark, lg, Map(
        "kafka.bootstrap.servers" -> "sim:9092",
        "subscribe" -> spec.topic,
        "startingOffsets" -> s"""{"${spec.topic}": {$body}}""",
        "endingOffsets" -> "latest"))
    }
    spark.sql(s"SELECT count(*) FROM `$t2`").collect()(0).getLong(0) shouldBe 7
    engine.close()
  }
}
