package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract test for the kafka source option translation — pins every
  * offset-spec form the reference CLI accepts (`beginning|end|N|-N|@ts`,
  * reference: KwackMain.java:69-76,175-189) and the subscribe-vs-assign
  * choice, against the exact option maps the spark-sql-kafka batch source
  * expects. No broker needed: the end-offset lookup is injected. */
class KafkaRecordsSpec extends AnyFunSuite with Matchers {

  private val ends = Map(0 -> 100L, 1 -> 50L, 2 -> 7L)
  private val lookup: KafkaRecords.EndOffsetLookup = (_, _) => ends
  private val boom: KafkaRecords.EndOffsetLookup =
    (_, _) => fail("end-offset lookup must not be consulted for this spec")

  private def opts(partitions: Seq[Int], spec: String,
                   lk: KafkaRecords.EndOffsetLookup = lookup) =
    KafkaRecords.readOptions("broker:9092", "t", partitions, spec, Map.empty, lk)

  test("base options: bootstrap, headers, snapshot end") {
    val o = opts(Nil, "beginning", boom)
    o("kafka.bootstrap.servers") shouldBe "broker:9092"
    o("includeHeaders") shouldBe "true"
    o("endingOffsets") shouldBe "latest"
  }

  test("no partition list -> subscribe; explicit list -> assign JSON") {
    opts(Nil, "beginning", boom)("subscribe") shouldBe "t"
    opts(Nil, "beginning", boom) should not contain key("assign")
    val a = opts(Seq(0, 2), "beginning", boom)
    a("assign") shouldBe """{"t": [0,2]}"""
    a should not contain key("subscribe")
  }

  test("beginning / empty / null -> earliest (no lookup)") {
    opts(Nil, "beginning", boom)("startingOffsets") shouldBe "earliest"
    opts(Nil, "", boom)("startingOffsets") shouldBe "earliest"
    opts(Nil, null, boom)("startingOffsets") shouldBe "earliest"
  }

  test("end -> latest (no lookup)") {
    opts(Nil, "end", boom)("startingOffsets") shouldBe "latest"
  }

  test("@ts -> startingTimestamp (no lookup)") {
    val o = opts(Nil, "@1700000000000", boom)
    o("startingTimestamp") shouldBe "1700000000000"
    o should not contain key("startingOffsets")
  }

  test("absolute N with explicit partitions -> per-partition JSON, no lookup") {
    opts(Seq(2, 0), "5", boom)("startingOffsets") shouldBe
      """{"t": {"0": 5,"2": 5}}"""
  }

  test("absolute N without partitions enumerates them via end offsets") {
    opts(Nil, "5")("startingOffsets") shouldBe
      """{"t": {"0": 5,"1": 5,"2": 5}}"""
  }

  test("relative -N resolves end minus N per partition, floored at 0") {
    // ends: 0->100, 1->50, 2->7; -10 => 90, 40, 0
    opts(Nil, "-10")("startingOffsets") shouldBe
      """{"t": {"0": 90,"1": 40,"2": 0}}"""
  }

  test("relative -N with a partition subset resolves only those partitions") {
    opts(Seq(1), "-10")("startingOffsets") shouldBe """{"t": {"1": 40}}"""
  }

  test("relative -N against an unknown partition fails loudly") {
    val e = intercept[IllegalArgumentException] {
      opts(Seq(9), "-10")
    }
    e.getMessage should include("partition 9")
  }

  test("default lookup without kafka-clients on classpath fails with guidance") {
    val e = intercept[IllegalStateException] {
      KafkaRecords.consumerEndOffsets("broker:9092", "t")
    }
    e.getMessage should include("kafka-clients")
  }

  test("extra options pass through and can override") {
    val o = KafkaRecords.readOptions("b:9092", "t", Nil, "beginning",
      Map("kafka.fetch.max.bytes" -> "1048576", "endingOffsets" -> "latest"),
      boom)
    o("kafka.fetch.max.bytes") shouldBe "1048576"
  }
}
