package graft.schema

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Engine, TestSpark}
import graft.serde.{Serde, W, WireFormat}
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord

/** HTTP Schema Registry client against an in-process stub server speaking
  * the Confluent v1 REST protocol (reference consumes the same protocol via
  * the client library: KwackEngine.java:409-430). Zero egress — the stub
  * binds 127.0.0.1. */
class HttpSchemaRegistrySpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private var stub: RegistryStubServer = _

  override def beforeAll(): Unit = { stub = new RegistryStubServer }
  override def afterAll(): Unit = if (stub != null) stub.stop()

  private def client = new HttpSchemaRegistry(stub.url)

  private val avroText =
    """{"type":"record","name":"V","fields":[
      |{"name":"id","type":"int"},{"name":"name","type":"string"}]}""".stripMargin
  private val protoText =
    """syntax = "proto3"; message P { string label = 1; int64 qty = 2; }"""
  private val jsonText =
    """{"type":"object","properties":{"x":{"type":"integer"},"s":{"type":"string"}}}"""

  test("register + getById + getLatest round-trip all three schema types") {
    val reg = client
    val avroId = reg.register("t-avro-value", "AVRO", avroText)
    val protoId = reg.register("t-proto-value", "PROTOBUF", protoText)
    val jsonId = reg.register("t-json-value", "JSON", jsonText)
    Set(avroId, protoId, jsonId).size shouldBe 3

    // absent schemaType on the wire must read back as AVRO
    val avro = reg.getById(avroId).get
    avro.schemaType shouldBe "AVRO"
    avro.schemaText shouldBe avroText
    avro.subject shouldBe "t-avro-value"

    reg.getById(protoId).get.schemaType shouldBe "PROTOBUF"
    reg.getById(jsonId).get.schemaType shouldBe "JSON"

    val latest = reg.getLatest("t-proto-value").get
    latest.id shouldBe protoId
    latest.version shouldBe 1
    latest.schemaText shouldBe protoText
  }

  test("register is idempotent per (subject, text) and versions advance") {
    val reg = client
    val id1 = reg.register("t-evolve-value", "AVRO", avroText)
    reg.register("t-evolve-value", "AVRO", avroText) shouldBe id1
    val evolved = avroText.replace(""""name":"V"""", """"name":"V2"""")
    val id2 = reg.register("t-evolve-value", "AVRO", evolved)
    id2 should not be id1
    reg.getLatest("t-evolve-value").get.version shouldBe 2
    reg.getLatest("t-evolve-value").get.id shouldBe id2
  }

  test("unknown subject/id resolve to None; dead URL fails over") {
    val reg = new HttpSchemaRegistry(Seq("http://127.0.0.1:1", stub.url))
    reg.getLatest("no-such-subject") shouldBe None
    reg.getById(999999) shouldBe None
    // failover actually reached the live stub
    stub.requestLog.exists(_.contains("no-such-subject")) shouldBe true
  }

  test("getById is memoized (second lookup serves from cache)") {
    val reg = client
    val id = reg.register("t-memo-value", "AVRO", avroText)
    reg.getById(id).get.schemaText shouldBe avroText
    val before = stub.requestLog.size
    reg.getById(id).get.schemaText shouldBe avroText
    stub.requestLog.size shouldBe before
  }

  test("client survives java serialization (executor shipping)") {
    val reg = client
    val id = reg.register("t-ser-value", "AVRO", avroText)
    val bos = new ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(reg); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[HttpSchemaRegistry]
    back.getById(id).get.schemaText shouldBe avroText
  }

  test("e2e: Engine ingests framed Avro + Proto records with Serde.Latest resolved over HTTP") {
    val reg = client
    val engine = new Engine(spark, reg)

    // --- avro topic: schema registered via HTTP by a "producer" ---
    val avroTopic = "http-avro"
    val schema = new Schema.Parser().parse(avroText)
    val avroId = reg.register(s"$avroTopic-value", "AVRO", avroText)
    def avroBytes(id: Int, name: String): Array[Byte] = {
      val rec = new GenericData.Record(schema)
      rec.put("id", id); rec.put("name", name)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
      enc.flush()
      WireFormat.frame(avroId, out.toByteArray)
    }

    // --- proto topic ---
    val protoTopic = "http-proto"
    val protoId = reg.register(s"$protoTopic-value", "PROTOBUF", protoText)
    def protoBytes(label: String, qty: Long): Array[Byte] =
      WireFormat.frame(protoId, new W().str(1, label).int(2, qty).bytes, Seq(0))

    val avroRecs = Seq(
      SyntheticRecord("a".getBytes, avroBytes(1, "one"), avroTopic, 0, 0L, 1700000000000L),
      SyntheticRecord("b".getBytes, avroBytes(2, "two"), avroTopic, 0, 1L, 1700000001000L))
    val protoRecs = Seq(
      SyntheticRecord("c".getBytes, protoBytes("x", 10L), protoTopic, 0, 0L, 1700000002000L))

    val specs = Seq(
      Engine.TopicSpec(avroTopic, keySerde = Serde.StringSerde, valueSerde = Serde.Latest),
      Engine.TopicSpec(protoTopic, keySerde = Serde.StringSerde, valueSerde = Serde.Latest))
    val bySrc = Map(avroTopic -> avroRecs, protoTopic -> protoRecs)
    val tables = engine.init(specs, s => KafkaRecords.synthetic(spark, bySrc(s.topic)))

    val avroRows = tables(avroTopic).selectExpr("id", "name").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    avroRows.toSeq shouldBe Seq((1, "one"), (2, "two"))

    val protoRows = tables(protoTopic).selectExpr("label", "qty").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    protoRows.toSeq shouldBe Seq(("x", 10L))
  }

  test("e2e: Serde.ById resolves a pinned schema id over HTTP") {
    val reg = client
    val engine = new Engine(spark, reg)
    val topic = "http-json"
    val id = reg.register(s"$topic-value", "JSON", jsonText)
    val payload = WireFormat.frame(id, """{"x":7,"s":"hi"}""".getBytes("UTF-8"))
    val recs = Seq(SyntheticRecord("k".getBytes, payload, topic, 0, 0L, 1700000003000L))
    val tables = engine.init(
      Seq(Engine.TopicSpec(topic, keySerde = Serde.StringSerde, valueSerde = Serde.ById(id))),
      _ => KafkaRecords.synthetic(spark, recs))
    val row = tables(topic).selectExpr("s", "x").collect().head
    (row.getString(0), row.getLong(1)) shouldBe ("hi", 7L)
  }
}
