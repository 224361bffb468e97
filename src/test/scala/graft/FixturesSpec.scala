package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.serde.{Serde, W, WireFormat}
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord

/** End-to-end parity with the reference's e2e fixtures (FIXTURES.md — the
  * exact schemas the reference tests feed through Kafka, with the same
  * expected outputs). */
class FixturesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def encode(schema: Schema, fill: GenericData.Record => Unit): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fill(rec)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  // FIXTURES.md #3 — Avro complex, all types (AvroTest.java:104-181)
  private val complexAvro =
    """{"namespace":"ns","type":"record","name":"ComplexFx","fields":[
      |{"name":"mynull","type":"null"},
      |{"name":"myboolean","type":"boolean"},
      |{"name":"myint","type":"int"},
      |{"name":"mylong","type":"long"},
      |{"name":"myfloat","type":"float"},
      |{"name":"mydouble","type":"double"},
      |{"name":"mybytes","type":"bytes"},
      |{"name":"mystring","type":"string"},
      |{"name":"myenum","type":{"type":"enum","name":"E","symbols":["ONE","TWO","THREE"]}},
      |{"name":"myarray","type":{"type":"array","items":"string"}},
      |{"name":"mymap","type":{"type":"map","values":"string"}},
      |{"name":"nullable_string","type":["null","string"],"default":null},
      |{"name":"myunion","type":["null","string","int"],"default":null},
      |{"name":"myfixed","type":{"type":"fixed","name":"F","size":4}},
      |{"name":"mydecimal","type":{"type":"bytes","logicalType":"decimal","precision":5,"scale":2}},
      |{"name":"myuuid","type":{"type":"string","logicalType":"uuid"}},
      |{"name":"mydate","type":{"type":"int","logicalType":"date"}},
      |{"name":"mytime","type":{"type":"int","logicalType":"time-millis"}},
      |{"name":"myts","type":{"type":"long","logicalType":"timestamp-millis"}}
      |]}""".stripMargin

  test("avro complex fixture: all types land with the reference's expected values") {
    val engine = new Engine(spark)
    val topic = "fx-avro-complex"
    val schema = new Schema.Parser().parse(complexAvro)
    val id = engine.registry.register(s"$topic-value", "AVRO", schema.toString)
    val payload = encode(schema, { rec =>
      rec.put("mynull", null)
      rec.put("myboolean", true)
      rec.put("myint", 1)
      rec.put("mylong", 2L)
      rec.put("myfloat", 3.0f)
      rec.put("mydouble", 4.0d)
      rec.put("mybytes", java.nio.ByteBuffer.wrap(Array[Byte](0, 1, 2)))
      rec.put("mystring", "testUser")
      rec.put("myenum", new GenericData.EnumSymbol(schema.getField("myenum").schema(), "ONE"))
      rec.put("myarray", java.util.List.of("hi", "there"))
      rec.put("mymap", java.util.Map.of("bye", "there"))
      rec.put("nullable_string", "zap")
      rec.put("myunion", 123)
      rec.put("myfixed", new GenericData.Fixed(
        schema.getField("myfixed").schema(), Array[Byte](0, 0, 0, 0)))
      rec.put("mydecimal", java.nio.ByteBuffer.wrap(
        java.math.BigDecimal.valueOf(12345, 2).unscaledValue().toByteArray))
      rec.put("myuuid", "d21998e8-8737-432e-a83c-13768dabd821")
      rec.put("mydate", 19723) // 2024-01-01
      rec.put("mytime", (8 * 3600 + 30 * 60 + 30) * 1000) // 08:30:30 in ms
      rec.put("myts", 1234567890000L) // 2009-02-13T23:31:30Z
    })
    engine.init(Seq(Engine.TopicSpec(topic, rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark,
        Seq(SyntheticRecord(null, WireFormat.frame(id, payload), topic, 0, 0L, 1L))))

    val json = engine.query(s"SELECT * FROM ${Engine.sanitize(topic)}").next()
    json should include(""""myboolean":true""")
    json should include(""""myint":1""")
    json should include(""""mybytes":"AAEC"""") // Base64, reference JSON output shape
    json should include(""""mystring":"testUser"""")
    json should include(""""myenum":"ONE"""")
    json should include(""""myarray":["hi","there"]""")
    json should include(""""mymap":{"bye":"there"}""")
    json should include(""""nullable_string":"zap"""")
    json should include(""""myunion":123""") // union flattened to active branch
    json should include(""""myfixed":"AAAAAA=="""")
    json should include(""""mydecimal":123.45""")
    json should include(""""myuuid":"d21998e8-8737-432e-a83c-13768dabd821"""")
    json should include(""""mydate":2024-01-01""".replace("2024-01-01", "\"2024-01-01\""))
    json should include(""""mytime":30630000000""") // micros-of-day
    engine.close()
  }

  // FIXTURES.md #5 — Avro key as rowkey (AvroKeyTest.java)
  test("avro key fixture: rowkey struct; null key / null value / tombstone semantics") {
    val engine = new Engine(spark)
    val topic = "fx-avro-key"
    val keySchema = new Schema.Parser().parse(
      """{"type":"record","name":"K","fields":[{"name":"k1","type":"int"}]}""")
    val valSchema = new Schema.Parser().parse(
      """{"type":"record","name":"V","fields":[{"name":"v1","type":"string"}]}""")
    val kid = engine.registry.register(s"$topic-key", "AVRO", keySchema.toString)
    val vid = engine.registry.register(s"$topic-value", "AVRO", valSchema.toString)
    def k(v: Int) = WireFormat.frame(kid, encode(keySchema, _.put("k1", v)))
    def v(s: String) = WireFormat.frame(vid, encode(valSchema, _.put("v1", s)))

    val records = Seq(
      SyntheticRecord(k(1), v("a"), topic, 0, 0L, 1L),
      SyntheticRecord(null, v("nokey"), topic, 0, 1L, 2L), // null key -> null rowkey
      SyntheticRecord(k(2), null, topic, 0, 2L, 3L), // tombstone: skipped
      SyntheticRecord(null, null, topic, 0, 3L, 4L)) // both null: skipped (struct value)
    engine.init(Seq(Engine.TopicSpec(topic, keySerde = Serde.Latest)),
      _ => KafkaRecords.synthetic(spark, records))

    val df = engine.table(topic)
    df.columns.toSeq shouldBe Seq("rowkey", "v1", "rowinfo")
    val rows = df.orderBy("rowinfo.off").collect()
    rows.length shouldBe 2 // tombstones stay out; earlier value remains queryable
    rows(0).getAs[Row]("rowkey").getInt(0) shouldBe 1
    rows(0).getAs[String]("v1") shouldBe "a"
    rows(1).isNullAt(0) shouldBe true
    rows(1).getAs[String]("v1") shouldBe "nokey"
    engine.close()
  }

  // FIXTURES.md #7 — Protobuf complex via external proto: serde, no SR,
  // raw unframed bytes (ProtobufNoSRTest.java:159-174)
  private val complexProto =
    """syntax = "proto3";
      |message Complex {
      |  optional string name = 1;
      |  string mystring = 2;
      |  bytes mybytes = 3;
      |  int32 myint = 4;
      |  uint32 myuint = 5;
      |  int64 mylong = 6;
      |  uint64 myulong = 7;
      |  float myfloat = 8;
      |  double mydouble = 9;
      |  bool myboolean = 10;
      |  Kind kind = 11;
      |  oneof myoneof { string myoneofstring = 12; int32 myoneofint = 13; }
      |  repeated string str_array = 14;
      |  repeated Data data_array = 15;
      |  map<string, Data> data_map = 16;
      |  confluent.type.Decimal decimal = 17 [(confluent.field_meta)={params:[
      |    {key:"precision",value:"5"},{key:"scale",value:"2"}]}];
      |  google.type.Date date = 18;
      |  google.type.TimeOfDay time = 19;
      |  google.protobuf.Timestamp timestamp = 20;
      |}
      |message Data { string data = 1; }
      |enum Kind { ZERO = 0; ONE = 1; TWO = 2; }
      |""".stripMargin

  test("protobuf complex fixture via external schema, raw bytes (no SR)") {
    val engine = new Engine(spark)
    val topic = "fx-proto-complex"
    val unscaled = java.math.BigDecimal.valueOf(12345, 2).unscaledValue().toByteArray
    val payload = new W()
      .str(2, "testUser")
      .int(4, 1)
      .int(5, 2) // uint32 -> 2L
      .int(6, 2L)
      .int(7, 3) // uint64 -> decimal(20,0) 3
      .float(8, 3.0f)
      .double(9, 4.0)
      .int(10, 1)
      .int(11, 1) // Kind.ONE
      .int(13, 5) // oneof int branch
      .str(14, "hi").str(14, "there")
      .msg(15, new W().str(1, "d1"))
      .msg(16, new W().str(1, "k").msg(2, new W().str(1, "dv")))
      .msg(17, new W().tag(1, 2).ld(unscaled).int(3, 2))
      .msg(18, new W().int(1, 2024).int(2, 1).int(3, 1))
      .msg(19, new W().int(1, 12).int(2, 30).int(3, 30))
      .msg(20, new W().int(1, 1234567890L))
      .bytes
    engine.init(Seq(Engine.TopicSpec(topic,
        valueSerde = Serde.parse("proto:" + complexProto.replace("\n", " ")),
        rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark,
        Seq(SyntheticRecord(null, payload, topic, 0, 0L, 1L))))

    val json = engine.query(s"SELECT * FROM ${Engine.sanitize(topic)}").next()
    json should include(""""name":null""") // optional absent
    json should include(""""mystring":"testUser"""")
    json should include(""""myuint":2""")
    json should include(""""myulong":3""")
    json should include(""""kind":"ONE"""")
    json should include(""""myoneof":5""") // flattened (ProtobufTest.java:103)
    json should include(""""str_array":["hi","there"]""")
    json should include(""""data_array":[{"data":"d1"}]""")
    json should include(""""data_map":{"k":{"data":"dv"}}""")
    json should include(""""decimal":123.45""")
    json should include(""""date":"2024-01-01"""")
    json should include(""""time":45030000000""") // 12:30:30 micros-of-day
    json should include("2009-02-13") // timestamp
    engine.close()
  }

  // FIXTURES.md #11 — reserved-word field names require quoted identifiers
  test("json fixture: reserved-word field names stay queryable") {
    val engine = new Engine(spark)
    graft.functions.GraftFunctions.register(spark)
    val topic = "fx-json-reserved"
    val schemaText =
      """{"type":"object","properties":{
        |  "badName":{"type":"object","properties":{
        |    "name":{"type":"string"},
        |    "group":{"type":"string"},
        |    "order":{"type":"integer"}}}}}""".stripMargin
    val doc = """{"badName":{"name":"n","group":"g","order":7}}"""
    engine.init(Seq(Engine.TopicSpec(topic,
        valueSerde = Serde.parse("json:" + schemaText.replace("\n", " ")),
        rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark,
        Seq(SyntheticRecord(null, doc.getBytes("UTF-8"), topic, 0, 0L, 1L))))
    val row = engine.sql(
      s"SELECT badName.`group` AS g, badName.`order` AS o FROM ${Engine.sanitize(topic)}")
      .collect()(0)
    row.getString(0) shouldBe "g"
    row.getLong(1) shouldBe 7L
    engine.close()
  }

  test("skip.bytes drops a leading payload prefix before parsing") {
    val engine = new Engine(spark)
    val topic = "fx-skip"
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"S","fields":[{"name":"x","type":"int"}]}""")
    val id = engine.registry.register(s"$topic-value", "AVRO", schema.toString)
    val framed = WireFormat.frame(id, encode(schema, _.put("x", 42)))
    val prefixed = Array[Byte](9, 9, 9) ++ framed // 3 junk bytes
    engine.init(Seq(Engine.TopicSpec(topic, rowAttrs = Set.empty, skipBytes = 3)),
      _ => KafkaRecords.synthetic(spark,
        Seq(SyntheticRecord(null, prefixed, topic, 0, 0L, 1L))))
    engine.table(topic).collect()(0).getInt(0) shouldBe 42
    engine.close()
  }

  test("numeric serde spec selects a specific registered schema id") {
    val engine = new Engine(spark)
    val topic = "fx-byid"
    val v1 = new Schema.Parser().parse(
      """{"type":"record","name":"B","fields":[{"name":"a","type":"int"}]}""")
    val v2 = new Schema.Parser().parse(
      """{"type":"record","name":"B","fields":[
        |{"name":"a","type":"int"},{"name":"b","type":"string","default":"x"}]}""".stripMargin)
    val id1 = engine.registry.register(s"$topic-value", "AVRO", v1.toString)
    engine.registry.register(s"$topic-value", "AVRO", v2.toString)
    val payload = WireFormat.frame(id1, encode(v1, _.put("a", 5)))
    // serde "<id1>" pins the OLD schema: table has only column a
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.parse(id1.toString),
        rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark, Seq(SyntheticRecord(null, payload, topic, 0, 0L, 1L))))
    engine.table(topic).columns.toSeq shouldBe Seq("a")
    engine.table(topic).collect()(0).getInt(0) shouldBe 5
    engine.close()
  }

  test("proto ;msg: attribute selects a non-first message") {
    val engine = new Engine(spark)
    val topic = "fx-proto-msg"
    val text = "syntax = \"proto3\"; message A { int32 x = 1; } message B { string y = 1; }"
    val payload = new W().str(1, "picked").bytes
    engine.init(Seq(Engine.TopicSpec(topic,
        valueSerde = Serde.parse(s"proto:$text;msg:B"), rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark,
        Seq(SyntheticRecord(null, payload, topic, 0, 0L, 1L))))
    engine.table(topic).columns.toSeq shouldBe Seq("y")
    engine.table(topic).collect()(0).getString(0) shouldBe "picked"
    engine.close()
  }

  // FIXTURES.md #2 — evolved schema with default through the ENGINE path
  test("avro evolution fixture: old records resolve new fields to defaults") {
    val engine = new Engine(spark)
    val topic = "fx-avro-evolved"
    val v1 = new Schema.Parser().parse(
      """{"namespace":"namespace","type":"record","name":"test","fields":[
        |{"name":"f1","type":"string"},{"name":"f2","type":"int"}]}""".stripMargin)
    val v2 = new Schema.Parser().parse(
      """{"namespace":"namespace","type":"record","name":"test","fields":[
        |{"name":"f1","type":"string"},{"name":"f2","type":"int"},
        |{"name":"f3","type":"string","default":"hithere"}]}""".stripMargin)
    val id1 = engine.registry.register(s"$topic-value", "AVRO", v1.toString)
    engine.registry.register(s"$topic-value", "AVRO", v2.toString)
    val payload = WireFormat.frame(id1, encode(v1, { r => r.put("f1", "hi"); r.put("f2", 123) }))
    engine.init(Seq(Engine.TopicSpec(topic, rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark, Seq(SyntheticRecord(null, payload, topic, 0, 0L, 1L))))
    val row = engine.table(topic).collect()(0)
    row.getString(0) shouldBe "hi"
    row.getInt(1) shouldBe 123
    row.getString(2) shouldBe "hithere" // default filled by reader resolution
    engine.close()
  }
}
