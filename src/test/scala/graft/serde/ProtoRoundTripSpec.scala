package graft.serde

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.schema.{ProtoSchema, ProtoSchemaCompiler}

/** Round-trips hand-encoded protobuf wire bytes through the decoder.
  * Covers the reference's tested surface (reference: ProtobufTest.java:80-120
  * — scalars incl. uint32/uint64, oneof, repeated, map, enum, nested,
  * Timestamp/Date/TimeOfDay/Decimal well-known types). */
class ProtoRoundTripSpec extends AnyFunSuite with Matchers {

  private val schemaText =
    """syntax = "proto3";
      |package test;
      |import "google/protobuf/timestamp.proto";
      |message Complex {
      |  bool b = 1;
      |  int32 i = 2;
      |  int64 l = 3;
      |  uint32 u32 = 4;
      |  uint64 u64 = 5;
      |  sint32 si = 6;
      |  float f = 7;
      |  double d = 8;
      |  string s = 9;
      |  bytes by = 10;
      |  Kind kind = 11;
      |  repeated int32 nums = 12;
      |  map<string, int32> counts = 13;
      |  Nested nested = 14;
      |  oneof myoneof { string name = 15; int32 num = 16; }
      |  google.protobuf.Timestamp ts = 17;
      |  optional int32 maybe = 18;
      |}
      |message Nested { string label = 1; }
      |enum Kind { NONE = 0; FIRST = 1; }
      |""".stripMargin

  test("compiler maps messages like the reference type table") {
    val (dt, _) = ProtoDecoders.make(schemaText, Some("Complex"), 0)
    val st = dt.asInstanceOf[StructType]
    st("u32").dataType shouldBe LongType
    st("u64").dataType shouldBe DecimalType(20, 0) // uint64 stays exact (ProtobufTest.java:98)
    st("kind").dataType shouldBe StringType
    st("nums").dataType shouldBe ArrayType(IntegerType, containsNull = false)
    st("counts").dataType shouldBe MapType(StringType, IntegerType, valueContainsNull = false)
    st("nested").dataType shouldBe StructType(Seq(StructField("label", StringType, nullable = false)))
    val oneof = st("myoneof").dataType.asInstanceOf[StructType]
    oneof.fieldNames.toSeq shouldBe Seq("tag", "name", "num")
    st("ts").dataType shouldBe TimestampType
    st("maybe").nullable shouldBe true
  }

  test("wire bytes decode to aligned row values") {
    val (dt, decode) = ProtoDecoders.make(schemaText, Some("Complex"), 0)
    val st = dt.asInstanceOf[StructType]

    val w2 = new W()
    w2.int(1, 1) // bool true
    w2.tag(2, 0); w2.varint(-3L) // negative int32: 10-byte sign-extended varint
    w2.int(3, 1L << 40)
    w2.int(4, 0xffffffffL) // uint32 max
    w2.tag(5, 0); w2.varint(-1L) // uint64 max = 18446744073709551615
    w2.tag(6, 0); w2.varint((5 << 1) ^ 0) // sint32 5 zigzag = 10
    w2.float(7, 1.5f)
    w2.double(8, 2.25)
    w2.str(9, "hi")
    w2.tag(10, 2); w2.ld(Array[Byte](9, 8))
    w2.int(11, 1) // Kind.FIRST
    // packed repeated ints
    val packed = new W(); packed.varint(1); packed.varint(2); packed.varint(3)
    w2.tag(12, 2); w2.ld(packed.bytes)
    // map entry {key:"a", value:4}
    w2.msg(13, new W().str(1, "a").int(2, 4))
    // nested
    w2.msg(14, new W().str(1, "deep"))
    // oneof: num=5
    w2.int(16, 5)
    // timestamp
    w2.msg(17, new W().int(1, 1700000000L).int(2, 123456789L))

    val row = decode(w2.bytes).asInstanceOf[Row]
    row.getBoolean(st.fieldIndex("b")) shouldBe true
    row.getInt(st.fieldIndex("i")) shouldBe -3
    row.getLong(st.fieldIndex("l")) shouldBe (1L << 40)
    row.getLong(st.fieldIndex("u32")) shouldBe 0xffffffffL
    row.get(st.fieldIndex("u64")).asInstanceOf[java.math.BigDecimal] shouldBe new java.math.BigDecimal("18446744073709551615")
    row.getInt(st.fieldIndex("si")) shouldBe 5
    row.getFloat(st.fieldIndex("f")) shouldBe 1.5f
    row.getDouble(st.fieldIndex("d")) shouldBe 2.25
    row.getString(st.fieldIndex("s")) shouldBe "hi"
    row.get(st.fieldIndex("by")).asInstanceOf[Array[Byte]].toSeq shouldBe Seq[Byte](9, 8)
    row.getString(st.fieldIndex("kind")) shouldBe "FIRST"
    row.get(st.fieldIndex("nums")).asInstanceOf[Seq[Int]] shouldBe Seq(1, 2, 3)
    row.get(st.fieldIndex("counts")).asInstanceOf[Map[String, Int]] shouldBe Map("a" -> 4)
    row.get(st.fieldIndex("nested")).asInstanceOf[Row].getString(0) shouldBe "deep"
    val oneof = row.get(st.fieldIndex("myoneof")).asInstanceOf[Row]
    oneof.getString(0) shouldBe "num"
    oneof.get(2) shouldBe 5
    row.get(st.fieldIndex("ts")).asInstanceOf[java.time.Instant] shouldBe
      java.time.Instant.ofEpochSecond(1700000000L, 123456000L) // ns truncated to us
    row.isNullAt(st.fieldIndex("maybe")) shouldBe true
  }

  test("absent plain scalars decode to proto3 defaults; absent message to null") {
    val (dt, decode) = ProtoDecoders.make(schemaText, Some("Complex"), 0)
    val st = dt.asInstanceOf[StructType]
    val row = decode(Array.emptyByteArray).asInstanceOf[Row]
    row.getBoolean(st.fieldIndex("b")) shouldBe false
    row.getInt(st.fieldIndex("i")) shouldBe 0
    row.getString(st.fieldIndex("s")) shouldBe ""
    row.getString(st.fieldIndex("kind")) shouldBe "NONE"
    row.get(st.fieldIndex("nums")).asInstanceOf[Seq[Int]] shouldBe Seq.empty
    row.get(st.fieldIndex("counts")).asInstanceOf[Map[String, Int]] shouldBe Map.empty
    row.isNullAt(st.fieldIndex("nested")) shouldBe true
    row.isNullAt(st.fieldIndex("myoneof")) shouldBe true
    row.isNullAt(st.fieldIndex("ts")) shouldBe true
    row.isNullAt(st.fieldIndex("maybe")) shouldBe true
  }

  test("confluent Decimal / Date / TimeOfDay / wrapper well-known types") {
    val text =
      """syntax = "proto3";
        |message WK {
        |  confluent.type.Decimal dec = 1 [(confluent.field_meta) = {
        |    params: [{key: "precision", value: "8"}, {key: "scale", value: "2"}]}];
        |  google.type.Date dt = 2;
        |  google.type.TimeOfDay tod = 3;
        |  google.protobuf.Int32Value wrapped = 4;
        |}""".stripMargin
    val (dt, decode) = ProtoDecoders.make(text, None, 0)
    val st = dt.asInstanceOf[StructType]
    st("dec").dataType shouldBe DecimalType(8, 2)
    st("dt").dataType shouldBe DateType
    st("tod").dataType shouldBe LongType
    st("wrapped").dataType shouldBe IntegerType
    st("wrapped").nullable shouldBe true

    val unscaled = java.math.BigDecimal.valueOf(12345, 2).unscaledValue().toByteArray
    val w = new W()
      .msg(1, new W().tag(1, 2).ld(unscaled).int(3, 2))
      .msg(2, new W().int(1, 2024).int(2, 3).int(3, 15))
      .msg(3, new W().int(1, 13).int(2, 45).int(3, 30))
      .msg(4, new W().int(1, 77))
    val row = decode(w.bytes).asInstanceOf[Row]
    row.get(st.fieldIndex("dec")).asInstanceOf[java.math.BigDecimal] shouldBe java.math.BigDecimal.valueOf(12345, 2)
    row.get(st.fieldIndex("dt")).asInstanceOf[java.time.LocalDate] shouldBe java.time.LocalDate.of(2024, 3, 15)
    row.getLong(st.fieldIndex("tod")) shouldBe (13L * 3600 + 45 * 60 + 30) * 1000000L
    row.getInt(st.fieldIndex("wrapped")) shouldBe 77
  }

  test("oneof keeps the last occurrence in WIRE order, not declaration order") {
    val (_, decode) = ProtoDecoders.make(schemaText, Some("Complex"), 0)
    // write the later-declared field FIRST, then the earlier one: proto
    // semantics keep the last field seen on the wire (name, field 15)
    val w = new W()
    w.int(16, 5) // num
    w.str(15, "winner") // name — written last, wins
    val row = decode(w.bytes).asInstanceOf[Row]
    val oneof = row.get(14).asInstanceOf[Row]
    oneof.getString(0) shouldBe "name"
    oneof.getString(1) shouldBe "winner"
  }

  test("framed payload with message indexes decodes") {
    val (_, decode) = ProtoDecoders.make(schemaText, Some("Complex"), 0)
    val body = new W().str(9, "framed").bytes
    val framed = WireFormat.frame(42, body, messageIndexes = Seq(0))
    val row = decode(framed).asInstanceOf[Row]
    row.getString(8) shouldBe "framed"
  }

  test("recursive message is rejected like the reference") {
    val text = "syntax = \"proto3\"; message Node { Node next = 1; }"
    an[IllegalArgumentException] should be thrownBy
      ProtoSchemaCompiler.compile(ProtoSchema.parse(text), None)
  }
}
