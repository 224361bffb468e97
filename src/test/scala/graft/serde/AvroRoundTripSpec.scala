package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.AvroDecoders
import graft.schema.{AvroSchemaCompiler, InMemorySchemaRegistry}

class AvroRoundTripSpec extends AnyFunSuite with Matchers {

  private def encode(schema: Schema, rec: GenericData.Record): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private val complexText =
    """{"type":"record","name":"Complex","fields":[
      |{"name":"b","type":"boolean"},
      |{"name":"i","type":"int"},
      |{"name":"l","type":"long"},
      |{"name":"f","type":"float"},
      |{"name":"d","type":"double"},
      |{"name":"s","type":"string"},
      |{"name":"by","type":"bytes"},
      |{"name":"e","type":{"type":"enum","name":"E","symbols":["A","B"]}},
      |{"name":"arr","type":{"type":"array","items":"int"}},
      |{"name":"m","type":{"type":"map","values":"string"}},
      |{"name":"opt","type":["null","string"],"default":null},
      |{"name":"u","type":["null","string","int"]},
      |{"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":5,"scale":2}},
      |{"name":"dt","type":{"type":"int","logicalType":"date"}},
      |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}
      |]}""".stripMargin

  test("compiler maps the complex record like the reference type table") {
    val schema = new Schema.Parser().parse(complexText)
    val st = AvroSchemaCompiler.compile(schema).dataType.asInstanceOf[StructType]
    st("i").dataType shouldBe IntegerType
    st("by").dataType shouldBe BinaryType
    st("e").dataType shouldBe StringType
    st("e").metadata.getStringArray(AvroSchemaCompiler.EnumSymbols) shouldBe Array("A", "B")
    st("arr").dataType shouldBe ArrayType(IntegerType, containsNull = false)
    st("m").dataType shouldBe MapType(StringType, StringType, valueContainsNull = false)
    st("opt").dataType shouldBe StringType
    st("opt").nullable shouldBe true
    // multi-branch union -> tagged struct (SURVEY §7.3)
    val u = st("u").dataType.asInstanceOf[StructType]
    u.fieldNames.toSeq shouldBe Seq("tag", "u1", "u2")
    st("u").nullable shouldBe true
    st("dec").dataType shouldBe DecimalType(5, 2)
    st("dt").dataType shouldBe DateType
    st("ts").dataType shouldBe TimestampType
  }

  test("wire-framed record decodes to aligned row values") {
    val schema = new Schema.Parser().parse(complexText)
    val compiled = AvroSchemaCompiler.compile(schema)
    val st = compiled.dataType.asInstanceOf[StructType]
    val reg = new InMemorySchemaRegistry
    val id = reg.register("t-value", "AVRO", schema.toString)

    val rec = new GenericData.Record(schema)
    rec.put("b", true); rec.put("i", -42); rec.put("l", 1L << 40)
    rec.put("f", 1.5f); rec.put("d", 2.25); rec.put("s", "hi")
    rec.put("by", java.nio.ByteBuffer.wrap(Array[Byte](1, 2)))
    rec.put("e", new GenericData.EnumSymbol(schema.getField("e").schema(), "B"))
    rec.put("arr", java.util.Arrays.asList(1, 2, 3))
    rec.put("m", java.util.Map.of("k", "v"))
    rec.put("opt", null)
    rec.put("u", 7) // int branch (index 2 in the union)
    rec.put("dec", java.nio.ByteBuffer.wrap(java.math.BigDecimal.valueOf(12345, 2).unscaledValue().toByteArray))
    rec.put("dt", 19000)
    rec.put("ts", 1700000000123L)

    val framed = WireFormat.frame(id, encode(schema, rec))
    val decode = AvroDecoders.make(schema.toString, st, reg, 0)
    val row = decode(framed).asInstanceOf[Row]

    row.getBoolean(st.fieldIndex("b")) shouldBe true
    row.getInt(st.fieldIndex("i")) shouldBe -42
    row.getLong(st.fieldIndex("l")) shouldBe (1L << 40)
    row.getString(st.fieldIndex("s")) shouldBe "hi"
    row.get(st.fieldIndex("by")).asInstanceOf[Array[Byte]].toSeq shouldBe Seq[Byte](1, 2)
    row.getString(st.fieldIndex("e")) shouldBe "B"
    row.get(st.fieldIndex("arr")).asInstanceOf[Seq[Int]] shouldBe Seq(1, 2, 3)
    row.get(st.fieldIndex("m")).asInstanceOf[Map[String, String]] shouldBe Map("k" -> "v")
    row.isNullAt(st.fieldIndex("opt")) shouldBe true
    val u = row.get(st.fieldIndex("u")).asInstanceOf[Row]
    u.getString(0) shouldBe "u2"
    u.get(2) shouldBe 7
    row.get(st.fieldIndex("dec")).asInstanceOf[java.math.BigDecimal] shouldBe java.math.BigDecimal.valueOf(12345, 2)
    row.get(st.fieldIndex("dt")).asInstanceOf[java.time.LocalDate] shouldBe java.time.LocalDate.ofEpochDay(19000)
    row.get(st.fieldIndex("ts")).asInstanceOf[java.time.Instant] shouldBe java.time.Instant.ofEpochMilli(1700000000123L)
  }

  test("schema evolution: old writer projects onto latest reader with defaults") {
    val writerText = """{"type":"record","name":"R","fields":[{"name":"a","type":"int"}]}"""
    val readerText = """{"type":"record","name":"R","fields":[
      |{"name":"a","type":"int"},{"name":"extra","type":"string","default":"dflt"}]}""".stripMargin
    val writer = new Schema.Parser().parse(writerText)
    val reader = new Schema.Parser().parse(readerText)
    val reg = new InMemorySchemaRegistry
    val writerId = reg.register("t-value", "AVRO", writer.toString)
    reg.register("t-value", "AVRO", reader.toString)

    val rec = new GenericData.Record(writer)
    rec.put("a", 9)
    val framed = WireFormat.frame(writerId, encode(writer, rec))
    val st = AvroSchemaCompiler.compile(reader).dataType.asInstanceOf[StructType]
    val row = AvroDecoders.make(reader.toString, st, reg, 0)(framed).asInstanceOf[Row]
    row.getInt(0) shouldBe 9
    row.getString(1) shouldBe "dflt"
  }

  test("raw (unframed) avro payload decodes via the reader schema") {
    val text = """{"type":"record","name":"R","fields":[{"name":"a","type":"int"}]}"""
    val schema = new Schema.Parser().parse(text)
    val st = AvroSchemaCompiler.compile(schema).dataType.asInstanceOf[StructType]
    val reg = new InMemorySchemaRegistry
    val rec = new GenericData.Record(schema)
    rec.put("a", 11)
    val raw = encode(schema, rec) // NO wire frame
    val row = AvroDecoders.make(schema.toString, st, reg, 0)(raw).asInstanceOf[Row]
    row.getInt(0) shouldBe 11
  }

  test("nullable record branch with a 'tag'-named first field is NOT union-collapsed") {
    val text =
      """{"type":"record","name":"Outer","fields":[
        |{"name":"link","type":["null",{"type":"record","name":"Link","fields":[
        |  {"name":"tag","type":"string"},{"name":"url","type":"string"}]}],"default":null}
        |]}""".stripMargin
    val schema = new Schema.Parser().parse(text)
    val st = AvroSchemaCompiler.compile(schema).dataType.asInstanceOf[StructType]
    val reg = new InMemorySchemaRegistry
    val id = reg.register("t-value", "AVRO", schema.toString)
    val rec = new GenericData.Record(schema)
    val link = new GenericData.Record(schema.getField("link").schema().getTypes.get(1))
    link.put("tag", "sale"); link.put("url", "http://x")
    rec.put("link", link)
    val framed = WireFormat.frame(id, encode(schema, rec))
    val row = AvroDecoders.make(schema.toString, st, reg, 0)(framed).asInstanceOf[Row]
    val l = row.get(0).asInstanceOf[Row]
    l.getString(0) shouldBe "sale" // real values survive, not Row("u1", null)
    l.getString(1) shouldBe "http://x"
  }

  test("recursive record schema is rejected like the reference") {
    val rec = """{"type":"record","name":"Node","fields":[
      |{"name":"next","type":["null","Node"]}]}""".stripMargin
    val schema = new Schema.Parser().parse(rec)
    an[IllegalArgumentException] should be thrownBy AvroSchemaCompiler.compile(schema)
  }
}
