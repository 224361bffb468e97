package graft.serde

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.schema.JsonSchemaCompiler

/** JSON-Schema compile + decode coverage mirroring the reference's tested
  * surface (reference: JsonSchemaTest.java — oneOf nullable flattening,
  * enum, $ref structs, arrays/maps of objects, allOf subtypes, recursive
  * rejection; JsonNoSchemaTest for schemaless). */
class JsonRoundTripSpec extends AnyFunSuite with Matchers {

  private val schemaText =
    """{
      |  "type": "object",
      |  "required": ["name"],
      |  "properties": {
      |    "name": {"type": "string"},
      |    "count": {"type": "integer"},
      |    "ratio": {"type": "number"},
      |    "flag": {"type": "boolean"},
      |    "kind": {"enum": ["red", "green"]},
      |    "maybe": {"oneOf": [{"type": "null"}, {"type": "string"}]},
      |    "either": {"oneOf": [{"type": "string"}, {"type": "integer"}]},
      |    "tags": {"type": "array", "items": {"type": "string"}},
      |    "attrs": {"type": "object", "additionalProperties": {"type": "integer"}},
      |    "child": {"$ref": "#/definitions/Child"}
      |  },
      |  "definitions": {
      |    "Child": {"type": "object", "properties": {"x": {"type": "integer"}}}
      |  }
      |}""".stripMargin

  test("compiler maps like the reference (integer->BIGINT, number->DOUBLE)") {
    val st = JsonSchemaCompiler.compile(schemaText).dataType.asInstanceOf[StructType]
    st("name").dataType shouldBe StringType
    st("name").nullable shouldBe false
    st("count").dataType shouldBe LongType
    st("count").nullable shouldBe true
    st("ratio").dataType shouldBe DoubleType
    st("flag").dataType shouldBe BooleanType
    st("kind").dataType shouldBe StringType
    st("maybe").dataType shouldBe StringType // nullable oneOf flattens
    st("maybe").nullable shouldBe true
    val u = st("either").dataType.asInstanceOf[StructType]
    u.fieldNames.toSeq shouldBe Seq("tag", "u0", "u1")
    st("tags").dataType shouldBe ArrayType(StringType, containsNull = false)
    st("attrs").dataType shouldBe MapType(StringType, LongType, valueContainsNull = false)
    st("child").dataType shouldBe StructType(Seq(StructField("x", LongType, nullable = true)))
  }

  test("document decodes with oneOf branch dispatch by validation") {
    val dt = JsonSchemaCompiler.compile(schemaText).dataType
    val decode = JsonValueReader.make(schemaText, dt, 0, Map.empty)
    val doc =
      """{"name":"a","count":3,"ratio":0.5,"flag":true,"kind":"red",
        |"maybe":"x","either":7,"tags":["t1","t2"],"attrs":{"k":9},
        |"child":{"x":1}}""".stripMargin
    val row = decode(null, doc.getBytes("UTF-8")).asInstanceOf[Row]
    val st = dt.asInstanceOf[StructType]
    row.getString(st.fieldIndex("name")) shouldBe "a"
    row.getLong(st.fieldIndex("count")) shouldBe 3L
    row.getDouble(st.fieldIndex("ratio")) shouldBe 0.5
    row.getBoolean(st.fieldIndex("flag")) shouldBe true
    row.getString(st.fieldIndex("kind")) shouldBe "red"
    row.getString(st.fieldIndex("maybe")) shouldBe "x"
    val u = row.get(st.fieldIndex("either")).asInstanceOf[Row]
    u.getString(0) shouldBe "u1" // integer branch validated
    u.get(2) shouldBe 7L
    row.get(st.fieldIndex("tags")).asInstanceOf[Seq[String]] shouldBe Seq("t1", "t2")
    row.get(st.fieldIndex("attrs")).asInstanceOf[Map[String, Long]] shouldBe Map("k" -> 9L)
    row.get(st.fieldIndex("child")).asInstanceOf[Row].getLong(0) shouldBe 1L
  }

  test("tag: key field copies into the value document (reference KwackEngine.java:491-499)") {
    val simple = """{"type":"object","properties":{
      |"id":{"type":"integer"},"v":{"type":"string"}}}""".stripMargin
    val dt = JsonSchemaCompiler.compile(simple).dataType
    val decode = JsonValueReader.make(simple, dt, 0, Map("k" -> "id"))
    val row = decode("""{"k":42}""".getBytes, """{"v":"hello"}""".getBytes)
      .asInstanceOf[Row]
    row.getLong(0) shouldBe 42L
    row.getString(1) shouldBe "hello"
  }

  test("allOf merges properties with required-union nullability") {
    val text =
      """{"allOf": [
        |  {"type":"object","properties":{"a":{"type":"string"}},"required":["a"]},
        |  {"type":"object","properties":{"b":{"type":"integer"}}}
        |]}""".stripMargin
    val st = JsonSchemaCompiler.compile(text).dataType.asInstanceOf[StructType]
    st.fieldNames.toSeq shouldBe Seq("a", "b")
    st("a").nullable shouldBe false
    st("b").nullable shouldBe true
  }

  test("array-form type flattens to nullable scalar; multi-type becomes a union") {
    val text =
      """{"type":"object","properties":{
        |"n":{"type":["integer","null"]},
        |"mixed":{"type":["string","integer"]}}}""".stripMargin
    val st = JsonSchemaCompiler.compile(text).dataType.asInstanceOf[StructType]
    st("n").dataType shouldBe LongType
    st("n").nullable shouldBe true
    val u = st("mixed").dataType.asInstanceOf[StructType]
    u.fieldNames.toSeq shouldBe Seq("tag", "u0", "u1")
    val decode = JsonValueReader.make(text, JsonSchemaCompiler.compile(text).dataType, 0, Map.empty)
    val row = decode(null, """{"n":7,"mixed":5}""".getBytes).asInstanceOf[Row]
    row.getLong(0) shouldBe 7L
    val mixed = row.get(1).asInstanceOf[Row]
    mixed.getString(0) shouldBe "u1"
    mixed.get(2) shouldBe 5L
  }

  test("a plain object that LOOKS like the union convention is not treated as one") {
    val text =
      """{"type":"object","properties":{
        |"s":{"type":"object","properties":{
        |  "tag":{"type":"string"},"u1":{"type":"integer"},"u2":{"type":"string"}}}}}""".stripMargin
    val dt = JsonSchemaCompiler.compile(text).dataType
    val decode = JsonValueReader.make(text, dt, 0, Map.empty)
    val row = decode(null, """{"s":{"tag":"sale","u1":3,"u2":"x"}}""".getBytes)
      .asInstanceOf[Row]
    val s = row.get(0).asInstanceOf[Row]
    s.getString(0) shouldBe "sale" // real field values survive
    s.getLong(1) shouldBe 3L
    s.getString(2) shouldBe "x"
  }

  test("recursive $ref is rejected like the reference (JsonSchemaTest.java:153-162)") {
    val text =
      """{"type":"object","properties":{
        |"next":{"$ref":"#/definitions/Self"}},
        |"definitions":{"Self":{"type":"object","properties":{
        |  "next":{"$ref":"#/definitions/Self"}}}}}""".stripMargin
    an[IllegalArgumentException] should be thrownBy JsonSchemaCompiler.compile(text)
  }
}
