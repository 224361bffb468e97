package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden tests for the JSON-lines projection (A15 — reference:
  * KwackEngine.java:274-302): binary Base64, union flattening, nesting,
  * escaping, decimals, and non-finite floats. Every emitted line must be
  * valid JSON (round-tripped through a strict parser here). */
class JsonOutputSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def line(schema: StructType, row: Row): String =
    JsonOutput.rowToJson(row, schema)

  test("scalars, nulls, decimals, and escaping") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType),
      StructField("d", DecimalType(12, 2)), StructField("n", StringType),
      StructField("b", BooleanType)))
    val out = line(schema, Row(7, "a\"b\n\t", new java.math.BigDecimal("12.30"), null, true))
    out shouldBe """{"i":7,"s":"a\"b\n\t","d":12.30,"n":null,"b":true}"""
  }

  test("binary encodes as Base64 (reference Blob handling)") {
    val schema = StructType(Seq(StructField("raw", BinaryType)))
    val out = line(schema, Row(Array[Byte](1, 2, 3, -1)))
    out shouldBe """{"raw":"AQID/w=="}"""
  }

  test("union-tagged struct collapses to the active branch value") {
    val u = StructType(Seq(
      StructField("tag", StringType),
      StructField("u1", StringType), StructField("u2", IntegerType)))
    val schema = StructType(Seq(StructField("v", u)))
    line(schema, Row(Row("u2", null, 5))) shouldBe """{"v":5}"""
    line(schema, Row(Row("u1", "x", null))) shouldBe """{"v":"x"}"""
  }

  test("nested struct / array / map") {
    val inner = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val schema = StructType(Seq(
      StructField("st", inner),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, LongType))))
    val out = line(schema,
      Row(Row(1, "x"), Seq(1, 2, 3), Map("k" -> 9L)))
    out shouldBe """{"st":{"a":1,"b":"x"},"arr":[1,2,3],"m":{"k":9}}"""
  }

  test("non-finite doubles are quoted (valid JSON, Jackson-style)") {
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType),
      StructField("z", DoubleType)))
    val out = line(schema, Row(Double.NaN, Double.PositiveInfinity, 1.5))
    out shouldBe """{"x":"NaN","y":"Infinity","z":1.5}"""
    // must parse as strict JSON
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(out).get("z").asDouble() shouldBe 1.5
  }

  test("engine query path emits one valid JSON object per row") {
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    val engine = new Engine(spark)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val ls = engine.query("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey").toSeq
    ls should have size 5
    ls.foreach { l => mapper.readTree(l).get("r_name").isTextual shouldBe true }
  }
}
