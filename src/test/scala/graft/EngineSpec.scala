package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.serde.{Serde, WireFormat}
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord

/** End-to-end: synthetic Kafka records -> Engine.decodeTopic -> table layout
  * [rowkey, fields..., rowinfo] -> SQL -> JSON output. Mirrors the
  * reference's e2e test shape (reference: AbstractSchemaTest.java:11-62,
  * AvroKeyTest tombstone semantics at 260-275). */
class EngineSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val valueSchemaText =
    """{"type":"record","name":"V","fields":[
      |{"name":"id","type":"int"},
      |{"name":"name","type":"string"},
      |{"name":"u","type":["null","string","int"],"default":null}
      |]}""".stripMargin

  private def encode(schema: Schema, vals: Map[String, Any]): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    vals.foreach { case (k, v) => rec.put(k, v) }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("avro topic decodes to [rowkey, fields..., rowinfo]; tombstones skipped") {
    val engine = new Engine(spark)
    val topic = "test-avro"
    val schema = new Schema.Parser().parse(valueSchemaText)
    val id = engine.registry.register(s"$topic-value", "AVRO", schema.toString)

    def framed(vals: Map[String, Any]): Array[Byte] =
      WireFormat.frame(id, encode(schema, vals))

    val records = Seq(
      SyntheticRecord("k1".getBytes, framed(Map("id" -> 1, "name" -> "a", "u" -> "s1")),
        topic, 0, 0L, 1700000000000L, headers = Seq("h1" -> "v1".getBytes)),
      SyntheticRecord("k2".getBytes, framed(Map("id" -> 2, "name" -> "b", "u" -> 7)),
        topic, 0, 1L, 1700000001000L),
      SyntheticRecord("k1".getBytes, null, topic, 0, 2L, 1700000002000L)) // tombstone

    val spec = Engine.TopicSpec(topic, keySerde = Serde.StringSerde)
    val tables = engine.init(Seq(spec), _ => KafkaRecords.synthetic(spark, records))
    val df = tables(topic)

    df.columns.toSeq shouldBe Seq("rowkey", "id", "name", "u", "rowinfo")
    val rows = df.orderBy("rowinfo.off").collect()
    rows.length shouldBe 2 // tombstone skipped (append-only, reference KwackEngine.java:820-823)
    rows(0).getAs[String]("rowkey") shouldBe "k1"
    rows(0).getAs[Int]("id") shouldBe 1
    val info = rows(0).getAs[Row]("rowinfo")
    info.getAs[Int]("vsi") shouldBe id
    info.getAs[Int]("par") shouldBe 0
    info.getAs[Long]("off") shouldBe 0L
    info.getAs[Long]("ts") shouldBe 1700000000000L
    info.getAs[Map[String, String]]("hdr") shouldBe Map("h1" -> "v1")

    // SQL over the sanitized view (topic has '-')
    val n = engine.sql("SELECT count(*) AS n FROM test_avro WHERE id > 0").collect()(0).getLong(0)
    n shouldBe 2L

    // JSON output flattens the union to the active branch value
    val lines = engine.query("SELECT u FROM test_avro ORDER BY id").toSeq
    lines shouldBe Seq("""{"u":"s1"}""", """{"u":7}""")
    engine.close()
  }

  test("undecodable records are skipped, not fatal (KwackEngine.java:888-895)") {
    val engine = new Engine(spark)
    val topic = "poison"
    val schema = new Schema.Parser().parse(valueSchemaText)
    val id = engine.registry.register(s"$topic-value", "AVRO", schema.toString)
    val good = WireFormat.frame(id, encode(schema,
      Map("id" -> 1, "name" -> "ok", "u" -> null)))
    val corrupt = WireFormat.frame(id, Array[Byte](-1, -1, -1)) // truncated avro
    val records = Seq(
      SyntheticRecord(null, good, topic, 0, 0L, 1L),
      SyntheticRecord(null, corrupt, topic, 0, 1L, 2L))
    val tables = engine.init(Seq(Engine.TopicSpec(topic, rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark, records))
    val rows = tables(topic).collect()
    rows.length shouldBe 1
    rows(0).getAs[String]("name") shouldBe "ok"
    engine.close()
  }

  test("primitive serdes make single-column rowval tables") {
    val engine = new Engine(spark)
    val topic = "nums"
    val records = Seq(
      SyntheticRecord(null, java.nio.ByteBuffer.allocate(8).putLong(5L).array(),
        topic, 0, 0L, 1L),
      SyntheticRecord(null, java.nio.ByteBuffer.allocate(8).putLong(9L).array(),
        topic, 0, 1L, 2L))
    val spec = Engine.TopicSpec(topic, keySerde = Serde.BinarySerde,
      valueSerde = Serde.LongSerde, rowAttrs = Set.empty)
    val tables = engine.init(Seq(spec), _ => KafkaRecords.synthetic(spark, records))
    tables(topic).columns.toSeq shouldBe Seq("rowval")
    tables(topic).agg(org.apache.spark.sql.functions.sum("rowval"))
      .collect()(0).getLong(0) shouldBe 14L
    engine.close()
  }

  test("schemaless json serde keeps the raw document queryable (JsonNoSchemaTest)") {
    val engine = new Engine(spark)
    val topic = "raw-json"
    val records = Seq(
      SyntheticRecord(null, """{"a": 1, "b": "x"}""".getBytes, topic, 0, 0L, 1L))
    val spec = Engine.TopicSpec(topic, valueSerde = Serde.SchemalessJson,
      rowAttrs = Set.empty)
    engine.init(Seq(spec), _ => KafkaRecords.synthetic(spark, records))
    val v = engine.sql("SELECT get_json_object(rowval, '$.b') FROM raw_json")
      .collect()(0).getString(0)
    v shouldBe "x"
    engine.close()
  }

  test("top-level union value schema stays a single rowval column") {
    val engine = new Engine(spark)
    val topic = "union-val"
    val text = """["null","string","int"]"""
    val schema = new Schema.Parser().parse(text)
    val id = engine.registry.register(s"$topic-value", "AVRO", schema.toString)
    def enc(v: AnyRef): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val e = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[AnyRef](schema).write(v, e)
      e.flush(); out.toByteArray
    }
    val records = Seq(
      SyntheticRecord(null, WireFormat.frame(id, enc("hello")), topic, 0, 0L, 1L),
      SyntheticRecord(null, WireFormat.frame(id, enc(Int.box(5))), topic, 0, 1L, 2L))
    engine.init(Seq(Engine.TopicSpec(topic, rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark, records))
    engine.table(topic).columns.toSeq shouldBe Seq("rowval") // NOT tag/u1/u2 columns
    val lines = engine.query(s"SELECT rowval FROM union_val ORDER BY rowval.tag").toSeq
    lines shouldBe Seq("""{"rowval":"hello"}""", """{"rowval":5}""")
    engine.close()
  }

  test("the 'epo' row attribute is accepted as an always-NULL INT column " +
      "(documented delta: Spark's Kafka source hides leader epoch)") {
    val engine = new Engine(spark)
    val topic = "epo-topic"
    val records = Seq(SyntheticRecord(null,
      java.nio.ByteBuffer.allocate(4).putInt(1).array(), topic, 0, 0L, 1L))
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde,
      rowAttrs = Set("par", "epo"))), _ => KafkaRecords.synthetic(spark, records))
    val rows = spark.sql(s"SELECT rowinfo.par, rowinfo.epo FROM `$topic`")
      .collect()
    rows.length shouldBe 1
    rows(0).getInt(0) shouldBe 0
    rows(0).isNullAt(1) shouldBe true
    spark.sql(s"SELECT rowinfo.epo FROM `$topic`").schema("epo")
      .dataType.simpleString shouldBe "int"
    engine.close()
  }

  test("copyTo exports query results as parquet (COPY ... TO)") {
    val engine = new Engine(spark)
    val topic = "cp"
    val records = Seq(SyntheticRecord(null,
      java.nio.ByteBuffer.allocate(4).putInt(3).array(), topic, 0, 0L, 1L))
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde,
      rowAttrs = Set.empty)), _ => KafkaRecords.synthetic(spark, records))
    val dir = java.nio.file.Files.createTempDirectory("graft-copy").toString + "/out"
    engine.copyTo("SELECT * FROM cp", dir)
    spark.read.parquet(dir).collect()(0).getInt(0) shouldBe 3
    engine.close()
  }
}
