package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.serde.Serde
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord

/** Round-8 regression specs for the four round-7 ADVICE findings:
  * NULL-key upsert batches, seeded-sample aliasing of anonymous
  * subqueries, EXPORT DATABASE quoting for keyed tables, and the
  * opt-in strict mode for the always-NULL `epo` attribute. */
class AdviceR7FixSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("ON CONFLICT: NULL key components never conflict — a batch with " +
      "two NULL-key rows is accepted and both rows insert") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((Option(1L), "a")).toDF("k", "name").createOrReplaceTempView("nk_src")
    engine.sql("CREATE TABLE nk_t AS SELECT k, name FROM nk_src")
    // two NULL-key rows in ONE batch: not duplicates (SQL equality), and
    // neither conflicts with anything already in the table
    engine.sql("INSERT INTO nk_t VALUES (NULL, 'x'), (NULL, 'y') " +
      "ON CONFLICT (k) DO NOTHING").collect()(0).getLong(0) shouldBe 2L
    engine.sql("SELECT count(*) AS n FROM nk_t WHERE k IS NULL")
      .collect()(0).getLong(0) shouldBe 2L
    // NULL-key rows sail past DO UPDATE too (nothing to match)
    engine.sql("INSERT INTO nk_t VALUES (NULL, 'z') " +
      "ON CONFLICT (k) DO UPDATE SET name = excluded.name")
      .collect()(0).getLong(0) shouldBe 1L
    // non-NULL duplicates within a batch still fail loudly
    an[Exception] should be thrownBy engine.sql(
      "INSERT INTO nk_t VALUES (9, 'p'), (9, 'q') ON CONFLICT (k) DO NOTHING")
    engine.sql("DROP TABLE nk_t")
    engine.close()
  }

  test("seeded USING SAMPLE after an unaliased parenthesized subquery " +
      "synthesizes an alias instead of emitting malformed SQL") {
    import spark.implicits._
    val engine = new Engine(spark)
    (1 to 100).toDF("id").createOrReplaceTempView("samp_sub_t")
    val rows = engine.sql(
      "SELECT id FROM (SELECT id FROM samp_sub_t WHERE id > 50) " +
        "USING SAMPLE 10 ROWS REPEATABLE (7)").collect()
    rows.length shouldBe 10
    all(rows.map(_.getInt(0))) should be > 50
    // deterministic under the seed
    val again = engine.sql(
      "SELECT id FROM (SELECT id FROM samp_sub_t WHERE id > 50) " +
        "USING SAMPLE 10 ROWS REPEATABLE (7)").collect()
    again.map(_.getInt(0)).toSeq shouldBe rows.map(_.getInt(0)).toSeq
    engine.close()
  }

  test("EXPORT DATABASE quotes keyed-table column names so a PK table " +
      "with a spaced column round-trips through IMPORT") {
    val engine = new Engine(spark)
    engine.sql("CREATE TABLE exq_t (`order id` BIGINT PRIMARY KEY, " +
      "`text` VARCHAR)")
    engine.sql("INSERT INTO exq_t VALUES (1, 'alpha'), (2, 'beta')")
    val dir = java.nio.file.Files.createTempDirectory("graft-exq").toString
    engine.sql(s"EXPORT DATABASE '$dir'").collect()
    val schemaSql = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "schema.sql"))
    schemaSql should include("`order id`")
    engine.sql("DROP TABLE exq_t")
    engine.close()
    val engine2 = new Engine(spark)
    engine2.sql(s"IMPORT DATABASE '$dir'").collect()
    engine2.sql("SELECT `order id`, `text` FROM exq_t ORDER BY `order id`")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    // the PRIMARY KEY survived the round-trip: OR REPLACE works keyless
    engine2.sql("INSERT OR REPLACE INTO exq_t VALUES (2, 'BETA')")
    engine2.sql("SELECT `text` FROM exq_t WHERE `order id` = 2")
      .collect()(0).getString(0) shouldBe "BETA"
    engine2.sql("DROP TABLE exq_t")
    engine2.close()
  }

  test("spark.graft.epo.strict=true makes the 'epo' attribute fail loudly " +
      "at init; default stays the documented always-NULL relaxation") {
    val engine = new Engine(spark)
    val topic = "epo-strict-topic"
    val records = Seq(SyntheticRecord(null,
      java.nio.ByteBuffer.allocate(4).putInt(1).array(), topic, 0, 0L, 1L))
    spark.conf.set("spark.graft.epo.strict", "true")
    try {
      val ex = intercept[IllegalArgumentException] {
        engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde,
          rowAttrs = Set("par", "epo"))),
          _ => KafkaRecords.synthetic(spark, records))
      }
      ex.getMessage should include("leader epoch")
    } finally spark.conf.unset("spark.graft.epo.strict")
    // default (conf unset): accepted, NULL, and marked in schema metadata
    val engine2 = new Engine(spark)
    engine2.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde,
      rowAttrs = Set("par", "epo"))),
      _ => KafkaRecords.synthetic(spark, records))
    val rowinfo = engine2.table(topic).schema("rowinfo").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    rowinfo("epo").metadata.contains("graft.alwaysNull") shouldBe true
    spark.sql(s"SELECT rowinfo.epo FROM `$topic`").collect()(0)
      .isNullAt(0) shouldBe true
    engine2.close()
  }
}
