package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 wave-8 invariants: x56 code-switching segmentation, q127
  * ALTER COLUMN TYPE. */
class NewOpsR10hSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val langStop: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "it", "a"),
    "es" -> Seq("el", "los", "y", "que", "una", "por", "con"),
    "fr" -> Seq("le", "les", "et", "que", "une", "pour", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"))
  private val markers =
    Seq("und der nicht", "the and of", "el los una", "les pour dans",
      "shi wo ta")

  test("x56 chunk languages, switch counts, and dominant shares replay " +
      "exactly from a plain-Scala scorer over every document") {
    val rows = SparkEntry.queries("x56_code_switching")(spark, sf).collect()
    rows.length shouldBe 500
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val ws = docs(id).split(" ", -1)
      val langs = (0 until (ws.length + 9) / 10).map { i =>
        val base = ws.slice(i * 10, i * 10 + 10).mkString(" ")
        val chunk =
          if ((id * 7 + i) % 4 == 0)
            base + " " + markers(((id + i) % 5).toInt)
          else base
        val toks = chunk.split(" +").toSet
        // argmax by (score, lang) — ties to the LATER lang name
        langStop.map { case (l, sw) => (sw.count(toks.contains), l) }.max._2
      }
      withClue(s"doc $id") {
        r.getLong(1) shouldBe langs.length.toLong
        r.getLong(2) shouldBe
          langs.sliding(2).count(p => p.length == 2 && p(0) != p(1)).toLong
        val dom = langs.groupBy(identity).view.mapValues(_.size).toSeq
          .map { case (l, c) => (c, l) }.max
        r.getString(3) shouldBe dom._2
        r.getLong(4) shouldBe dom._1 * 1000L / langs.length
      }
    }
    // planted switching really occurs somewhere
    rows.map(_.getLong(2)).sum should be > 0L
  }

  test("ALTER COLUMN TYPE: default USING is a plain cast, FK members " +
      "refuse the retype, and a CHECK-breaking retype fails atomically") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE par (pk BIGINT PRIMARY KEY)")
      e.sql("INSERT INTO par VALUES (1)")
      e.sql("CREATE OR REPLACE TABLE att (id BIGINT, " +
        "pk BIGINT REFERENCES par, v DOUBLE CHECK (v >= 0), s VARCHAR)")
      e.sql("INSERT INTO att VALUES (1, 1, 1.9, '42')")
      // default USING: plain cast of the old value
      e.sql("ALTER TABLE att ALTER COLUMN s TYPE BIGINT")
      e.sql("SELECT s FROM att").collect()(0).getLong(0) shouldBe 42L
      // USING re-derivation
      e.sql("ALTER TABLE att ALTER v SET DATA TYPE BIGINT " +
        "USING CAST(FLOOR(v) AS BIGINT)")
      e.sql("SELECT v FROM att").collect()(0).getLong(0) shouldBe 1L
      // FK member (child side) refuses
      intercept[Exception](
        e.sql("ALTER TABLE att ALTER COLUMN pk TYPE INT"))
        .getMessage should include("FOREIGN KEY")
      // FK referenced (parent side) refuses
      intercept[Exception](
        e.sql("ALTER TABLE par ALTER COLUMN pk TYPE INT"))
        .getMessage should include("FOREIGN KEY")
      // a retype whose USING breaks the CHECK fails loudly, atomically
      intercept[Exception](
        e.sql("ALTER TABLE att ALTER v TYPE BIGINT USING v - 100"))
        .getMessage should include("CHECK")
      e.sql("SELECT v FROM att").collect()(0).getLong(0) shouldBe 1L
      // unknown column errors
      intercept[Exception](
        e.sql("ALTER TABLE att ALTER COLUMN nope TYPE INT"))
        .getMessage should include("no column")
    } finally e.close()
  }
}
