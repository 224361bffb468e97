package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 fifth-wave specs: p07 dual-sink streaming quality gate
  * (dead-letter pattern), m20 cross-format exact media dedup. The oracle
  * hash gates the values; these pin the dual-sink accounting identity
  * (accept + quarantine covers every ingested doc exactly once across TWO
  * physical sinks) and the cross-format decode equivalence the m20 pairs
  * certify. */
class NewOpsR9eSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("p07: accept + per-reason quarantine counts partition every " +
      "ingested doc across the two sinks") {
    val out = queries.Pipeline.queries("p07_dlq_gate")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    rows.foreach { r =>
      num(r, "n_docs") shouldBe
        num(r, "n_accept") + num(r, "n_short") + num(r, "n_few") +
          num(r, "n_stop") + num(r, "n_punct") + num(r, "n_wlen")
    }
    // coverage across BOTH sinks: nothing dropped, nothing duplicated by
    // the micro-batch splits (4 staged files, 2 per trigger)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    rows.map(num(_, "n_docs")).sum shouldBe d.count()
    // the gate must actually reject something AND accept something at this
    // sf, or the dual-sink path isn't exercised
    rows.map(num(_, "n_accept")).sum should be > 0L
    (rows.map(num(_, "n_docs")).sum - rows.map(num(_, "n_accept")).sum) should
      be > 0L
  }

  test("m21: clean clips report zero clipping; planted twins recover the " +
      "exact plateau arithmetic from the decoded containers") {
    val out = queries.Multimodal.queries("m21_audio_clipping")(spark, sfDir)
    val rows = out.collect()
    val (twins, clean) = rows.partition(r => num(r, "doc_id") >= 3000L)
    clean.length should be > 0
    twins.length should be > 0
    clean.foreach { r =>
      num(r, "n_clipped") shouldBe 0L
      num(r, "max_run") shouldBe 0L
      num(r, "clipped_permille") shouldBe 0L
    }
    twins.foreach { r =>
      val id = num(r, "doc_id") - 3000L
      val L = id % 5 + 2
      val n = num(r, "n_samples")
      n shouldBe 500L + id % 250
      num(r, "max_run") shouldBe L
      num(r, "n_clipped") shouldBe (n / 50) * L + math.min(L, n % 50)
      num(r, "clipped_permille") shouldBe num(r, "n_clipped") * 1000 / n
    }
  }

  test("m20: every pair is cross-format, twin-keyed, and dimensioned by " +
      "the fixture contract — certifying BMP/PNG decoders agree on pixels") {
    val out = queries.Multimodal.queries("m20_crossformat_dedup")(spark, sfDir)
    val rows = out.collect()
    // planted twins: doc_id <= 100, doc_id % 3 == 0 — count them from data
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val expected = d.filter(col("doc_id") <= 100 && col("doc_id") % 3 === 0)
      .count()
    rows.length shouldBe expected.toInt
    rows.foreach { r =>
      num(r, "dup_id") shouldBe num(r, "canonical_id") + 2000L
      // the engine derived formats from the DECODED containers — a pair
      // surviving with equal formats would mean the twin planting failed
      r.getAs[String]("fmt_canonical") should not be r.getAs[String]("fmt_dup")
      Set("bmp", "png") should contain(r.getAs[String]("fmt_canonical"))
      val id = num(r, "canonical_id")
      num(r, "width") shouldBe 8 + id % 56
      num(r, "height") shouldBe 8 + (id * 7) % 40
    }
  }
}
