package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 fourteenth-wave specs: q116 watermark-planning audit, p10 corpus
  * snapshot diff, m26 aspect-ratio bucketing. The oracle hash gates the
  * values; these pin the semantics each report must satisfy. */
class NewOpsR9lSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("q116: lateness is monotone in the watermark delay and the audit " +
      "covers every event") {
    val rows = queries.Streaming.queries("q116_watermark_audit")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    rows.map(num(_, "n_events")).sum shouldBe total
    rows.foreach { r =>
      // a longer allowed delay can only drop FEWER events
      num(r, "late10_permille") should be >= num(r, "late30_permille")
      num(r, "late30_permille") should be >= num(r, "late60_permille")
      num(r, "late60_permille") should be >= num(r, "late120_permille")
      // transport lag is synthesized in [0, 120s); an event can only be
      // later than the watermark by less than the max lag, so a 120s
      // delay drops nothing
      num(r, "late120_permille") shouldBe 0L
      num(r, "max_lag_ms") should be < 120000L
    }
    // the audit genuinely bites at the tightest delay on this corpus
    rows.map(num(_, "late10_permille")).sum should be > 0L
  }

  test("p10: the diff statuses partition both snapshots and recover the " +
      "planted version predicates exactly") {
    val rows = queries.Pipeline.queries("p10_snapshot_diff")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def cnt(pred: org.apache.spark.sql.Column): Long = d.filter(pred).count()
    val added = cnt(col("doc_id") % 10 === 6 && col("doc_id") % 13 =!= 5)
    val removed = cnt(col("doc_id") % 13 === 5 && col("doc_id") % 10 =!= 6)
    val changed = cnt(col("doc_id") % 10 =!= 6 && col("doc_id") % 13 =!= 5 &&
      col("doc_id") % 17 === 3)
    val unchanged = cnt(col("doc_id") % 10 =!= 6 && col("doc_id") % 13 =!= 5 &&
      col("doc_id") % 17 =!= 3)
    rows.map(num(_, "n_added")).sum shouldBe added
    rows.map(num(_, "n_removed")).sum shouldBe removed
    rows.map(num(_, "n_changed")).sum shouldBe changed
    rows.map(num(_, "n_unchanged")).sum shouldBe unchanged
    // every changed doc gained exactly 2 tokens (' v2 edited'); removed
    // docs subtract their full mass, added docs add theirs — the net
    // delta reconciles against an independent recompute
    val tok = org.apache.spark.sql.functions
      .size(split(col("text"), " ")).cast("long")
    val addedTok = d.filter(col("doc_id") % 10 === 6 &&
      col("doc_id") % 13 =!= 5).agg(sum(tok)).collect()(0).getLong(0)
    val removedTok = d.filter(col("doc_id") % 13 === 5 &&
      col("doc_id") % 10 =!= 6).agg(sum(tok)).collect()(0).getLong(0)
    // added docs that also carry the %17 edit enter v2 with the 2 extra
    // tokens too
    val addedEdited = cnt(col("doc_id") % 10 === 6 &&
      col("doc_id") % 13 =!= 5 && col("doc_id") % 17 === 3)
    rows.map(num(_, "net_token_delta")).sum shouldBe
      addedTok - removedTok + 2 * (changed + addedEdited)
  }

  test("m26: every image routes to exactly one bucket and the batching " +
      "algebra is self-consistent") {
    val rows = queries.Multimodal.queries("m26_aspect_buckets")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val nImages = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") <= 100).count()
    rows.map(num(_, "n_images")).sum shouldBe nImages
    rows.foreach { r =>
      val n = num(r, "n_images")
      num(r, "n_batches") shouldBe n / 4
      num(r, "fill_permille") shouldBe (n / 4) * 4 * 1000 / n
      num(r, "total_px") should be > 0L
    }
    // the fixture's dim spread genuinely uses multiple buckets
    rows.length should be > 1
  }
}
