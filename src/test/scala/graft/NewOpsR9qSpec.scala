package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 nineteenth-wave specs: q120 multi-touch attribution, s40
  * assignment-margin audit. The oracle hash gates the values; these pin
  * cents conservation and the margin/population algebra. */
class NewOpsR9qSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("q120: linear attribution conserves every attributed purchase's " +
      "cents exactly and last-touch totals the same book") {
    val rows = queries.Streaming.queries("q120_attribution")(spark, sfDir)
      .collect()
    rows.length should be > 0
    // both models distribute the SAME money: the set of purchases with at
    // least one touch; totals across channels must be equal
    rows.map(num(_, "last_touch_cents")).sum shouldBe
      rows.map(num(_, "linear_cents")).sum
    // independent recompute of the attributed book: purchases with >= 1
    // view/click touch in the 24h window
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("tsz", col("ts").cast("timestamp"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_millis(col("tsz")).as("pts"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val touch = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), unix_millis(col("tsz")).as("tts"))
    val attributed = purch.join(touch, Seq("user_id"))
      .filter(col("tts") <= col("pts") && col("tts") > col("pts") - 86400000L)
      .select(col("pid"), col("cents")).distinct()
    rows.map(num(_, "last_touch_cents")).sum shouldBe
      attributed.agg(sum(col("cents"))).collect()(0).getLong(0)
    // both channels genuinely receive credit
    rows.map(_.getAs[String]("channel")).sorted shouldBe
      Array("click", "view")
    rows.foreach(r => num(r, "n_touches") should be > 0L)
  }

  test("s40: margins tile the corpus, stay in [0, 1000), and the cell " +
      "split matches the trained assignment") {
    val rows = queries.Similarity.queries("s40_margin_audit")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    rows.map(num(_, "n_vectors")).sum shouldBe e.count()
    rows.foreach { r =>
      num(r, "n_unstable") should be <= num(r, "n_vectors")
      num(r, "unstable_permille") shouldBe
        num(r, "n_unstable") * 1000 / num(r, "n_vectors")
      num(r, "min_margin_permille") should be >= 0L
      num(r, "min_margin_permille") should be < 1000L
    }
  }
}
