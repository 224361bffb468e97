package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 sixteenth-wave specs: q117 ordered funnel, q118 retention
  * cohorts, m27 fake-stereo detection. The oracle hash gates the values;
  * these pin the stage algebra, cohort tiling, and plant recovery. */
class NewOpsR9nSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("q117: funnel stages are monotonically shrinking and each stage is " +
      "bounded by a naive unordered recompute") {
    val rows = queries.Streaming.queries("q117_funnel")(spark, sfDir)
      .collect().sortBy(_.getAs[String]("stage"))
    rows.map(_.getAs[String]("stage")) shouldBe
      Array("0_all", "1_view", "2_click", "3_purchase")
    val n = rows.map(num(_, "n_users"))
    n(0) should be >= n(1)
    n(1) should be >= n(2)
    n(2) should be >= n(3)
    val e = spark.read.parquet(s"$sfDir/events.parquet")
    n(0) shouldBe e.select("user_id").distinct().count()
    n(1) shouldBe e.filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    // ordered stages can never exceed the unordered has-both bound
    n(2) should be <= e.filter(col("event_type").isin("view", "click"))
      .groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("k"))
      .filter(col("k") === 2).count()
    // the funnel genuinely converts on this corpus
    n(3) should be > 0L
  }

  test("q118: every cohort's week-0 row covers the full cohort and " +
      "retention never exceeds cohort size") {
    val rows = queries.Streaming.queries("q118_retention")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      num(r, "n_active") should be <= num(r, "cohort_size")
      num(r, "week_offset") should be >= 0L
      num(r, "retained_permille") shouldBe
        num(r, "n_active") * 1000 / num(r, "cohort_size")
    }
    // week 0 is full by construction: the signup event itself is activity
    // in the cohort week
    rows.filter(r => num(r, "week_offset") == 0L).foreach { r =>
      num(r, "n_active") shouldBe num(r, "cohort_size")
    }
  }

  test("m27: the sweep recovers exactly the planted fake-stereo clips " +
      "from real decoded WAV frames") {
    val rows = queries.Multimodal.queries("m27_fake_stereo")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val id = num(r, "doc_id")
      r.getAs[Boolean]("mono_dup") shouldBe (id % 6 == 1)
      num(r, "n_frames") shouldBe 500 + id % 250
      if (id % 6 == 1) num(r, "sum_absdiff") shouldBe 0L
      else {
        num(r, "sum_absdiff") should be > 0L
        // per-frame |L-R| is 13 except at the 2001-wrap where it is 1988
        Set(13L, 1988L) should contain(num(r, "max_absdiff"))
      }
    }
    rows.count(_.getAs[Boolean]("mono_dup")) should be > 0
  }
}
