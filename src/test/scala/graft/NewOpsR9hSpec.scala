package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 tenth-wave specs: m23 thumbnail (2x2 average-pool + round-trip),
  * x49 Zipf power-law fit, s35 index compaction. The oracle hash gates the
  * values; these pin the physical invariants — the pooled mass matches an
  * independent replay of the pixel contract, the fit is a genuine Zipf
  * shape, and the compaction accounting tiles the corpus. */
class NewOpsR9hSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("m23: pooled dims follow the fixture geometry, every thumbnail " +
      "round-trips losslessly, and the pooled mass matches an independent " +
      "replay of the pixel contract") {
    val rows = queries.Multimodal.queries("m23_thumbnail")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val id = num(r, "doc_id")
      val (w, h) = (8 + (id % 56).toInt, 8 + ((id * 7) % 40).toInt)
      num(r, "w2") shouldBe (w / 2).toLong
      num(r, "h2") shouldBe (h / 2).toLong
      num(r, "n_px2") shouldBe ((w / 2) * (h / 2) * 3).toLong
      r.getAs[Boolean]("roundtrip_ok") shouldBe true
      // independent replay of p(y,x,c) = ((y*w+x)*3+c)*7 + id mod 251
      def p(y: Int, x: Int, c: Int): Long =
        (((y.toLong * w + x) * 3 + c) * 7 + id) % 251
      var expect = 0L
      for (y2 <- 0 until h / 2; x2 <- 0 until w / 2; c <- 0 until 3)
        expect += (p(2 * y2, 2 * x2, c) + p(2 * y2, 2 * x2 + 1, c) +
          p(2 * y2 + 1, 2 * x2, c) + p(2 * y2 + 1, 2 * x2 + 1, c)) / 4
      num(r, "pooled_sum") shouldBe expect
    }
  }

  test("x49: every source fits a genuine Zipf shape - 20 ranks, negative " +
      "slope, r-squared in (0, 1]") {
    val rows = queries.TextOps.queries("x49_zipf_fit")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      num(r, "n_top") shouldBe 20L
      num(r, "top_count") should be >= 1L
      r.getAs[String]("top_term") should not be empty
      val slope = r.getAs[Double]("zipf_slope")
      slope should be < 0.0
      val r2 = r.getAs[Double]("fit_r2")
      r2 should (be > 0.0 and be <= 1.0)
    }
  }

  test("s35: compaction accounting tiles the index - deletes sum to the " +
      "planted tombstones, permille and retrain flags are consistent") {
    val rows = queries.Similarity.queries("s35_index_compaction")(
      spark, sfDir).collect()
    rows.length should be > 0
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    rows.map(num(_, "n_before")).sum shouldBe e.count()
    rows.map(num(_, "n_deleted")).sum shouldBe
      e.filter("vec_id % 9 = 4").count()
    val totalAfter = rows.map(num(_, "n_after")).sum
    rows.foreach { r =>
      num(r, "n_deleted") shouldBe num(r, "n_before") - num(r, "n_after")
      num(r, "del_permille") shouldBe
        num(r, "n_deleted") * 1000L / num(r, "n_before")
      r.getAs[Boolean]("retrain") shouldBe
        (num(r, "n_after") * 8L > totalAfter * 2L)
    }
  }
}
