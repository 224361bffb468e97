package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 twelfth-wave specs: x50 code-vs-prose routing, m24 letterbox
  * border detection, s36 quantizer retrain migration audit. The oracle hash
  * gates the values; these pin the plant-recovery and tiling algebra. */
class NewOpsR9jSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("x50: the verdict recovers the planted code docs exactly and the " +
      "manifest tiles the corpus") {
    val rows = queries.TextOps.queries("x50_code_detect")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = d.filter(col("doc_id") % 23 === 7)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.map(num(_, "n_docs")).sum shouldBe d.count()
    rows.foreach { r =>
      // exactly the planted docs classify as code — the base corpus is
      // symbol-free, so a single false positive or negative breaks this
      num(r, "n_code") shouldBe planted.getOrElse(r.getString(0), 0L)
      if (num(r, "n_code") > 0) {
        num(r, "total_sym") should be > 0L
        num(r, "code_tokens") should be > 0L
      }
    }
    // the gate genuinely splits: both classes present corpus-wide
    rows.map(num(_, "n_code")).sum should be > 0L
    rows.map(num(_, "prose_tokens")).sum should be > 0L
  }

  test("m24: generic border detection recovers the planted letterbox " +
      "geometry from real decoded containers") {
    val rows = queries.Multimodal.queries("m24_letterbox")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val id = num(r, "doc_id")
      num(r, "top_px") shouldBe id % 4
      num(r, "bottom_px") shouldBe (id * 3) % 4
      num(r, "left_px") shouldBe (id * 5) % 3
      num(r, "right_px") shouldBe (id * 7) % 3
      val (w, h) = (num(r, "width"), num(r, "height"))
      val (cw, ch) = (num(r, "crop_w"), num(r, "crop_h"))
      cw shouldBe w - num(r, "left_px") - num(r, "right_px")
      ch shouldBe h - num(r, "top_px") - num(r, "bottom_px")
      num(r, "border_permille") shouldBe (w * h - cw * ch) * 1000 / (w * h)
      num(r, "interior_sum") should be > 0L
    }
    // the zero-border case (id % 12 == 0) and both containers are covered
    rows.count(r => num(r, "border_permille") == 0L) should be > 0
    rows.map(_.getAs[String]("format")).distinct.sorted shouldBe
      Seq("bmp", "png")
  }

  test("s36: the migration audit tiles the survivor corpus and its " +
      "stay/move split is self-consistent") {
    val rows = queries.Similarity.queries("s36_retrain_migration")(
      spark, sfDir).collect()
    rows.length should be > 0
    val survivors = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") % 9 =!= 4).count()
    rows.map(num(_, "n_surv")).sum shouldBe survivors
    rows.foreach { r =>
      num(r, "n_stay") + num(r, "n_moved") shouldBe num(r, "n_surv")
      num(r, "top_dest_n") should be <= num(r, "n_surv")
      num(r, "top_dest_n") should be > 0L
      num(r, "stay_permille") shouldBe num(r, "n_stay") * 1000 / num(r, "n_surv")
      // the (old -> old) bucket holds exactly the stayers, so the dominant
      // destination equals it when it IS the old cell and dominates it
      // otherwise
      num(r, "top_dest_n") should be >= num(r, "n_stay")
      if (num(r, "top_dest_cell") == num(r, "old_cell"))
        num(r, "top_dest_n") shouldBe num(r, "n_stay")
    }
  }
}
