package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 ninth-wave specs: m22 PNG metadata-chunk audit/strip, x48
  * quasi-identifier k-anonymity audit. The oracle hash gates the values;
  * these pin the physical invariants — the chunk walk recovers EXACTLY
  * the planted tEXt payload and the strip is pixel-lossless, and the
  * k-anonymity accounting exactly tiles the corpus. */
class NewOpsR9gSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("m22: the chunk walk recovers exactly the planted tEXt payload, " +
      "BMPs carry none, and every strip re-decodes losslessly") {
    val rows = queries.Multimodal.queries("m22_png_metadata")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val id = num(r, "doc_id")
      val fmt = r.getAs[String]("format")
      fmt shouldBe (if (id % 2 == 0) "bmp" else "png")
      if (id % 6 == 1) {
        num(r, "n_meta") shouldBe 1L
        // tEXt data = "Comment" (7) + NUL + "src=doc_" (8) + digits(id)
        num(r, "meta_bytes") shouldBe 16L + id.toString.length
        num(r, "removed_bytes") shouldBe num(r, "meta_bytes") + 12L
      } else {
        num(r, "n_meta") shouldBe 0L
        num(r, "removed_bytes") shouldBe 0L
      }
      // the strip must stay pixel-lossless: the re-decode of the stripped
      // bytes succeeded and the byte accounting closed exactly
      r.getAs[Boolean]("decode_ok") shouldBe true
      num(r, "width") should be > 0L
      num(r, "height") should be > 0L
    }
    // the fixture genuinely plants: some rows carry metadata
    rows.count(num(_, "n_meta") == 1L) should be > 0
  }

  test("x48: group accounting exactly tiles the corpus and the permille " +
      "is the integer-floor ratio") {
    val rows = queries.TextOps.queries("x48_k_anonymity")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    rows.map(num(_, "n_docs")).sum shouldBe d.count()
    rows.foreach { r =>
      num(r, "k_anonymity") should be >= 1L
      num(r, "n_groups") should be <= num(r, "n_docs")
      num(r, "n_below_k") should be <= num(r, "n_docs")
      num(r, "permille_below") shouldBe
        num(r, "n_below_k") * 1000L / num(r, "n_docs")
      // k-anonymity is the SMALLEST group: if any doc sits below k=5 the
      // min must be below 5 too
      if (num(r, "n_below_k") > 0) num(r, "k_anonymity") should be < 5L
    }
  }
}
