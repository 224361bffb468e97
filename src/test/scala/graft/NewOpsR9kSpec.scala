package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 thirteenth-wave specs: s37 serving load audit, d32 band-store
  * compaction, m25 ViT patchify. The oracle hash gates the values; these
  * pin the conservation/tiling algebra each report must satisfy. */
class NewOpsR9kSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("s37: probe mass and population both tile their totals and the " +
      "scan-cost algebra is self-consistent") {
    val rows = queries.Similarity.queries("s37_serving_load")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // every corpus vector sits in exactly one cell; every query emits
    // exactly nprobe=3 probes
    rows.map(num(_, "population")).sum shouldBe e.count()
    rows.map(num(_, "n_probes")).sum shouldBe
      e.filter(col("vec_id") < 50).count() * 3
    val totalScan = rows.map(num(_, "est_scan")).sum
    rows.foreach { r =>
      num(r, "est_scan") shouldBe num(r, "n_probes") * num(r, "population")
      num(r, "load_permille") shouldBe num(r, "est_scan") * 1000 / totalScan
    }
  }

  test("d32: compaction conserves keys per band and deletes exactly the " +
      "tombstoned docs' band keys") {
    val rows = queries.Dedup.queries("d32_store_compaction")(spark, sfDir)
      .collect()
    rows.length shouldBe 4
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions.size(split(col("text"), " ")) >= 3)
    val storeDocs = d.filter(col("doc_id") % 10 =!= 3)
    val tombDocs = storeDocs.filter(col("doc_id") % 11 === 6).count()
    rows.foreach { r =>
      num(r, "keys_after") + num(r, "n_deleted") shouldBe num(r, "keys_before")
      // each doc contributes exactly one key per band
      num(r, "keys_before") shouldBe storeDocs.count()
      num(r, "n_deleted") shouldBe tombDocs
      num(r, "max_bucket_after") should be <= num(r, "keys_after")
      num(r, "buckets_after") should be <= num(r, "keys_after")
    }
    // the corpus genuinely collides: some band has a bucket bigger than 1
    rows.map(num(_, "max_bucket_after")).max should be > 1L
  }

  test("m25: the patch grid tiles every image exactly and patch sums " +
      "reconcile with the full-interior pixel mass") {
    val rows = queries.Multimodal.queries("m25_patchify")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val byDoc = rows.groupBy(num(_, "doc_id"))
    byDoc.foreach { case (id, ps) =>
      val (w, h) = (8 + (id % 56).toInt, 8 + ((id * 7) % 40).toInt)
      // exactly (w/4)*(h/4) patches, each grid position once
      ps.length shouldBe (w / 4) * (h / 4)
      ps.map(r => (num(r, "py"), num(r, "px"))).distinct.length shouldBe
        ps.length
      // independent closed-form replay of the total patch mass from the
      // fixture contract (the covered region's pixel sum)
      var expected = 0L
      for (py <- 0 until h / 4; px <- 0 until w / 4; j <- 0 until 48) {
        val (dy, dx, c) = (j / 12, (j / 3) % 4, j % 3)
        expected +=
          ((((4 * py + dy) * w + 4 * px + dx) * 3 + c) * 7 + id) % 251
      }
      ps.map(num(_, "patch_sum")).sum shouldBe expected
      ps.foreach(r =>
        num(r, "patch_mean_q") shouldBe num(r, "patch_sum") / 48)
    }
  }
}
