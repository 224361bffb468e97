package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 eighteenth-wave specs: s39 embedding coverage, x52 frequency
  * spectrum, d33 corpus checksum. The oracle hash gates the values; these
  * pin integrity tiling, the spectrum algebra, and the checksum's
  * order-independence + content-sensitivity. */
class NewOpsR9pSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("s39: coverage and orphan counts recover the planted integrity " +
      "gaps exactly") {
    val rows = queries.Similarity.queries("s39_embedding_coverage")(
      spark, sfDir).collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 37 =!= 2)
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") % 41 =!= 13)
    rows.map(num(_, "n_docs")).sum shouldBe d.count()
    rows.map(num(_, "n_embedded")).sum shouldBe
      d.join(v.select(col("vec_id").as("doc_id")), Seq("doc_id")).count()
    // orphans: surviving vectors whose doc was culled
    rows.filter(_.getAs[String]("source") == "(orphan)")
      .map(num(_, "n_orphans")).sum shouldBe
      v.select(col("vec_id").as("doc_id"))
        .join(d.select("doc_id"), Seq("doc_id"), "left_anti").count()
    rows.foreach { r =>
      num(r, "n_embedded") should be <= num(r, "n_docs")
    }
    // the planted gaps genuinely bite
    rows.map(num(_, "n_embedded")).sum should be < rows.map(num(_, "n_docs")).sum
  }

  test("x52: the spectrum reconciles with an independent vocabulary " +
      "recompute and the Good-Turing bound holds") {
    val rows = queries.TextOps.queries("x52_freq_spectrum")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val terms = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    rows.map(num(_, "tokens")).sum shouldBe terms.count()
    rows.map(num(_, "vocab")).sum shouldBe
      terms.distinct().count()
    rows.foreach { r =>
      num(r, "n1") + num(r, "n2") should be <= num(r, "vocab")
      num(r, "unseen_mass_permille") shouldBe
        num(r, "n1") * 1000 / num(r, "tokens")
    }
  }

  test("m29: every Laplacian response is a mod-251 wrap seam (the fixture " +
      "field is locally linear)") {
    val rows = queries.Multimodal.queries("m29_sharpness")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      // linear field => L = 0 except where a neighbor term wrapped mod
      // 251, and each wrap contributes exactly +-251 — so every response
      // is a multiple of 251 and the SSE a multiple of 251^2
      num(r, "max_abs_lap") % 251 shouldBe 0L
      num(r, "lap_sse") % (251L * 251L) shouldBe 0L
      // seams genuinely occur at these dims
      num(r, "lap_sse") should be > 0L
      num(r, "sharp_permille") should be > 0L
      num(r, "sharp_permille") should be < 1000L
    }
  }

  test("d33: the checksum is partition-order independent and flips on a " +
      "single swapped text") {
    val rows = queries.Dedup.queries("d33_corpus_checksum")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    rows.map(num(_, "n_docs")).sum shouldBe d.count()
    // independent recompute under a DIFFERENT partitioning: same checksums
    val dg = graft.queries.QueryHelpers.md5i(
      concat(col("doc_id").cast("string"), lit("|"), col("text")))
    val re = d.repartition(7, col("doc_id"))
      .select(col("source"), dg.as("dg"))
      .groupBy(col("source"))
      .agg(expr("bit_xor(dg)").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      num(r, "xor_digest") shouldBe re(r.getAs[String]("source"))
    }
    // content sensitivity: swapping two docs' texts changes some source's
    // xor even though the text multiset is unchanged
    val swapped = d.withColumn("text",
      when(col("doc_id") === 0L, lit("swap-a"))
        .when(col("doc_id") === 1L, lit("swap-b"))
        .otherwise(col("text")))
    val dg2 = graft.queries.QueryHelpers.md5i(
      concat(col("doc_id").cast("string"), lit("|"), col("text")))
    val sw = swapped.select(col("source"), dg2.as("dg"))
      .groupBy(col("source")).agg(expr("bit_xor(dg)").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sw should not equal re
  }
}
