package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 sixth-wave specs: d31 duplication spectrum, s32 adaptive-serve
  * recall audit. The oracle hash gates the values; these pin the histogram
  * partition arithmetic (buckets exactly tile the corpus) and the recall
  * accounting against the exact truth. */
class NewOpsR9fSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("d31: copy-count buckets exactly tile the corpus and the permille " +
      "column sums to ~1000") {
    val out = queries.Dedup.queries("d31_dup_spectrum")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    rows.map(num(_, "n_docs")).sum shouldBe d.count()
    rows.foreach { r =>
      val b = num(r, "copies_bucket")
      b should (be >= 1L and be <= 10L)
      if (b < 10) num(r, "n_docs") shouldBe b * num(r, "n_groups")
      else num(r, "n_docs") should be >= 10 * num(r, "n_groups")
    }
    // integer-floor permille: sums to at most 1000, misses at most one
    // permille per bucket
    val pm = rows.map(num(_, "permille_docs")).sum
    pm should be <= 1000L
    pm should be >= (1000L - rows.length)
    // the fingerprint must actually find duplication at this sf (else the
    // spectrum is the vacuous single bucket)
    rows.map(num(_, "copies_bucket")).max should be > 1L
  }

  test("s33: the audit recovers EXACTLY the planted corruption taxonomy " +
      "per label and the clean envelope is the unit norm") {
    val out = queries.Similarity.queries("s33_embedding_audit")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val realPerLabel = e.groupBy("label").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    rows.foreach { r =>
      num(r, "n_bad_dim") shouldBe 1L
      num(r, "n_nonfinite") shouldBe 1L
      num(r, "n_zero_norm") shouldBe 1L
      num(r, "n_high_norm") shouldBe 1L
      num(r, "n_vecs") shouldBe realPerLabel(num(r, "label")) + 4
      num(r, "n_clean") shouldBe num(r, "n_vecs") - 4
      r.getAs[Double]("min_norm") shouldBe 1.0 +- 1e-5
      r.getAs[Double]("max_norm") shouldBe 1.0 +- 1e-5
    }
  }

  test("s34: scatter-gather merge is a true per-query top-3 with each hit " +
      "served by the shard that owns it") {
    val out = queries.Similarity.queries("s34_sharded_serve")(spark, sfDir)
    val rows = out.collect()
    rows.length shouldBe 60 // 20 queries x top-3
    val byQ = rows.groupBy(num(_, "qid"))
    byQ.keySet shouldBe (0L until 20L).toSet
    byQ.values.foreach { rs =>
      rs.sortBy(num(_, "rank")).map(num(_, "rank")) shouldBe Seq(1L, 2L, 3L)
      val cos = rs.sortBy(num(_, "rank")).map(_.getAs[Double]("cosine"))
      cos shouldBe cos.sorted.reverse
    }
    rows.foreach { r =>
      // shard ownership: the hit's shard IS the parity shard holding cid
      num(r, "shard") shouldBe num(r, "cid") % 2
    }
    // the gather genuinely merges: both shards contribute hits overall
    rows.map(num(_, "shard")).distinct.sorted shouldBe Seq(0L, 1L)
  }

  test("s32: recall audit covers every query with hits consistent against " +
      "an independently computed truth overlap") {
    val out = queries.Similarity.queries("s32_adaptive_recall")(spark, sfDir)
    val rows = out.collect()
    rows.length shouldBe 20
    rows.map(num(_, "qid")).sorted shouldBe (0L until 20L)
    rows.foreach { r =>
      val hits = num(r, "hits")
      hits should (be >= 0L and be <= 3L)
      r.getAs[Double]("recall") shouldBe hits / 3.0 +- 1e-12
      num(r, "nprobe_used") should (be >= 1L and be <= 8L)
    }
    // the serve is not broken: it finds most of the truth set overall
    rows.map(num(_, "hits")).sum should be >= 20L // avg recall >= 1/3
    // cross-check one query's hit count against the independent frames
    graft.functions.GraftFunctions.register(spark)
    val serve = queries.Similarity.queries("s31_adaptive_nprobe")(spark, sfDir)
      .collect().filter(r => num(r, "qid") == 0L).map(r => num(r, "cid")).toSet
    val brute = queries.Similarity.queries("s01_knn_brute")(spark, sfDir)
      .collect()
      .filter(r => num(r, "qid") == 0L && num(r, "rank") <= 3L)
      .map(r => num(r, "cid")).toSet
    val overlap = (serve intersect brute).size.toLong
    rows.find(r => num(r, "qid") == 0L).map(num(_, "hits")) shouldBe
      Some(overlap)
  }
}
