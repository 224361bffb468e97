package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 third-wave specs: d29 cross-source duplication matrix, s31
  * adaptive-nprobe IVF serve, x46 median/MAD perplexity outliers. The
  * driver's oracle hash gates the values; these pin the invariants the hash
  * can't explain (matrix symmetry arithmetic, per-query probe adaptivity,
  * outlier-threshold consistency) plus the plan shapes the scale story
  * depends on. */
class NewOpsR9cSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("d29: source pairs are ordered, counts cover the shared groups, " +
      "and no doc-level pair join appears in the plan") {
    val out = queries.Dedup.queries("d29_source_matrix")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (s1, s2) = (r.getAs[String]("src1"), r.getAs[String]("src2"))
      s1 should be < s2
      num(r, "n_shared_groups") should be >= 1L
      // each shared group contributes >= 1 doc per side
      num(r, "n_docs_src1") should be >= num(r, "n_shared_groups")
      num(r, "n_docs_src2") should be >= num(r, "n_shared_groups")
    }
    // the matrix is over distinct unordered pairs — no (a,b)+(b,a) dupes
    val keys = rows.map(r => (r.getAs[String]("src1"), r.getAs[String]("src2")))
    keys.distinct.length shouldBe keys.length
    // every shared fingerprint group really spans both sources: recompute
    // one pair's shared-group count directly
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val fp = d.select(
      md5(substring(regexp_replace(lower(col("text")), " +", " "), 1, 64))
        .as("h"), col("source")).distinct()
    val (a, b) = (keys.head._1, keys.head._2)
    val shared = fp.filter(col("source") === a).select("h")
      .intersect(fp.filter(col("source") === b).select("h")).count()
    shared shouldBe num(rows.head, "n_shared_groups")
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("s31: probe depth adapts per query within [1, k] and the re-rank " +
      "is a correct per-query top-3") {
    val out = queries.Similarity.queries("s31_adaptive_nprobe")(spark, sfDir)
    val rows = out.collect()
    rows.length shouldBe 60 // 20 queries x top-3
    val byQ = rows.groupBy(num(_, "qid"))
    byQ.keySet shouldBe (0L until 20L).toSet
    byQ.values.foreach { rs =>
      rs.sortBy(num(_, "rank")).map(num(_, "rank")) shouldBe Seq(1L, 2L, 3L)
      // one probe depth per query, within [1, 8]
      val np = rs.map(num(_, "nprobe_used")).distinct
      np.length shouldBe 1
      np.head should (be >= 1L and be <= 8L)
      // cosine non-increasing down the ranks
      val cos = rs.sortBy(num(_, "rank")).map(_.getAs[Double]("cosine"))
      cos shouldBe cos.sorted.reverse
    }
    // the whole point: depth is per-query, not per-index — the corpus has
    // dense and sparse cells, so at least two distinct depths must appear
    rows.map(num(_, "nprobe_used")).distinct.length should be > 1
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("x46: outlier flags are consistent with the median/MAD threshold " +
      "and every scored doc is audited exactly once") {
    val out = queries.TextOps.queries("x46_ppl_outliers")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nDocs, nOut) = (num(r, "n_docs"), num(r, "n_outliers"))
      nOut should be <= nDocs
      num(r, "mad_nll") should be >= 0L
      // worst_dev vs threshold decides whether ANY outlier exists
      val worst = num(r, "worst_dev")
      if (nOut > 0) worst should be > 3 * num(r, "mad_nll")
      else worst should be <= 3 * num(r, "mad_nll")
    }
    // coverage: per-source doc counts sum to the number of scorable docs
    // (>= 2 chars — the bigram model's domain)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val scorable = d.filter(expr("length(text) >= 2")).count()
    rows.map(num(_, "n_docs")).sum shouldBe scorable
    // MAD threshold on integers: median is an actual data point, so the
    // deviation at the median doc is 0 — mad is exact integer arithmetic
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }
}
