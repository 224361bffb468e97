package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic properties of the round-4b operators, beyond the DuckDB-oracle
  * hash gate: the claims a user relies on (training improves, merges are
  * well-formed, leakage hits are real cross-split twins, dedup drops point
  * at earlier cluster-mates). */
class NewOpsR4bSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("x15 classifier: training reduces misclassifications") {
    val rows = SparkEntry.queries("x15_quality_classifier")(spark, sfDir)
      .orderBy(col("iter")).collect()
    rows.length should be >= 2
    val first = rows.head.getAs[Long]("n_misclassified")
    val last = rows.last.getAs[Long]("n_misclassified")
    last should be < first
    // iteration 0 starts from zero weights
    rows.head.getAs[Double]("w_stopword") shouldBe 0.0
  }

  test("x16 BPE: merges well-formed, best-pair count non-increasing") {
    val rows = SparkEntry.queries("x16_bpe_train")(spark, sfDir)
      .orderBy(col("round")).collect()
    rows.length should be >= 3
    rows.foreach { r =>
      r.getAs[String]("merged") shouldBe
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym")
      r.getAs[Long]("n_occurrences") should be > 0L
    }
    // a post-merge pair (x, ab) can occur at most count(ab) <= prev max
    // times and untouched pairs only lose occurrences, so the argmax count
    // cannot increase round over round
    val counts = rows.map(_.getAs[Long]("n_occurrences")).toSeq
    counts.zip(counts.tail).foreach { case (a, b) => b should be <= a }
  }

  test("x17 leakage: every leaked group is one planted twin across the split") {
    val rows = SparkEntry.queries("x17_split_leakage")(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("n_train") shouldBe 1L
      r.getAs[Long]("n_eval") shouldBe 1L
      val ids = Seq(r.getAs[Long]("train_doc"), r.getAs[Long]("eval_doc"))
      // exactly one side is the planted variant (doc_id + 1,000,000), and
      // it is the twin of the other side
      ids.count(_ >= 1000000L) shouldBe 1
      (ids.max - 1000000L) % 5 shouldBe 0
      ids.max - 1000000L shouldBe ids.min
    }
  }

  test("d11 semdedup: drops point at earlier cluster-mates above threshold") {
    val rows = SparkEntry.queries("d11_semdedup")(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("kept_anchor") should be < r.getAs[Long]("vec_id")
      r.getAs[Double]("max_cos") should be >= 0.35
      r.getAs[Long]("n_anchors") should be >= 1L
    }
  }

  test("d12 CDC: per-doc profile consistent with the chunk expression") {
    val out = SparkEntry.queries("d12_cdc_dedup")(spark, sfDir)
    val direct = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "size(graft_cdc_chunks(text)) AS n_direct")
    val joined = out.join(direct, Seq("doc_id"))
    joined.filter(col("n_chunks") =!= col("n_direct")).count() shouldBe 0L
    joined.filter(col("dup_frac") < 0.0 || col("dup_frac") > 1.0 ||
      col("n_dup_chunks") > col("n_chunks")).count() shouldBe 0L
  }

  test("s09 kNN graph: max 3 neighbors per vector, no self-edges") {
    val rows = SparkEntry.queries("s09_knn_graph")(spark, sfDir)
    rows.filter(col("qid") === col("cid")).count() shouldBe 0L
    rows.groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 3).count() shouldBe 0L
    // ranks are 1..k and cosine is non-increasing in rank per query
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("rank"))
    rows.withColumn("prev", lag(col("cosine"), 1).over(w))
      .filter(col("prev").isNotNull && col("cosine") > col("prev"))
      .count() shouldBe 0L
  }
}
