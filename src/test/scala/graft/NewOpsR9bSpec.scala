package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 second-wave specs: s30 graph-descent serve, x45 topic clusters,
  * d28 token-balanced shards, p05 eval-set builder. Each op's oracle hash is
  * gated by the driver; these pin the algorithmic invariants the hash alone
  * can't explain (descent monotonicity, shard balance bound, funnel
  * arithmetic) plus the plan shapes the 100 TB story depends on. */
class NewOpsR9bSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("s30: greedy descent never ends below the entry node's cosine and " +
      "plans no cartesian product") {
    val out = queries.Similarity.queries("s30_graph_walk")(spark, sfDir)
    val rows = out.collect()
    rows.length shouldBe 10
    // recompute each query's cosine AT the fixed entry node (100): the walk
    // keeps the current node among its candidates at every hop, so the
    // final cosine is monotonically >= the entry cosine
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val entry = e.filter(col("vec_id") === 100)
      .select(col("embedding").as("ne"))
    val atEntry = e.filter(col("vec_id") < 10)
      .crossJoin(entry)
      .select(col("vec_id"),
        expr("graft_cosine(embedding, ne)").as("c0"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val cos = r.getAs[Double]("cosine")
      cos should be >= atEntry(num(r, "qid")) - 1e-9
    }
    // at least one walk must actually move off the entry node
    rows.count(num(_, "cid") != 100L) should be > 0
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("x45: 8 clusters x top-3 terms, sizes partition the joined corpus") {
    val out = queries.TextOps.queries("x45_topic_clusters")(spark, sfDir)
    val rows = out.collect()
    rows.length shouldBe 24 // 8 cells x 3 ranked terms
    rows.map(num(_, "cell")).distinct.sorted shouldBe (0L until 8L)
    // each cluster's 3 rows repeat one n_docs; the cluster sizes must sum
    // to the number of embedded documents (500 at every sf)
    val sizes = rows.groupBy(num(_, "cell")).map { case (_, rs) =>
      val distinctSizes = rs.map(num(_, "n_docs")).distinct
      distinctSizes.length shouldBe 1
      distinctSizes.head
    }
    sizes.sum shouldBe 500L
    // ranks are 1..3 per cell with tfidf non-increasing
    rows.groupBy(num(_, "cell")).values.foreach { rs =>
      val byRank = rs.sortBy(num(_, "rnk"))
      byRank.map(num(_, "rnk")) shouldBe Seq(1L, 2L, 3L)
      val scores = byRank.map(_.getAs[Double]("tfidf"))
      scores shouldBe scores.sorted.reverse
    }
  }

  test("d28: serpentine shards cover all canonicals and the token spread " +
      "is bounded by one max document") {
    val out = queries.Dedup.queries("d28_token_shards")(spark, sfDir)
    val rows = out.collect()
    rows.length shouldBe 8
    rows.map(num(_, "shard")).sorted shouldBe (0L until 8L)
    val nDocs = rows.map(num(_, "n_docs")).sum
    // canonical count = distinct normalized texts
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val nCanon = d.select(
      md5(regexp_replace(lower(col("text")), " +", " ")).as("h"))
      .distinct().count()
    nDocs shouldBe nCanon
    // serpentine balance: spread between heaviest and lightest shard is at
    // most the single largest document (each serpentine pass adds exactly
    // one doc per shard and reverses direction — the classic bound)
    val totals = rows.map(num(_, "total_tokens"))
    val maxDoc = rows.map(num(_, "max_tokens")).max
    (totals.max - totals.min) should be <= maxDoc
  }

  test("p05: per-source funnel arithmetic is exact and the split is the " +
      "deterministic md5 carve") {
    val out = queries.Pipeline.queries("p05_eval_builder")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    rows.foreach { r =>
      num(r, "n_candidates") shouldBe
        num(r, "n_dup_dropped") + num(r, "n_contam_dropped") + num(r, "n_final")
    }
    // total candidates = docs whose md5i(doc_id) % 10 == 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val expected = d.filter(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 === 0).count()
    rows.map(num(_, "n_candidates")).sum shouldBe expected
  }
}
