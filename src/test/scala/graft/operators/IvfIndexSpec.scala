package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class IvfIndexSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def embeddings = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
  }

  test("index build is deterministic across runs") {
    val e = embeddings
    val c1 = IvfIndex.train(e, "vec_id", "embedding", k = 8, iters = 3)
    val c2 = IvfIndex.train(e, "vec_id", "embedding", k = 8, iters = 3)
    c1.map(_.vec.toSeq) shouldBe c2.map(_.vec.toSeq)
  }

  test("probed search reaches adequate recall vs brute force") {
    val e = embeddings
    val centroids = IvfIndex.train(e, "vec_id", "embedding", k = 8, iters = 3)
    val assigned = IvfIndex.assign(e, "vec_id", "embedding", centroids).cache()
    val queries = e.filter(col("vec_id") < 10)
    val ivf = IvfIndex.search(assigned, queries, "vec_id", "embedding",
      centroids, nprobe = 3, topk = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    // brute-force ground truth
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val exact = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr("graft_cosine(qe, ce)").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = ivf.intersect(exact).size.toDouble / exact.size.toDouble
    withClue(s"recall@5 = $recall") { recall should be >= 0.5 }
    // every IVF hit is a real corpus neighbor of the right query
    ivf.foreach { case (qid, cid) => qid should not be cid }
  }
}
