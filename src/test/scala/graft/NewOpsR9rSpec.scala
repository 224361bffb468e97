package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 twentieth-wave specs: s41 PQ codebook utilization, p13 order
  * certificate. The oracle hash gates the values; these pin the code
  * accounting and the digest's order sensitivity. */
class NewOpsR9rSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("s41: every subspace's code accounting tiles the corpus and " +
      "used + dead = k") {
    val rows = queries.Similarity.queries("s41_pq_utilization")(spark, sfDir)
      .collect()
    rows.length shouldBe 8 // pqM subspaces
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    rows.foreach { r =>
      num(r, "used_codes") + num(r, "dead_codes") shouldBe 16L // pqK
      num(r, "used_codes") should be > 0L
      num(r, "max_code_n") should be <= n
      // the hottest code's share is at least the uniform share
      num(r, "max_share_permille") should be >= 1000L / 16L
    }
  }

  test("p13: the order digest is position-sensitive (swapping two docs' " +
      "order keys flips it) and shards tile the corpus") {
    val rows = queries.Pipeline.queries("p13_order_certificate")(spark, sfDir)
      .collect()
    rows.length shouldBe 4
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    rows.map(num(_, "n_docs")).sum shouldBe d.count()
    rows.foreach { r =>
      num(r, "order_digest") should be >= 0L
      num(r, "order_digest") should be < 1000003L
      num(r, "first_doc") should not be num(r, "last_doc")
    }
    // independent recompute with two docs' order keys SWAPPED inside one
    // shard: the multiset of (doc, digest) is unchanged, only order moved
    // — an order-independent checksum (d33) would NOT see this
    val M = 1000003L
    val ok0 = graft.queries.QueryHelpers.md5i(
      concat(lit("p13:"), col("doc_id").cast("string")))
    val dgm = graft.queries.QueryHelpers.md5i(
      concat(col("doc_id").cast("string"), lit("|"), col("text"))) % M
    val keyed = d.select(col("doc_id"), ok0.as("ok"), dgm.as("dgm"))
      .withColumn("shard", col("ok") % 4)
    // pick the two smallest-ok docs of shard 0 and swap their keys
    val two = keyed.filter(col("shard") === 0)
      .orderBy(col("ok"), col("doc_id")).limit(2).collect()
    val (a, b) = (two(0).getAs[Long]("doc_id"), two(1).getAs[Long]("doc_id"))
    val swapped = keyed.withColumn("ok2",
      when(col("doc_id") === a, lit(two(1).getAs[Long]("ok")))
        .when(col("doc_id") === b, lit(two(0).getAs[Long]("ok")))
        .otherwise(col("ok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("ok2"), col("doc_id"))
    val dig = swapped.withColumn("r", row_number().over(w).cast("long"))
      .filter(col("shard") === 0)
      .agg(expr(s"sum((r % $M) * dgm % $M) % $M")).collect()(0).getLong(0)
    val original = rows.find(r => num(r, "shard") == 0L).get
    dig should not be num(original, "order_digest")
  }
}
