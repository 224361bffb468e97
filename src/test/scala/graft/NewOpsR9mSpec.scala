package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 fifteenth-wave specs: s38 cell distortion, x51 canary tracking,
  * p11 composed maintenance manifest. The oracle hash gates the values;
  * these pin each report's conservation algebra and plant recovery. */
class NewOpsR9mSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("s38: distortion shares tile the total and every cell's stats are " +
      "self-consistent") {
    val rows = queries.Similarity.queries("s38_cell_distortion")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    rows.map(num(_, "n_vectors")).sum shouldBe e.count()
    // integer permilles of a partition sum to at most 1000 (floor loss)
    val pm = rows.map(num(_, "distortion_permille")).sum
    pm should be <= 1000L
    pm should be > 1000L - rows.length
    rows.foreach { r =>
      r.getAs[Double]("max_d2") should be >= r.getAs[Double]("mean_d2")
      r.getAs[Double]("mean_d2") should be >= 0.0
    }
  }

  test("x51: the sweep recovers exactly the planted canaries with their " +
      "true propagation spread") {
    val rows = queries.TextOps.queries("x51_canary_tracking")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = d.filter(col("doc_id") % 29 === 11)
      .select((col("doc_id") % 5).as("k"), col("doc_id"), col("source"))
    val byK = planted.collect()
      .groupBy(_.getLong(0))
    rows.length shouldBe byK.size
    rows.map(num(_, "n_docs")).sum shouldBe planted.count()
    rows.foreach { r =>
      num(r, "n_sources") should be <= num(r, "n_docs")
      r.getAs[Boolean]("cross_source") shouldBe (num(r, "n_sources") > 1)
    }
    // propagation genuinely occurs: some canary spans multiple docs
    rows.map(num(_, "n_docs")).max should be > 1L
  }

  test("p11: each maintenance leg's summary equals an independent rollup " +
      "of its own gated report") {
    val rows = queries.Pipeline.queries("p11_maintenance_run")(spark, sfDir)
      .collect()
    rows.map(_.getAs[String]("job")).sorted shouldBe
      Array("band_store_compaction", "index_compaction", "quantizer_retrain")
    val byJob = rows.map(r => r.getAs[String]("job") -> r).toMap
    val s35 = queries.Similarity.queries("s35_index_compaction")(spark, sfDir)
      .collect()
    num(byJob("index_compaction"), "n_entities") shouldBe s35.length
    num(byJob("index_compaction"), "n_removed") shouldBe
      s35.map(num(_, "n_deleted")).sum
    val s36 = queries.Similarity.queries("s36_retrain_migration")(spark, sfDir)
      .collect()
    num(byJob("quantizer_retrain"), "n_moved") shouldBe
      s36.map(num(_, "n_moved")).sum
    val d32 = queries.Dedup.queries("d32_store_compaction")(spark, sfDir)
      .collect()
    num(byJob("band_store_compaction"), "n_removed") shouldBe
      d32.map(num(_, "n_deleted")).sum
    num(byJob("band_store_compaction"), "n_entities") shouldBe d32.length
  }
}
