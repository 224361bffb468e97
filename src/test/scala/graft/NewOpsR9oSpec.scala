package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 seventeenth-wave specs: q119 transition matrix, p12 user
  * erasure, m28 dominant colors. The oracle hash gates the values; these
  * pin conservation, the landed-output certificate, and the palette
  * period structure of the fixture. */
class NewOpsR9oSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("q119: transition counts tile the session steps and each Markov " +
      "row's permilles are floor-consistent") {
    val rows = queries.Streaming.queries("q119_transitions")(spark, sfDir)
      .collect()
    rows.length should be > 0
    // independent recompute of the step universe (count only — the matrix
    // split is the oracle's job)
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("tsz", col("ts").cast("timestamp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsz"), col("event_id"))
    val nSteps = e.withColumn("pts", lag(col("tsz"), 1).over(w))
      .filter(col("pts").isNotNull &&
        unix_millis(col("tsz")) - unix_millis(col("pts")) < 300000L)
      .count()
    rows.map(num(_, "n_steps")).sum shouldBe nSteps
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val total = rs.map(num(_, "n_steps")).sum
      rs.foreach { r =>
        num(r, "row_permille") shouldBe num(r, "n_steps") * 1000 / total
      }
      // floor permilles of one row sum to (1000 - groups, 1000]
      val pm = rs.map(num(_, "row_permille")).sum
      pm should be <= 1000L
      pm should be > 1000L - rs.length
    }
  }

  test("p12: the certificate's counts conserve per table and the LANDED " +
      "outputs hold zero takedown rows") {
    val rows = queries.Pipeline.queries("p12_user_erasure")(spark, sfDir)
      .collect()
    rows.map(_.getAs[String]("tbl")).sorted shouldBe
      Array("documents", "events")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val byTbl = rows.map(r => r.getAs[String]("tbl") -> r).toMap
    rows.foreach { r =>
      num(r, "rows_before") shouldBe
        num(r, "rows_removed") + num(r, "rows_after")
      num(r, "residual") shouldBe 0L
    }
    num(byTbl("events"), "rows_removed") shouldBe
      ev.filter(col("user_id") % 19 === 7).count()
    num(byTbl("documents"), "rows_removed") shouldBe
      docs.filter(col("doc_id") % 50 % 19 === 7).count()
    // the takedown genuinely bites on both tables
    num(byTbl("events"), "rows_removed") should be > 0L
    num(byTbl("documents"), "rows_removed") should be > 0L
  }

  test("m28: the decoded palette matches the fixture's 251-periodic color " +
      "structure exactly") {
    val rows = queries.Multimodal.queries("m28_dominant_colors")(spark, sfDir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val npx = num(r, "n_px")
      // the pixel formula cycles through exactly 251 colors (21 coprime
      // with the 251 modulus), so the distinct count is min(n_px, 251)
      num(r, "n_colors") shouldBe math.min(npx, 251L)
      // the dominant color covers ceil(npx/251) pixels
      val topCount = (npx + 250) / 251
      num(r, "top_permille") shouldBe topCount * 1000 / npx
      num(r, "top4_permille") should be >= num(r, "top_permille")
      num(r, "top_color") should (be >= 0L and be <= 0xffffffL)
    }
  }
}
