package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 fourth-wave specs: p06 training-mix builder, x47 readability
  * audit. The driver's oracle hash gates the values; these pin the funnel
  * and allocation invariants (selection within allocation within candidate
  * mass, water-filling never over-allocates the budget, shard spread
  * bounds) and the readability formula consistency. */
class NewOpsR9dSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("p06: the mix funnel is monotone per source and the allocation " +
      "never exceeds the half-mass budget") {
    val out = queries.Pipeline.queries("p06_mix_builder")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    rows.foreach { r =>
      num(r, "sel_tokens") should be <= num(r, "alloc_tokens")
      num(r, "alloc_tokens") should be <= num(r, "cand_tokens")
      num(r, "n_selected") should be <= num(r, "n_cand")
      num(r, "util_pct") should be <= 100L
      num(r, "n_shards") should (be >= 0L and be <= 4L)
      // a source with a selection touches at least one shard
      if (num(r, "n_selected") > 0) num(r, "n_shards") should be >= 1L
    }
    // water-filling never over-allocates: sum(alloc) <= floor(total/2)
    val totalCand = rows.map(num(_, "cand_tokens")).sum
    rows.map(num(_, "alloc_tokens")).sum should be <= totalCand / 2
    // the budget is actually used: selection is non-trivial
    rows.map(num(_, "sel_tokens")).sum should be > 0L
    // candidate mass equals the canonical (exact-dedup) corpus mass
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val canonTokens = d.select(
        md5(regexp_replace(lower(col("text")), " +", " ")).as("h"),
        expr("cast(size(filter(split(regexp_replace(lower(text), ' +', ' '), " +
          "' '), w -> w <> '')) as long)").as("n"))
      .groupBy(col("h")).agg(min(col("n")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    totalCand shouldBe canonTokens
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("x47: readability formulas recompute from the integer sums and the " +
      "easy-band count is bounded") {
    val out = queries.TextOps.queries("x47_readability")(spark, sfDir)
    val rows = out.collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (w, s2, syl) =
        (num(r, "words"), num(r, "sentences"), num(r, "syllables"))
      syl should be >= w // every word contributes at least one syllable
      s2 should be >= num(r, "n_docs") // every doc counts at least 1 sentence
      num(r, "n_easy") should be <= num(r, "n_docs")
      val wps = w.toDouble / s2
      val spw = syl.toDouble / w
      r.getAs[Double]("flesch") shouldBe
        BigDecimal(206.835 - 1.015 * wps - 84.6 * spw)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble +- 0.011
      r.getAs[Double]("fkgl") shouldBe
        BigDecimal(0.39 * wps + 11.8 * spw - 15.59)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble +- 0.011
    }
    // coverage: every document with at least one word is audited
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val audited = d.filter(expr(
      "size(filter(split(regexp_replace(lower(text), ' +', ' '), ' '), " +
        "w -> w <> '')) >= 1")).count()
    rows.map(num(_, "n_docs")).sum shouldBe audited
  }
}
