package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 twenty-first-wave specs: q121 skew diagnostics, d34
  * shingle-width ablation. The oracle hash gates the values; these pin
  * the skew algebra against an independent recompute and the ablation's
  * class tiling. */
class NewOpsR9sSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("q121: both families' row/key/max accounting matches independent " +
      "recomputes and the skew floor holds") {
    val rows = queries.Streaming.queries("q121_skew_diagnostics")(spark, sfDir)
      .collect()
    rows.map(_.getAs[String]("key_family")).sorted shouldBe
      Array("events.user_id", "lineitem.l_orderkey")
    val byFam = rows.map(r => r.getAs[String]("key_family") -> r).toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    num(byFam("events.user_id"), "n_rows") shouldBe ev.count()
    num(byFam("events.user_id"), "n_keys") shouldBe
      ev.select("user_id").distinct().count()
    num(byFam("events.user_id"), "max_key_n") shouldBe
      ev.groupBy("user_id").count().agg(max("count"))
        .collect()(0).getLong(0)
    rows.foreach { r =>
      // the heaviest key is at least the average, so skew_x1000 >= 1000
      num(r, "skew_x1000") should be >= 1000L
      num(r, "max_key_n") should be <= num(r, "n_rows")
    }
  }

  test("x53: the confusion matrix tiles the corpus and its rows agree " +
      "with x03's per-doc verdicts") {
    val rows = queries.TextOps.queries("x53_lang_confusion")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    rows.map(num(_, "n")).sum shouldBe d.count()
    // independent cell recompute straight from x03's gated per-doc output
    val x03 = queries.TextOps.queries("x03_lang_id")(spark, sfDir).collect()
    val cells = x03.groupBy(r =>
        (r.getAs[String]("labelled"), r.getAs[String]("guessed")))
      .map { case (k, v) => k -> v.length.toLong }
    rows.foreach { r =>
      val k = (r.getAs[String]("labelled"), r.getAs[String]("guessed"))
      num(r, "n") shouldBe cells(k)
      r.getAs[Boolean]("correct") shouldBe (k._1 == k._2)
    }
    rows.groupBy(_.getAs[String]("labelled")).foreach { case (_, rs) =>
      val total = rs.map(num(_, "n")).sum
      rs.foreach(r =>
        num(r, "row_permille") shouldBe num(r, "n") * 1000 / total)
    }
  }

  test("d34: the ablation classes tile the candidate-pair universe and " +
      "agreeing dup pairs sit above the threshold in both widths") {
    val rows = queries.Dedup.queries("d34_shingle_ablation")(spark, sfDir)
      .collect()
    rows.length should be > 0
    val classes = rows.map(_.getAs[String]("verdict_class")).toSet
    classes.subsetOf(Set("both", "only_w3", "only_w5", "neither")) shouldBe
      true
    rows.foreach { r =>
      val c = r.getAs[String]("verdict_class")
      if (c == "both" || c == "only_w3")
        num(r, "mean_j3_permille") should be >= 500L
      if (c == "both" || c == "only_w5")
        num(r, "mean_j5_permille") should be >= 500L
      if (c == "neither") {
        num(r, "mean_j3_permille") should be < 500L
        num(r, "mean_j5_permille") should be < 500L
      }
      num(r, "n_pairs") should be > 0L
    }
    // the audit sees both agreement outcomes on this corpus: some real
    // dups agree, and the bulk of candidates are non-dups
    classes should contain("both")
    classes should contain("neither")
  }
}
