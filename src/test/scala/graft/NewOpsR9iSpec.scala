package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 eleventh-wave specs: p08 incremental refresh admission. The
  * oracle hash gates the values; these pin the funnel algebra — the four
  * gates PARTITION the batch exactly, and the exact-dup gate agrees with
  * an independent recompute of store membership. */
class NewOpsR9iSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def num(r: Row, name: String): Long = r.getAs[Any](name) match {
    case i: Int  => i.toLong
    case l: Long => l
    case o       => fail(s"$name is not integral: $o")
  }

  test("p08: the four admission gates partition every batch doc exactly " +
      "once and the exact gate matches independent store membership") {
    val rows = queries.Pipeline.queries("p08_refresh_admission")(
      spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      num(r, "n_quality_rejected") + num(r, "n_exact_dup") +
        num(r, "n_near_dup") + num(r, "n_admitted") shouldBe num(r, "n_batch")
      num(r, "admitted_tokens") should be >= num(r, "n_admitted") * 10L
    }
    // independent replay of the split and the exact gate
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val hash = graft.queries.QueryHelpers.md5i(col("doc_id").cast("string"))
    val norm = md5(regexp_replace(lower(col("text")), " +", " "))
    val batch = d.filter(hash % 10 === 7)
    rows.map(num(_, "n_batch")).sum shouldBe batch.count()
    val storeH = d.filter(hash % 10 =!= 7).select(norm.as("h")).distinct()
    val exactTotal = batch.select(norm.as("h"))
      .join(storeH, Seq("h"), "left_semi").count()
    // the engine's exact gate only sees quality-passed docs, so the
    // independent count is an upper bound that collapses to equality when
    // no quality-failed doc shares a store hash (true at this sf: the one
    // rejected doc is unique)
    rows.map(num(_, "n_exact_dup")).sum shouldBe exactTotal
    // the near gate genuinely fires on this corpus
    rows.map(num(_, "n_near_dup")).sum should be > 0L
  }

  test("p09: the streaming arrival path produces bit-identical verdicts " +
      "to d27's batch admission gate") {
    val streamed = queries.Pipeline.queries("p09_stream_admission")(
      spark, sfDir).collect()
    streamed.length should be > 0
    val batch = queries.Dedup.queries("d27_lsh_store")(spark, sfDir)
      .collect()
    // same universe, same verdict/dup_of/n_matches per doc — the stream
    // only changes WHEN docs arrive, never what is decided about them
    streamed.length shouldBe batch.length
    val byId = batch.map(r => num(r, "doc_id") -> r).toMap
    streamed.foreach { sr =>
      val br = byId(num(sr, "doc_id"))
      sr.getAs[String]("verdict") shouldBe br.getAs[String]("verdict")
      Option(sr.getAs[Any]("dup_of")).map(_.toString) shouldBe
        Option(br.getAs[Any]("dup_of")).map(_.toString)
      num(sr, "n_matches") shouldBe num(br, "n_matches")
    }
    // both verdicts occur: the gate genuinely splits the stream
    streamed.map(_.getAs[String]("verdict")).distinct.sorted shouldBe
      Seq("near_dup", "unique")
  }
}
