package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 wave-9 invariants: d39 one-permutation hashing sketch. */
class NewOpsR10iSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private val C = 1000000007L
  private val hA = 101L // hashAB.head — the d03 contract
  private val hB = 17L

  private def md5i(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def sketch(shingles: Seq[String]): Seq[Long] = {
    val bins = Array.fill[Option[Long]](8)(None)
    shingles.distinct.foreach { sgl =>
      val h = (hA * (md5i(sgl) % P) + hB) % P
      val j = (h % 8).toInt
      val v = h / 8
      if (bins(j).forall(_ > v)) bins(j) = Some(v)
    }
    (0 until 8).map { j =>
      (0 until 8).iterator
        .flatMap(d => bins((j + d) % 8).map(_ + d * C))
        .next()
    }
  }

  test("d39 densified OPH slots replay from a plain-Scala one-pass " +
      "sketch for every candidate pair, and the estimator algebra holds") {
    val rows = SparkEntry.queries("d39_oph_sketch")(spark, sf).collect()
    rows.length should be > 0
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def shingles(id: Long): Seq[String] =
      docs(id).sliding(3).map(_.mkString(" ")).toSeq
    rows.foreach { r =>
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      val agree = r.getInt(2)
      withClue(s"pair ($d1, $d2)") {
        agree should (be >= 0 and be <= 8)
        r.getLong(3) shouldBe agree * 125L
        r.getLong(5) shouldBe math.abs(r.getLong(3) - r.getLong(4))
        val (s1, s2) = (sketch(shingles(d1)), sketch(shingles(d2)))
        agree shouldBe (0 until 8).count(i => s1(i) == s2(i))
      }
    }
    // an identical-shingle pair (if any) must agree on all 8 slots;
    // verify the sketch is deterministic regardless
    val any = rows.head
    sketch(shingles(any.getLong(0))) shouldBe
      sketch(shingles(any.getLong(0)))
  }
}
