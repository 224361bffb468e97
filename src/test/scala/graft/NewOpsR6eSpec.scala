package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 batch-5 semantic specs:
  *  - q102 sessionize: every session's internal gaps are <= 30 min, the
  *    gap BETWEEN consecutive sessions of a user is > 30 min, and event
  *    counts reconcile with the filtered input.
  *  - q103 merge upsert: the full-outer MERGE triad — updated keys carry
  *    the bumped source price, kept keys the target price, inserted keys
  *    exist only in the source slice.
  *  - x35 word entropy: the native one-pass graft_word_entropy must equal
  *    an independently computed per-doc entropy (fixed-point micro-nat
  *    convention), and uniform-token docs must hit ln(n) exactly.
  */
class NewOpsR6eSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q102 sessions split exactly at the 30-minute gap rule") {
    val out = queries.RelationalStats.queries("q102_sessionize")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000, r.getTimestamp(3).getTime / 1000,
        r.getLong(4)))
    out.length should be > 0
    // per user: session_no is 1..k dense, ordered, and consecutive
    // sessions are separated by > 1800 s (end of prior -> start of next)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ss = rows.sortBy(_._2)
      ss.map(_._2) shouldBe (1L to ss.length.toLong)
      ss.sliding(2).foreach {
        case Array(a, b) => (b._3 - a._4) should be > 1800L
        case _ =>
      }
      // a session's span is bounded by its gaps: with n events all gaps
      // <= 1800, duration <= (n-1) * 1800
      ss.foreach { s => (s._4 - s._3) should be <= (s._5 - 1) * 1800L }
    }
    // event counts reconcile with the filtered input
    val n = Tables.load(spark, sfDir, "events")
      .filter(col("user_id") <= 300).count()
    out.map(_._5).sum shouldBe n
  }

  test("q103 merge triad: updated/kept/inserted partition the key space") {
    val out = queries.RelationalStats.queries("q103_merge_upsert")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    val orders = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    out.foreach { case (k, status, price, action) =>
      val (origStatus, origPrice) = orders(k)
      val inTarget = k % 3 != 0
      val inSource = k % 2 == 0
      action shouldBe (if (inTarget && inSource) "updated"
                       else if (inSource) "inserted" else "kept")
      if (inSource) {
        status shouldBe "U"
        price shouldBe (BigDecimal(origPrice).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * BigDecimal("1.10")).toDouble
      } else {
        status shouldBe origStatus
        price shouldBe origPrice
      }
    }
    // every in-scope key appears exactly once
    out.map(_._1).toSet shouldBe orders.keySet.filter(k => k % 3 != 0 || k % 2 == 0)
    out.length shouldBe out.map(_._1).toSet.size
  }

  test("x35 native entropy matches an independent fixed-point computation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = queries.TextOps.queries("x35_word_entropy")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.length should be > 0
    out.foreach { case (id, nTokens, nTypes, entropyMicro) =>
      val words = docs(id).split(" +").filter(_.nonEmpty)
      words.length.toLong shouldBe nTokens
      val counts = words.groupBy(identity).view.mapValues(_.length.toLong)
      counts.size.toLong shouldBe nTypes
      val s = counts.values
        .map(c => c * Math.round(Math.log(c.toDouble) * 1e6)).sum
      val exp = Math.round(Math.log(nTokens.toDouble) * 1e6) - s / nTokens
      entropyMicro shouldBe exp
    }
  }

  test("x35 uniform-token document entropy is exactly quantized ln(n)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("a b c d", "x x x x", "p q p q").toDF("text")
      .selectExpr("graft_word_entropy(text) AS e")
      .select(col("e.n_tokens"), col("e.n_types"), col("e.entropy_micro"))
      .collect()
    // 4 distinct tokens: H = ln(4); all-same: H = 0; two of each: ln(2)
    df(0).getLong(2) shouldBe Math.round(Math.log(4.0) * 1e6)
    df(1).getLong(2) shouldBe 0L
    df(2).getLong(2) shouldBe
      Math.round(Math.log(4.0) * 1e6) - Math.round(Math.log(2.0) * 1e6)
  }
}
