package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic properties of the round-5 third batch: s15 MMR diversification
  * (greedy recomputed independently in-test), q88 stream-static join
  * (streamed result equals the batch join), x25 packing curve (corpus
  * totals invariant across contexts, bins monotone). */
class NewOpsR5cSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("s15 MMR picks equal an independent greedy recomputation") {
    // Recompute the whole contract from raw embeddings with plain Scala:
    // same block shortlist (top-8 same-label by cosine), same greedy
    // argmax(0.7*rel - 0.3*max sim to picked), ties by cid.
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    val expected = vecs.filter(_._1 < 5).flatMap { case (qid, lbl, qe) =>
      val shortl = vecs
        .filter(v => v._2 == lbl && v._1 != qid)
        .map(v => (v._1, cos(qe, v._3)))
        .sortBy { case (cid, c) => (-c, cid) }
        .take(8)
      val rel = shortl.toMap
      var picked = List.empty[Long]
      (1 to 3).map { pick =>
        val best = shortl
          .filter { case (cid, _) => !picked.contains(cid) }
          .map { case (cid, r) =>
            val pen = if (picked.isEmpty) 0.0
              else picked.map(p => cos(byId(cid)._3, byId(p)._3)).max
            val score = if (picked.isEmpty) r else 0.7 * r - 0.3 * pen
            (cid, score)
          }
          .minBy { case (cid, sc) => (-sc, cid) }
        picked = picked :+ best._1
        (qid, pick.toLong, best._1)
      }
    }.toSet
    val got = SparkEntry.queries("s15_mmr_diversify")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("pick"), r.getAs[Long]("cid")))
      .toSet
    got shouldBe expected
  }

  test("q88 streamed enrichment equals the batch stream-static join") {
    val got = SparkEntry.queries("q88_stream_static_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), Option(r.get(4)))).toSet
    val e = Tables.load(spark, sfDir, "events").filter(col("user_id") < 10)
    val c = Tables.load(spark, sfDir, "customer")
    val want = e.join(c, e("user_id") === c("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("c_mktsegment"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), Option(r.get(4)))).toSet
    got shouldBe want
    got.size should be > 0
  }

  test("x25 packing curve: corpus totals invariant, bins monotone in context") {
    val rows = SparkEntry.queries("x25_packing_curve")(spark, sfDir)
      .orderBy(col("ctx")).collect()
    rows.map(_.getAs[Long]("ctx")).toSeq shouldBe Seq(128L, 256L, 512L)
    rows.map(_.getAs[Long]("total_tokens")).distinct.length shouldBe 1
    rows.map(_.getAs[Long]("n_docs")).distinct.length shouldBe 1
    val bins = rows.map(_.getAs[Long]("total_bins"))
    bins.zip(bins.tail).foreach { case (a, b) => a should be >= b }
    rows.foreach { r =>
      r.getAs[Long]("capacity") shouldBe
        r.getAs[Long]("total_bins") * r.getAs[Long]("ctx")
      r.getAs[Double]("utilization") should be > 0.0
    }
  }
}
