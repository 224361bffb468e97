package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 batch-4 semantic specs:
  *  - q100 bag set-ops: INTERSECT ALL / EXCEPT ALL multiplicities
  *    re-derived from independent per-key counts (min / floored diff).
  *  - x33 domain mixture: temperature scaling must up-weight small domains
  *    and down-weight the largest without reordering, and the renormalized
  *    weights must sum to ~1e6 ppm.
  *  - m12 audio fingerprint: every degraded query clip must retrieve its
  *    own source recording at rank 1 with the offset-vote alignment at
  *    delta = -1 (one cut window) and votes = its full gram count.
  */
class NewOpsR6dSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q100 bag set-ops multiplicities = min / floored difference of per-key counts") {
    val c = Tables.load(spark, sfDir, "customer")
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val s = Tables.load(spark, sfDir, "supplier")
      .groupBy(col("s_nationkey")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val out = queries.RelationalMore.queries("q100_setops_all")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue, r.getLong(2)))
    val ia = out.filter(_._1 == "intersect_all").map(t => t._2 -> t._3).toMap
    val ea = out.filter(_._1 == "except_all").map(t => t._2 -> t._3).toMap
    (c.keySet ++ s.keySet).foreach { k =>
      val expIa = math.min(c.getOrElse(k, 0L), s.getOrElse(k, 0L))
      val expEa = math.max(c.getOrElse(k, 0L) - s.getOrElse(k, 0L), 0L)
      ia.getOrElse(k, 0L) shouldBe expIa
      ea.getOrElse(k, 0L) shouldBe expEa
    }
    ia.values.foreach(_ should be > 0L) // no zero-count rows emitted
    ea.values.foreach(_ should be > 0L)
  }

  test("x33 temperature scaling boosts small domains, keeps order, sums to ~1e6 ppm") {
    val out = queries.TextOps.queries("x33_domain_mixture")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    out.length should be > 2
    // weights renormalize to one million ppm (integer floor slack only)
    val wSum = out.map(_._4).sum
    wSum should be <= 1000000L
    wSum should be > (1000000L - out.length.toLong * 2)
    // sqrt scaling preserves the token-share ORDER...
    val byTokens = out.sortBy(_._2)
    byTokens.map(_._4).sliding(2).foreach { w =>
      if (w.length == 2) w(0) should be <= w(1)
    }
    // ...but compresses it: smallest domain boosted, largest damped
    byTokens.head._5 should be > 1.0
    byTokens.last._5 should be < 1.0
    // boost must be exactly w_ppm / base_ppm
    out.foreach { case (_, _, base, w, boost) =>
      boost shouldBe (w.toDouble / base.toDouble)
    }
  }

  test("m12 fingerprint retrieves every degraded clip's source at rank 1, delta -1") {
    val out = queries.Multimodal.queries("m12_audio_fingerprint")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val top1 = out.filter(_._2 == 1)
    top1.length should be > 90 // one query row per doc_id <= 100 in the slice
    top1.foreach { case (qid, _, cid, votes, delta) =>
      cid shouldBe qid
      delta shouldBe -1L
      // full-alignment vote count: every query gram votes for the source
      // at the cut-window offset -> votes = nw - 4 complete grams
      val nf = 500 + qid % 250
      val nw = (nf - 25) / 25
      votes shouldBe (nw - 1 - 3 + 1)
    }
  }
}
