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

  test("q101 retention cells re-derive from raw events (first-day cohorts)") {
    val rows = Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        to_date(col("ts")).cast("string").as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val firstDay = rows.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val expected = rows.map { case (u, d) => (u, d) }.distinct
      .map { case (u, d) =>
        val c = firstDay(u)
        val off = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(c), java.time.LocalDate.parse(d))
        (c, off)
      }
      .filter(_._2 <= 7)
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val out = queries.RelationalStats.queries("q101_retention_cohorts")(spark, sfDir)
      .collect()
      .map(r => ((r.getDate(0).toString, r.getInt(1).toLong), r.getLong(2)))
      .toMap
    out shouldBe expected
    // offset-0 cell of each cohort = the cohort's size (everyone is active
    // on their own first day)
    val sizes = firstDay.values.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    sizes.foreach { case (c, n) => out((c, 0L)) shouldBe n }
  }

  test("x34 drift terms re-derive from raw counts; symmetric KL total positive") {
    val out = queries.TextOps.queries("x34_distribution_drift")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 16
    val total = out.find(_._1 == "__total_sym_kl__").get
    total._4 should be > 0L // the two slices genuinely differ
    val top = out.filterNot(_._1 == "__total_sym_kl__")
    top should have length 15
    // independently recount the top words and replay the nano-nat formula
    val words = Tables.load(spark, sfDir, "documents")
      .select((col("doc_id") >= 250).as("isnew"),
        explode(split(col("text"), " +")).as("w"))
      .filter(col("w") =!= "").collect()
      .map(r => (r.getBoolean(0), r.getString(1)))
    val nb = words.count(!_._1).toLong
    val nn = words.count(_._1).toLong
    val v = words.map(_._2).distinct.length.toLong
    top.foreach { case (w, cb, cn, drift) =>
      cb shouldBe words.count(x => !x._1 && x._2 == w).toLong
      cn shouldBe words.count(x => x._1 && x._2 == w).toLong
      val pb = (cb + 1).toDouble / (nb + v).toDouble
      val pn = (cn + 1).toDouble / (nn + v).toDouble
      val m = math.round(pb * math.log(pb / pn) * 1000000000.0)
      val n = math.round(pn * math.log(pn / pb) * 1000000000.0)
      drift shouldBe (m + n)
    }
  }

  test("s19 IVFPQ ranks candidates by non-decreasing ADC and finds exact-L2 neighbors") {
    val out = queries.Similarity.queries("s19_knn_ivfpq")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    byQ.size shouldBe 20
    byQ.values.foreach { g =>
      g.map(_._2).sorted shouldBe (1 to g.length)
      // ADC distance non-decreasing in rank order
      g.sortBy(_._2).map(_._4).sliding(2).foreach { w =>
        if (w.length == 2) w(0) should be <= w(1)
      }
    }
    // compressed-index quality floor. The synthetic embeddings are
    // near-random in 64-dim — the WORST case for product quantization
    // (s11 measures plain-PQ recall@3 at ~0.2 on the same data; s12
    // exists to repair it by exact re-rank) — so the floor only pins
    // "meaningfully better than chance" (random top-3 of ~300: ~0.01),
    // not production recall.
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, sfDir, "embeddings")
    graft.functions.GraftFunctions.register(spark)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val truth = q.hint("broadcast")
      .crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("ce")))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr("graft_l2(qe, ce)").as("d"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d").asc, col("cid"))))
      .filter(col("rk") <= 3).select(col("qid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = out.count(r => truth.contains((r._1, r._3)))
    hits.toDouble / 60.0 should be >= 0.05
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
