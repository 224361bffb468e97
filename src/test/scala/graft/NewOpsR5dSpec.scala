package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic properties of the round-5 fourth batch: q89 gap-fill/LOCF
  * (dense hourly grid, conserved counts, carry-forward), q90 SCD2
  * (tiling validity intervals, one open row per key), x26 curriculum
  * ordering (dense ranks, tier monotonicity, interleave shape). */
class NewOpsR5dSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("q89 grid is dense hourly per user; counts conserved; LOCF carries") {
    val rows = SparkEntry.queries("q89_gap_fill")(spark, sfDir)
      .orderBy(col("user_id"), col("h")).collect()
    rows.length should be > 0
    val src = Tables.load(spark, sfDir, "events")
      .filter(col("user_id") < 5)
    rows.map(_.getAs[Long]("n_events")).sum shouldBe src.count()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val hs = rs.map(_.getAs[java.sql.Timestamp]("h").getTime).sorted
      withClue(s"user $u") {
        // dense hourly grid: every step is exactly one hour
        hs.zip(hs.tail).foreach { case (a, b) => b - a shouldBe 3600000L }
        // once a value appears it is never null again (carry-forward)
        val vs = rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
          .map(r => Option(r.getAs[java.lang.Double]("v_locf")))
        val firstDefined = vs.indexWhere(_.isDefined)
        if (firstDefined >= 0)
          vs.drop(firstDefined).forall(_.isDefined) shouldBe true
      }
    }
  }

  test("q90 SCD2 intervals tile; exactly one open row per user; no no-op versions") {
    val rows = SparkEntry.queries("q90_scd2")(spark, sfDir)
      .orderBy(col("user_id"), col("version")).collect()
    rows.length should be > 0
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      withClue(s"user $u") {
        sorted.map(_.getAs[Long]("version")).toSeq shouldBe
          (1L to sorted.length).toSeq
        sorted.count(_.getAs[Boolean]("is_current")) shouldBe 1
        sorted.last.getAs[Boolean]("is_current") shouldBe true
        sorted.zip(sorted.tail).foreach { case (a, b) =>
          // interval end = next interval start (half-open tiling)
          a.getAs[java.sql.Timestamp]("valid_to") shouldBe
            b.getAs[java.sql.Timestamp]("valid_from")
          // consecutive versions always change state
          a.getAs[String]("event_type") should not be
            b.getAs[String]("event_type")
        }
      }
    }
  }

  test("q91 z-order buckets balance spans across BOTH dimensions") {
    // At a fixed bucket count the span PRODUCT equalizes between z-order
    // and a single-column sort (k buckets -> 1/k of the area either way);
    // the z-order win is BALANCE: the mean normalized span over both
    // dimensions drops, because a single-column sort leaves the unsorted
    // dimension at ~full width — so predicates on EITHER dimension prune.
    val rows = SparkEntry.queries("q91_zorder_layout")(spark, sfDir).collect()
    rows.length shouldBe 16
    val raw = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .selectExpr("o_custkey AS cust",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT) AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rc = (raw.map(_._1).max - raw.map(_._1).min).toDouble
    val rd = (raw.map(_._2).max - raw.map(_._2).min).toDouble
    def meanNorm(spans: Seq[(Double, Double)]): Double =
      spans.map { case (c, d) => (c / rc + d / rd) / 2 }.sum / spans.length
    val z = meanNorm(rows.toSeq.map(r =>
      (r.getAs[Long]("cust_span").toDouble, r.getAs[Long]("day_span").toDouble)))
    val naive = meanNorm(
      raw.sortBy(_._1).grouped(math.ceil(raw.length / 16.0).toInt).map { g =>
        ((g.map(_._1).max - g.map(_._1).min).toDouble,
          (g.map(_._2).max - g.map(_._2).min).toDouble)
      }.toSeq)
    withClue(s"zorder=$z naive=$naive: ") { z should be < naive }
  }

  test("q92 funnel counts equal an independent per-user recomputation") {
    val r = SparkEntry.queries("q92_funnel")(spark, sfDir).collect().head
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getAs[java.sql.Timestamp](2)))
      .groupBy(_._1)
    val week = 7L * 24 * 3600 * 1000
    var nv = 0L; var nc = 0L; var np = 0L
    ev.values.foreach { rows =>
      val ts = rows.map(r => (r._2, r._3.getTime))
      val vts = ts.filter(_._1 == "view").map(_._2)
      if (vts.nonEmpty) {
        nv += 1
        val v = vts.min
        val cts = ts.filter(t => t._1 == "click" && t._2 > v && t._2 <= v + week)
          .map(_._2)
        if (cts.nonEmpty) {
          nc += 1
          val c = cts.min
          if (ts.exists(t =>
            t._1 == "purchase" && t._2 > c && t._2 <= v + week)) np += 1
        }
      }
    }
    (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_purchase")) shouldBe ((nv, nc, np))
    r.getAs[Double]("view_to_click") should (be > 0.0 and be <= 1.0)
  }

  test("x27 held-out perplexity equals an independent Scala recomputation") {
    val got = SparkEntry.queries("x27_heldout_ppl")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.length >= 2)
    def md5i(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def grams(t: String): Seq[String] =
      (0 until t.length - 1).map(i => t.substring(i, i + 2))
    val (train, eval) = docs.partition(d => md5i(s"split:${d._1}") % 10 < 8)
    val counts = train.flatMap(d => grams(d._3))
      .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val total = counts.values.sum
    val nll = counts.map { case (g, c) =>
      g -> math.round(-math.log(c.toDouble / total.toDouble) * 1e6)
    }
    val oov = math.round(math.log(total.toDouble) * 1e6)
    val want = eval.groupBy(_._2).map { case (src, ds) =>
      val gs = ds.flatMap(d => grams(d._3))
      val nOov = gs.count(g => !nll.contains(g)).toLong
      val tot = gs.map(g => nll.getOrElse(g, oov)).sum
      src -> (ds.length.toLong, gs.length.toLong, nOov,
        Math.floorDiv(tot, gs.length.toLong))
    }
    got shouldBe want
    // held-out OOV exists only if a bigram never appears in training —
    // either way the score is total (no nulls)
    got.values.foreach { case (_, nb, nOov, avg) =>
      nOov should be >= 0L
      nOov should be <= nb
      avg should be > 0L
    }
  }

  test("x26 curriculum: dense ranks, tiers ascend, interleave is pos-major") {
    val rows = SparkEntry.queries("x26_curriculum_order")(spark, sfDir)
      .orderBy(col("rank")).collect()
    rows.map(_.getAs[Long]("rank")).toSeq shouldBe (1L to 200L).toSeq
    val tiers = rows.map(_.getAs[Long]("tier"))
    tiers.zip(tiers.tail).foreach { case (a, b) => a should be <= b }
    rows.groupBy(_.getAs[Long]("tier")).foreach { case (_, rs) =>
      val keys = rs.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source")))
      // pos-major interleave: (pos, source) strictly increases within a tier
      keys.zip(keys.tail).foreach { case (a, b) =>
        (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) shouldBe true
      }
    }
  }
}
