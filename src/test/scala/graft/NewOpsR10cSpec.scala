package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 continuation invariants: s43 MaxSim multi-vector retrieval,
  * d36 KMV cardinality sketch, x54 encoding audit, m31 spectral peak. */
class NewOpsR10cSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("s43 MaxSim top-3 equals an independent plain-Scala late-interaction " +
      "recompute over the collected embeddings") {
    val got = SparkEntry.queries("s43_maxsim_multivector")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val all = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def subs(v: Array[Float]): Seq[Array[Float]] =
      (0 until 8).map(i => v.slice(i * 8, i * 8 + 8))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // same sequential index-order fold as graft_cosine
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = all.filter(_._1 < 5)
    queries.foreach { case (qid, qlabel, qv) =>
      val scored = all
        .filter(c => c._2 == qlabel && c._1 != qid)
        .map { case (cid, _, cv) =>
          val score = subs(qv).map { qs =>
            val best = subs(cv).map(ds => cos(qs, ds)).max
            math.round(BigDecimal(best * 1e6)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }.sum
          (cid, score)
        }
        .sortBy { case (cid, sc) => (-sc, cid) }
        .take(3)
      scored.zipWithIndex.foreach { case ((cid, sc), i) =>
        withClue(s"qid $qid rank ${i + 1}") {
          got((qid, i + 1)) shouldBe ((cid, sc))
        }
      }
    }
    got.keySet.map(_._1) shouldBe queries.map(_._1).toSet
  }

  test("d36 KMV: sketch size is min(k, exact), sub-k sources report exactly, " +
      "and the estimator matches a plain-Scala recompute from md5 prefixes") {
    val rows = SparkEntry.queries("d36_kmv_cardinality")(spark, sf).collect()
    rows.length should be > 0
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(text: String): Long = {
      val hex = md.digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val bySource = docs.groupBy(_._1).map { case (s0, g) =>
      s0 -> g.map(d => h48(d._2)).distinct.sorted.toVector
    }
    rows.foreach { r =>
      val (src, exact, nSketch) = (r.getString(0), r.getLong(1), r.getLong(2))
      val est = r.getLong(4)
      val hs = bySource(src)
      withClue(s"source $src") {
        exact shouldBe hs.length.toLong
        nSketch shouldBe math.min(32L, exact)
        if (exact < 32) est shouldBe exact // sketch IS exact below k
        else {
          val hk = hs(31)
          r.getLong(3) shouldBe hk
          est shouldBe 31L * 281474976710656L / hk
        }
        r.getLong(5) shouldBe math.abs(est - exact) * 1000 / exact
      }
    }
  }

  test("x54 encoding audit: detector counts equal the planted-corruption " +
      "arithmetic per source and clean sources report zero") {
    val rows = SparkEntry.queries("x54_encoding_audit")(spark, sf).collect()
    rows.length should be > 0
    val plan = Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s0, g) =>
        val ids = g.map(_._2)
        // CASE precedence: %7 wins; %11 only corrupts when %7 doesn't
        s0 -> (ids.length.toLong,
          ids.count(_ % 7 == 0).toLong,
          ids.count(id => id % 11 == 0 && id % 7 != 0).toLong)
      }
    rows.foreach { r =>
      val (src, nDocs, nRepl, nCtl, nMoji, pm) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (expN, expMoji, expCtl) = plan(src)
      withClue(s"source $src") {
        nDocs shouldBe expN
        nRepl shouldBe expMoji // every mojibake doc also gets U+FFFD
        nMoji shouldBe expMoji
        nCtl shouldBe expCtl
        if (expMoji == 0) pm shouldBe 0L else pm should be > 0L
      }
    }
    // the plant is real on this corpus: at least one source fires
    rows.map(_.getLong(4)).sum should be > 0L
  }

  test("m31 spectral peak: integer-period tones land exactly on their " +
      "fundamental bin and amp/half re-derive from the decoded PCM") {
    val rows = SparkEntry.queries("m31_spectral_peak")(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (id, half, amp, peak) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(4))
      withClue(s"doc $id") {
        // fixture contract, re-derived by the engine from decoded bytes
        half shouldBe (2 + id % 5).toInt
        amp shouldBe (500 + id % 300).toInt
        // period 2*half divides 64 -> fundamental bin exactly 64/(2*half)
        if (64 % (2 * half) == 0) peak shouldBe 64 / (2 * half)
        // non-integer-bin fundamentals still land adjacent to 64/(2*half)
        else math.abs(peak - 64.0 / (2 * half)) should be <= 1.0
        r.getLong(5) should be > 0L
      }
    }
    // the corpus exercises both exact-bin and leakage cases
    rows.map(_.getInt(1)).distinct.length should be >= 3
  }
}
