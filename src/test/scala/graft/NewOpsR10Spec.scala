package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 first wave invariants: q122 skyline (Pareto frontier via the
  * distributed prefix-scan spelling) and m30 indexed-color PNG decode.
  * Never value-duplicates the oracle: q122 is checked against an
  * independent brute-force dominance recompute, m30 against the fixture
  * formula replayed in plain Scala (not through ImageCodecs). */
class NewOpsR10Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q122 skyline equals the brute-force dominance recompute; no " +
      "result row dominates another; every excluded row is dominated") {
    val got = SparkEntry.queries("q122_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pts = graft.Tables.load(spark, sf, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("cents"),
        col("p_size").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def dominates(a: (Long, Long, Int), b: (Long, Long, Int)): Boolean =
      a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    val expected = pts.filter(b => !pts.exists(a => dominates(a, b)))
      .sortBy(p => (p._2, p._1))
    got.toSeq shouldBe expected.toSeq
    got.length should be > 0
    // internal consistency: the frontier is an antichain
    got.foreach { a =>
      got.foreach { b =>
        if (a != b) withClue(s"$a dominates $b") {
          dominates(a, b) shouldBe false
        }
      }
    }
    // completeness: every excluded point has a dominator in the frontier
    val inSky = got.toSet
    pts.filter(p => !inSky.contains(p)).foreach { b =>
      withClue(s"excluded $b has no dominator in the skyline") {
        got.exists(a => dominates(a, b)) shouldBe true
      }
    }
  }

  test("m30 palette decode recovers the fixture formula (independent " +
      "replay) and the k=13 plant collapses to one used color") {
    val got = SparkEntry.queries("m30_palette_png")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5))))
      .toMap
    got.size should be > 0
    // plain-Scala replay of the documented fixture contract (no
    // ImageCodecs involvement): w/h/k, palette bytes, index stream
    got.foreach { case (id, (w, h, k, mass, used)) =>
      val ew = (8 + id % 40).toInt
      val eh = (8 + (id * 5) % 32).toInt
      val ek = (4 + id % 13).toInt
      (w, h, k) shouldBe ((ew, eh, ek))
      var emass = 0L
      val eused = scala.collection.mutable.Set[Int]()
      var p = 0
      while (p < ew * eh) {
        val idx = ((p * 13 + id) % ek).toInt
        eused += idx
        var c = 0
        while (c < 3) {
          emass += (idx * 37 + c * 11 + id) % 256
          c += 1
        }
        p += 1
      }
      withClue(s"doc $id") {
        mass shouldBe emass
        used shouldBe eused.size
      }
    }
    // the plant: id % 13 == 9 gives k = 13 and index (p*13+id) % 13 ==
    // id % 13 — exactly ONE palette entry ever referenced
    val planted = got.keys.filter(_ % 13 == 9)
    planted should not be empty
    planted.foreach { id => got(id)._5 shouldBe 1 }
    // and a non-plant with gcd(13, k) = 1 uses its full palette
    val full = got.keys.filter(id => id % 13 != 9)
    full should not be empty
    full.foreach { id => got(id)._5 shouldBe got(id)._3 }
  }
}
