package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-style randomized tests for the USING SAMPLE rewrite
  * (Engine.rewriteUsingSample): the failure classes under test are
  *  - a 'USING SAMPLE …' inside a string literal being rewritten,
  *  - a JOIN … USING (cols) being mistaken for the sample clause,
  *  - the seeded rows form wrapping MORE than the preceding FROM item
  *    (swallowing an earlier item or a prefix keyword).
  * Seeded LCG generation (the AsofDirectionPropertySpec convention).
  */
class SampleRewritePropertySpec extends AnyFunSuite with Matchers {

  private lazy val engine = new Engine(TestSpark.spark)

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  private def gen(seed: Long, n: Int): Seq[(String, String, Int, Int)] = {
    val r = lcg(seed)
    def word(): String = {
      val len = 1 + math.floorMod(r.next(), 7).toInt
      (0 until len).map(_ => ('a' + math.floorMod(r.next(), 26)).toChar)
        .mkString
    }
    // decoy fragments that must never trigger the rewrite
    def decoy(): String = math.floorMod(r.next(), 4) match {
      case 0 => s"'${word()} USING SAMPLE 5 ROWS'"
      case 1 => s"JOIN ${word()} USING (${word()}, ${word()})"
      case 2 => s"f(${word()} USING SAMPLE 9)"
      case _ => word()
    }
    (0 until n).map { _ =>
      val decoys = (0 until (1 + math.floorMod(r.next(), 3).toInt))
        .map(_ => decoy()).mkString(" ")
      val item = word()
      val rows = 1 + math.floorMod(r.next(), 500).toInt
      val sd = math.floorMod(r.next(), 1000).toInt
      (decoys, item, rows, sd)
    }
  }

  test("decoy USING fragments never rewrite; trailing text is preserved") {
    gen(0xabc1L, 300).foreach { case (decoys, _, _, _) =>
      val q = s"SELECT a FROM t $decoys"
      withClue(q) { engine.rewriteUsingSample(q) shouldBe q }
    }
  }

  test("unseeded rows form becomes TABLESAMPLE in place, decoys intact") {
    gen(0xabc2L, 300).foreach { case (decoys, item, rows, _) =>
      val q = s"SELECT a FROM $item USING SAMPLE $rows ROWS $decoys"
      val out = engine.rewriteUsingSample(q)
      withClue(s"$q -> $out") {
        out shouldBe s"SELECT a FROM $item TABLESAMPLE ($rows ROWS) $decoys"
      }
    }
  }

  test("seeded rows form wraps exactly the preceding item in a " +
      "deterministic-random top-N subquery") {
    gen(0xabc3L, 300).foreach { case (decoys, item, rows, sd) =>
      val q =
        s"SELECT a FROM $item USING SAMPLE $rows ROWS REPEATABLE ($sd) $decoys"
      val out = engine.rewriteUsingSample(q)
      withClue(s"$q -> $out") {
        out shouldBe ("SELECT a FROM " +
          s"(SELECT * FROM $item ORDER BY rand($sd) LIMIT $rows) " +
          s"$item $decoys")
      }
    }
  }

  test("seeded form after a decoy prefix still wraps only the FROM item") {
    gen(0xabc4L, 300).foreach { case (decoys, item, rows, sd) =>
      // decoys sit BETWEEN FROM items: "FROM x JOIN y USING (c), item"
      val q = s"SELECT a FROM x $decoys, $item " +
        s"USING SAMPLE $rows ROWS REPEATABLE ($sd)"
      val out = engine.rewriteUsingSample(q)
      withClue(s"$q -> $out") {
        out should startWith(s"SELECT a FROM x $decoys,")
        out should include(
          s"(SELECT * FROM $item ORDER BY rand($sd) LIMIT $rows) $item")
      }
    }
  }
}
