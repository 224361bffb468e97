package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-style randomized tests for the quote/paren-aware top-level
  * WHERE scanner that splits UPDATE/DELETE statements
  * (Engine.splitAtTopLevelWhere): the failure class under test is a
  * ' WHERE ' inside a string literal or a parenthesized subexpression
  * being mistaken for the clause boundary — the same class the ASOF
  * alias-strip fix addressed in round 5. Seeded LCG generation (the
  * AsofDirectionPropertySpec convention), 500 cases per property.
  */
class WhereScannerPropertySpec extends AnyFunSuite with Matchers {

  private lazy val engine = new Engine(TestSpark.spark)

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  private def cases(seed: Long, n: Int): Seq[(String, String)] = {
    val r = lcg(seed)
    def word(): String = {
      val len = 1 + math.floorMod(r.next(), 7).toInt
      (0 until len).map(_ => ('a' + math.floorMod(r.next(), 26)).toChar)
        .mkString
    }
    // fragments that must NEVER trigger a split
    def opaque(): String = math.floorMod(r.next(), 9) match {
      case 0 => word()
      case 1 => s"'${word()} WHERE ${word()}'" // single-quoted literal
      case 2 => s""""${word()} WHERE ${word()}"""" // double-quoted
      case 3 => s"`${word()} WHERE ${word()}`" // backquoted identifier
      case 4 => s"f(${word()}, ${word()} WHERE ${word()})" // parens
      case 5 => // dollar-quoted literal (r10: Postgres form DuckDB accepts)
        "$$" + word() + " WHERE " + word() + "$$"
      case 6 => // tagged dollar quote
        val tag = word()
        "$" + tag + "$" + word() + " WHERE " + word() + "$" + tag + "$"
      case 7 => // NESTED block comment (r10): one comment to the scanner
        s"/* ${word()} /* WHERE ${word()} */ ${word()} WHERE */"
      case _ => s"WHERE_${word()}" // prefix is one identifier token
    }
    def frags(): String =
      (0 until (1 + math.floorMod(r.next(), 4).toInt))
        .map(_ => opaque()).mkString(" ")
    (0 until n).map(_ => (frags(), frags()))
  }

  test("WHERE inside quotes or parens never splits; a real WHERE always does") {
    cases(0x5eed1L, 500).foreach { case (body, pred) =>
      withClue(body) {
        engine.splitAtTopLevelWhere(body) shouldBe ((body.trim, None))
      }
      val stmt = s"$body WHERE $pred"
      withClue(stmt) {
        val (b, w) = engine.splitAtTopLevelWhere(stmt)
        b shouldBe body.trim
        w shouldBe Some(pred.trim)
      }
    }
  }

  test("the first top-level WHERE wins when the predicate contains another") {
    cases(0x5eed2L, 200).foreach { case (a, b) =>
      val stmt = s"$a WHERE $b WHERE $a"
      val (body, w) = engine.splitAtTopLevelWhere(stmt)
      withClue(stmt) {
        body shouldBe a.trim
        w shouldBe Some(s"$b WHERE $a".trim)
      }
    }
  }

  test("word boundaries: WHEREx / xWHERE are identifiers, not keywords") {
    engine.splitAtTopLevelWhere("a WHEREx b") shouldBe (("a WHEREx b", None))
    engine.splitAtTopLevelWhere("a xWHERE b") shouldBe (("a xWHERE b", None))
    engine.splitAtTopLevelWhere("a where b") shouldBe (("a", Some("b")))
  }
}
