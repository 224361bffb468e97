package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-style randomized tests for the SET-assignment splitter shared
  * by UPDATE / UPDATE ... FROM / INSERT ... ON CONFLICT DO UPDATE
  * (Engine.parseAssignments via the public sql() path): the failure
  * classes under test are a ',' or '=' inside a string literal or a
  * parenthesized call being taken for an assignment boundary. Seeded LCG
  * generation, 200 end-to-end statements. */
class AssignmentParserPropertySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  test("literals containing '=', ',' and ' WHERE ' survive SET splitting " +
      "end to end") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "x", "y")).toDF("k", "a", "b")
      .createOrReplaceTempView("ap_src")
    val r = lcg(0xa551617L)
    def word(): String = {
      val len = 1 + math.floorMod(r.next(), 6).toInt
      (0 until len).map(_ => ('a' + math.floorMod(r.next(), 26)).toChar)
        .mkString
    }
    // rhs shapes whose internal '=', ',', WHERE must NOT split
    def rhs(lit1: String): String = math.floorMod(r.next(), 4) match {
      case 0 => s"'$lit1 = x, y WHERE z'"
      case 1 => s"concat('$lit1,=', 'p = q')"
      case 2 => s"CASE WHEN 1 = 1 THEN '$lit1' ELSE 'a,b' END"
      case _ => s"if(k = 1, '$lit1', ',=')"
    }
    (0 until 200).foreach { i =>
      // disjoint-by-construction markers: 'not include' stays exact
      val l1 = s"L${i}a_${word()}"; val l2 = s"L${i}b_${word()}"
      val e1 = rhs(l1)
      val e2 = rhs(l2)
      engine.sql("CREATE OR REPLACE TABLE ap_t AS SELECT k, a, b FROM ap_src")
      engine.sql(s"UPDATE ap_t SET a = $e1, b = $e2 WHERE k = 1")
        .collect()(0).getLong(0) shouldBe 1L
      val row = engine.sql("SELECT a, b FROM ap_t").collect()(0)
      withClue(s"case $i: SET a = $e1, b = $e2 -> ") {
        row.getString(0) should include(l1)
        row.getString(1) should include(l2)
        // the rhs decoys must not leak into the WRONG column
        row.getString(0) should not include l2
      }
    }
    engine.sql("DROP TABLE ap_t")
    engine.close()
  }
}
