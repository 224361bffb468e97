package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class SaltedJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"l$i"))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = SaltedJoin.saltedJoin(left, right, Seq("k"), buckets = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    salted shouldBe plain
    plain.size shouldBe 900 // the hot key's rows all match; keys 901+ don't
  }

  test("left join preserves unmatched rows exactly once") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (99L, "nomatch")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val out = SaltedJoin.saltedJoin(left, right, Seq("k"), buckets = 4, joinType = "left")
      .collect()
    out.length shouldBe 3
    out.count(_.isNullAt(2)) shouldBe 1
  }
}
