package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** r14 skew-proofing of the mirror-matrix pair expansion (VERDICT r13
  * item 4): pair counts must match the naive quadratic form exactly, and
  * the plan must NOT materialize the |set|^2 pair list inside one row. */
class PairExpandSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Reference implementation: the r13 in-row flatten(transform(...)). */
  private def naive(sets: org.apache.spark.sql.DataFrame) =
    sets.filter(org.apache.spark.sql.functions.size(col("ss")) >= 2)
      .select(explode(expr(
        "flatten(transform(ss, a -> transform(filter(ss, b -> b > a), " +
          "b -> named_struct('s1', a, 's2', b))))")).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("c"))

  test("pairCounts equals the in-row expansion on a mixed corpus") {
    import spark.implicits._
    val sets = Seq(
      Seq("a", "b", "c"),
      Seq("a", "c"),
      Seq("b"),
      Seq.empty[String],
      Seq("a", "b", "c", "d", "e")
    ).toDF("ss").withColumn("ss", sort_array(col("ss")))
    val got = PairExpand.pairCounts(sets, "ss", "c")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = naive(sets)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    got shouldBe want
    got should contain(("a", "c", 3L)) // appears in rows 1, 2 and 5
  }

  test("hot-gram set: one group shared by many members stays row-bounded") {
    import spark.implicits._
    // one HOT gram carried by 1000 sources (the 100 TB skew case the r13
    // verdict flagged) plus a cold tail — 1000^2/2 pairs must stream out
    // without building a half-million-struct array in one row
    val hot = (1 to 1000).map(i => f"s$i%04d")
    val sets = Seq(hot, Seq("s0001", "s0002")).toDF("ss")
      .withColumn("ss", sort_array(col("ss")))
    val counted = PairExpand.pairCounts(sets, "ss", "c")
    val agg = counted.agg(sum(col("c")), count(lit(1))).collect().head
    agg.getLong(0) shouldBe (1000L * 999 / 2 + 1) // all hot pairs + 1 dup
    agg.getLong(1) shouldBe (1000L * 999 / 2)     // distinct pairs
    counted.filter(col("s1") === "s0001" && col("s2") === "s0002")
      .collect().head.getLong(2) shouldBe 2L
    // plan shape: the quadratic in-row flatten(transform) is gone; the
    // expansion rides two pipelined Generate operators
    val plan = counted.queryExecution.executedPlan.toString()
    plan should not include "flatten"
    plan.linesIterator.count(_.trim.startsWith("+- Generate")) should be >= 1
  }

  test("pair set is exactly the b > a filter form (sorted distinct input)") {
    import spark.implicits._
    val sets = Seq(Seq("x", "y", "z")).toDF("ss")
      .withColumn("ss", sort_array(col("ss")))
    PairExpand.pairs(sets, "ss")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("x", "y"), ("x", "z"), ("y", "z"))
  }
}
