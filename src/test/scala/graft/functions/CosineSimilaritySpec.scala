package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class CosineSimilaritySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("graft_cosine is bit-identical to the interpreted in-order fold") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val interp = "aggregate(zip_with(a, b, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    def norm(c: String) = s"sqrt(aggregate(zip_with($c, $c, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    val out = df.select(
      expr("graft_cosine(a, b)").as("native"),
      expr(s"$interp / (${norm("a")} * ${norm("b")})").as("interp")).collect()
    out.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("null input yields null; codegen and interpreted agree") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 0.0f)), None: Option[Array[Float]])).toDF("a", "b")
    df.selectExpr("graft_cosine(a, b)").collect()(0).isNullAt(0) shouldBe true
  }
}
