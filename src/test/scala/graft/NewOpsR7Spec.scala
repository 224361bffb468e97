package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-7 batch-1 semantic specs:
  *  - x37 PMI collocations must survive degenerate documents (0 or 1
  *    non-empty tokens): Spark's sequence(1, size-1) runs DESCENDING for
  *    size < 2 and would index element_at(ws, 0) → error, where DuckDB's
  *    RANGE(1, LEN(ws)) is just empty. The guard makes the bigram list
  *    empty instead.
  */
class NewOpsR7Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("x37 tolerates 0/1-token documents (empty bigram list, no crash)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_x37_short").toString
    // enough repeated 2-token docs to clear the n_ab >= 5 floor, plus the
    // degenerate shapes that used to crash the whole query
    val docs = (Seq.fill(6)("alpha beta") ++
      Seq("", " ", "solo", "  solo  ", "gamma delta"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.TextOps.queries("x37_pmi_collocations")(spark, dir)
      .collect()
    // only (alpha, beta) clears the n_ab >= 5 floor
    out.length shouldBe 1
    out(0).getAs[String]("a") shouldBe "alpha"
    out(0).getAs[String]("b") shouldBe "beta"
    out(0).getAs[Long]("n_ab") shouldBe 6L
  }
}
