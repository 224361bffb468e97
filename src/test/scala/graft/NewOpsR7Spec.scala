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

  private val sfDir = "/root/testdata/sf0.001"

  test("d24 analytic S-curve matches the closed form and its boundary " +
      "identities") {
    val rows = queries.Dedup.queries("d24_lsh_curve")(spark, sfDir)
      .collect()
      .map(r => ((r.getAs[Int]("b"), r.getAs[Int]("r"),
        r.getAs[Int]("s20")), r.getAs[Double]("p_candidate")))
      .toMap
    rows.size shouldBe 80
    // closed form via the same left-assoc multiply chains
    def p(b: Int, r: Int, s: Double): Double = {
      val sr = (1 to r).map(_ => s).product
      1.0 - (1 to b).map(_ => 1.0 - sr).product
    }
    for (((b, r, s20), got) <- rows) {
      val want = BigDecimal(p(b, r, s20 / 20.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      withClue(s"(b=$b r=$r s20=$s20) ") {
        math.abs(got - want) should be <= 1e-9
      }
    }
    // s = 1.0 always qualifies; the curve is monotone in s for each config
    Seq((1, 8), (2, 4), (4, 2), (8, 1)).foreach { case (b, r) =>
      rows((b, r, 20)) shouldBe 1.0
      val curve = (1 to 20).map(i => rows((b, r, i)))
      curve.sliding(2).foreach { w => w(0) should be <= w(1) }
    }
  }

  test("x44 counts exactly the planted intra-doc chunk repeats") {
    import org.apache.spark.sql.functions.{col, split}
    val out = queries.TextOps.queries("x44_selfrep_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out.nonEmpty shouldBe true
    // every flagged doc is a planted one (no organic intra-doc repeats in
    // the fixture corpus) and long docs plant exactly 2 duplicate chunks
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.keys.foreach { d => (d % 7) shouldBe 0L }
    out.foreach { case (d, (nChunks, nDup, dupTokens)) =>
      val n = docs(d)
      withClue(s"doc $d ($n words) ") {
        // the planted prefix is min(n, 20) words long
        nChunks shouldBe (n + math.min(n, 20)) / 10
        if (n >= 20) nDup shouldBe 2L else nDup should be >= 1L
        dupTokens shouldBe nDup * 10
      }
    }
    // coverage: every planted doc with >= 20 words is flagged
    docs.filter { case (d, n) => d % 7 == 0 && n >= 20 }
      .keys.foreach { d => out.contains(d) shouldBe true }
  }

  test("d25 cohesion rows are internally consistent with the d07 clusters") {
    val out = queries.Dedup.queries("d25_cluster_cohesion")(spark, sfDir)
      .collect()
    out.length should be > 0
    val clusters = queries.Dedup.queries("d07_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // id -> lbl
    val bySize = clusters.groupBy(_._2).map { case (l, m) => l -> m.size }
    out.foreach { r =>
      val (cluster, nMembers, nPairs) =
        (r.getLong(0), r.getLong(1), r.getLong(2))
      val (mean, mn, mx) = (r.getLong(3), r.getLong(4), r.getLong(5))
      withClue(s"cluster $cluster ") {
        // the label is its own smallest member; sizes agree with d07
        bySize(cluster).toLong shouldBe nMembers
        nMembers should be >= 2L
        nPairs should be >= 1L
        nPairs should be <= nMembers * (nMembers - 1) / 2
        mn should be <= mean
        mean should be <= mx
        mx should be <= 1000000L
      }
    }
  }

  test("p01 export lands as a hive-partitioned layout by source") {
    queries.Pipeline.queries("p01_pipeline_e2e")(spark, sfDir).count()
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val export = tmp.listFiles()
      .filter(f => f.getName.startsWith("graft_p01_export") && f.isDirectory)
      .maxBy(_.lastModified())
    val packed = new java.io.File(export, "packed.parquet")
    packed.isDirectory shouldBe true
    val parts = packed.listFiles().filter(_.getName.startsWith("source="))
    parts.length should be > 1
  }
}
