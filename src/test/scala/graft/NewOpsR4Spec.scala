package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-4 operator semantics: benchmark decontamination and filtered ANN. */
class NewOpsR4Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("x11 decontamination: report excludes benchmark docs, ratios are sane") {
    val rows = SparkEntry.queries("x11_decontaminate")(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val docId = r.getLong(r.fieldIndex("doc_id"))
      val nGrams = r.getInt(r.fieldIndex("n_grams"))
      val nOverlap = r.getLong(r.fieldIndex("n_overlap"))
      val ratio = r.getDouble(r.fieldIndex("overlap_ratio"))
      withClue(s"doc $docId: ") {
        docId % 97 should not be 0L // benchmark slice never reports on itself
        nOverlap should be <= nGrams.toLong
        nOverlap should be >= 1L // only overlapping docs are in the report
        ratio shouldBe (nOverlap.toDouble / nGrams) +- 1e-6
        r.getBoolean(r.fieldIndex("contaminated")) shouldBe (ratio >= 0.08)
      }
    }
  }

  test("x11 decontamination: overlap counts match a direct intersection") {
    // independent recomputation: per-doc |grams ∩ benchGrams| via array ops
    val d = Tables.load(spark, sfDir, "documents")
      .filter(expr("size(split(text, ' ')) >= 3"))
    graft.functions.GraftFunctions.register(spark)
    val sh = d.select(col("doc_id"), expr("graft_shingles(text)").as("sh"))
    val benchGrams = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val expected = sh.filter(col("doc_id") % 97 =!= 0)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).count(benchGrams))
      .filter(_._2 > 0).toMap
    val got = SparkEntry.queries("x11_decontaminate")(spark, sfDir)
      .collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getLong(r.fieldIndex("n_overlap")))
      .toMap
    got.view.mapValues(_.toInt).toMap shouldBe expected
  }

  test("s08 filtered ANN: every hit satisfies the metadata predicate") {
    val rows = SparkEntry.queries("s08_knn_filtered")(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val label = r.getInt(r.fieldIndex("label"))
      ((label % 3) + 3) % 3 shouldBe 1
    }
    // ranks are contiguous from 1 within each query
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getInt(g.head.fieldIndex("rank"))).sorted shouldBe (1 to g.length)
    }
  }

  test("s08 filtered ANN: filtering before scoring beats post-filtering s04") {
    // post-filtering the unfiltered top-3 keeps only hits that HAPPEN to
    // satisfy the predicate — strictly fewer than the filtered search's k
    // unless every unfiltered neighbor matched. The filtered operator must
    // dominate: per query it returns >= the post-filtered count.
    val filtered = SparkEntry.queries("s08_knn_filtered")(spark, sfDir)
      .groupBy(col("qid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Tables.load(spark, sfDir, "embeddings")
    val labels = e.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val postFiltered = SparkEntry.queries("s04_knn_ivf_trained")(spark, sfDir)
      .collect()
      .map(r => r.getLong(r.fieldIndex("qid")) -> r.getLong(r.fieldIndex("cid")))
      .filter { case (_, cid) => ((labels(cid) % 3) + 3) % 3 == 1 }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    postFiltered.foreach { case (qid, n) =>
      filtered.getOrElse(qid, 0L) should be >= n
    }
  }
}
