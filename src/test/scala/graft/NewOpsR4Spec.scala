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

  test("x12 repetition: fractions recompute from raw text") {
    val rows = SparkEntry.queries("x12_repetition")(spark, sfDir).collect()
    rows.length should be > 0
    val texts = Tables.load(spark, sfDir, "documents")
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    rows.take(50).foreach { r =>
      val words = texts(r.getLong(r.fieldIndex("doc_id"))).split(" ", -1)
      val bigrams = words.sliding(2).map(_.mkString(" ")).toSeq
      val five = words.sliding(5).map(_.mkString(" ")).toSeq
      val topN = bigrams.groupBy(identity).values.map(_.length).max
      r.getInt(r.fieldIndex("n_words")) shouldBe words.length
      r.getLong(r.fieldIndex("top_bigram_n")) shouldBe topN.toLong
      r.getDouble(r.fieldIndex("top_bigram_frac")) shouldBe
        (topN.toDouble / bigrams.length) +- 1e-6
      r.getDouble(r.fieldIndex("dup_5gram_frac")) shouldBe
        (1.0 - five.distinct.length.toDouble / five.length) +- 1e-6
    }
  }

  test("x13 LM score: per-doc totals recompute from the corpus bigram model") {
    val texts = Tables.load(spark, sfDir, "documents")
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).filter(_._2.length >= 2)
    val all = texts.flatMap(_._2.sliding(2))
    val counts = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = all.length.toDouble
    val nllMicro = counts.map { case (bg, c) =>
      bg -> math.round(-math.log(c / total) * 1e6) }
    val expected = texts.map { case (id, txt) =>
      val tot = txt.sliding(2).map(nllMicro).sum
      id -> (txt.length - 1L, tot, tot / (txt.length - 1L))
    }.toMap
    val got = SparkEntry.queries("x13_lm_score")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got shouldBe expected
  }

  test("d10 incremental dedup: every new-shard doc gets one consistent verdict") {
    val rows = SparkEntry.queries("d10_incremental_dedup")(spark, sfDir).collect()
    val d = Tables.load(spark, sfDir, "documents").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("text"))).toMap
    val newIds = d.keySet.filter(_ % 10 == 7)
    rows.map(_.getLong(0)).toSet shouldBe newIds
    rows.map(_.getLong(0)).length shouldBe newIds.size // exactly once
    def canon(t: String) = t.toLowerCase.replaceAll(" +", " ")
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      r.getString(r.fieldIndex("verdict")) match {
        case "exact_dup" =>
          val m = r.getLong(r.fieldIndex("matched_id"))
          m % 10 should not be 7L
          canon(d(m)) shouldBe canon(d(id))
          r.isNullAt(r.fieldIndex("jaccard")) shouldBe true
        case "near_dup" =>
          val m = r.getLong(r.fieldIndex("matched_id"))
          m % 10 should not be 7L
          canon(d(m)) should not be canon(d(id))
          r.getDouble(r.fieldIndex("jaccard")) should be >= 0.8
        case "unique" =>
          r.isNullAt(r.fieldIndex("matched_id")) shouldBe true
          // no non-shard doc may share its canonical form
          d.filter(_._1 % 10 != 7).values.count(t => canon(t) == canon(d(id))) shouldBe 0
        case v => fail(s"unexpected verdict $v")
      }
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
