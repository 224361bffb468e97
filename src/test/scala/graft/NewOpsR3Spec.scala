package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-3 operator semantics: moment-derived statistics, passage dedup,
  * quantized ANN, vocab top-k, source profile, interval arithmetic. */
class NewOpsR3Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q65 moment formulas agree with Spark's builtin statistical aggs") {
    val m = SparkEntry.queries("q65_stats_moments")(spark, sfDir)
      .select("l_returnflag", "stddev_qty", "covar_qd", "corr_qd", "regr_slope")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val b = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        covar_samp(col("l_quantity"), col("l_discount")).as("cv"),
        corr(col("l_quantity"), col("l_discount")).as("cr"),
        regr_slope(col("l_discount"), col("l_quantity")).as("sl"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    m.keySet shouldBe b.keySet
    // builtins use float streaming updates; the decimal-moment form is the
    // exact value — they agree to ~1e-6 relative, not bit-for-bit (which is
    // exactly why the oracle-gated query uses moments)
    m.foreach { case (k, (sd, cv, cr, sl)) =>
      val (bsd, bcv, bcr, bsl) = b(k)
      sd shouldBe bsd +- math.abs(bsd) * 1e-6
      cv shouldBe bcv +- math.abs(bcv) * 1e-6
      cr shouldBe bcr +- math.abs(bcr) * 1e-6
      sl shouldBe bsl +- math.abs(bsl) * 1e-6
    }
  }

  test("d08 passage chunking: every reported passage repeats across docs") {
    val rows = SparkEntry.queries("d08_passage_dedup")(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      val nd = r.getLong(r.fieldIndex("nd"))
      nd should be > 1L
      n should be >= nd
    }
    // chunk count invariant on a constructed doc: 23 words -> 3 chunks
    import spark.implicits._
    val df = Seq((1L, (1 to 23).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
      .select(split(col("text"), " ").as("ws"))
      .select(explode(expr("sequence(0, ((size(ws) + 9) div 10) - 1)")).as("i"), col("ws"))
      .select(expr("slice(ws, i * 10 + 1, 10)").as("chunk"))
    val chunks = df.collect().map(_.getSeq[String](0))
    chunks.length shouldBe 3
    chunks.map(_.length).toSeq shouldBe Seq(10, 10, 3)
  }

  test("s07 quantization bounds and exact-rank agreement at the top") {
    val out = SparkEntry.queries("s07_knn_quantized")(spark, sfDir)
    val rows = out.collect()
    rows.length shouldBe 60 // 20 queries x top-3
    // int8 symmetric quantization: |dot| <= 64 * 127^2
    rows.foreach(r => math.abs(r.getLong(r.fieldIndex("qdot"))) should be <= 64L * 127 * 127)
    // determinism: a second run returns the identical result set
    val again = SparkEntry.queries("s07_knn_quantized")(spark, sfDir).collect()
    again.map(_.toString).sorted.toSeq shouldBe rows.map(_.toString).sorted.toSeq
    // quality: quantized top-3 overlaps exact float cosine top-3 for most
    // queries (recall >= 0.5 on this tiny corpus is a loose floor; observed
    // ~0.9+) — quantization trades recall for bandwidth, not correctness
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val exact = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr(graft.queries.QueryHelpers.cosineExpr("qe", "ce")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = rows.map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("cid")))).toSet
    val recall = quant.count(exact.contains).toDouble / exact.size
    recall should be >= 0.5
  }

  test("x06 vocab: descending counts, deterministic tiebreak, true counts") {
    val rows = SparkEntry.queries("x06_vocab_topk")(spark, sfDir).collect()
    rows.length should be > 0
    val counts = rows.map(_.getLong(1))
    counts.zip(counts.tail).foreach { case (a, b) => a should be >= b }
    // spot-check the top term's count against a direct aggregation
    val top = rows.head.getString(0)
    val n = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === top).count()
    rows.head.getLong(1) shouldBe n
  }

  test("m06 source profile totals reconcile with direct byte accounting") {
    val prof = SparkEntry.queries("m06_source_profile")(spark, sfDir).collect()
    val totalBytes = prof.map(_.getLong(prof.head.fieldIndex("total_bytes"))).sum
    val direct = Tables.load(spark, sfDir, "documents")
      .agg(sum(org.apache.spark.sql.functions.length(col("text"))))
      .collect().head.getLong(0)
    totalBytes shouldBe direct
    prof.foreach { r =>
      val mean = r.getDouble(r.fieldIndex("mean_cp"))
      mean should be > 0.0
      mean should be < 256.0 // ASCII corpus: mean code point per byte < 256
    }
  }

  test("positional join pairs by rank and NULL-pads the shorter side") {
    import spark.implicits._
    val l = Seq("a", "b", "c").toDF("lv")
    val r = Seq(10, 20).toDF("rv")
    val out = graft.operators.PositionalJoin
      .byOrder(l, Seq(col("lv")), r, Seq(col("rv")))
      .orderBy(col("pos")).collect()
    out.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getInt(2))).toSeq shouldBe
      Seq((0L, "a", 10), (1L, "b", 20), (2L, "c", null))
  }

  test("q68 EXCLUDE GROUP is NULL when only peers precede; TIES keeps self") {
    val rows = SparkEntry.queries("q68_frame_exclude_more")(spark, sfDir).collect()
    rows.length should be > 0
    // each user's earliest-day rows have excl_group NULL (nothing outside
    // the peer group precedes), so every user shows at least one NULL
    rows.groupBy(_.getLong(0)).values.foreach { userRows =>
      userRows.exists(_.isNullAt(userRows.head.fieldIndex("excl_group"))) shouldBe true
    }
    // excl_ties is never NULL: the current row always stays in frame
    rows.foreach(r => r.isNullAt(r.fieldIndex("excl_ties")) shouldBe false)
  }

  test("q71 typed fold matches the declarative aggregation") {
    val typed = SparkEntry.queries("q71_stateful_typed")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val decl = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100.0) as bigint)")).as("cents"),
        max(col("event_id")).as("mx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    typed shouldBe decl
  }

  test("q67 interval arithmetic: day offsets and month-end clamping") {
    val rows = SparkEntry.queries("q67_interval_arith")(spark, sfDir)
    rows.select(datediff(col("plus7d"), col("minus1m"))).collect()
      .foreach(r => r.getInt(0) should (be >= 35 and be <= 38)) // 7d + ~1 month
    // month addition clamps: Jan 31 - 1 month stays in-range
    val clamp = spark.sql(
      "SELECT CAST(DATE '1997-03-31' - INTERVAL 1 MONTH AS DATE) AS d").collect().head
    clamp.getDate(0).toString shouldBe "1997-02-28"
  }
}
