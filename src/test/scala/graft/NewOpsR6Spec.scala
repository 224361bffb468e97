package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 hardening + scale-plumbing specs: the DistributedRank helper
  * (exact distributed ranks/NTILE without a global window), the quote-aware
  * ASOF alias strip, the d16 plan-literal cap, PqAdc code bounds, and the
  * per-query conf isolation of streaming snapshots. */
class NewOpsR6Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("DistributedRank matches the global window's ranks and NTILE exactly") {
    import spark.implicits._
    // adversarial value distribution: heavy ties, skew, negatives
    val rows = (1 to 997).map { i =>
      val v = if (i % 7 == 0) 42L else (i * 2654435761L % 101) - 50
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    for (tiles <- Seq(3, 4, 16, 256); parts <- Seq(1, 5, 32)) {
      val (ranked, total) = graft.operators.DistributedRank.withGlobalRank(
        df, col("v"), Seq(col("v"), col("id")), "rk", parts)
      total shouldBe 997L
      val got = ranked
        .withColumn("tile", graft.operators.DistributedRank
          .ntileFromRank(col("rk"), tiles, total))
        .select("id", "rk", "tile").as[(Long, Long, Long)].collect().sortBy(_._1)
      val w = Window.orderBy(col("v"), col("id"))
      val want = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("tile", ntile(tiles).over(w).cast("long"))
        .select("id", "rk", "tile").as[(Long, Long, Long)].collect().sortBy(_._1)
      withClue(s"tiles=$tiles parts=$parts") { got shouldBe want }
    }
  }

  test("DistributedRank plans partitioned windows only (no global funnel)") {
    import org.apache.spark.sql.execution.window.WindowExec
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v")
    val (ranked, _) = graft.operators.DistributedRank.withGlobalRank(
      df, col("v"), Seq(col("v"), col("id")), "rk", 8)
    val global = ranked.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    global shouldBe empty
  }

  test("ASOF alias strip is quote-aware and dotted-name safe") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, 10L, "x"), (1L, 25L, "y")).toDF("k", "t", "ev")
      .createOrReplaceTempView("asof_sl")
    Seq((1L, 8L, 100.0), (1L, 20L, 200.0)).toDF("k", "rt", "price")
      .createOrReplaceTempView("asof_sr")
    // alias `e` appears inside a string literal ('e.g. ...') and as the
    // suffix of a qualified reference — neither may be rewritten
    val out = engine.sql(
      """SELECT e.ev, 'e.g. keep e.this' AS note, r.price
        |FROM asof_sl e ASOF JOIN asof_sr r
        |ON e.k = r.k AND e.t >= r.rt ORDER BY e.ev""".stripMargin).collect()
    out.map(_.getString(1)).distinct.toSeq shouldBe Seq("e.g. keep e.this")
    out.map(r => (r.getString(0), r.getDouble(2))).toSeq shouldBe
      Seq(("x", 100.0), ("y", 200.0))
    engine.close()
  }

  test("d16 bloom plan literal enforces the size cap before planning") {
    val small = Array.fill[Byte](1024)(7)
    queries.Dedup.bloomPlanLiteral(small) shouldBe
      java.util.Base64.getEncoder.encodeToString(small)
    val ex = intercept[IllegalArgumentException] {
      queries.Dedup.bloomPlanLiteral(Array.fill[Byte](5 << 20)(7))
    }
    ex.getMessage should include("plan-literal cap")
  }

  test("WAV decoder rejects a short fmt chunk instead of misreading") {
    val wav = media.AudioCodecs.encodeWav(8000, 1,
      Array.tabulate(8)(_.toShort))
    wav(16) = 12 // declared fmt length < canonical 16
    val ex = intercept[IllegalArgumentException] {
      media.AudioCodecs.decodeWav(wav)
    }
    ex.getMessage should include("short fmt chunk")
  }

  test("graft_pq_adc rejects out-of-range codes with a named error") {
    graft.functions.GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT graft_pq_adc(array(1.0d), array(5),
          |array(array(array(0.0d)))) AS d""".stripMargin).collect()
    }
    // surfaced through Spark's execution wrapper; the root message names
    // the code and the valid range
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    messages(ex).mkString("\n") should include("out of range")
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("d17 recovers the planted 120-char cross-doc spans exactly") {
    val rows = SparkEntry.queries("d17_span_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows should not be empty
    val plantedPairs = rows.filter { case (d1, d2, _, _, _) =>
      d2 == d1 + 3000000L
    }
    plantedPairs should not be empty
    // every planted twin shares exactly the embedded slice with its origin:
    // the longest span covers the full 120 chars (guard text blocks
    // extension), and the removable accounting includes it
    plantedPairs.foreach { case (_, _, nSpans, maxSpan, removed) =>
      maxSpan should be >= 120L
      nSpans should be >= 1L
      removed should be >= maxSpan
    }
  }

  test("x28 collapses URL variants and enforces the domain cap") {
    val rows = SparkEntry.queries("x28_url_curation")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows should not be empty
    rows.foreach { case (domain, nDocs, nCanon, nDup, nKept) =>
      domain should fullyMatch regex "www\\.[a-z0-9_]+\\.com"
      nCanon + nDup shouldBe nDocs // accounting closes
      nKept should be <= math.min(nDocs, 100L)
    }
    // canonicalization must actually collapse something: the four https
    // variants of each full group share one canonical URL
    rows.map(_._4).sum should be > 0L
  }

  test("q93 bucketed join result equals the plain shuffled join") {
    import graft.queries.QueryHelpers._
    val got = SparkEntry.queries("q93_bucketed_join")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    val want = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
      .orderBy(col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    got shouldBe want
  }

  test("m10 scene cuts land exactly where the fixture plants them") {
    val rows = SparkEntry.queries("m10_video_scenes")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    rows.length should be > 0
    rows.groupBy(_._1).foreach { case (doc, frames) =>
      val nf = 4 + (doc % 5).toInt
      val cut = 1 + (doc % (nf - 1)).toInt
      withClue(s"doc=$doc") {
        frames.length shouldBe nf
        // exactly one scene boundary, at the planted frame index
        frames.filter(_._4 == 1L).map(_._2).toSeq shouldBe Seq(cut.toLong)
        // the two scenes are internally static: one checksum value each
        frames.filter(_._2 < cut).map(_._3).distinct.length shouldBe 1
        frames.filter(_._2 >= cut).map(_._3).distinct.length shouldBe 1
      }
    }
  }

  test("q95 transformWithState agrees row-for-row with q80 mapGroupsWithState") {
    val a = SparkEntry.queries("q95_transform_with_state")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q80_stream_custom_state")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    a.length should be > 0
    a shouldBe b
  }

  test("streaming snapshot with statePartitions never mutates the shared conf") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val mem = MemoryStream[(Long, Double)]
    mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
    val agged = mem.toDF().toDF("k", "v").groupBy("k")
      .agg(sum("v").as("s"))
    val snap = streaming.StreamingOps.snapshotToTable(
      agged, "r6_conf_iso", "complete", statePartitions = 2)
    snap.sparkSession shouldBe theSameInstanceAs(spark)
    snap.as[(Long, Double)].collect().sortBy(_._1).toSeq shouldBe
      Seq((1L, 3.0), (2L, 5.0))
    spark.conf.get("spark.sql.shuffle.partitions") shouldBe before
    // the state shuffle really ran at 2 partitions (the isolated conf took)
    snap.rdd.getNumPartitions should be <= 2
  }
}
