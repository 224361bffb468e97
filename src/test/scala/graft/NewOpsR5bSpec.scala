package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic properties of the round-5 second-batch operators (d16 bloom
  * prefilter, m09 audio frame features, s14 range search, x24 perplexity
  * buckets, q86/q87 text sinks) beyond the DuckDB-oracle hash gate. */
class NewOpsR5bSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("graft_bloom_contains: no false negatives, bounded false positives") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val members = (0L until 1000L).map(i => i * 2654435761L % 1000003L)
    val bf = members.toDF("k").stat.bloomFilter("k", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val b64 = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    def probe(ks: Seq[Long]): Long =
      ks.toDF("k")
        .filter(expr(s"graft_bloom_contains(unbase64('$b64'), k)"))
        .count()
    probe(members) shouldBe members.length.toLong // zero false negatives
    val nonMembers = (2000000L until 2010000L)
    val fp = probe(nonMembers)
    fp.toDouble / nonMembers.length should be < 0.05 // ~fpp, generous bound
  }

  test("d16 bloom-prefiltered result is EXACT (equals the bloom-free join)") {
    val got = SparkEntry.queries("d16_bloom_prefilter")(spark, sfDir)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
    // bloom-free replica of the same contract
    val d = Tables.load(spark, sfDir, "documents")
    def canon(c: org.apache.spark.sql.Column) =
      md5(regexp_replace(lower(trim(c)), " +", " "))
    val batch = d.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id").as("nid"), canon(col("text")).as("h"))
    val corpus = d.filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id").as("oid"), col("text"))
      .unionAll(d.filter(col("doc_id") % 20 === 3)
        .select((col("doc_id") + 2000000L).as("oid"),
          concat(upper(col("text")), lit("  ")).as("text")))
      .select(col("oid"), canon(col("text")).as("h"))
    val want = batch.join(corpus, Seq("h"), "left")
      .groupBy(col("nid"))
      .agg(min(col("oid")).as("first_dup_of"), count(col("oid")).as("n_dups"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
    got shouldBe want
  }

  test("d16 planted twins are found; every planted batch doc matches") {
    val rows = SparkEntry.queries("d16_bloom_prefilter")(spark, sfDir).collect()
    rows.length should be > 0
    val byNid = rows.map(r => r.getLong(0) -> r).toMap
    byNid.keys.filter(_ % 20 == 3).foreach { nid =>
      withClue(s"nid=$nid") {
        byNid(nid).getAs[Long]("n_dups") should be >= 1L
        byNid(nid).getAs[Long]("first_dup_of") shouldBe (nid + 2000000L)
      }
    }
  }

  test("m09 audio frame stats match the fixture's closed-form series") {
    val rows = SparkEntry.queries("m09_audio_frames")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    (1L to 5L).foreach { id =>
      val ch = 1 + (id % 2).toInt
      val nf = 500 + (id % 250).toInt
      val v = (0 until nf).map(j => ((j.toLong * ch * 13 + id) % 2001 - 1000).toInt)
      val zc = v.sliding(2).count { case Seq(a, b) => a * b < 0 }
      val wins = v.grouped(100).map(_.map(x => x.toLong * x).sum).toSeq
      val r = rows(id)
      withClue(s"doc $id") {
        r.getAs[Long]("n_windows") shouldBe ((nf + 99) / 100).toLong
        r.getAs[Long]("zero_crossings") shouldBe zc.toLong
        r.getAs[Long]("energy_total") shouldBe wins.sum
        r.getAs[Long]("peak_win_energy") shouldBe wins.max
      }
    }
  }

  test("s14 range search: threshold respected, in-query-set pairs symmetric") {
    val rows = SparkEntry.queries("s14_range_search")(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach(_.getAs[Double]("cosine") should be >= 0.25)
    // cosine is symmetric: if both endpoints are query vectors, both
    // directed rows must appear
    val pairs = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    pairs.filter(_._2 < 20).foreach { case (q, c) =>
      withClue(s"($q,$c)") { pairs should contain((c, q)) }
    }
  }

  test("x24 buckets partition the scored corpus; keep rates ordered") {
    val rows = SparkEntry.queries("x24_ppl_bucket_sample")(spark, sfDir)
      .orderBy(col("bucket")).collect()
    rows.length shouldBe 4
    val scoredDocs = Tables.load(spark, sfDir, "documents")
      .filter(expr("length(text) >= 2")).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scoredDocs)
    // bucket 1 has keep-rate 1000 permille: keeps everything
    rows.head.getAs[Long]("n_kept") shouldBe rows.head.getAs[Long]("n_docs")
    // NTILE boundaries are ordered: each bucket's hi <= next bucket's lo
    rows.sliding(2).foreach { case Array(a, b) =>
      a.getAs[Long]("nll_hi") should be <= b.getAs[Long]("nll_lo")
    }
    rows.foreach { r =>
      r.getAs[Long]("n_kept") should be <= r.getAs[Long]("n_docs")
    }
  }

  test("q86/q87 text sinks round-trip 1001 rows with exact types") {
    Seq("q86_copy_csv", "q87_copy_json").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val bySchema = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
      withClue(q) {
        bySchema("o_orderkey") shouldBe "long"
        bySchema("price") shouldBe "double"
        bySchema("o_orderdate") shouldBe "timestamp"
        df.count() shouldBe 1001L
        df.filter(col("o_orderkey").isNull || col("price").isNull ||
          col("o_orderdate").isNull).count() shouldBe 0L
      }
    }
  }

  test("new-op plans: no cartesian; d16 confirm join broadcasts; m09 map-only") {
    def planString(q: String): String =
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
    Seq("d16_bloom_prefilter", "s14_range_search", "x24_ppl_bucket_sample",
      "m09_audio_frames").foreach { q =>
      withClue(q) { planString(q) should not include "CartesianProduct" }
    }
    val d16 = planString("d16_bloom_prefilter")
    d16 should include("bloommightcontain") // prefilter survives planning
    // ...and is pushed into the corpus scan stage (DataFilters), so rows
    // drop at the source before any join
    d16.split("FileScan").drop(1).exists(_.contains("bloommightcontain")) shouldBe true
    d16 should include("BroadcastHashJoin")
    d16 should not include "SortMergeJoin"
    // m09: map-only decode — only the presentation sort's single exchange
    val m09 = planString("m09_audio_frames")
    m09.split("Exchange").length - 1 shouldBe 1
  }
}
