package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 batch-3 semantic specs:
  *  - Tables: both parquet timestamp encodings (NANOS-as-long and MICROS
  *    native) normalize to TimestampType — the driver's testdata generator
  *    has shipped both, and a mismatch silently breaks every events query.
  *  - s17 hybrid RRF: fusion arithmetic re-derived independently from the
  *    two arms' rank lists.
  *  - x30 boilerplate lines: the planted 10-word header must be flagged in
  *    every planted document and in none of the short unplantable ones.
  *  - x31 tokenizer fertility: per-language aggregates re-derived from the
  *    per-document x22 encode (same dictionary, independent aggregation).
  *  - q96 FILTER/argmax: argmax keys re-derived by a driver-side scan with
  *    the identical encoded tiebreak.
  */
class NewOpsR6cSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("events ts column normalizes to TimestampType under either parquet encoding") {
    val e = Tables.load(spark, sfDir, "events")
    e.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
    // values must be sane micros-precision 2024 timestamps, not epoch-garbage
    val r = e.agg(min(col("ts")).cast("string"), max(col("ts")).cast("string"))
      .collect()(0)
    r.getString(0) should startWith("2024-")
    r.getString(1) should startWith("2024-")
  }

  test("s17 hybrid RRF fuses the two arms with exact nano-unit arithmetic") {
    val out = queries.Similarity.queries("s17_hybrid_rrf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getInt(5)))
    out.map(_._1).distinct.sorted shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    out.groupBy(_._1).values.foreach { g =>
      g.map(_._2).sorted shouldBe (1 to g.length)
      // fused score must equal the RRF formula of the reported arm ranks
      g.foreach { case (_, _, _, nano, rd, rl) =>
        def c(r: Int): Long =
          if (r == 0) 0L else math.round(1000000000.0 / (r + 60))
        nano shouldBe (c(rd) + c(rl))
        (rd, rl) should not be ((0, 0))
      }
      // descending fused score in rank order
      g.sortBy(_._2).map(_._4).sliding(2).foreach { w =>
        if (w.length == 2) w(0) should be >= w(1)
      }
    }
    // both arms must actually contribute somewhere
    out.exists(r => r._5 > 0 && r._6 == 0) shouldBe true
    out.exists(r => r._6 > 0 && r._5 == 0) shouldBe true
  }

  test("x30 flags the planted boilerplate header in every planted doc") {
    val out = queries.TextOps.queries("x30_boilerplate_lines")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    out.length shouldBe nDocs
    val planted = out.filter(_._1 % 7 == 0)
    planted should not be empty
    // every planted doc gains the header as line 0 -> at least one boiler line
    planted.foreach { case (id, nl, nb, ppm) =>
      withClue(s"doc $id:") {
        nb should be >= 1L
        ppm shouldBe (nl - nb) * 1000000L / nl
      }
    }
    // retention arithmetic holds everywhere and nobody loses everything
    out.foreach { case (_, nl, nb, ppm) =>
      nb should be <= nl
      ppm shouldBe (nl - nb) * 1000000L / nl
    }
  }

  test("x31 per-language fertility equals the aggregated x22 per-doc encode") {
    val perDoc = queries.TextOps.queries("x22_bpe_encode")(spark, sfDir)
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_tokens"))
    val langs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val expect = perDoc.join(langs, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tokens")).as("n_tokens"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = queries.TextOps.queries("x31_tokenizer_fertility")(spark, sfDir)
      .collect()
    got.length shouldBe expect.size
    got.foreach { r =>
      val (nd, nw, nc, nt) = expect(r.getString(0))
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
        ((nd, nw, nc, nt))
      r.getDouble(5) shouldBe (nc.toDouble / nt.toDouble)
      r.getDouble(6) shouldBe (nt.toDouble / nw.toDouble)
    }
  }

  test("m11 resample matches the fixture's closed-form series independently") {
    val out = queries.Multimodal.queries("m11_audio_resample")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5),
          r.getInt(6), r.getInt(7)))).toMap
    out.keySet.max should be <= 100L
    out.keySet.foreach { id =>
      // fixture closed form (m07 convention): rate/channels/frames from
      // doc_id; channel-0 sample j = ((j*ch)*13 + doc_id) % 2001 - 1000
      val rate = 8000 + (id % 3).toInt * 4000
      val ch = 1 + (id % 2).toInt
      val nf = 500 + (id % 250).toInt
      def s0(j: Int): Int = (((j.toLong * ch * 13 + id) % 2001) - 1000).toInt
      val outs = (0 until nf / 2).map(j => (s0(2 * j) + s0(2 * j + 1)) >> 1)
      val (nIn, nOut, oRate, sum, peak, first, last) = out(id)
      (nIn, nOut, oRate) shouldBe ((nf, nf / 2, rate / 2))
      sum shouldBe outs.map(_.toLong).sum
      peak shouldBe outs.map(math.abs).max
      first shouldBe outs.head
      last shouldBe outs.last
    }
  }

  test("d19 soft-dedup weights re-derive from d07's cluster labels") {
    val clusters = queries.Dedup.queries("d07_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = clusters.values.groupBy(identity).map { case (l, v) => l -> v.size }
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val out = queries.Dedup.queries("d19_soft_dedup")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val exp = rows.map { case (id, _, nc) =>
        val cs = clusters.get(id).map(sizes).getOrElse(1)
        (1L, if (cs > 1) 1L else 0L, nc, nc * (1000000L / cs))
      }.reduce((x, y) => (x._1 + y._1, x._2 + y._2, x._3 + y._3, x._4 + y._4))
      withClue(s"source $src:") { out(src) shouldBe exp }
    }
  }

  test("q97 file-sink streamed result equals the direct batch computation") {
    val got = queries.Streaming.queries("q97_stream_file_sink")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val exp = Tables.load(spark, sfDir, "events")
      .filter(col("user_id") < 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)), sum(coalesce(round(col("value") * 100, 0)
        .cast("long"), lit(0L))), min(col("event_id")), max(col("event_id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    got shouldBe exp
  }

  test("q98 forward asof picks the strictly-next event per user (driver rescan)") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(2)
        val micros = (t.getTime / 1000) * 1000000L + t.getNanos / 1000
        (r.getLong(0), r.getLong(1), micros, r.getString(3))
      }
    // dedup per (user, ts): keep the largest event_id (q34 convention)
    val dedup = events.groupBy(e => (e._2, e._3)).map(_._2.maxBy(_._1)).toSeq
    val byUser = dedup.groupBy(_._2).map { case (u, v) => u -> v.sortBy(_._3) }
    val out = queries.RelationalExt.queries("q98_asof_forward")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val lefts = events.filter(_._1 <= 300)
    out.size shouldBe lefts.length
    lefts.foreach { case (id, u, ts, _) =>
      val expected = byUser.get(u).flatMap(_.find(_._3 > ts)).map(_._1)
      withClue(s"event $id:") { out(id) shouldBe expected }
    }
    // forward matches must actually exist in this slice
    out.values.count(_.isDefined) should be > 0
  }

  test("engine ASOF SQL supports all four inequality directions exactly") {
    import spark.implicits._
    // left at ts 5 and 10; right at 3, 7, 12 — every direction picks a
    // different, hand-checkable neighbor (plus a 7 == 7 tie for strictness)
    Seq((1L, ts(5)), (2L, ts(7)), (3L, ts(10)))
      .toDF("lid", "lts").createOrReplaceTempView("asof_dir_l")
    Seq((10L, ts(3), "a"), (20L, ts(7), "b"), (30L, ts(12), "c"))
      .toDF("rid", "rts", "v").createOrReplaceTempView("asof_dir_r")
    val engine = new Engine(spark)
    try {
      // the grammar requires at least one equality key — use a constant one
      def runKeyed(op: String): Map[Long, Option[String]] = {
        spark.sql("SELECT lid, lts, 1 AS k FROM asof_dir_l")
          .createOrReplaceTempView("asof_dir_lk")
        spark.sql("SELECT rid, rts, v, 1 AS k FROM asof_dir_r")
          .createOrReplaceTempView("asof_dir_rk")
        engine.sql(
          s"""SELECT l.lid, r.v FROM asof_dir_lk l ASOF LEFT JOIN asof_dir_rk r
             |ON l.k = r.k AND l.lts $op r.rts""".stripMargin)
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
      }
      runKeyed(">=") shouldBe Map( // backward: latest at-or-before
        1L -> Some("a"), 2L -> Some("b"), 3L -> Some("b"))
      runKeyed(">") shouldBe Map( // backward strict: 7 must skip the 7
        1L -> Some("a"), 2L -> Some("a"), 3L -> Some("b"))
      runKeyed("<=") shouldBe Map( // forward: earliest at-or-after
        1L -> Some("b"), 2L -> Some("b"), 3L -> Some("c"))
      runKeyed("<") shouldBe Map( // forward strict
        1L -> Some("b"), 2L -> Some("c"), 3L -> Some("c"))
    } finally engine.close()
  }

  private def ts(sec: Int): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000L)

  test("s18 centrality equals a pure-Scala PageRank over s09's edges") {
    val edges = queries.Similarity.queries("s09_knn_graph")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))) // (qid=src, cid=dst)
    // node set = every assigned vector, including edge-less singleton cells
    val nodes = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    val outDeg = edges.groupBy(_._1).map { case (s0, v) => s0 -> v.length }
    var pr = nodes.map(_ -> 1000000L).toMap
    (1 to 5).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => pr(e._1) / outDeg(e._1)).sum
      }
      pr = nodes.map(n => n -> (150000L + 850L * in.getOrElse(n, 0L) / 1000L)).toMap
    }
    val expect = pr.toSeq.sortBy { case (id, p) => (-p, id) }.take(20)
    val got = queries.Similarity.queries("s18_graph_centrality")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe expect.map { case (id, p) => (id, p) }
  }

  test("x32 novelty re-derives from the raw shingle sets") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ").length >= 3)
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val base = docs.filter(_._1 < 250).flatMap(d => grams(d._2)).toSet
    val out = queries.TextOps.queries("x32_ngram_novelty")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = docs.filter(_._1 >= 250)
    out.size shouldBe batch.length
    batch.foreach { case (id, text) =>
      val g = grams(text)
      val novel = g.count(!base.contains(_)).toLong
      withClue(s"doc $id:") {
        out(id) shouldBe ((g.size.toLong, novel, novel * 1000000L / g.size))
      }
    }
    // the split must actually produce both seen and novel material
    out.values.exists(_._2 > 0) shouldBe true
    out.values.exists(v => v._2 < v._1) shouldBe true
  }

  test("q96 argmax keys match a driver-side rescan with the encoded tiebreak") {
    val out = queries.RelationalMore.queries("q96_filter_argmax")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"),
        col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    li.groupBy(_._1).foreach { case (flag, rows) =>
      def key(t: (String, Long, Double, Double)): Long =
        BigDecimal(t._3 * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong * 10000000L + t._2
      val (nBig, kMax, kMin) = out(flag)
      nBig shouldBe rows.count(_._4 > 25)
      kMax shouldBe rows.maxBy(key)._2
      kMin shouldBe rows.minBy(key)._2
    }
  }
}
