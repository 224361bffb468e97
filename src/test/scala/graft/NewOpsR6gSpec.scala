package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 batch-7 semantic specs:
  *  - d20 edit-distance dedup: every emitted candidate pair's Levenshtein
  *    distance matches an independent DP computation on the raw texts and
  *    the ppm ratio respects the near-dup threshold.
  *  - q104 windowed distinct: the collect_set rewrite's cumulative counts
  *    are monotone per nation and end at the nation's true distinct total.
  *  - q105 volume shipping: one group's revenue re-derived from the raw
  *    fact join in exact decimals.
  *  - x37 PMI collocations: counts and the staged integer ratio re-derived
  *    from the raw token stream; ranking monotone.
  *  - x38 vocab growth: per-source token/vocab/hapax profile re-derived
  *    from the raw corpus.
  */
class NewOpsR6gSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var j = 0
    while (j <= b.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, b.length + 1)
      i += 1
    }
    prev(b.length)
  }

  test("d20 pairs carry the exact Levenshtein distance under the threshold") {
    val texts = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = queries.Dedup.queries("d20_editdist_dedup")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getLong(5)))
    out.foreach { case (d1, d2, common, l, maxLen, ppm) =>
      d1 should be < d2
      common should be >= 3L
      l shouldBe lev(texts(d1), texts(d2))
      maxLen shouldBe math.max(texts(d1).length, texts(d2).length)
      ppm shouldBe l.toLong * 1000000L / maxLen
      ppm should be <= 600000L
    }
    // pairs are unique
    out.map(p => (p._1, p._2)).toSet.size shouldBe out.length
  }

  test("q104 cumulative distinct counts are monotone and end at the truth") {
    val out = queries.RelationalStats.queries("q104_window_distinct")(
        spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    out.map(t => (t._1, t._2)).toSet.size shouldBe out.length
    val truth = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (nation, rows) =>
      val byMon = rows.sortBy(_._2).map(_._3)
      byMon.zip(byMon.tail).foreach { case (a, b) => a should be <= b }
      byMon.last shouldBe truth(nation)
    }
  }

  test("q105 revenue re-derives from the raw fact join in exact decimals") {
    val out = queries.RelationalStats.queries("q105_volume_shipping")(
        spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2).toLong),
        (r.getDouble(3), r.getLong(4)))).toMap
    out.keys.foreach { case (s1, c1, _) =>
      Set("NATION_1", "NATION_2") should contain(s1)
      Set("NATION_1", "NATION_2") should contain(c1)
      s1 should not be c1
    }
    // independent recomputation of one full group via raw collect
    // (integral key columns load as INT or BIGINT depending on the writer)
    def kv(r: org.apache.spark.sql.Row): (Long, Long) =
      (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue)
    val n = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.get(0).asInstanceOf[Number].longValue -> r.getString(1))
      .toMap
    val su = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).collect().map(kv).toMap
    val cu = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect().map(kv).toMap
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect().map(kv).toMap
    val acc = scala.collection.mutable.Map[(String, String, Long),
      (BigDecimal, Long)]()
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount")).collect()
      .foreach { r =>
        val sn = n(su(r.get(1).asInstanceOf[Number].longValue))
        val cn = n(cu(ord(r.get(0).asInstanceOf[Number].longValue)))
        val ok = Set("NATION_1", "NATION_2")
        if (ok(sn) && ok(cn) && sn != cn) {
          val year = r.getDate(2).toLocalDate.getYear.toLong
          val vol = BigDecimal(r.getDouble(3)).setScale(2,
              BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(4)).setScale(4,
              BigDecimal.RoundingMode.HALF_UP))
          val k = (sn, cn, year)
          val (v0, c0) = acc.getOrElse(k, (BigDecimal(0), 0L))
          acc(k) = (v0 + vol, c0 + 1)
        }
      }
    acc.foreach { case (k, (v, c)) =>
      val (rev, items) = out(k)
      items shouldBe c
      rev shouldBe v.toDouble
    }
    out.keySet shouldBe acc.keySet
  }

  test("q106 time-weighted average re-derives from the raw event stream") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.getTimestamp(1).getTime / 1000L,
        r.get(2).asInstanceOf[Number].longValue, r.getDouble(3)))
    val out = queries.RelationalStats.queries("q106_time_weighted")(
        spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val byUser = events.groupBy(_._1)
    byUser.foreach { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val intervals = sorted.zip(sorted.tail)
        .map { case (a, b) => (BigDecimal(a._4).setScale(2,
          BigDecimal.RoundingMode.HALF_UP), b._2 - a._2) }
      val duration = intervals.map(_._2).sum
      if (intervals.nonEmpty && duration > 0) {
        val (n, d, ws, twa) = out(uid)
        n shouldBe intervals.length.toLong
        d shouldBe duration
        ws shouldBe intervals.map { case (v, dt) => v * dt }.sum.toDouble
        twa shouldBe ws / d.toDouble
      } else out.contains(uid) shouldBe false
    }
  }

  test("q109 ordered string_agg re-derives from the raw order stream") {
    val out = queries.RelationalStats.queries("q109_string_agg")(spark, sfDir)
      .collect()
      .map(r => r.get(0).asInstanceOf[Number].longValue ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
    val raw = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") <= 300)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
      .collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue, r.getString(2)))
    val byCust = raw.groupBy(_._1)
    out.keySet shouldBe byCust.keySet
    byCust.foreach { case (cust, rows) =>
      val (keys, n, statuses) = out(cust)
      keys shouldBe rows.map(_._2).sorted.mkString(",")
      n shouldBe rows.length.toLong
      statuses shouldBe rows.map(_._3).distinct.sorted.mkString("|")
    }
  }

  test("x37 staged PMI ratio re-derives from the raw token stream") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map[String, Long]()
    val bi = scala.collection.mutable.Map[(String, String), Long]()
    var nu = 0L; var nb = 0L
    docs.foreach { txt =>
      val ws = txt.split(" ").filter(_.nonEmpty)
      ws.foreach { w => uni(w) = uni.getOrElse(w, 0L) + 1; nu += 1 }
      ws.zip(ws.tail).foreach { p => bi(p) = bi.getOrElse(p, 0L) + 1 }
      nb += math.max(ws.length - 1, 0)
    }
    val out = queries.TextOps.queries("x37_pmi_collocations")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out.length shouldBe 20
    out.foreach { case (a, b, nAb, nA, nB, ppm) =>
      nAb shouldBe bi((a, b))
      nA shouldBe uni(a)
      nB shouldBe uni(b)
      nAb should be >= 5L
      ppm shouldBe ((nAb * 1000000L / nA) * nu / nB) * nu / nb
    }
    val ranks = out.map(_._6)
    ranks.zip(ranks.tail).foreach { case (hi, lo) => hi should be >= lo }
  }

  test("x38 per-source vocab profile re-derives from the raw corpus") {
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = rows.groupBy(_._1)
    val out = queries.TextOps.queries("x38_vocab_growth")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    out.keySet shouldBe bySource.keySet
    bySource.foreach { case (src, ds) =>
      val counts = scala.collection.mutable.Map[String, Long]()
      var tokens = 0L
      ds.foreach { case (_, txt) =>
        txt.split(" ").filter(_.nonEmpty).foreach { w =>
          counts(w) = counts.getOrElse(w, 0L) + 1; tokens += 1
        }
      }
      val hapax = counts.values.count(_ == 1L).toLong
      val (nTokens, vocab, hx, ttr, hppm) = out(src)
      nTokens shouldBe tokens
      vocab shouldBe counts.size.toLong
      hx shouldBe hapax
      ttr shouldBe vocab * 1000000L / tokens
      hppm shouldBe hapax * 1000000L / vocab
    }
  }
}
