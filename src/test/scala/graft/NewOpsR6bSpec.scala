package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 batch-2 semantic specs: each new operator is re-derived by an
  * INDEPENDENT pure-Scala reimplementation over the collected fixture data
  * (different code path from both the engine plan and the DuckDB oracle),
  * so a shared bug between query and oracle SQL cannot hide.
  *  - s16 binary quantization: sign-bit packing, Hamming shortlist, re-rank
  *  - x29 DSIR importance resampling: hashed-bucket LLR in micronats
  *  - d18 prototypicality pruning: per-cell drop sets off the trained IVF
  */
class NewOpsR6bSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5Bucket(tok: String, mod: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % mod
  }

  /** Spark round(): BigDecimal HALF_UP (away from zero), NOT Math.round. */
  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cosineD(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val embs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("s16 binary quantization reproduces an independent pack/Hamming/re-rank") {
    // independent: pack sign bits, brute-force Hamming top-8, cosine top-3
    def pack(e: Array[Float], from: Int): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        if (e(from + i) >= 0.0f) acc + (1L << i) else acc
      }
    val codes = embs.map { case (id, e) => id -> (pack(e, 0), pack(e, 32)) }
    val want = codes.keys.filter(_ < 20).toSeq.sorted.flatMap { qid =>
      val (q0, q1) = codes(qid)
      val short = codes.toSeq.filter(_._1 != qid)
        .map { case (cid, (w0, w1)) =>
          (cid, java.lang.Long.bitCount(q0 ^ w0) + java.lang.Long.bitCount(q1 ^ w1))
        }
        .sortBy { case (cid, h) => (h, cid) }.take(8)
      short.map { case (cid, h) => (cid, h, cosine(embs(qid), embs(cid))) }
        .sortBy { case (cid, _, cos) => (-cos, cid) }.take(3).zipWithIndex
        .map { case ((cid, h, cos), i) =>
          (qid, (i + 1).toLong, cid, h.toLong, cos) }
    }
    val got = SparkEntry.queries("s16_binary_quant")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getDouble(4)))
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) =>
      (g._1, g._2, g._3, g._4) shouldBe ((w._1, w._2, w._3, w._4))
      g._5 shouldBe (w._5 +- 1e-6)
    }
  }

  test("x29 DSIR scores equal an independent hashed-bucket LLR recomputation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val B = 64L
    val tokBuckets = docs.map { case (id, lang, _, text) =>
      (id, lang, text.split(" ", -1).map(md5Bucket(_, B)))
    }
    val cr = new Array[Long](B.toInt); val ct = new Array[Long](B.toInt)
    tokBuckets.foreach { case (_, lang, bs) =>
      bs.foreach { b =>
        cr(b.toInt) += 1; if (lang == "en") ct(b.toInt) += 1
      }
    }
    val rr = cr.sum; val tt = ct.sum
    val w = (0 until B.toInt).map { b =>
      roundHalfUp((math.log((ct(b) + 1).toDouble / (tt + B).toDouble)
        - math.log((cr(b) + 1).toDouble / (rr + B).toDouble)) * 1e6)
    }
    val want = tokBuckets.map { case (id, _, bs) =>
      (id, bs.length.toLong, bs.map(b => w(b.toInt)).sum)
    }.sortBy { case (id, _, s) => (-s, id) }.take(100).toSeq
    val got = SparkEntry.queries("x29_dsir_resample")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    got shouldBe want
  }

  test("d18 drops exactly the most-prototypical 30% of every IVF cell") {
    // independent replay: same trained quantizer config as trainedIvf (k=8,
    // iters=3 — the s04 family constants), then pure-Scala cosine ranking
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = graft.operators.IvfIndex.train(e, "vec_id", "embedding",
      k = 8, iters = 3)
    val assigned = graft.operators.IvfIndex
      .assign(e, "vec_id", "embedding", centroids)
      .select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val byCell = assigned.groupBy(_._1)
    val cmap = centroids.map(c => c.cell -> c.vec).toMap
    val want = byCell.toSeq.flatMap { case (cell, members) =>
      val ranked = members.map { case (_, id) =>
        (id, cosineD(embs(id), cmap(cell))) }
        .sortBy { case (id, pc) => (-pc, id) }
      val n = ranked.length.toLong
      val nDrop = (n * 3) / 10
      ranked.take(nDrop.toInt).zipWithIndex.map { case ((id, pc), i) =>
        (cell, id, (i + 1).toLong, pc, n, nDrop)
      }
    }.sortBy(_._2)
    val got = SparkEntry.queries("d18_proto_prune")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) =>
      (g._1, g._2, g._3, g._5, g._6) shouldBe ((w._1, w._2, w._3, w._5, w._6))
      g._4 shouldBe (w._4 +- 1e-6)
    }
    // every cell's dropped set is a strict prefix of its prototypicality order
    got.groupBy(_._1).foreach { case (cell, rows) =>
      val n = rows.head._5
      withClue(s"cell=$cell") { rows.length.toLong shouldBe (n * 3) / 10 }
    }
  }
}
