package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-6 batch-6 semantic specs:
  *  - m13 channel stats: the real-codec decode must reproduce the
  *    interleaved-RGB fixture contract per channel, and the three channel
  *    sums must total m02's whole-image sum.
  *  - s20 IVF cell stats: cell populations cover the corpus exactly and
  *    the ppm load factors are the exact integer shares of k * 1e6.
  *  - x36 length histogram: buckets partition the corpus, bounds are the
  *    true powers of two, cumulative counts are monotone to the total.
  */
class NewOpsR6fSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("m13 per-channel stats replay the fixture contract through real codecs") {
    val out = queries.Multimodal.queries("m13_channel_stats")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getLong(6)))
    out.length % 3 shouldBe 0
    out.groupBy(_._1).foreach { case (docId, chans) =>
      chans.map(_._2).sorted shouldBe Array(0, 1, 2)
      val w = 8 + (docId % 56).toInt
      val h = 8 + ((docId * 7) % 40).toInt
      chans.foreach { case (_, c, nCh, sumV, minV, maxV, meanMicro) =>
        nCh shouldBe (w * h).toLong
        val vs = (0 until w * h)
          .map(j => (((3L * j + c) * 7 + docId) % 251).toInt)
        sumV shouldBe vs.map(_.toLong).sum
        minV shouldBe vs.min
        maxV shouldBe vs.max
        meanMicro shouldBe sumV * 1000000L / nCh
      }
    }
  }

  test("s20 cell populations cover the corpus with exact ppm load factors") {
    val out = queries.Similarity.queries("s20_ivf_cell_stats")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val n = Tables.load(spark, sfDir, "embeddings").count()
    out.map(_._2).sum shouldBe n
    out.length should be <= 8
    out.foreach { case (_, nVecs, loadPpm) =>
      loadPpm shouldBe nVecs * 8 * 1000000L / n
      nVecs should be > 0L
    }
  }

  test("x36 buckets partition the corpus on exact power-of-two bounds") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("n_chars")).collect().map(_.getLong(0))
    val out = queries.TextOps.queries("x36_length_hist")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    out.map(_._3).sum shouldBe docs.length.toLong
    out.map(_._4).sum shouldBe docs.sum
    out.foreach { case (bucket, lo, nDocs, _, sharePpm, _, _) =>
      lo shouldBe (1L << bucket)
      nDocs shouldBe docs.count(c => c >= lo && c < lo * 2).toLong
      sharePpm shouldBe nDocs * 1000000L / docs.length
    }
    // cumulative counts are monotone and end at the total
    val byBucket = out.sortBy(_._1)
    byBucket.map(_._6).sliding(2).foreach {
      case Array(a, b) => a should be < b
      case _ =>
    }
    byBucket.last._6 shouldBe docs.length.toLong
    byBucket.last._7 shouldBe 1000000L * docs.length / docs.length
  }
}
