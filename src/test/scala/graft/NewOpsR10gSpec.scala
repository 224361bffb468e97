package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 wave-7 invariants: p14 partition backfill routing, s45
  * serving-funnel recall attribution. */
class NewOpsR10gSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("p14 routing: exactly one month served from v2 (the earliest late " +
      "month), and every row count recomputes from the raw table") {
    val rows = SparkEntry.queries("p14_partition_backfill")(spark, sf)
      .collect()
    val v2Months = rows.filter(_.getString(1) == "v2").map(_.getString(0))
    v2Months.length shouldBe 1
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val target = orders.filter(_._1 % 10 == 0).map(_._2).min
    v2Months.head shouldBe target
    rows.foreach { r =>
      val m = r.getString(0)
      val expect =
        if (m == target) orders.count(_._2 == m)
        else orders.count(o => o._2 == m && o._1 % 10 != 0)
      withClue(m) { r.getLong(2) shouldBe expect.toLong }
    }
    // the backfilled month really gained its late rows
    orders.count(o => o._2 == target && o._1 % 10 == 0) should be > 0
  }

  test("s45 funnel is monotone and the cell ceiling recomputes from the " +
      "label partition against an independent brute-force truth") {
    val rows = SparkEntry.queries("s45_serving_funnel")(spark, sf).collect()
    rows.length shouldBe 20
    val all = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { r =>
      val (qid, n, inCell, inShort, inFinal) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      n shouldBe 3L
      withClue(s"qid $qid") {
        inFinal should be <= inShort
        inShort should be <= inCell
        inCell should be <= n
        // independent truth + cell-ceiling recompute
        val (_, qlab, qv) = all.find(_._1 == qid).get
        val truth = all.filter(_._1 != qid)
          .map { case (cid, clab, cv) => (cid, clab, cos(qv, cv)) }
          .sortBy { case (cid, _, c) => (-c, cid) }.take(3)
        inCell shouldBe truth.count(_._2 == qlab).toLong
      }
    }
  }
}
