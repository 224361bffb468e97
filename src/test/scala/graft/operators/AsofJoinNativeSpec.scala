package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The native sort-merge AS-OF operator must agree row-for-row with the
  * window composition (AsofJoin.asofLeft) — two independent implementations
  * of the same semantics — and must plan as one shuffle per side. */
class AsofJoinNativeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native matches hand-built expectations incl. ties, empties, nulls") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:05:00"), 102.0), // tie: greatest payload wins
      // (deterministic: payload columns join the right sort as a tiebreak)
      (2L, ts("2024-01-01 09:00:00"), 50.0)
      // key 3: no quotes at all
    ).toDF("id", "qts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 09:59:59")), // before any quote -> null
      (1L, ts("2024-01-01 10:00:00")), // exact match -> 100.0
      (1L, ts("2024-01-01 10:05:00")), // tie ts -> last of equal ts = 102.0
      (1L, ts("2024-01-01 11:00:00")), // after all -> 102.0
      (2L, ts("2024-01-01 10:00:00")), // -> 50.0
      (3L, ts("2024-01-01 10:00:00"))  // no right key -> null
    ).toDF("id", "tts")

    val out = AsofJoinNative.asofLeft(trades, quotes, Seq("id"), "tts", "qts")
      .orderBy(col("id"), col("tts"))
      .select(col("id"), col("tts"), col("px"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    out.toSeq shouldBe Seq(
      (1L, null), (1L, 100.0), (1L, 102.0), (1L, 102.0), (2L, 50.0), (3L, null))
  }

  test("NULL timestamps never match: right skipped, left unmatched") {
    import spark.implicits._
    val quotes = Seq(
      (1L, None: Option[Timestamp], 999.0), // null right ts: r.ts <= l.ts is never true
      (1L, Some(ts("2024-01-01 10:00:00")), 100.0)
    ).toDF("id", "qts", "px")
    val trades = Seq(
      (1L, Some(ts("2024-01-01 09:00:00"))), // only the null-ts quote sorts before -> null
      (1L, Some(ts("2024-01-01 10:30:00"))), // -> 100.0
      (1L, None: Option[Timestamp])          // null left ts -> null
    ).toDF("id", "tts")
    val out = AsofJoinNative.asofLeft(trades, quotes, Seq("id"), "tts", "qts")
      .orderBy(col("tts")) // Spark asc = nulls first
      .select(col("px")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    out.toSeq shouldBe Seq(null, null, 100.0)
  }

  test("self as-of join re-aliases shared lineage instead of mis-binding") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:05:00"), 20.0),
      (2L, ts("2024-01-01 10:01:00"), 30.0)
    ).toDF("id", "t", "v")
    // left and right are the SAME plan: each row's as-of match is itself
    val out = AsofJoinNative.asofLeft(ev, ev, Seq("id"), "t", "t")
      .orderBy(col("id"), col("t")).collect()
    out.length shouldBe 3
    out.foreach { r =>
      r.getDouble(3) shouldBe r.getDouble(2) // payload v == own v
    }
  }

  test("mismatched key types are rejected, not silently unmatched") {
    import spark.implicits._
    val l = Seq((1, ts("2024-01-01 10:00:00"))).toDF("id", "t")        // int key
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 5.0)).toDF("id", "t", "v") // long key
    val e = intercept[IllegalArgumentException] {
      AsofJoinNative.asofLeft(l, r, Seq("id"), "t", "t")
    }
    e.getMessage should include("type mismatch")
  }

  test("native and composed implementations agree on real data") {
    val e = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val composed = AsofJoin.asofLeft(e, o, Seq("user_id"), "ts", "o_orderdate")
      .select(col("event_id"), col("o_orderkey"))
    val native = AsofJoinNative.asofLeft(e, o, Seq("user_id"), "ts", "o_orderdate")
      .select(col("event_id"), col("o_orderkey"))
    composed.exceptAll(native).count() shouldBe 0
    native.exceptAll(composed).count() shouldBe 0
    native.count() should be > 0L
  }

  test("native plan is one shuffle per side (sort-merge shape)") {
    val e = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val df = AsofJoinNative.asofLeft(e, o, Seq("user_id"), "ts", "o_orderdate")
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
    shuffles.size shouldBe 2
    plan.collect { case e: AsofJoinNative.AsofJoinExec => e } should have size 1
  }
}
