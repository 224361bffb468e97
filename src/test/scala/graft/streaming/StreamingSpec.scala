package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.StreamingOps.{KeyedEvent, UserStats}

/** Drives the StreamingOps operators through real micro-batches
  * (MemoryStream), verifying watermarked windows, streaming dedup, and
  * custom mapGroupsWithState state across batches. */
class StreamingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("tumbling window aggregation over a stream matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "v")
    val agg = StreamingOps.tumblingAgg(df, "ts", "event_type", "v", "10 minutes")

    mem.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "view", 5.0))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("tumbling").orderBy("window_start", "event_type").collect()
    rows.length shouldBe 2
    rows(0).getAs[String]("event_type") shouldBe "click"
    rows(0).getAs[Long]("n") shouldBe 2L
    rows(0).getAs[Double]("total") shouldBe 3.0
    rows(1).getAs[String]("event_type") shouldBe "view"
  }

  test("streaming dedup keeps the first event per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "event_id", "payload")
    val out = StreamingOps.dedup(df, "ts", Seq("event_id"))

    mem.addData((ts(1), 1L, "a"), (ts(2), 1L, "dup"), (ts(3), 2L, "b"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("dedup").orderBy("event_id").collect()
    rows.map(_.getAs[Long]("event_id")).toSeq shouldBe Seq(1L, 2L)
    rows(0).getAs[String]("payload") shouldBe "a"
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[KeyedEvent]
    val out = StreamingOps.runningUserStats(mem.toDS())

    val q = out.writeStream.format("memory").queryName("userstats")
      .outputMode("update").start()
    mem.addData(KeyedEvent(1L, "click", 2.0), KeyedEvent(1L, "view", 3.0))
    q.processAllAvailable()
    mem.addData(KeyedEvent(1L, "click", 5.0), KeyedEvent(2L, "view", 7.0))
    q.processAllAvailable()
    q.stop()

    // update mode emits one row per key per batch; the LAST row per key is
    // the accumulated state
    val last = spark.table("userstats").as[UserStats].collect()
      .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n_events) }
    last(1L).n_events shouldBe 3L
    last(1L).total_value shouldBe 10.0
    last(2L).n_events shouldBe 1L
  }

  test("engine decode pipeline is source-agnostic: runs on a streaming frame") {
    implicit val sqlCtx = spark.sqlContext
    import graft.{Engine, TestSpark}
    import graft.serde.Serde
    implicit val rowEnc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(graft.sources.KafkaRecords.schema)
    val mem = MemoryStream[org.apache.spark.sql.Row]
    val engine = new Engine(spark)
    val decoded = engine.decodeTopic(
      Engine.TopicSpec("stream-topic", valueSerde = Serde.IntSerde, rowAttrs = Set.empty),
      mem.toDF())
    mem.addData(
      org.apache.spark.sql.Row(null, java.nio.ByteBuffer.allocate(4).putInt(7).array(),
        "stream-topic", 0, 0L, ts(1), 0, Seq.empty),
      org.apache.spark.sql.Row(null, java.nio.ByteBuffer.allocate(4).putInt(8).array(),
        "stream-topic", 0, 1L, ts(2), 0, Seq.empty))
    val q = decoded.writeStream.format("memory").queryName("decoded")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("decoded").orderBy("rowval").collect()
    rows.map(_.getInt(0)).toSeq shouldBe Seq(7, 8) // decoded mid-stream
  }

  test("flatMapGroupsWithState emits sessions exactly once, on close") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingOps.{ClosedSession, TimedEvent}
    val mem = MemoryStream[TimedEvent]
    val out = StreamingOps.sessionizeOnClose(mem.toDS(), gapMs = 5 * 60 * 1000L,
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()

    // batch 1: one session for user 1 (10:00, 10:02)
    mem.addData(TimedEvent(1L, ts(0)), TimedEvent(1L, ts(2)))
    q.processAllAvailable()
    // batch 2: event at 10:30 — watermark advances to 10:20, past the
    // session's timeout (10:02 + 5 min) — session 1 closes; new one opens
    mem.addData(TimedEvent(1L, ts(30)))
    q.processAllAvailable()
    // batch 3: other user at 11:00 — watermark 10:50 closes session 2
    mem.addData(TimedEvent(2L, ts(60, 0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("closed_sessions").as[ClosedSession].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    rows.length shouldBe 2
    rows(0).n_events shouldBe 2L
    rows(0).session_start shouldBe ts(0)
    rows(0).session_end shouldBe ts(7) // last event 10:02 + 5 min gap
    rows(1).n_events shouldBe 1L
    rows(1).session_start shouldBe ts(30)
  }

  test("sessionizeOnClose absorbs out-of-order events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingOps.{ClosedSession, TimedEvent}
    val mem = MemoryStream[TimedEvent]
    val out = StreamingOps.sessionizeOnClose(mem.toDS(), gapMs = 5 * 60 * 1000L,
      watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("ooo_sessions")
      .outputMode("append").start()

    mem.addData(TimedEvent(1L, ts(10)))
    q.processAllAvailable()
    // out-of-order but within the 30-min watermark: 10:08 extends the open
    // session downward; 10:00 is detached below it (>= 5-min gap) and
    // closes immediately as a singleton
    mem.addData(TimedEvent(1L, ts(8)), TimedEvent(1L, ts(0)))
    q.processAllAvailable()
    // push the watermark far forward to close the open session
    mem.addData(TimedEvent(2L, ts(120)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ooo_sessions").as[ClosedSession].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    rows.map(r => (r.session_start, r.n_events)).toSeq shouldBe Seq(
      (ts(0), 1L),  // detached singleton
      (ts(8), 2L))  // 10:08 merged below the 10:10 session
  }

  test("stream-stream interval join buffers and joins across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("view_ts", "user_id", "view_id")
    val c = clicks.toDF().toDF("click_ts", "user_id", "click_id")
    val joined = StreamingOps.intervalJoin(v, c, "user_id",
      "view_ts", "click_ts", "10 minutes")

    // view at t+0; clicks at t+5 (in window), t+15 (out), other user t+1
    views.addData((ts(0), 1L, 100L))
    clicks.addData((ts(5), 1L, 200L), (ts(15), 1L, 201L), (ts(1), 2L, 202L))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("ssjoin").collect()
    rows.length shouldBe 1
    rows(0).getAs[Long]("view_id") shouldBe 100L
    rows(0).getAs[Long]("click_id") shouldBe 200L
  }

  test("full chain: Kafka-shaped stream -> decode -> tumbling window agg") {
    implicit val sqlCtx = spark.sqlContext
    import graft.Engine
    import graft.serde.Serde
    implicit val rowEnc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(graft.sources.KafkaRecords.schema)
    val mem = MemoryStream[org.apache.spark.sql.Row]
    val engine = new Engine(spark)
    val topic = "stream-window-topic"
    val decoded = engine.decodeTopic(
      Engine.TopicSpec(topic, valueSerde = Serde.IntSerde, rowAttrs = Set("ts")),
      mem.toDF())
    // record timestamp (rowinfo.ts, epoch millis) drives the event-time window
    val events = decoded.selectExpr(
      "rowval AS v", "timestamp_millis(rowinfo.ts) AS ts",
      "CAST(rowval % 2 AS STRING) AS parity")
    val agg = StreamingOps.tumblingAgg(events, "ts", "parity", "v", "10 minutes")

    def rec(v: Int, t: Timestamp) =
      org.apache.spark.sql.Row(null,
        java.nio.ByteBuffer.allocate(4).putInt(v).array(),
        topic, 0, v.toLong, t, 0, Seq.empty)
    // window 1 (10:00): values 1,2,3; window 2 (10:10): value 4
    mem.addData(rec(1, ts(1)), rec(2, ts(3)), rec(3, ts(5)), rec(4, ts(11)))
    val q = agg.writeStream.format("memory").queryName("decoded_windows")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("decoded_windows")
      .orderBy("window_start", "parity").collect()
    rows.map(r => (r.getAs[String]("parity"), r.getAs[Long]("n"),
      r.getAs[Long]("total"))).toSeq shouldBe Seq(
      ("0", 1L, 2L), ("1", 2L, 4L), // window 1: evens {2}, odds {1,3}
      ("0", 1L, 4L))                // window 2: evens {4}
  }

  test("session windows run on a stream (gap merge across one batch)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val agg = StreamingOps.sessionAgg(df, "ts", "user_id", "5 minutes")

    // two events 2 min apart (one session), one 20 min later (new session)
    mem.addData((ts(0), 1L), (ts(2), 1L), (ts(22), 1L))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sessions").orderBy("session_start").collect()
    rows.length shouldBe 2
    rows(0).getAs[Long]("n") shouldBe 2L
    rows(1).getAs[Long]("n") shouldBe 1L
  }
}
