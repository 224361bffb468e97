package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import QueryHelpers._
import graft.streaming.StreamingOps

/** Streaming-operator semantics exercised through the batch path (the same
  * code runs on streaming frames — see graft.streaming.StreamingOps and
  * StreamingSpec). The DuckDB oracle pins the window/session semantics.
  */
object Streaming {

  /** Tumbling 1-hour windows per event_type with decimal-exact totals. */
  private val q36: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .withColumn("v", col("value").cast(DecimalType(12, 2)))
    StreamingOps.tumblingAgg(e, "ts", "event_type", "v", "1 hour")
      .select(col("window_start"), col("event_type"), col("n"),
        col("total").cast("double").as("total"))
      .psort(col("window_start"), col("event_type"))
  }

  private val q36Sql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      | event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sliding 1-hour windows every 30 minutes: each event lands in two
    * overlapping windows. */
  private val q37: Q = (s, dir) => {
    val e = t(s, dir, "events")
    StreamingOps.slidingAgg(e, "ts", "event_type", "1 hour", "30 minutes")
      .psort(col("window_start"), col("event_type"))
  }

  private val q37Sql =
    """WITH starts AS (
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type FROM events)
      |SELECT window_start, event_type, COUNT(*) AS n
      |FROM starts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Gap-based session windows (5 min) per user: session ends 5 min after
    * its last event; a new event at exactly the gap boundary starts a new
    * session (Spark session_window semantics, pinned by the lag/cumsum
    * rendering in the oracle). */
  private val q38: Q = (s, dir) => {
    val e = t(s, dir, "events")
    StreamingOps.sessionAgg(e, "ts", "user_id", "5 minutes")
      .psort(col("user_id"), col("session_start"))
  }

  private val q38Sql =
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL '5 minutes' THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL '5 minutes' AS session_end,
      |       user_id, COUNT(*) AS n
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Recursive CTE (Spark >= 4.0): a 1997 month spine left-joined to order
    * counts — the SURVEY §7.3 "recursive CTE" gap is closed natively. */
  private val q39Text =
    """WITH RECURSIVE months(m) AS (
      |  SELECT DATE '1997-01-01' AS m
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
      |  WHERE m < DATE '1997-12-01')
      |SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
      |FROM months LEFT JOIN orders
      |  ON o_orderdate >= CAST(m AS TIMESTAMP)
      | AND o_orderdate < CAST(CAST(m + INTERVAL '1' MONTH AS DATE) AS TIMESTAMP)
      |GROUP BY m ORDER BY m""".stripMargin

  private val q39: Q = (s, dir) => {
    graft.Tables.register(s, dir)
    s.sql(q39Text)
  }

  /** Stream-stream interval join (view→click attribution within 10 min):
    * the watermarked two-stream join whose state Spark bounds to the
    * interval; here exercised on the batch frames, StreamingSpec drives the
    * same operator through MemoryStream micro-batches. */
  private val q50: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    StreamingOps.intervalJoin(views, clicks, "user_id",
        "view_ts", "click_ts", "10 minutes")
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
      .psort(col("user_id"), col("view_id"), col("click_id"))
  }

  private val q50Sql =
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      | v.ts AS view_ts, c.ts AS click_ts
      |FROM events v JOIN events c ON v.user_id = c.user_id
      |WHERE v.event_type = 'view' AND c.event_type = 'click'
      |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '10 minutes'
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  /** End-to-end STREAMING execution through the correctness gate: a slice
    * of the events table replays through a MemoryStream source, the
    * tumbling aggregation runs as an actual Structured Streaming query
    * (micro-batches, Trigger.AvailableNow — the reference's consume-to-end
    * snapshot semantics) into a memory sink, and the sink contents are what
    * the DuckDB oracle hashes. Unlike q36 (same transform on the batch
    * path), this gates the streaming RUNTIME: source -> watermark ->
    * stateful agg -> sink. Complete output mode + exact decimal sums make
    * the result independent of micro-batch boundaries.
    *
    * Hygiene (a MemoryStream gate runs INSIDE a 100-query benchmark
    * session): only a bounded slice streams (MemoryStream pins all added
    * batches on the driver; streaming an sf-proportional collect here
    * caused enough driver memory pressure to evict OTHER queries'
    * persisted index frames), the small sink result is copied to a local
    * frame, and the sink view is dropped immediately — nothing from the
    * run outlives the query. */
  private val q74Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q74: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    // null-safe row shape (boxed Double): q36 and the oracle tolerate NULL
    // measures, so the streaming gate must too
    val rows = t(s, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp](0), r.getAs[String](1),
        r.getAs[java.lang.Double](2)))
      .toSeq
    val ms = MemoryStream[(java.sql.Timestamp, String, java.lang.Double)]
    // two chunks -> at least two micro-batches worth of source data
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a)
    ms.addData(b)
    val stream = ms.toDF().toDF("ts", "event_type", "value")
      .withColumn("v", col("value").cast(DecimalType(12, 2)))
    val agged = StreamingOps.tumblingAgg(stream, "ts", "event_type", "v", "1 hour")
    val sink = "q74_sink_" + q74Counter.incrementAndGet()
    val result = StreamingOps
      .snapshotToTable(agged, sink, "complete", statePartitions = 4,
        extraConfs = StreamingOps.noIdleBatches)
      .select(col("window_start"), col("event_type"), col("n"),
        col("total").cast("double").as("total"))
    // detach pins the snapshot executor-side, then drops the sink so
    // repeated invocations don't pin dead views on the driver.
    // State-store teardown is amortized: the gates cap state partitions at
    // 4, so the dead providers left per run are a few near-empty maps —
    // StreamingOps.shutdownGates() unloads them once at suite end instead
    // of paying a maintenance-pool stop/restart inside every gate.
    StreamingOps.detach(result, sink).psort(col("window_start"), col("event_type"))
  }

  // identical aggregation contract, restricted to the streamed slice — the
  // oracle pins that the streaming runtime computes exactly what the batch
  // path computes
  private val q74Sql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      | event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM events WHERE user_id < 10 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Typed per-key custom state (the Dataset.groupByKey.mapGroups shape —
    * the batch twin of mapGroupsWithState, which StreamingSpec drives
    * through MemoryStream): per-user event count, money total in exact
    * integer cents, and latest event id, folded imperatively per group.
    * Values are positive, so Scala's math.round (half toward +inf) and SQL
    * ROUND (half away from zero) agree. */
  case class UEvent(user_id: Long, value: Double, event_id: Long)
  case class UState(user_id: Long, n_events: Long, total_cents: Long,
                    max_event: Long)

  private val q71: Q = (s, dir) => {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val encIn: Encoder[UEvent] = Encoders.product[UEvent]
    implicit val encOut: Encoder[UState] = Encoders.product[UState]
    implicit val encKey: Encoder[Long] = Encoders.scalaLong
    t(s, dir, "events")
      .select(col("user_id"), col("value"), col("event_id"))
      .as[UEvent]
      .groupByKey(_.user_id)
      .mapGroups { (k, it) =>
        var n = 0L; var cents = 0L; var maxEv = Long.MinValue
        it.foreach { e =>
          n += 1
          cents += math.round(e.value * 100.0)
          if (e.event_id > maxEv) maxEv = e.event_id
        }
        UState(k, n, cents, maxEv)
      }
      .toDF()
      .psort(col("user_id"))
  }

  private val q71Sql =
    """SELECT user_id, COUNT(*) AS n_events,
      | CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
      | MAX(event_id) AS max_event
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q79: streaming DEDUP through the real runtime — the incremental twin
    * of d01/d10: the event stream deduplicated on (user_id, event_type) by
    * Spark's state-backed dropDuplicatesWithinWatermark
    * (StreamingOps.dedup), run as an actual Structured Streaming query
    * (MemoryStream micro-batches, Trigger.AvailableNow, append sink); the
    * sink is then aggregated in batch and THAT is what the oracle hashes.
    *
    * Determinism: the watermark delay (365 days) exceeds the events table's
    * time span, so no dedup state is ever evicted and the streaming result
    * equals global DISTINCT regardless of micro-batch boundaries — the
    * property the oracle (COUNT(DISTINCT user_id) per type) pins. At scale
    * the delay is tuned to the real out-of-orderness and state stays
    * bounded per key-partition. Same driver hygiene as q74 (bounded slice,
    * sink dropped, state stores unloaded). */
  /** Driver copy of a bounded gate slice. A bare `.limit(cap)` on an
    * unordered frame silently feeds an arbitrary, run-dependent subset to
    * the stream when the slice outgrows the cap while the oracle keeps
    * aggregating the full slice — so overflow must be an error, not a
    * truncation. (~600 rows at sf0.1; the cap exists only as a driver-memory
    * guard.) */
  private val driverSliceCap = 20000
  private def cappedSlice(df: DataFrame): Array[Row] = {
    val rows = df.limit(driverSliceCap + 1).collect()
    require(rows.length <= driverSliceCap,
      s"streaming gate slice exceeds driver cap $driverSliceCap; " +
        "tighten the slice predicate instead of truncating nondeterministically")
    rows
  }

  private val q79Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q79: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val rows = cappedSlice(t(s, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("ts"), col("user_id"), col("event_type")))
      .map(r => (r.getAs[java.sql.Timestamp](0), r.getLong(1), r.getString(2)))
      .toSeq
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a)
    ms.addData(b)
    val stream = ms.toDF().toDF("ts", "user_id", "event_type")
    val deduped = graft.streaming.StreamingOps.dedup(
      stream, "ts", Seq("user_id", "event_type"), watermark = "365 days")
    val sink = "q79_sink_" + q79Counter.incrementAndGet()
    val first = graft.streaming.StreamingOps
      .snapshotToTable(deduped, sink, "append", statePartitions = 4,
        extraConfs = StreamingOps.noIdleBatches)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_users"))
    StreamingOps.detach(first, sink).psort(col("event_type"))
  }

  private val q79Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
      |FROM events WHERE user_id < 10
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q80: CUSTOM STATE through the real streaming runtime — q71's typed
    * per-user fold (event count, exact integer cents, latest event id)
    * executed as an actual mapGroupsWithState streaming query over
    * MemoryStream micro-batches in Update mode. Each batch re-emits the
    * touched users' cumulative stats; n_events is strictly monotone per
    * user, so the LAST emission per user (max n_events) equals the batch
    * totals regardless of micro-batch boundaries — the property the
    * oracle pins. Integer-cents state keeps the fold order-independent
    * (the q71 determinism contract). Same driver hygiene as q74/q79. */
  private val q80Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q80: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val rows = cappedSlice(t(s, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("value"), col("event_id")))
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val ms = MemoryStream[(Long, Double, Long)]
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a)
    ms.addData(b)
    // s.implicits._ supplies the key/state/product encoders
    val stream = ms.toDF().toDF("user_id", "value", "event_id").as[UEvent]
    val updated = stream.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long, Long), UState](GroupStateTimeout.NoTimeout()) {
        (u: Long, it: Iterator[UEvent], st: GroupState[(Long, Long, Long)]) =>
          var (n, c, m) = st.getOption.getOrElse((0L, 0L, 0L))
          it.foreach { e =>
            n += 1
            c += math.round(e.value * 100.0)
            m = math.max(m, e.event_id)
          }
          st.update((n, c, m))
          UState(u, n, c, m)
      }
    val sink = "q80_sink_" + q80Counter.incrementAndGet()
    val snap = graft.streaming.StreamingOps
      .snapshotToTable(updated.toDF(), sink, "update", statePartitions = 4,
        extraConfs = StreamingOps.noIdleBatches)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    val fin = snap.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"), col("total_cents"), col("max_event"))
    StreamingOps.detach(fin, sink).psort(col("user_id"))
  }

  private val q80Sql =
    """SELECT user_id, COUNT(*) AS n_events,
      | CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
      | MAX(event_id) AS max_event
      |FROM events WHERE user_id < 10
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q85: stream-STREAM interval join through the real runtime — two
    * MemoryStream sources (views, clicks), watermarks on both sides, the
    * time-bounded join condition, run as an actual Structured Streaming
    * query into an append sink (q50 gates the same TRANSFORM on the batch
    * path, where watermarks are no-ops; this gates the streaming JOIN
    * STATE machinery itself). Watermark delay (365 days) exceeds the data
    * span so no row is evicted before matching, making the streamed result
    * equal the batch interval join the oracle pins — at scale the delay is
    * the real out-of-orderness bound and join state stays bounded per
    * key-partition. Same driver hygiene as q74/q79 (capped slice, sink
    * dropped, suite-end state teardown). */
  private val q85Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q85: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    def slice(tpe: String) = cappedSlice(t(s, dir, "events")
      .filter(col("user_id") < 100 && col("event_type") === tpe)
      .select(col("ts"), col("user_id"), col("event_id")))
      .map(r => (r.getAs[java.sql.Timestamp](0), r.getLong(1), r.getLong(2)))
      .toSeq
    def stream(rows: Seq[(java.sql.Timestamp, Long, Long)],
               tsName: String, idName: String) = {
      val ms = MemoryStream[(java.sql.Timestamp, Long, Long)]
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a)
      ms.addData(b)
      ms.toDF().toDF(tsName, "user_id", idName)
    }
    val views = stream(slice("view"), "view_ts", "view_id")
    val clicks = stream(slice("click"), "click_ts", "click_id")
    val joined = graft.streaming.StreamingOps.intervalJoin(
        views, clicks, "user_id", "view_ts", "click_ts", "30 minutes",
        watermark = "365 days")
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
    val sink = "q85_sink_" + q85Counter.incrementAndGet()
    val result = graft.streaming.StreamingOps
      .snapshotToTable(joined, sink, "append", statePartitions = 4,
        extraConfs = StreamingOps.noIdleBatches)
    StreamingOps.detach(result, sink).psort(col("user_id"), col("view_id"), col("click_id"))
  }

  private val q85Sql =
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      | v.ts AS view_ts, c.ts AS click_ts
      |FROM events v JOIN events c ON v.user_id = c.user_id
      |WHERE v.event_type = 'view' AND c.event_type = 'click'
      |  AND v.user_id < 100
      |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '30 minutes'
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  /** q88: stream-STATIC enrichment join through the real runtime — the
    * third join topology after batch (q50) and stream-stream (q85): an
    * event stream joined per micro-batch against a STATIC dimension table
    * (customer), the canonical "enrich the firehose with reference data"
    * shape. Stateless by construction (no join state, no watermark — the
    * static side is re-broadcast into each micro-batch), so the streamed
    * result provably equals the batch join, which the oracle pins. At
    * scale the static side is the broadcast dimension and the stream never
    * shuffles for the join. Same driver hygiene as q74/q85 (capped slice,
    * sink dropped, suite-end state teardown). */
  private val q88Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q88: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val rows = cappedSlice(t(s, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("event_id"), col("user_id"), col("value")))
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.lang.Double](2)))
      .toSeq
    val ms = MemoryStream[(Long, Long, java.lang.Double)]
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a)
    ms.addData(b)
    val stream = ms.toDF().toDF("event_id", "user_id", "value")
    val dim = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val joined = stream.join(broadcast(dim),
        stream("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("c_mktsegment"), col("value"))
    val sink = "q88_sink_" + q88Counter.incrementAndGet()
    val result = graft.streaming.StreamingOps
      .snapshotToTable(joined, sink, "append", statePartitions = 4,
        extraConfs = StreamingOps.noIdleBatches)
    StreamingOps.detach(result, sink).psort(col("event_id"))
  }

  private val q88Sql =
    """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |WHERE e.user_id < 10
      |ORDER BY e.event_id""".stripMargin

  /** q94: dropDuplicatesWithinWatermark with REAL state eviction — the gate
    * that distinguishes it from q79's dropDuplicates: q79's 365-day delay
    * never evicts, so it proves dedup but not the watermark lifecycle; q94
    * plants a stream where the SECOND occurrence of each key arrives after
    * the key's dedup state may have expired, and the emission count per key
    * (1 = still deduped, 2 = state evicted, re-emitted) is decided by the
    * watermark arithmetic alone.
    *
    * Determinism (batch boundaries and processing order both neutralized):
    * batch 1 carries two IDENTICAL rows per key at ts0(u) = base + 3u min
    * (identical ts ⇒ the first-processed row fixes the same expiry
    * whichever one wins), batch 2 one row at ts0(u) + 500 min. After batch
    * 1 the watermark is W1 = max(ts0) - 31 min; in batch 2 key u re-emits
    * iff its expiry ts0(u) + 31 min < W1 ⟺ u <= maxU - 21 (constants
    * chosen so no key lands exactly ON a boundary — the > vs >= eviction
    * detail can never flip a row). The oracle replays exactly this
    * arithmetic in SQL over the same distinct-user set. At scale the
    * shape is the production one: state bounded by keys-per-delay-window,
    * evicted as the watermark passes, shuffle keyed on the dedup key. */
  private val q94Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q94: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val users = cappedSlice(
      t(s, dir, "events").filter(col("user_id") < 100)
        .select(col("user_id")).distinct())
      .map(_.getLong(0)).sorted
    def ts(u: Long, offMin: Long) =
      new java.sql.Timestamp(base.getTime + (3 * u + offMin) * 60000L)
    val b1 = users.flatMap(u => Seq((ts(u, 0), u), (ts(u, 0), u)))
    val b2 = users.map(u => (ts(u, 500), u))
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = ms.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "31 minutes")
      .dropDuplicatesWithinWatermark("user_id")
    val sink = "q94_sink_" + q94Counter.incrementAndGet()
    // staged feeding: each wave must commit as its OWN micro-batch so the
    // watermark advances between them (AvailableNow would drain all
    // pre-added blocks in one batch and never evict). The middle wave is
    // ONE guaranteed-late dummy row (base < W1 ⇒ dropped by the late
    // filter, never emitted, watermark unchanged): it commits a batch
    // between the occurrence waves so expired state is gone before wave 3
    // whether eviction runs on read or at end-of-batch — the result is
    // identical under both.
    val emitted = graft.streaming.StreamingOps
      .snapshotToTableStaged(deduped, sink, "append", statePartitions = 4,
        extraConfs = StreamingOps.noIdleBatches)(Seq(
        () => ms.addData(b1.toSeq),
        () => ms.addData(Seq((base, 999999L))),
        () => ms.addData(b2.toSeq)))
      .filter(col("user_id") < 100)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_emitted"))
    StreamingOps.detach(emitted, sink).psort(col("user_id"))
  }

  private val q94Sql =
    """WITH u AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id < 100),
      |w AS (SELECT MAX(3 * user_id) - 31 AS w1 FROM u)
      |SELECT user_id,
      |  CASE WHEN 3 * user_id + 31 < (SELECT w1 FROM w)
      |       THEN 2 ELSE 1 END AS n_emitted
      |FROM u ORDER BY user_id""".stripMargin

  /** Accumulator state for q95's StatefulProcessor (count, exact integer
    * cents, max event id — all order-independent folds, so batch and
    * within-batch processing order cannot change the result). */
  case class UAcc(n: Long, cents: Long, max_id: Long)

  /** q95's processor: the transformWithState (Spark 4 arbitrary-state v2)
    * spelling of q80's mapGroupsWithState fold — ValueState instead of
    * GroupState, explicit init with a typed state handle, emission of the
    * cumulative row per touched key per batch. Runs on the RocksDB state
    * store provider (required by the API), which is also the provider a
    * 100 TB deployment runs: state lives off-heap/on-disk per partition,
    * not in executor heap. */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UEvent, UState] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[UAcc] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[UAcc]("acc",
        org.apache.spark.sql.Encoders.product[UAcc],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UEvent],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UState] = {
      var acc = if (state.exists()) state.get() else UAcc(0L, 0L, 0L)
      rows.foreach { e =>
        acc = UAcc(acc.n + 1, acc.cents + math.round(e.value * 100.0),
          math.max(acc.max_id, e.event_id))
      }
      state.update(acc)
      Iterator.single(UState(key, acc.n, acc.cents, acc.max_id))
    }
  }

  /** q95: q80's per-user running stats through transformWithState — the
    * arbitrary-stateful-processing v2 API — with the SAME oracle as q80:
    * the cumulative emissions are batch-boundary dependent, but the MAX
    * row per user equals the full-slice aggregate regardless of batching,
    * which is what the gate pins. Differentially, q80 (mapGroupsWithState,
    * HDFS-backed store) and q95 (StatefulProcessor, RocksDB store) must
    * agree row-for-row. */
  private val q95Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q95: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val rows = cappedSlice(t(s, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("value"), col("event_id")))
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val ms = MemoryStream[(Long, Double, Long)]
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a)
    ms.addData(b)
    val stream = ms.toDF().toDF("user_id", "value", "event_id").as[UEvent]
    val updated = stream.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[UState]])
    val sink = "q95_sink_" + q95Counter.incrementAndGet()
    val snap = graft.streaming.StreamingOps
      .snapshotToTable(updated.toDF(), sink, "update", statePartitions = 4,
        extraConfs = Map("spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    val fin = snap.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"), col("total_cents"), col("max_event"))
    StreamingOps.detach(fin, sink).psort(col("user_id"))
  }

  /** q97: streaming PARQUET FILE SINK — exactly-once shard delivery, the
    * fourth sink topology after memory (q74+), COPY batch files (q75/q86/
    * q87), and the stateful gates: a stateless curation transform (filter +
    * exact-cents projection) streams through the REAL runtime into a file
    * sink whose `_spark_metadata` log commits files atomically per
    * micro-batch, and the gate aggregates the READ-BACK files — so a
    * dropped row, a double-committed file, or a half-written shard breaks
    * the hash against the batch oracle.
    *
    * Scale: the map-only transform never shuffles (partition count = source
    * partitions); at 100 TB this is exactly how curated shards land on
    * object storage, with the metadata log carrying exactly-once across
    * executor failures. */
  private val q97Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q97: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    q97Counter.incrementAndGet() // distinct lineage per run (fresh sink dir)
    val rows = t(s, dir, "events")
      .filter(col("user_id") < 8)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.lang.Double](2)))
      .toSeq
    val ms = MemoryStream[(Long, String, java.lang.Double)]
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a)
    ms.addData(b)
    val stream = ms.toDF().toDF("event_id", "event_type", "value")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
    val landed = StreamingOps.snapshotToFiles(stream)
    landed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("cents"), lit(0L))).as("cents_total"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .psort(col("event_type"))
  }

  private val q97Sql =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(COALESCE(CAST(ROUND(value * 100, 0) AS BIGINT), 0)) AS BIGINT) AS cents_total,
      | MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM events WHERE user_id < 8
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q108: stream-stream LEFT OUTER interval join through the REAL
    * runtime — the attribution shape q85 can't express: every view
    * appears exactly once, clicks within [view_ts, view_ts + 30 min]
    * attach, and views with no click emit NULL-extended ONLY after the
    * watermark passes the end of their match interval (the runtime must
    * hold left state that long — the semantics under test). A sentinel
    * batch 10 days past end-of-data on BOTH streams (user_id = -1,
    * filtered from the result) drives the watermark far enough to flush
    * every pending outer row; input batches are time-ordered so the
    * 1-minute watermark delay never drops a legitimate row.
    *
    * Scale: stream-stream outer join state is bounded by the interval
    * (30 min of per-key left rows), evicted by watermark — the exact
    * mechanism that makes attribution joins runnable on an unbounded
    * firehose. Oracle: the equivalent batch LEFT JOIN. */
  private val q108Counter = new java.util.concurrent.atomic.AtomicInteger()
  private val q108: Q = (s, dir) => {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    def slice(tpe: String) = cappedSlice(t(s, dir, "events")
      .filter(col("user_id") < 40 && col("event_type") === tpe)
      .select(col("ts"), col("user_id"), col("event_id")))
      .map(r => (r.getAs[java.sql.Timestamp](0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1.getTime) // time-ordered batches: no late drops
    val viewRows = slice("view")
    val clickRows = slice("click")
    val maxTs = (viewRows ++ clickRows).map(_._1.getTime).max
    // TWO sentinel waves: outer-row eviction runs with the watermark
    // computed at the END of the previous micro-batch, so the first
    // sentinel advances the watermark past every real interval and the
    // second batch applies it — without the second wave the final ~31
    // minutes of views would never null-flush. Staged feeding commits
    // each wave as its own micro-batch (AvailableNow would drain all
    // pre-added blocks in one batch and the watermark would never move
    // between waves).
    val sentinels = Seq(10L, 20L).map(d => (new java.sql.Timestamp(
      maxTs + d * 24 * 3600 * 1000), -1L, -1L))
    val msV = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val msC = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val views = msV.toDF().toDF("view_ts", "user_id", "view_id")
    val clicks = msC.toDF().toDF("click_ts", "user_id", "click_id")
    // NOTE: the sentinel filter must run on the SNAPSHOT, not the stream —
    // an in-stream filter on user_id pushes below the EventTimeWatermark
    // node, the sentinels never reach the watermark accounting, and the
    // final 31 minutes of outer rows never flush (observed, not theory).
    val joined = graft.streaming.StreamingOps.intervalJoinLeftOuter(
        views, clicks, "user_id", "view_ts", "click_ts", "30 minutes",
        watermark = "1 minute")
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
    val sink = "q108_sink_" + q108Counter.incrementAndGet()
    // three waves: one data batch (watermark progression mid-data adds a
    // full micro-batch of cost without exercising any extra semantics —
    // the outer-flush machinery under test lives in the sentinel waves)
    val result = graft.streaming.StreamingOps
      .snapshotToTableStaged(joined, sink, "append", statePartitions = 2,
        extraConfs = StreamingOps.noIdleBatches)(Seq(
        () => { msV.addData(viewRows); msC.addData(clickRows) },
        () => { msV.addData(Seq(sentinels(0))); msC.addData(Seq(sentinels(0))) },
        () => { msV.addData(Seq(sentinels(1))); msC.addData(Seq(sentinels(1))) }))
      .filter(col("user_id") >= 0) // drop the sentinel rows from the snapshot
    StreamingOps.detach(result, sink).psort(col("user_id"), col("view_id"), col("click_id"))
  }

  private val q108Sql =
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      | v.ts AS view_ts, c.ts AS click_ts
      |FROM (SELECT * FROM events
      |      WHERE event_type = 'view' AND user_id < 40) v
      |LEFT JOIN (SELECT * FROM events
      |           WHERE event_type = 'click' AND user_id < 40) c
      |  ON v.user_id = c.user_id
      |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '30 minutes'
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  // ---- q116: watermark-planning lateness audit -----------------------------
  /** q116: the audit an operator runs BEFORE choosing a watermark delay —
    * replay the stream's true drop semantics over the event log and report,
    * per event type, what each candidate delay (10/30/60/120 s) WOULD have
    * dropped. Arrival times are synthesized deterministically from
    * event_id (0-120 s transport lag); an event is late under delay W iff
    * the running max event-time of everything that arrived BEFORE it
    * exceeds its own event-time by more than W — exactly Spark's
    * per-partition watermark update rule (watermark advances on arrival,
    * an event never drops itself).
    *
    * Scale shape: the running max is a per-event-type window (the
    * per-partition watermark tracking Flink/Spark actually do — the global
    * watermark is the MIN over partitions, a k-row reduce); one window
    * pass + one per-type agg, exact integer lateness counters. */
  private val q116: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ems"),
        ((col("event_id") * 7919L) % 120000L).as("lag_ms"))
      .withColumn("arr", col("ems") + col("lag_ms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("arr"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val withWm = e.withColumn("wm", max(col("ems")).over(w))
    def latePm(wMs: Long): org.apache.spark.sql.Column =
      expr(s"sum(CASE WHEN wm - ems > $wMs THEN 1 ELSE 0 END) * 1000" +
        " div count(1)")
    withWm.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_events"),
        max(col("lag_ms")).as("max_lag_ms"),
        latePm(10000L).as("late10_permille"),
        latePm(30000L).as("late30_permille"),
        latePm(60000L).as("late60_permille"),
        latePm(120000L).as("late120_permille"))
      .psort(col("event_type"))
  }

  private val q116Sql =
    """WITH e AS (
      |  SELECT event_type, event_id, epoch_ms(ts) AS ems,
      |    (event_id * 7919) % 120000 AS lag_ms,
      |    epoch_ms(ts) + (event_id * 7919) % 120000 AS arr
      |  FROM events),
      |w AS (
      |  SELECT event_type, lag_ms, ems,
      |    MAX(ems) OVER (PARTITION BY event_type ORDER BY arr, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
      |  FROM e)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(lag_ms) AS BIGINT) AS max_lag_ms,
      |  CAST(SUM(CASE WHEN wm - ems > 10000 THEN 1 ELSE 0 END) * 1000
      |    // COUNT(*) AS BIGINT) AS late10_permille,
      |  CAST(SUM(CASE WHEN wm - ems > 30000 THEN 1 ELSE 0 END) * 1000
      |    // COUNT(*) AS BIGINT) AS late30_permille,
      |  CAST(SUM(CASE WHEN wm - ems > 60000 THEN 1 ELSE 0 END) * 1000
      |    // COUNT(*) AS BIGINT) AS late60_permille,
      |  CAST(SUM(CASE WHEN wm - ems > 120000 THEN 1 ELSE 0 END) * 1000
      |    // COUNT(*) AS BIGINT) AS late120_permille
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q117: ordered conversion funnel --------------------------------------
  /** q117: the classic ordered funnel over the event log — of all users,
    * who VIEWED, then CLICKED at-or-after their first view, then PURCHASED
    * at-or-after that click (each stage anchored on the earliest
    * qualifying event, the standard strict-order funnel). Output is the
    * 4-row stage report with per-stage conversion permille.
    *
    * Scale shape: three per-user min aggregations chained by user_id
    * equi-joins (co-partitionable — one shuffle key end to end), four
    * 1-row counts broadcast into the tiny stage union. */
  private val q117: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vts"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") >= col("vts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") >= col("cts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
    // r13: the 1-row stage-count frame feeds FOUR union branches — unpinned,
    // each branch re-ran the whole 3-stage funnel (4x recompute, profiled
    // 13 jobs); one eager localCheckpoint runs it once.
    val agg = e.agg(countDistinct(col("user_id")).as("n0"))
      .crossJoin(broadcast(v.agg(count(lit(1)).as("n1"))))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n2"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n3"))))
      .localCheckpoint(true)
    agg.select(lit("0_all").as("stage"), col("n0").as("n_users"),
        lit(1000L).as("permille_of_prev"))
      // greatest(n, 1) guards the degenerate corpus with an empty previous
      // stage: Spark `div` would return NULL where DuckDB `//` RAISES on
      // division by zero — the engines must agree on empty stages too
      // (same pattern as p06's util_pct).
      .unionAll(agg.select(lit("1_view"), col("n1"),
        expr("n1 * 1000 div greatest(n0, 1L)")))
      .unionAll(agg.select(lit("2_click"), col("n2"),
        expr("n2 * 1000 div greatest(n1, 1L)")))
      .unionAll(agg.select(lit("3_purchase"), col("n3"),
        expr("n3 * 1000 div greatest(n2, 1L)")))
      .psort(col("stage"))
  }

  private val q117Sql =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS vts FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS cts FROM events e
      |  JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts >= v.vts GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS pts FROM events e
      |  JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.cts GROUP BY 1),
      |n AS (SELECT
      |  (SELECT COUNT(DISTINCT user_id) FROM events) AS n0,
      |  (SELECT COUNT(*) FROM v) AS n1,
      |  (SELECT COUNT(*) FROM c) AS n2,
      |  (SELECT COUNT(*) FROM p) AS n3)
      |SELECT '0_all' AS stage, CAST(n0 AS BIGINT) AS n_users,
      |  CAST(1000 AS BIGINT) AS permille_of_prev FROM n
      |UNION ALL SELECT '1_view', CAST(n1 AS BIGINT),
      |  CAST(n1 * 1000 // GREATEST(n0, 1) AS BIGINT) FROM n
      |UNION ALL SELECT '2_click', CAST(n2 AS BIGINT),
      |  CAST(n2 * 1000 // GREATEST(n1, 1) AS BIGINT) FROM n
      |UNION ALL SELECT '3_purchase', CAST(n3 AS BIGINT),
      |  CAST(n3 * 1000 // GREATEST(n2, 1) AS BIGINT) FROM n
      |ORDER BY stage""".stripMargin

  // ---- q118: weekly retention cohorts ---------------------------------------
  /** q118: the retention matrix every growth dashboard is built on — users
    * cohorted by SIGNUP week, then for each later week-offset the count
    * and permille still active (any event). Weeks are exact integer
    * epoch-day arithmetic (no timezone/locale week functions — identical
    * in both engines by construction).
    *
    * Scale shape: one per-user min (signup), one distinct (user, week)
    * projection, ONE user_id equi-join, one (cohort, offset) agg — the
    * cohort matrix is weeks^2-bounded. */
  private val q118: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val week = (c: org.apache.spark.sql.Column) =>
      floor(unix_millis(c) / lit(604800000L)).cast("long")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(week(col("ts"))).as("cohort_week"))
    val active = e.select(col("user_id"), week(col("ts")).as("aweek"))
      .distinct()
    val sized = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cohort.join(active, Seq("user_id"))
      .filter(col("aweek") >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        (col("aweek") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sized, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        expr("n_active * 1000 div cohort_size").as("retained_permille"))
      .psort(col("cohort_week"), col("week_offset"))
  }

  private val q118Sql =
    """WITH cohort AS (
      |  SELECT user_id, MIN(epoch_ms(ts) // 604800000) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |active AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS aweek
      |  FROM events),
      |sized AS (
      |  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      |  FROM cohort GROUP BY 1)
      |SELECT c.cohort_week, a.aweek - c.cohort_week AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_active, s.cohort_size,
      |  CAST(COUNT(*) * 1000 // s.cohort_size AS BIGINT)
      |    AS retained_permille
      |FROM cohort c JOIN active a USING (user_id)
      |JOIN sized s ON c.cohort_week = s.cohort_week
      |WHERE a.aweek >= c.cohort_week
      |GROUP BY c.cohort_week, week_offset, s.cohort_size
      |ORDER BY c.cohort_week, week_offset""".stripMargin

  // ---- q119: session path transition matrix ---------------------------------
  /** q119: the event-type transition matrix product analytics reads paths
    * from — within each user's 5-minute-gap sessions (q38's session rule),
    * count consecutive (from_type -> to_type) steps, with each transition's
    * permille among steps leaving the same from_type (the per-state
    * Markov row). Ties in ts order break on event_id so both engines walk
    * identical paths.
    *
    * Scale shape: one per-user window pass (lag over the user's own
    * timeline — partition-parallel across users, never a global sort),
    * one (from, to) agg over at most |types|^2 groups, a |types|-row
    * broadcast for the row totals. */
  private val q119: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_type").isNotNull &&
        unix_millis(col("ts")) - unix_millis(col("prev_ts")) < 300000L)
      .select(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
    val m = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_steps"))
    val totals = m.groupBy(col("from_type"))
      .agg(sum(col("n_steps")).as("row_total"))
    m.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_steps"),
        expr("n_steps * 1000 div row_total").as("row_permille"))
      .psort(col("from_type"), col("to_type"))
  }

  private val q119Sql =
    """WITH steps AS (
      |  SELECT prev_type AS from_type, event_type AS to_type FROM (
      |    SELECT event_type, ts,
      |      LAG(event_type) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS prev_type,
      |      LAG(ts) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS prev_ts
      |    FROM events)
      |  WHERE prev_type IS NOT NULL
      |    AND epoch_ms(ts) - epoch_ms(prev_ts) < 300000),
      |m AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_steps
      |  FROM steps GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n_steps) AS BIGINT) AS row_total
      |  FROM m GROUP BY 1)
      |SELECT m.from_type, m.to_type, m.n_steps,
      |  CAST(m.n_steps * 1000 // t.row_total AS BIGINT) AS row_permille
      |FROM m JOIN tot t USING (from_type)
      |ORDER BY m.from_type, m.to_type""".stripMargin

  // ---- q120: multi-touch revenue attribution --------------------------------
  /** q120: the attribution job marketing analytics runs — every purchase's
    * value credited to the view/click touches that preceded it within 24h,
    * under BOTH models: last-touch (full value to the latest touch) and
    * linear (value split equally, remainder cents to the latest touch —
    * the largest-remainder rule that keeps the books exact). Money stays
    * in integer CENTS end to end, so both engines' totals are
    * bit-identical and every purchase's cents are fully conserved across
    * its touches (spec-pinned).
    *
    * Scale shape: one user_id equi-join with a time-range predicate (the
    * q50 interval-join shape — state bounded by the window), one
    * per-purchase ranking window, one channel-level agg. */
  private val q120: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_millis(col("ts")).as("pts"),
        // cents via ROUND(double) — NOT a double->DECIMAL cast, whose
        // tie-rounding mode differs subtly between engines (Spark HALF_UP
        // vs DuckDB away-from-zero). ROUND on a double is half-away-from-
        // zero in BOTH engines (BigDecimal HALF_UP == away-from-zero for
        // either sign), so the contract holds even for negative refunds.
        round(col("value") * 100).cast("long").as("cents"))
    val touch = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("channel"),
        unix_millis(col("ts")).as("tts"), col("event_id").as("tid"))
    val joined = purch.join(touch, Seq("user_id"))
      .filter(col("tts") <= col("pts") &&
        col("tts") > col("pts") - 86400000L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("tts").desc, col("tid").desc)
    val ranked = joined
      .withColumn("rn", row_number().over(w))
      .withColumn("n_touch", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))))
    ranked.select(col("channel"),
        when(col("rn") === 1, col("cents")).otherwise(0L).as("last_cents"),
        (expr("cents div n_touch") +
          when(col("rn") === 1, expr("cents % n_touch")).otherwise(0L))
          .as("linear_cents"))
      .groupBy(col("channel")).agg(
        count(lit(1)).as("n_touches"),
        sum(col("last_cents")).as("last_touch_cents"),
        sum(col("linear_cents")).as("linear_cents"))
      .psort(col("channel"))
  }

  private val q120Sql =
    """WITH purch AS (
      |  SELECT event_id AS pid, user_id, epoch_ms(ts) AS pts,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |touch AS (
      |  SELECT user_id, event_type AS channel, epoch_ms(ts) AS tts,
      |    event_id AS tid
      |  FROM events WHERE event_type IN ('view', 'click')),
      |ranked AS (
      |  SELECT channel, cents,
      |    ROW_NUMBER() OVER (PARTITION BY pid
      |      ORDER BY tts DESC, tid DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY pid) AS n_touch
      |  FROM purch JOIN touch USING (user_id)
      |  WHERE tts <= pts AND tts > pts - 86400000)
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  CAST(SUM(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT)
      |    AS last_touch_cents,
      |  CAST(SUM(cents // n_touch
      |    + CASE WHEN rn = 1 THEN cents % n_touch ELSE 0 END) AS BIGINT)
      |    AS linear_cents
      |FROM ranked GROUP BY channel ORDER BY channel""".stripMargin

  // ---- q121: join-key skew diagnostics ---------------------------------------
  /** q121: the pre-flight diagnostic that justifies (or spares) a salting
    * pass — for each join-key family the pipeline shuffles on, the row
    * count, distinct keys, the heaviest key's row count, and the skew
    * factor x1000 (heaviest-key rows / uniform share; 1000 = perfectly
    * even). A factor in the thousands is the straggler-task signature at
    * 100 TB, and the salting recommendation (q56's operator) keys off it.
    *
    * Scale shape: one count-per-key shuffle per audited family with
    * map-side partials, then a key-count-bounded re-aggregation; 2-row
    * output. */
  private val q121: Q = (s, dir) => {
    def audit(df: DataFrame, key: String, fam: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("n")).as("max_key_n"))
        .select(lit(fam).as("key_family"), col("n_rows"), col("n_keys"),
          col("max_key_n"),
          // divide by the integer average FIRST: max*keys*1000 overflows
          // BIGINT at extreme key counts, max*1000 never does
          expr("max_key_n * 1000 div (n_rows div n_keys)").as("skew_x1000"))
        .withColumn("salting_recommended", col("skew_x1000") > 4000L)
    audit(t(s, dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey")
      .unionAll(audit(t(s, dir, "events"), "user_id", "events.user_id"))
      .psort(col("key_family"))
  }

  private val q121Sql =
    """WITH li AS (
      |  SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |ev AS (
      |  SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1)
      |SELECT 'events.user_id' AS key_family,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(MAX(n) AS BIGINT) AS max_key_n,
      |  CAST(MAX(n) * 1000 // (SUM(n) // COUNT(*)) AS BIGINT) AS skew_x1000,
      |  MAX(n) * 1000 // (SUM(n) // COUNT(*)) > 4000 AS salting_recommended
      |FROM ev
      |UNION ALL
      |SELECT 'lineitem.l_orderkey',
      |  CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),
      |  CAST(MAX(n) AS BIGINT),
      |  CAST(MAX(n) * 1000 // (SUM(n) // COUNT(*)) AS BIGINT),
      |  MAX(n) * 1000 // (SUM(n) // COUNT(*)) > 4000
      |FROM li
      |ORDER BY key_family""".stripMargin

  val queries: Map[String, Q] = Map(
    "q121_skew_diagnostics" -> q121,
    "q120_attribution" -> q120,
    "q119_transitions" -> q119,
    "q117_funnel" -> q117,
    "q118_retention" -> q118,
    "q116_watermark_audit" -> q116,
    "q108_stream_outer" -> q108,
    "q97_stream_file_sink" -> q97,
    "q95_transform_with_state" -> q95,
    "q94_stream_dedup_within" -> q94,
    "q88_stream_static_join" -> q88,
    "q85_stream_stream_join" -> q85,
    "q80_stream_custom_state" -> q80,
    "q79_stream_dedup" -> q79,
    "q36_stream_tumbling" -> q36,
    "q37_stream_sliding" -> q37,
    "q38_stream_session" -> q38,
    "q39_recursive_cte" -> q39,
    "q50_stream_join" -> q50,
    "q71_stateful_typed" -> q71,
    "q74_stream_e2e" -> q74)

  val oracleSql: Map[String, String] = Map(
    "q121_skew_diagnostics" -> q121Sql,
    "q120_attribution" -> q120Sql,
    "q119_transitions" -> q119Sql,
    "q117_funnel" -> q117Sql,
    "q118_retention" -> q118Sql,
    "q116_watermark_audit" -> q116Sql,
    "q108_stream_outer" -> q108Sql,
    "q97_stream_file_sink" -> q97Sql,
    "q95_transform_with_state" -> q80Sql,
    "q94_stream_dedup_within" -> q94Sql,
    "q88_stream_static_join" -> q88Sql,
    "q85_stream_stream_join" -> q85Sql,
    "q80_stream_custom_state" -> q80Sql,
    "q79_stream_dedup" -> q79Sql,
    "q36_stream_tumbling" -> q36Sql,
    "q37_stream_sliding" -> q37Sql,
    "q38_stream_session" -> q38Sql,
    "q39_recursive_cte" -> q39Text,
    "q50_stream_join" -> q50Sql,
    "q71_stateful_typed" -> q71Sql,
    "q74_stream_e2e" -> q74Sql)
}
