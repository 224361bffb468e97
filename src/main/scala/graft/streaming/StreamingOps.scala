package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming extension.
  *
  * The reference engine is a bounded snapshot (consume-to-end, then query —
  * reference: KwackEngine.java:745-774; SURVEY §1.5/§2.2 "Streaming: none");
  * these operators are the forward-looking streaming surface on top of the
  * same tables. Every transform here works identically on a batch frame and
  * a streaming frame, so the DuckDB-oracle correctness gate exercises the
  * batch path while StreamingSpec drives the same code through MemoryStream
  * micro-batches.
  *
  * Scale notes: all aggregations are keyed on (window, key) — state is
  * bounded by the watermark and partitioned by the grouping key, the normal
  * 1000-executor layout. `Trigger.AvailableNow` reproduces the reference's
  * snapshot semantics on a live stream.
  */
object StreamingOps {

  /** r13 (guide §1/§2 — don't run work the result can't observe): after
    * every data micro-batch whose watermark advanced, the runtime by
    * default schedules an EXTRA no-data micro-batch purely to let
    * event-time state evict/emit early — for the gates each one costs a
    * full batch round (plan + state commit + WAL, ~0.5-1 s measured at
    * the local floor) and DOUBLES the batch count. Pass this at call
    * sites whose final snapshot provably cannot depend on mid-stream
    * eviction timing:
    *  - complete-mode aggregations (the last data batch re-emits the
    *    whole state);
    *  - append-mode dedup / inner joins / stateless enrichment (rows
    *    emit when DATA arrives; eviction never emits);
    *  - the staged outer-join gates, whose SECOND sentinel wave exists
    *    precisely so the flush happens in a DATA batch.
    * NOT safe for event-time-timeout operators that EMIT on timer fire
    * (sessionizeOnClose / transformWithState timers) unless a sentinel
    * wave drives the clock — those keep the default. */
  val noIdleBatches: Map[String, String] =
    Map("spark.sql.streaming.noDataMicroBatches.enabled" -> "false")

  /** Tumbling-window aggregate with watermark-bounded state. */
  def tumblingAgg(events: DataFrame, tsCol: String, keyCol: String,
                  valueCol: String, windowLen: String,
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col("total"))

  /** Sliding-window aggregate. */
  def slidingAgg(events: DataFrame, tsCol: String, keyCol: String,
                 windowLen: String, slide: String,
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col(keyCol), col("n"))

  /** Session windows (gap-based) per key. */
  def sessionAgg(events: DataFrame, tsCol: String, keyCol: String,
                 gap: String, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col(keyCol), col("n"))

  /** Stream-stream inner join within a time bound: right events that occur
    * in [leftTs, leftTs + bound] for the same key. With watermarks on both
    * sides the join state is bounded (Spark drops buffered rows once the
    * watermark passes leftTs + bound) — the 1000-executor layout shuffles
    * both streams on the key, so each task joins co-partitioned slices.
    * Works identically on batch frames (the oracle path). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, bound: String,
                   watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(keyCol) === r(keyCol) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound"))
      .drop(r(keyCol))
  }

  /** Stream-stream LEFT OUTER interval join: unmatched left rows are
    * null-extended and emitted only once the watermark passes the end of
    * their match interval (leftTs + bound) — the runtime must hold left
    * state exactly that long, which is why outer stream joins REQUIRE
    * both watermarks and the time-range condition. Callers drive the
    * watermark past end-of-data (sentinel batch) to flush the tail. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String, bound: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(keyCol) === r(keyCol) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound"), "left_outer")
      .drop(r(keyCol))
  }

  /** Streaming dedup: first event per key wins within the watermark. */
  def dedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
            watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  // ---- custom state: running per-key counters via mapGroupsWithState ----

  case class KeyedEvent(user_id: Long, event_type: String, value: Double)
  case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  implicit private val keyedEnc: Encoder[KeyedEvent] = Encoders.product[KeyedEvent]
  implicit private val statsEnc: Encoder[UserStats] = Encoders.product[UserStats]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit private val stateEnc: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  /** Running per-user counters with explicit state — the
    * KeyValueGroupedDataset.mapGroupsWithState shape for custom streaming
    * state the built-in aggregates can't express. */
  def runningUserStats(events: Dataset[KeyedEvent]): Dataset[UserStats] =
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), UserStats](GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[KeyedEvent], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { e => n += 1; v += e.value }
          state.update((n, v))
          UserStats(user, n, v)
      }

  // ---- flatMapGroupsWithState: sessionization with event-time timeout ----

  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  implicit private val timedEnc: Encoder[TimedEvent] = Encoders.product[TimedEvent]
  implicit private val sessStateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val closedEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]

  /** Gap-based sessionization that EMITS each session exactly once, when it
    * closes — either by a later event past the gap, or by the event-time
    * timeout once the watermark passes session_end + gap. This is the
    * flatMapGroupsWithState shape for state the built-in `session_window`
    * aggregate can't express (emit-on-close with custom payload); state is
    * per-key and bounded by the watermark, the standard 1000-executor
    * layout. Out-of-order events within the watermark extend the open
    * session downward; an event detached below it by >= gap closes
    * immediately as its own session (only later batches could have merged
    * into it, and those would themselves be late). */
  def sessionizeOnClose(events: Dataset[TimedEvent], gapMs: Long,
                        watermark: String = "10 minutes"): Dataset[ClosedSession] =
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          def closed(s: SessionState) = ClosedSession(user,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end + gapMs), s.n)
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            Iterator(closed(s))
          } else {
            var out = List.empty[ClosedSession]
            var st = state.getOption
            rows.map(_.ts.getTime).toSeq.sorted.foreach { t =>
              st match {
                case Some(s) if t - s.end >= gapMs =>
                  out ::= closed(s); st = Some(SessionState(t, t, 1))
                case Some(s) if s.start - t >= gapMs =>
                  // late-but-within-watermark event detached BELOW the open
                  // session: it can only grow downward from even-later
                  // arrivals, which sort first within a batch — so by now it
                  // is a complete singleton session of its own
                  out ::= closed(SessionState(t, t, 1))
                case Some(s) =>
                  st = Some(SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case None => st = Some(SessionState(t, t, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            out.reverse.iterator
          }
      }

  /** Run a streaming frame to completion as a snapshot (the reference's
    * consume-to-end semantics) into an in-memory table; returns the result.
    *
    * Gate-startup amortization (the correctness/bench gates run three of
    * these inside a 128-query suite, so per-query bring-up cost is pure
    * harness overhead):
    *  - checkpoints go to tmpfs (/dev/shm) when available — the offset/
    *    commit logs are many small fsync-ed files, and the gate's
    *    checkpoint is throwaway by design;
    *  - `statePartitions` caps `spark.sql.shuffle.partitions` for THIS
    *    query only, via an isolated `newSession` clone of the SQL conf
    *    (same SparkContext, separate SQLConf): state-store count equals
    *    shuffle partitions, and a bounded driver-slice gate has no
    *    business opening/committing 32 stores per micro-batch. The clone
    *    matters — mutate-and-restore on the shared session would leak the
    *    4-partition setting into any query another thread plans during
    *    the stream's run (parallel test suites do exactly that). The
    *    stream's ANALYZED plan is rebound to the clone (functions/views
    *    already resolved, so the clone's empty registries are moot), and
    *    the snapshot is rebound back to the caller's session before
    *    return. Production streams keep the session default — partition
    *    count should match key cardinality and throughput, which for the
    *    gates is a few hundred rows. */
  def snapshotToTable(stream: DataFrame, name: String,
                      outputMode: String = "complete",
                      statePartitions: Int = 0,
                      extraConfs: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    val parent = stream.sparkSession
    val sess = if (statePartitions > 0 || extraConfs.nonEmpty) {
      val s2 = parent.newSession()
      if (statePartitions > 0)
        s2.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      extraConfs.foreach { case (k, v) => s2.conf.set(k, v) }
      s2
    } else parent
    val bound =
      if (sess eq parent) stream
      else GraftPlanBridge.ofRows(sess, stream.queryExecution.analyzed)
    val shm = new java.io.File("/dev/shm")
    val ckBase = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Path.of(System.getProperty("java.io.tmpdir"))
    val ck = java.nio.file.Files.createTempDirectory(ckBase, "graft_ck_")
    trackTempDir(ck)
    val q = bound.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val snap = sess.table(name)
    if (sess eq parent) snap
    else GraftPlanBridge.ofRows(parent, snap.queryExecution.analyzed)
  }

  /** Stage a batch frame as parquet files and re-open it as a STREAMING
    * file source — the executor-side ingest rig: the write is a
    * distributed parquet job and the returned stream reads those files
    * through Spark's file-source (the same `readStream` path a production
    * deployment points at its landing bucket), so no corpus-sized rows
    * ever pass through the driver. With `maxFilesPerTrigger` unset,
    * Trigger.AvailableNow drains every staged file in one micro-batch —
    * deterministic for keep-first dedup state regardless of file order. */
  def stageAndStream(df: DataFrame, numFiles: Int = 4,
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stage_")
    // staging copies are corpus-sized: File.deleteOnExit() would be a
    // no-op on a non-empty directory, so track for recursive cleanup —
    // eagerly at shutdownGates() (suite end) and via the JVM hook
    trackTempDir(dir, eager = true)
    df.coalesce(numFiles).write.mode("overwrite").parquet(dir.toString)
    val reader = df.sparkSession.readStream.schema(df.schema)
    maxFilesPerTrigger
      .foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(dir.toString)
  }

  /** Run a streaming frame to completion through `foreachBatch`
    * (Trigger.AvailableNow) — the transactional apply path: each
    * micro-batch is handed to the caller (typically a MERGE INTO against
    * an engine table, the CDC-apply-to-lake pattern) and recorded by the
    * streaming checkpoint exactly once. The batch frame arrives bound to
    * the micro-batch's session clone; callers that hand it to another
    * session's catalog should pin it first (localCheckpoint) and re-bind
    * the plan. */
  def applyBatches(stream: DataFrame)(f: (DataFrame, Long) => Unit): Unit = {
    val shm = new java.io.File("/dev/shm")
    val ckBase = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Path.of(System.getProperty("java.io.tmpdir"))
    val ck = java.nio.file.Files.createTempDirectory(ckBase, "graft_ck_")
    trackTempDir(ck)
    val q = stream.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     id: Long) => f(b.toDF(), id))
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Detach a [[snapshotToTable]] result (or a frame derived from it)
    * from its memory-sink temp view: pin the frame's partitions
    * EXECUTOR-side via an eager localCheckpoint, then drop the view so
    * repeated gate invocations don't accumulate dead views. Unlike the
    * former createDataFrame(collect()) detach, any computation layered on
    * the snapshot (window ranks, aggregates) stays in the distributed
    * plan — the production serve shape. */
  def detach(df: DataFrame, sink: String): DataFrame = {
    val pinned = df.localCheckpoint(true)
    df.sparkSession.catalog.dropTempView(sink)
    pinned
  }

  /** Run a streaming frame to completion into a PARQUET FILE SINK (append
    * mode — the only mode file sinks support) and return the read-back
    * frame. This is the exactly-once shard-delivery path a production
    * pipeline lands curated output with: the sink's `_spark_metadata`
    * transaction log records exactly the files committed by completed
    * micro-batches, and `spark.read.parquet` on the directory resolves
    * through that log — a half-written or orphaned file from a failed
    * batch is invisible to readers. Throwaway offset/commit logs go to
    * tmpfs (the [[snapshotToTable]] amortization); the DATA directory is a
    * real temp dir on disk — it IS the output.
    *
    * r14: same `statePartitions`/`extraConfs` session-clone isolation as
    * [[snapshotToTable]] — a stateful gate streaming into a FILE sink
    * (p02) was the one gate still opening/committing a state store AND a
    * sink file per session-default shuffle partition each micro-batch;
    * production streams keep the default (partition count should match
    * key cardinality and throughput). */
  def snapshotToFiles(stream: DataFrame,
                      statePartitions: Int = 0,
                      extraConfs: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    val parent = stream.sparkSession
    val sess = if (statePartitions > 0 || extraConfs.nonEmpty) {
      val s2 = parent.newSession()
      if (statePartitions > 0)
        s2.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      extraConfs.foreach { case (k, v) => s2.conf.set(k, v) }
      s2
    } else parent
    val bound =
      if (sess eq parent) stream
      else GraftPlanBridge.ofRows(sess, stream.queryExecution.analyzed)
    val shm = new java.io.File("/dev/shm")
    val ckBase = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Path.of(System.getProperty("java.io.tmpdir"))
    val ck = java.nio.file.Files.createTempDirectory(ckBase, "graft_ck_")
    trackTempDir(ck)
    val out = java.nio.file.Files.createTempDirectory("graft_filesink_")
    trackTempDir(out)
    val q = bound.writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ck.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // read back on the CALLER's session (the clone only scoped the conf)
    parent.read.parquet(out.toString)
  }

  /** [[snapshotToTable]] with EXPLICIT batch boundaries: Trigger.AvailableNow
    * drains every pre-added MemoryStream block in ONE micro-batch, so a gate
    * that needs the watermark to ADVANCE between waves (state eviction,
    * late-row drops) must feed data while the query runs. Each `stage`
    * callback adds one wave; `processAllAvailable()` after it commits that
    * wave as its own micro-batch (advancing the watermark) before the next
    * stage fires. Same session-clone conf isolation as [[snapshotToTable]]. */
  def snapshotToTableStaged(stream: DataFrame, name: String,
                            outputMode: String,
                            statePartitions: Int,
                            extraConfs: Map[String, String] = Map.empty)
                           (stages: Seq[() => Unit]): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    val parent = stream.sparkSession
    val sess = if (statePartitions > 0 || extraConfs.nonEmpty) {
      val s2 = parent.newSession()
      if (statePartitions > 0)
        s2.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      extraConfs.foreach { case (k, v) => s2.conf.set(k, v) }
      s2
    } else parent
    val bound =
      if (sess eq parent) stream
      else GraftPlanBridge.ofRows(sess, stream.queryExecution.analyzed)
    val shm = new java.io.File("/dev/shm")
    val ckBase = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Path.of(System.getProperty("java.io.tmpdir"))
    val ck = java.nio.file.Files.createTempDirectory(ckBase, "graft_ck_")
    trackTempDir(ck)
    val q = bound.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ck.toString)
      .start()
    try stages.foreach { st => st(); q.processAllAvailable() }
    finally q.stop()
    q.awaitTermination()
    val snap = sess.table(name)
    if (sess eq parent) snap
    else GraftPlanBridge.ofRows(parent, snap.queryExecution.analyzed)
  }

  /** Suite-end teardown for the streaming gates: unloads the state-store
    * provider cache and stops the maintenance pool ONCE, instead of per
    * gate. Each gate uses a fresh throwaway checkpoint, so its providers
    * are dead the moment the query terminates — but with the gates capped
    * at a few state partitions over a bounded slice, the dead-provider
    * residue per run is a handful of near-empty maps, safe to carry until
    * the suite ends. Verify/Bench call this after their query loop. */
  def shutdownGates(): Unit = {
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    // every tracked stream has terminated by suite end: reclaim the
    // corpus-sized staging copies now rather than at JVM exit
    drainEagerTempDirs()
  }

  /** Temp directories needing RECURSIVE deletion (deleteOnExit does not
    * recurse, so a non-empty staging/checkpoint dir would leak past
    * process exit). `eager=true` dirs (corpus-sized staging copies) are
    * additionally reclaimed by [[shutdownGates]] during the process
    * lifetime; the rest wait for the one JVM shutdown hook. */
  private val eagerTmp =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val exitTmp =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hookInstalled =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      finally walk.close()
    }
  }

  private[graft] def trackTempDir(p: java.nio.file.Path,
                                  eager: Boolean = false): Unit = {
    (if (eager) eagerTmp else exitTmp).add(p)
    if (hookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        drainEagerTempDirs()
        var q = exitTmp.poll()
        while (q != null) { deleteRecursively(q); q = exitTmp.poll() }
      }, "graft-tmpdir-cleanup"))
  }

  private def drainEagerTempDirs(): Unit = {
    var p = eagerTmp.poll()
    while (p != null) { deleteRecursively(p); p = eagerTmp.poll() }
  }
}
