package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** STATEFUL checkpoint recovery (VERDICT r10 task 4): kill a running
  * transformWithState query — q95's RunningStatsProcessor on the RocksDB
  * state store — after N committed micro-batches with NONZERO state,
  * restart from the same checkpoint, and prove:
  *   1. state-store recovery: per-user cumulative counts CONTINUE across
  *      the restart (strictly increasing per touched batch — a reset
  *      state would restart low and break monotonicity);
  *   2. no re-emission: batches committed before the kill keep their
  *      exact emitted rows after the restart (the offset log prevents
  *      re-reading their source files);
  *   3. the final per-user row hash-matches the batch oracle over the
  *      full source — neither under-counted (lost state) nor
  *      over-counted (replayed committed input against recovered state).
  * Extends CheckpointRecoverySpec (stateless file sink) to the stateful
  * runtime the 100 TB deployment runs: RocksDB per-partition state,
  * exactly-once via offset log + idempotent per-batch sink. */
class StatefulCheckpointRecoverySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("RocksDB transformWithState state survives a mid-stream kill: " +
      "counts continue monotonically, committed batches never re-emit, " +
      "final rows hash-match the batch oracle") {
    import graft.queries.Streaming.{RunningStatsProcessor, UEvent, UState}
    val nUsers = 5
    val nRows = 200L
    val nFiles = 20

    // dedicated session: RocksDB provider + small state partitioning are
    // per-query confs the shared test session must not inherit
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "4")
    sess.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import sess.implicits._

    val src = (1L to nRows).map(i =>
      (i % nUsers, (i % 97).toDouble / 4.0, i))
      .toDF("user_id", "value", "event_id")
    val stage = java.nio.file.Files.createTempDirectory("graft_sckr_src_")
    val ck = java.nio.file.Files.createTempDirectory("graft_sckr_ck_")
    val out = java.nio.file.Files.createTempDirectory("graft_sckr_out_")
    Seq(stage, ck, out).foreach(StreamingOps.trackTempDir(_))
    src.repartition(nFiles).write.mode("overwrite").parquet(stage.toString)
    val outS = out.toString

    // ~10 rows/file x 15 ms keeps each micro-batch slow enough that the
    // kill lands mid-stream deterministically
    val slow = udf((x: Double) => { Thread.sleep(15); x })
    def start() = {
      val stream = sess.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
        .withColumn("value", slow(col("value")))
        .as[UEvent]
      val updated = stream.groupByKey(_.user_id)
        .transformWithState(new RunningStatsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update(),
          implicitly[org.apache.spark.sql.Encoder[UState]])
      updated.toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // idempotent per-batch sink: a replayed in-flight batch
          // overwrites its own directory with identical content
          df.write.mode("overwrite").parquet(s"$outS/batch=$id")
          ()
        }
        .option("checkpointLocation", ck.toString)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // run 1: at least two COMMITTED stateful batches, then kill
    val q1 = start()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 && q1.isActive &&
        System.nanoTime() < deadline) Thread.sleep(20)
    q1.stop()
    q1.awaitTermination()

    // batches the offset log actually committed in run 1
    val committedRun1 = Option(new java.io.File(s"$ck/commits").listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.forall(_.isDigit))
      .map(_.toLong).toSet
    committedRun1.size should be >= 2
    committedRun1.size.toLong should be < nFiles.toLong // mid-stream for real

    def batchRows(id: Long): Set[(Long, Long, Long, Long)] =
      sess.read.parquet(s"$outS/batch=$id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val run1Emissions = committedRun1.map(id => id -> batchRows(id)).toMap

    // the kill left NONZERO, PARTIAL state: some user's running count is
    // strictly between 0 and its full-source total
    val lastCounts = run1Emissions(committedRun1.max)
      .map(t => t._1 -> t._2).toMap
    val oracle = src.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100.0) as bigint)")).as("total_cents"),
        max(col("event_id")).as("max_event"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    lastCounts.values.foreach(_ should be > 0L)
    lastCounts.exists { case (u, n) => n < oracle(u)._1 } shouldBe true

    // run 2: same checkpoint — recovers RocksDB state + offsets, drains
    val q2 = start()
    q2.awaitTermination()

    // (2) no re-emission: run-1 committed batches are byte-identical
    committedRun1.foreach { id =>
      batchRows(id) shouldBe run1Emissions(id)
    }

    // (1) state continuity: per user, n_events strictly increases across
    // the batches that touched it — including across the restart seam
    val all = sess.read.option("basePath", outS).parquet(outS)
      .select(col("batch").cast("long"), col("user_id"), col("n_events"),
        col("total_cents"), col("max_event"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    all.groupBy(_._2).values.foreach { g =>
      val byBatch = g.sortBy(_._1).map(_._3)
      byBatch.zip(byBatch.tail).foreach { case (a, b) => b should be > a }
    }

    // (3) final row per user equals the batch oracle exactly
    val fin = all.groupBy(_._2).map { case (u, g) =>
      val last = g.maxBy(_._1)
      u -> (last._3, last._4, last._5)
    }
    fin shouldBe oracle
    ()
  }
}
