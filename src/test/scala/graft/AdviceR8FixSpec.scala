package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 regression specs for the round-8 ADVICE findings: the
  * quote-aware USING SAMPLE selfContained guard, recursive staging-dir
  * cleanup in StreamingOps, and the p02 keep-lowest gate's fail-loud
  * single-batch guard (the JdbcServe port-conflict fix is exercised in
  * server/JdbcServeSpec, which owns the one-per-JVM thrift server). */
class AdviceR8FixSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("seeded USING SAMPLE after a parenthesized subquery whose string " +
      "literal contains '(' or ')' is accepted (quote-aware paren scan)") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq.tabulate(100)(i => (i + 1, if (i % 2 == 0) ")" else "(x")).toDF("id", "tag")
      .createOrReplaceTempView("samp_paren_t")
    // the literal ')' inside the subquery's WHERE skewed the old
    // non-quote-aware depth count and wrongly rejected the statement
    val rows = engine.sql(
      "SELECT id FROM (SELECT id FROM samp_paren_t WHERE tag = ')') " +
        "USING SAMPLE 5 ROWS REPEATABLE (11)").collect()
    rows.length shouldBe 5
    all(rows.map(_.getInt(0) % 2)) shouldBe 1 // only tag=')' rows (odd ids)
    // aliased form with a '(' literal
    val rows2 = engine.sql(
      "SELECT s.id FROM (SELECT id FROM samp_paren_t WHERE tag = '(x') AS s " +
        "USING SAMPLE 5 ROWS REPEATABLE (11)").collect()
    rows2.length shouldBe 5
    // a non-FROM-item prefix is still rejected (the guard did not go soft)
    an[Exception] should be thrownBy engine.sql(
      "SELECT * FROM samp_paren_t a JOIN samp_paren_t b ON a.id = b.id " +
        "USING SAMPLE 5 ROWS REPEATABLE (11)")
    engine.close()
  }

  test("stageAndStream staging dirs are reclaimed recursively by " +
      "shutdownGates (deleteOnExit cannot delete non-empty dirs)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Path.of(System.getProperty("java.io.tmpdir"))
    def stagingDirs(): Set[String] = {
      val s = java.nio.file.Files.list(tmp)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("graft_stage_")).toSet
      finally s.close()
    }
    val before = stagingDirs()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val stream = graft.streaming.StreamingOps.stageAndStream(df, numFiles = 1)
    val snap = graft.streaming.StreamingOps.snapshotToTable(
      stream.groupBy("k").count(), "advice_stage_snap")
    snap.count() shouldBe 2
    val created = stagingDirs() -- before
    created should not be empty // the staging copy exists while streaming
    graft.streaming.StreamingOps.shutdownGates()
    (stagingDirs() intersect created) shouldBe empty // reclaimed, recursively
    spark.catalog.dropTempView("advice_stage_snap")
  }

  test("p02 keepLowestGate fails loud when a lower doc_id arrives after " +
      "the winner was emitted, and stays quiet on duplicates-after") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.queries.Pipeline.PDoc
    def st(init: Option[PDoc]) = TestGroupState.create[PDoc](
      init.map(Optional.of[PDoc]).getOrElse(Optional.empty[PDoc]()),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val d = (id: Long) => PDoc("h", id, "s", "t")
    // first sight: emits the batch min and records it
    val s1 = st(None)
    graft.queries.Pipeline.keepLowestGate("h",
      Iterator(d(7), d(3), d(9)), s1).toSeq.map(_.doc_id) shouldBe Seq(3L)
    s1.get.doc_id shouldBe 3L
    // later batch with only HIGHER ids: legitimate duplicates, dropped
    graft.queries.Pipeline.keepLowestGate("h",
      Iterator(d(8)), st(Some(d(3)))).toSeq shouldBe empty
    // later batch with a LOWER id: the single-batch assumption broke —
    // the gate must fail loud, not silently keep the wrong winner
    val ex = intercept[IllegalStateException] {
      graft.queries.Pipeline.keepLowestGate("h",
        Iterator(d(2)), st(Some(d(3))))
    }
    ex.getMessage should include("single-batch")
  }
}
