package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 second wave invariants: d35 cross-shard near-dup residual,
  * s42 index-staleness audit, q123 sequences. */
class NewOpsR10bSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("d35 matrix equals an independent recompute from the gated d03 " +
      "pair list plus a plain-Scala serpentine shard assignment") {
    val got = SparkEntry.queries("d35_cross_shard_residual")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent shard map: exact-dedup canon + token-desc serpentine,
    // recomputed with collections (no DistributedRank, no engine window)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map { r =>
        val norm = r.getString(1).toLowerCase.replaceAll(" +", " ")
        (r.getLong(0), norm, norm.split(" ").count(_.nonEmpty).toLong)
      }
    val canon = docs.groupBy(_._2).map { case (_, g) =>
      (g.map(_._1).min, g.map(_._3).min) }.toSeq
    val ranked = canon.sortBy { case (id, n) => (-n, id) }.zipWithIndex
    val shardOf = ranked.map { case ((id, _), r0) =>
      val pass = r0 / 8
      val pos = r0 % 8
      id -> (if (pass % 2 == 0) pos.toLong else 7L - pos)
    }.toMap
    val pairs = SparkEntry.queries("d03_dedup_minhash_lsh")(spark, sf)
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs
      .filter { case (a, b) => shardOf.contains(a) && shardOf.contains(b) }
      .map { case (a, b) =>
        (math.min(shardOf(a), shardOf(b)), math.max(shardOf(a), shardOf(b))) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    got shouldBe expected
    got.values.sum should be > 0L
  }

  test("s42: a stale serve can never return a new arrival, hits respect " +
      "the structural ceiling, and the permille is exact") {
    val rows = SparkEntry.queries("s42_staleness_audit")(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (hits, nNew, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      withClue(s"qid ${r.getLong(0)}") {
        // new arrivals are structurally unreachable by the T0 index
        hits should be <= (3L - nNew)
        nNew should be <= 3L
        pm shouldBe hits * 1000 / 3
      }
    }
    // staleness is real on this corpus: some query loses a true neighbor
    rows.map(_.getLong(2)).sum should be > 0L
  }

  test("q124 CHECK constraints: NULL passes, FALSE rejects atomically on " +
      "INSERT and UPDATE, column- and table-level forms both enforce") {
    val engine = new Engine(spark)
    try {
      engine.sql("CREATE OR REPLACE TABLE ck (a BIGINT CHECK (a > 0), " +
        "b DOUBLE, CHECK (b IS NULL OR b < 100))")
      engine.sql("INSERT INTO ck VALUES (1, 5.0)")
      engine.sql("INSERT INTO ck VALUES (2, NULL)") // NULL b passes
      // a violating row anywhere in the batch rejects the WHOLE batch
      val ex = intercept[Exception](
        engine.sql("INSERT INTO ck VALUES (3, 1.0), (-1, 2.0)"))
      ex.getMessage should include("CHECK")
      engine.sql("SELECT COUNT(*) AS n FROM ck").head()
        .getLong(0) shouldBe 2L // the valid row (3, ...) did NOT land
      // NULL in the checked column passes (SQL: NULL predicate = pass)
      engine.sql("INSERT INTO ck VALUES (NULL, 1.0)")
      // table-level CHECK enforces on UPDATE; rejected update leaves state
      an[Exception] should be thrownBy
        engine.sql("UPDATE ck SET b = 200.0 WHERE a = 1")
      engine.sql("SELECT CAST(b AS DOUBLE) AS b FROM ck WHERE a = 1")
        .head().getDouble(0) shouldBe 5.0
      engine.sql("DROP TABLE ck")
    } finally engine.close()
  }

  test("q123 sequences: dense INCREMENT-2 ids follow the draw order, " +
      "currval stamps the last value, lifecycle statements enforce") {
    val out = SparkEntry.queries("q123_sequences")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    out.length should be > 0
    val ids = out.map(_._1)
    // dense arithmetic progression from START 1000 with INCREMENT 2
    ids.toSeq shouldBe (0 until ids.length).map(i => 1000L + 2L * i)
    out.map(_._4).distinct.toSeq shouldBe Seq(ids.max) // currval = last drawn
    // assignment follows the statements' ORDER BY o_orderkey per draw,
    // and draw 2's keys all exceed draw 1's — so id order IS key order
    out.map(_._2).toSeq shouldBe out.map(_._2).sorted.toSeq

    val engine = new Engine(spark)
    try {
      // currval before any draw fails loudly
      engine.sql("CREATE SEQUENCE fresh_seq")
      an[Exception] should be thrownBy
        engine.sql("SELECT currval('fresh_seq') AS c").collect()
      // scalar nextval draws exactly one value per statement
      engine.sql("SELECT nextval('fresh_seq') AS v").head().getLong(0) shouldBe 1L
      engine.sql("SELECT nextval('fresh_seq') AS v").head().getLong(0) shouldBe 2L
      engine.sql("SELECT currval('fresh_seq') AS c").head().getLong(0) shouldBe 2L
      // duplicate CREATE fails; OR REPLACE resets; IF NOT EXISTS tolerates
      an[Exception] should be thrownBy engine.sql("CREATE SEQUENCE fresh_seq")
      engine.sql("CREATE SEQUENCE IF NOT EXISTS fresh_seq")
      engine.sql("SELECT nextval('fresh_seq') AS v").head().getLong(0) shouldBe 3L
      engine.sql("CREATE OR REPLACE SEQUENCE fresh_seq START 50")
      engine.sql("SELECT nextval('fresh_seq') AS v").head().getLong(0) shouldBe 50L
      // a literal containing nextval(...) is NOT a draw (maskOpaque)
      engine.sql("SELECT 'nextval(''fresh_seq'')' AS s").head()
        .getString(0) shouldBe "nextval('fresh_seq')"
      engine.sql("SELECT currval('fresh_seq') AS c").head().getLong(0) shouldBe 50L
      // DROP removes; IF EXISTS tolerates a second drop
      engine.sql("DROP SEQUENCE fresh_seq")
      an[Exception] should be thrownBy
        engine.sql("SELECT nextval('fresh_seq') AS v").collect()
      engine.sql("DROP SEQUENCE IF EXISTS fresh_seq")
    } finally engine.close()
  }
}
