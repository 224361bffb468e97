package graft.server

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Engine, TestSpark}
import graft.serde.Serde
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord

/** e2e: an EXTERNAL JDBC client attaches to the engine's thrift endpoint
  * and queries engine-registered topic views over the wire — the
  * reference's sqlline-over-JDBC parity path. */
class JdbcServeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("hive-jdbc client attaches, sees engine topic views, and runs a " +
      "gated query's SQL over the wire") {
    val engine = new Engine(spark)
    graft.functions.GraftFunctions.register(spark)
    val topic = "jdbc-topic"
    val records = (0 until 10).map(i => SyntheticRecord(null,
      java.nio.ByteBuffer.allocate(4).putInt(i * 11).array(),
      topic, i % 2, i.toLong, 1700000000000L + i))
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde)),
      _ => KafkaRecords.synthetic(spark, records))
    val confBefore =
      spark.conf.getOption("spark.sql.datetime.java8API.enabled")
    val port = JdbcServe.start(spark)
    val conn = JdbcServe.connect(port)
    try {
      // engine temp view visible through the external connection
      val st = conn.createStatement()
      val rs = st.executeQuery(
        "SELECT count(*) AS n, sum(rowval) AS s FROM jdbc_topic")
      rs.next() shouldBe true
      rs.getLong("n") shouldBe 10L
      rs.getLong("s") shouldBe (0 until 10).map(_ * 11).sum.toLong
      // a relational shape over a parquet table path (what the gated
      // queries run): aggregate documents from the test data
      val rs2 = st.executeQuery(
        "SELECT source, count(*) AS n FROM parquet.`/root/testdata/" +
          "sf0.001/documents.parquet` GROUP BY source ORDER BY source")
      val seen = Iterator.continually(rs2)
        .takeWhile(_.next()).map(r => (r.getString(1), r.getLong(2))).toList
      seen.length should be > 0
      all(seen.map(_._2)) should be > 0L
      // engine-registered native function served over the wire
      val rs3 = st.executeQuery(
        "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      rs3.next() shouldBe true
      rs3.getDouble("c") shouldBe 1.0 +- 1e-9
      // DatabaseMetaData surface (what sqlline/BI tools introspect)
      val md = conn.getMetaData
      md.getDatabaseProductName.toLowerCase should include("spark")
      // the thrift session layer enables java8API datetimes on the SHARED
      // session (singleSession mode); the ingest decode must tolerate it:
      // re-sync a topic WHILE a JDBC session has been open
      val engine2 = new Engine(spark)
      engine2.init(Seq(Engine.TopicSpec("jdbc-live-topic",
        valueSerde = Serde.IntSerde, rowAttrs = Set("par", "ts"))),
        _ => KafkaRecords.synthetic(spark, Seq(SyntheticRecord(null,
          java.nio.ByteBuffer.allocate(4).putInt(7).array(),
          "jdbc-live-topic", 0, 0L, 1700000000123L))))
      spark.sql("SELECT rowinfo.ts FROM `jdbc-live-topic`").collect()(0)
        .getLong(0) shouldBe 1700000000123L
      engine2.close()
    } finally {
      conn.close()
      JdbcServe.stop()
    }
    // stop() must restore the session confs the thrift session layer
    // mutated (openSession enables java8API datetimes on the SHARED
    // session in singleSession mode) — no leak into later engine work
    spark.conf.getOption("spark.sql.datetime.java8API.enabled") shouldBe
      confBefore
  }
}
