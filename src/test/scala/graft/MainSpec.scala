package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.serde.Serde
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord

/** CLI surface (reference: KwackMain.java:49-138): flag parsing, the
  * properties-file config path (-F), -X passthrough split, and the -d
  * persisted-db round trip (decode once, restore on the next run). */
class MainSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def intRecords(topic: String, vals: Seq[Int]) =
    vals.zipWithIndex.map { case (v, i) =>
      SyntheticRecord(null, java.nio.ByteBuffer.allocate(4).putInt(v).array(),
        topic, 0, i.toLong, 1000L + i)
    }

  test("flag parsing covers the reference option surface") {
    val c = Main.parse(Array(
      "-t", "a=f.parquet", "-t", "b", "-v", "a=int", "-k", "b=string",
      "-a", "rowkey,par", "-q", "SELECT 1", "-x", "5", "-b", "broker:9092",
      "-p", "b=0,2", "-o", "b=-10", "-m", "3000", "-r", "mock://x",
      "-d", "/tmp/db", "-X", "kafka.fetch.max.bytes=1048576",
      "-X", "spark.sql.shuffle.partitions=8", "-j", "10123"))
    c.topics shouldBe Vector("a" -> Some("f.parquet"), "b" -> None)
    c.valueSerdes("a") shouldBe Serde.IntSerde
    c.rowAttrs shouldBe Set("rowkey", "par")
    c.skipBytes shouldBe 5
    c.partitions("b") shouldBe Seq(0, 2)
    c.offsets("b") shouldBe "-10"
    c.metadataTimeoutMs shouldBe Some(3000L)
    c.registryUrl shouldBe Some("mock://x")
    c.dbDir shouldBe Some("/tmp/db")
    c.passthrough should have size 2
    c.jdbcPort shouldBe Some(10123)
  }

  test("-F properties file maps the reference config keys; later flags win") {
    val f = Files.createTempFile("graft", ".properties")
    Files.writeString(f,
      """topics=t1,t2
        |value.serdes=t1=int,t2=string
        |row.attributes=par,off
        |skip.bytes=3
        |query=SELECT * FROM t1
        |db=/tmp/dbdir
        |""".stripMargin)
    val c = Main.parse(Array("-F", f.toString, "-q", "SELECT 2"))
    c.topics.map(_._1) shouldBe Vector("t1", "t2")
    c.valueSerdes("t1") shouldBe Serde.IntSerde
    c.rowAttrs shouldBe Set("par", "off")
    c.skipBytes shouldBe 3
    c.dbDir shouldBe Some("/tmp/dbdir")
    c.query shouldBe Some("SELECT 2") // flag after -F overrides
  }

  test("same topic via -t and -F is decoded once; file source refines it") {
    val f = Files.createTempFile("graft", ".properties")
    Files.writeString(f, "topics=t1,t2\n")
    val c = Main.parse(Array("-t", "t1", "-F", f.toString, "-t", "t2=r.parquet"))
    c.topics shouldBe Vector("t1" -> None, "t2" -> Some("r.parquet"))
  }

  test("-d persists decoded tables and restores them on the next run") {
    val topic = "cli-db-topic"
    val recDir = Files.createTempDirectory("graftrec").toString
    val dbDir = Files.createTempDirectory("graftdb").toString
    // stage raw records as a parquet file source
    KafkaRecords.synthetic(spark, intRecords(topic, Seq(7, 8, 9)))
      .write.mode("overwrite").parquet(s"$recDir/records.parquet")

    // run 1: decode from the file source, persist into -d
    Main.runWith(spark, Main.parse(Array(
      "-t", s"$topic=$recDir/records.parquet", "-v", s"$topic=int",
      "-a", "", "-d", dbDir)))
    spark.table(Engine.sanitize(topic)).collect().map(_.getInt(0)).sorted shouldBe
      Array(7, 8, 9)
    new java.io.File(s"$dbDir/${Engine.sanitize(topic)}.parquet").exists() shouldBe true

    // run 2: no source at all — restored from -d
    spark.catalog.dropTempView(Engine.sanitize(topic))
    Main.runWith(spark, Main.parse(Array("-t", topic, "-a", "", "-d", dbDir)))
    spark.table(Engine.sanitize(topic)).collect().map(_.getInt(0)).sorted shouldBe
      Array(7, 8, 9)
  }

  test("-a epo: reference configs naming the leader-epoch attribute run, " +
      "column lands as always-NULL INT (documented delta)") {
    val topic = "cli-epo-topic"
    val recDir = Files.createTempDirectory("graftepo").toString
    KafkaRecords.synthetic(spark, intRecords(topic, Seq(1, 2)))
      .write.mode("overwrite").parquet(s"$recDir/records.parquet")
    Main.runWith(spark, Main.parse(Array(
      "-t", s"$topic=$recDir/records.parquet", "-v", s"$topic=int",
      "-a", "par,epo")))
    val rows = spark.sql(
      s"SELECT rowinfo.par, rowinfo.epo FROM ${Engine.sanitize(topic)}")
      .collect()
    rows.length shouldBe 2
    rows.foreach(r => r.isNullAt(1) shouldBe true)
    spark.catalog.dropTempView(Engine.sanitize(topic))
  }

  test("unsupported registry URL scheme is rejected with guidance") {
    val e = intercept[IllegalArgumentException] {
      Main.runWith(spark, Main.parse(Array("-r", "ftp://sr:8081")))
    }
    e.getMessage should include("mock://")
  }

  test("REPL (A16) runs sqlline-style commands over scripted stdin") {
    // the reference's interactive surface (sqlline over JDBC,
    // KwackApplication.java:16-35) — driven end-to-end through the real
    // JLine reader on a dumb terminal: list tables, describe, a query with
    // row-cap truncation, an unknown command, quit
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
    val engine = new Engine(spark)
    spark.range(3).toDF("n").createOrReplaceTempView("repl_demo")
    val script = Seq(
      "!help",
      "!tables",
      "!describe repl_demo",
      "!rows 2",
      "SELECT n FROM repl_demo ORDER BY n;",
      "!nosuch",
      "quit").mkString("\n") + "\n"
    val outBuf = new ByteArrayOutputStream()
    val errBuf = new ByteArrayOutputStream()
    val termOut = new ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new PrintStream(errBuf, true, "UTF-8"))
    try Console.withOut(new PrintStream(outBuf, true, "UTF-8")) {
      Main.repl(engine,
        Some((new ByteArrayInputStream(script.getBytes("UTF-8")), termOut)))
    } finally System.setErr(oldErr)
    val out = outBuf.toString("UTF-8")
    out should include("!describe <table>") // !help text
    out should include("repl_demo") // !tables listing
    out should include("n: long") // !describe schema
    out should include("display cap: 2") // !rows ack
    out should include("first 2 rows selected") // truncated query footer
    errBuf.toString("UTF-8") should include("unknown command")
  }
}
