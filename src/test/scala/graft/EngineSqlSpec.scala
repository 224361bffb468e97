package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.serde.Serde
import graft.sources.KafkaRecords
import graft.sources.KafkaRecords.SyntheticRecord

/** Engine SQL-surface parity: single-quoted table refs, COPY ... TO,
  * union accessor functions, and snapshot sync(). */
class EngineSqlSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def intRecord(topic: String, off: Long, v: Int) =
    SyntheticRecord(null, java.nio.ByteBuffer.allocate(4).putInt(v).array(),
      topic, 0, off, 1700000000000L + off)

  test("FROM 'topic' single-quoted refs rewrite to view refs (AbstractSchemaTest.java:60)") {
    val engine = new Engine(spark)
    graft.functions.GraftFunctions.register(spark)
    val topic = "test-quoted"
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde)),
      _ => KafkaRecords.synthetic(spark, Seq(intRecord(topic, 0, 7), intRecord(topic, 1, 8))))
    val rows = engine.sql(s"SELECT rowval FROM 'test-quoted' ORDER BY rowval").collect()
    rows.map(_.getInt(0)).toSeq shouldBe Seq(7, 8)
    engine.close()
  }

  test("DESCRIBE and SHOW TABLES pass through to the catalog (DuckDB REPL surface)") {
    val engine = new Engine(spark)
    val topic = "desc-topic"
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde)),
      _ => KafkaRecords.synthetic(spark, Seq(intRecord(topic, 0, 1))))
    // temp views register under sanitized names; DESCRIBE surfaces columns
    val cols = engine.sql("DESCRIBE desc_topic").collect()
      .map(_.getString(0)).toSet
    cols should contain("rowval")
    val tables = engine.sql("SHOW TABLES").collect()
      .map(_.getAs[String]("tableName")).toSet
    tables should contain("desc_topic")
    engine.close()
  }

  test("COPY <table> TO '<path>' (FORMAT 'parquet') writes and reports rows") {
    val engine = new Engine(spark)
    val topic = "copysrc"
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde, rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark, Seq(intRecord(topic, 0, 1), intRecord(topic, 1, 2))))
    val dir = java.nio.file.Files.createTempDirectory("graft-copy2").toString + "/t"
    val status = engine.sql(s"COPY copysrc TO '$dir' (FORMAT 'parquet')").collect()
    status(0).getLong(0) shouldBe 2L
    spark.read.parquet(dir).count() shouldBe 2L
    // subquery form
    val dir2 = java.nio.file.Files.createTempDirectory("graft-copy3").toString + "/t"
    engine.sql(s"COPY (SELECT rowval * 2 AS v FROM copysrc) TO '$dir2' (FORMAT 'parquet')")
    spark.read.parquet(dir2).orderBy("v").collect().map(_.getInt(0)).toSeq shouldBe Seq(2, 4)
    engine.close()
  }

  test("FROM '<path>.parquet/csv/json' scans files directly (read_* surface)") {
    val engine = new Engine(spark)
    // parquet
    val rows = engine.sql(
      "SELECT COUNT(*) AS n FROM '/root/testdata/sf0.001/region.parquet'").collect()
    rows(0).getLong(0) shouldBe 5L
    // csv + json written by us, read back through the same sugar
    val dir = java.nio.file.Files.createTempDirectory("graft-fileref").toString
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    engine.sql(s"COPY (SELECT r_regionkey, r_name FROM region) TO '$dir/r.csv' (FORMAT csv)")
    engine.sql(s"COPY (SELECT r_regionkey, r_name FROM region) TO '$dir/r.json' (FORMAT json)")
    engine.sql(s"SELECT COUNT(*) AS n FROM '$dir/r.csv'").collect()(0).getLong(0) shouldBe 5L
    engine.sql(s"SELECT COUNT(*) AS n FROM '$dir/r.json'").collect()(0).getLong(0) shouldBe 5L
    // a join between a file scan and a topic-style view
    val j = engine.sql(
      s"SELECT COUNT(*) AS n FROM '$dir/r.json' f JOIN region r ON f.r_regionkey = r.r_regionkey")
      .collect()
    j(0).getLong(0) shouldBe 5L
    engine.close()
  }

  test("COPY ... (FORMAT parquet, PARTITION_BY (...)) writes hive layout") {
    val engine = new Engine(spark)
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-copy-part").toString + "/r"
    val status = engine.sql(
      s"COPY (SELECT r_regionkey, r_name FROM region) TO '$dir' " +
        "(FORMAT parquet, PARTITION_BY (r_regionkey))").collect()
    status(0).getLong(0) shouldBe 5L
    // hive-partitioned directories, partition column recovered on read
    new java.io.File(dir).listFiles().count(_.getName.startsWith("r_regionkey=")) shouldBe 5
    val back = spark.read.parquet(dir)
    back.count() shouldBe 5L
    back.columns.toSet shouldBe Set("r_name", "r_regionkey")

    // multi-column partitioning nests directories in order
    val dir2 = java.nio.file.Files.createTempDirectory("graft-copy-part2").toString + "/n"
    engine.sql(
      s"COPY (SELECT n_regionkey, n_nationkey, n_name FROM nation) TO '$dir2' " +
        "(FORMAT parquet, PARTITION_BY (n_regionkey, n_nationkey))").collect()
    val lvl1 = new java.io.File(dir2).listFiles()
      .filter(_.getName.startsWith("n_regionkey="))
    lvl1.length shouldBe 5
    lvl1.head.listFiles().count(_.getName.startsWith("n_nationkey=")) should be >= 1

    // unknown options fail loudly instead of silently writing wrong output
    val bad = intercept[IllegalArgumentException] {
      engine.sql(s"COPY region TO '$dir2' (FORMAT csv, DELIMITER '|')")
    }
    bad.getMessage should include("unsupported COPY option")
    engine.close()
  }

  test("union_tag / union_extract over the tagged-struct union convention") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("u1", Some("s"), None: Option[Int]), ("u2", None, Some(5)))
      .toDF("tag", "u1", "u2")
      .selectExpr("named_struct('tag', tag, 'u1', u1, 'u2', u2) AS u")
    df.createOrReplaceTempView("unions")
    val rows = spark.sql(
      "SELECT union_tag(u) AS t, union_extract(u, 'u2') AS v FROM unions ORDER BY t").collect()
    rows(0).getString(0) shouldBe "u1"
    rows(1).getString(0) shouldBe "u2"
    rows(1).getInt(1) shouldBe 5
  }

  test("GraftExtensions injects every native function into a fresh session") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val session = TestSpark.spark.newSession()
    // builders list drives both paths; spot-check through SQL
    graft.functions.GraftFunctions.register(session)
    val v = session.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0)
    v shouldBe 1.0
    graft.functions.GraftFunctions.builders.map(_._1) should contain allOf
      ("graft_cosine", "graft_dot", "graft_shingles", "graft_md5i_array",
        "graft_minhash", "graft_token_stats", "union_tag", "union_extract")
  }

  test("CREATE MACRO: definition, expansion, nesting, replace, drop, recursion guard") {
    val engine = new Engine(spark)
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    engine.sql("CREATE MACRO with_tax(p, t) AS p * (1 + t)")
      .collect()(0).getString(0) shouldBe "with_tax"
    // expansion with argument precedence preserved: 2+1 parenthesized
    engine.sql("SELECT with_tax(100.0, 2 + 1) AS v").collect()(0)
      .getDecimal(0).doubleValue() shouldBe 400.0
    // macro over a real table column
    val n = engine.sql(
      "SELECT COUNT(*) AS n FROM lineitem WHERE with_tax(l_extendedprice, l_tax) > l_extendedprice")
      .collect()(0).getLong(0)
    n should be > 0L
    // nested macros expand through
    engine.sql("CREATE MACRO twice_taxed(p, t) AS with_tax(with_tax(p, t), t)")
    engine.sql("SELECT twice_taxed(100.0, 1.0) AS v").collect()(0)
      .getDecimal(0).doubleValue() shouldBe 400.0
    // duplicate rejected; OR REPLACE allowed
    an[IllegalArgumentException] should be thrownBy
      engine.sql("CREATE MACRO with_tax(p) AS p")
    engine.sql("CREATE OR REPLACE MACRO with_tax(p, t) AS p * (1 + t) + 1")
    engine.sql("SELECT with_tax(100.0, 0.0) AS v").collect()(0)
      .getDecimal(0).doubleValue() shouldBe 101.0
    // zero-arg macro
    engine.sql("CREATE MACRO the_answer() AS 42")
    engine.sql("SELECT the_answer() AS v").collect()(0).getInt(0) shouldBe 42
    // arity mismatch fails loudly
    an[IllegalArgumentException] should be thrownBy
      engine.sql("SELECT with_tax(1.0) AS v")
    // recursion fails loudly instead of hanging
    engine.sql("CREATE MACRO loopy(x) AS loopy(x) + 1")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("SELECT loopy(1) AS v")
    // drop removes expansion (the raw name then fails in Catalyst)
    engine.sql("DROP MACRO the_answer").collect()(0).getString(0) shouldBe "the_answer"
    an[Exception] should be thrownBy engine.sql("SELECT the_answer() AS v").collect()
    engine.close()
  }

  test("macro expansion: argument capture and quoted literals") {
    val engine = new Engine(spark)
    // an argument whose TEXT is another parameter's name must not be
    // re-substituted (two-phase placeholder substitution)
    engine.sql("CREATE MACRO wt(p, t) AS p * (1 + t)")
    engine.sql("SELECT wt(t, 0.5) AS v FROM (SELECT 10.0 AS t)").collect()(0)
      .getDecimal(0).doubleValue() shouldBe 15.0
    // commas and parens inside string literals are not argument separators
    engine.sql("CREATE MACRO up(x) AS upper(x)")
    engine.sql("SELECT up('a,b') AS v").collect()(0).getString(0) shouldBe "A,B"
    engine.sql("SELECT up('(') AS v, 'up(' AS s").collect()(0).getString(0) shouldBe "("
    // a parameter name inside a body string literal stays literal
    engine.sql("CREATE MACRO lbl(t) AS concat('t=', t)")
    engine.sql("SELECT lbl(7) AS v").collect()(0).getString(0) shouldBe "t=7"
    // macro-name text inside a literal is not a call site
    engine.sql("SELECT 'up(z)' AS v").collect()(0).getString(0) shouldBe "up(z)"
    engine.close()
  }

  test("SUMMARIZE profiles every column in one pass (table and file refs)") {
    val engine = new Engine(spark)
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    val rows = engine.sql("SUMMARIZE region").collect()
    val cols = spark.table("region").columns
    rows.length shouldBe cols.length
    rows.map(_.getString(0)).toSeq shouldBe cols.toSeq
    val byName = rows.map(r => r.getString(0) -> r).toMap
    byName("r_regionkey").getString(1) shouldBe "0"  // min
    byName("r_regionkey").getString(2) shouldBe "4"  // max
    byName("r_regionkey").getLong(3) shouldBe 5L     // non-null
    byName("r_regionkey").getLong(4) shouldBe 5L     // distinct
    byName("r_regionkey").getLong(5) shouldBe 0L     // nulls
    // file-ref form goes through the same sugar
    engine.sql("SUMMARIZE '/root/testdata/sf0.001/nation.parquet'")
      .collect().length should be > 0
    // column names with dots must not parse as nested-field paths
    spark.sql("SELECT 1 AS `user.id`, 'x' AS plain")
      .createOrReplaceTempView("dotted")
    val dr = engine.sql("SUMMARIZE dotted").collect()
    dr.map(_.getString(0)).toSeq shouldBe Seq("user.id", "plain")
    dr(0).getString(1) shouldBe "1"
    // DuckDB's query form profiles the query result (incl. FROM-first)
    val qr = engine.sql(
      "SUMMARIZE SELECT r_regionkey * 2 AS dk FROM region WHERE r_regionkey < 3")
      .collect()
    qr.length shouldBe 1
    qr(0).getString(0) shouldBe "dk"
    qr(0).getString(2) shouldBe "4" // max = 2*2
    qr(0).getLong(3) shouldBe 3L
    engine.sql("SUMMARIZE FROM region WHERE r_regionkey = 0")
      .collect().length shouldBe spark.table("region").columns.length
    engine.close()
  }

  test("sync() advances the snapshot from saved end offsets") {
    val engine = new Engine(spark)
    val topic = "synced"
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde)),
      _ => KafkaRecords.synthetic(spark, Seq(intRecord(topic, 0, 1), intRecord(topic, 1, 2))))
    engine.endOffsets(topic) shouldBe Map(0 -> 2L) // next offset to read
    engine.sync(_ => KafkaRecords.synthetic(spark, Seq(intRecord(topic, 2, 3))))
    engine.endOffsets(topic) shouldBe Map(0 -> 3L)
    engine.sql(s"SELECT count(*) AS n FROM synced").collect()(0).getLong(0) shouldBe 3L
    engine.close()
  }

  test("FROM-first syntax: bare, SELECT-list, and clause-carrying forms rewrite correctly") {
    val engine = new Engine(spark)
    val topic = "fromfirst"
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde, rowAttrs = Set.empty)),
      _ => KafkaRecords.synthetic(spark,
        Seq(intRecord(topic, 0, 5), intRecord(topic, 1, 2), intRecord(topic, 2, 9))))
    // bare FROM == SELECT *
    engine.sql("FROM fromfirst").count() shouldBe 3L
    // bare FROM + WHERE
    engine.sql("FROM fromfirst WHERE rowval > 4").count() shouldBe 2L
    // DuckDB clause order: FROM t SELECT list WHERE ... ORDER BY ...
    engine.sql("FROM fromfirst SELECT rowval * 10 AS v WHERE rowval >= 5 ORDER BY v")
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(50, 90)
    // a SELECT inside a subquery expression must not be mistaken for the clause
    engine.sql("FROM fromfirst WHERE rowval = (SELECT max(rowval) FROM fromfirst)")
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(9)
    // not FROM-first: untouched
    engine.sql("SELECT count(*) AS n FROM fromfirst").collect()(0).getLong(0) shouldBe 3L
    engine.close()
  }

  test("COLUMNS('regex') expands against the FROM relation's schema, search semantics") {
    val engine = new Engine(spark)
    val dir = "/root/testdata/sf0.001"
    val df = engine.sql(
      s"SELECT COLUMNS('^l_(orderkey|linenumber|quantity)$$') FROM '$dir/lineitem.parquet' " +
        "WHERE l_orderkey = 1 ORDER BY l_linenumber")
    df.columns.toSeq shouldBe Seq("l_orderkey", "l_linenumber", "l_quantity")
    df.count() should be > 0L
    // search (unanchored) semantics: 'linenumber' matches l_linenumber only
    engine.sql(s"SELECT COLUMNS('linenumber') FROM '$dir/lineitem.parquet' LIMIT 1")
      .columns.toSeq shouldBe Seq("l_linenumber")
    // no match must fail loudly
    an[Exception] should be thrownBy
      engine.sql(s"SELECT COLUMNS('nope_.*') FROM '$dir/lineitem.parquet'")
    engine.close()
  }

  test("ASOF [LEFT] JOIN SQL lowers to the native operator with DuckDB semantics") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (3L, 50L, "d"))
      .toDF("k", "t", "ev").createOrReplaceTempView("asof_l")
    Seq((1L, 8L, 100.0), (1L, 20L, 200.0), (2L, 9L, 300.0))
      .toDF("k", "rt", "price").createOrReplaceTempView("asof_r")
    // inner: unmatched left rows (k=2 t=5 before any right ts; k=3 no key)
    // are dropped; each match takes the latest right row with rt <= t
    val inner = engine.sql(
      """SELECT l.ev, r.price FROM asof_l l ASOF JOIN asof_r r
        |ON l.k = r.k AND l.t >= r.rt ORDER BY l.ev""".stripMargin).collect()
    inner.map(r => (r.getString(0), r.getDouble(1))).toSeq shouldBe
      Seq(("a", 100.0), ("b", 200.0))
    // LEFT: unmatched rows survive with null payload
    val left = engine.sql(
      """SELECT ev, price FROM asof_l ASOF LEFT JOIN asof_r r
        |ON asof_l.k = r.k AND t >= rt ORDER BY ev""".stripMargin).collect()
    left.map(r => (r.getString(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
      .toSeq shouldBe Seq(("a", 100.0), ("b", 200.0), ("c", -1.0), ("d", -1.0))
    // the mirror spelling r.ts <= l.ts works
    engine.sql(
      """SELECT count(*) AS n FROM asof_l l ASOF JOIN asof_r r
        |ON l.k = r.k AND r.rt <= l.t""".stripMargin)
      .collect()(0).getLong(0) shouldBe 2L
    // forward direction: earliest right row at-or-after per key
    // (a t=10 -> rt=20; c t=5 -> rt=9; b t=25 and d k=3 have none)
    val fwd = engine.sql(
      """SELECT l.ev, r.price FROM asof_l l ASOF JOIN asof_r r
        |ON l.k = r.k AND l.t <= r.rt ORDER BY l.ev""".stripMargin).collect()
    fwd.map(r => (r.getString(0), r.getDouble(1))).toSeq shouldBe
      Seq(("a", 200.0), ("c", 300.0))
    // no equality key must fail loudly (hash partitioning needs one)
    an[Exception] should be thrownBy engine.sql(
      "SELECT * FROM asof_l l ASOF JOIN asof_r r ON l.t >= r.rt")
    engine.close()
  }

  test("USING SAMPLE rewrites to TABLESAMPLE: rows, percent, repeatable, join-USING untouched") {
    import spark.implicits._
    val engine = new Engine(spark)
    (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "grp")
      .createOrReplaceTempView("samp_t")
    engine.sql("SELECT count(*) AS n FROM samp_t USING SAMPLE 10 ROWS")
      .collect()(0).getLong(0) shouldBe 10L
    engine.sql("SELECT count(*) AS n FROM samp_t USING SAMPLE 25")
      .collect()(0).getLong(0) shouldBe 25L
    // percent sampling is Bernoulli — row count varies, bound it loosely
    val pct = engine.sql(
      "SELECT count(*) AS n FROM samp_t USING SAMPLE 50% (bernoulli) REPEATABLE (42)")
      .collect()(0).getLong(0)
    pct should be > 15L
    pct should be < 85L
    // REPEATABLE pins the draw
    engine.sql(
      "SELECT count(*) AS n FROM samp_t USING SAMPLE 50 PERCENT REPEATABLE (42)")
      .collect()(0).getLong(0) shouldBe pct
    // seeded ROWS form: an honest random-but-deterministic draw — exact
    // size, repeatable, and NOT the first-N prefix
    val drawIds = engine.sql(
      "SELECT id FROM samp_t USING SAMPLE 10 ROWS REPEATABLE (7)")
      .collect().map(_.getLong(0)).toSet
    drawIds.size shouldBe 10
    val again = engine.sql(
      "SELECT id FROM samp_t USING SAMPLE 10 ROWS REPEATABLE (7)")
      .collect().map(_.getLong(0)).toSet
    again shouldBe drawIds
    drawIds should not be (1L to 10L).toSet
    // a different seed gives a different draw
    engine.sql("SELECT id FROM samp_t USING SAMPLE 10 ROWS REPEATABLE (8)")
      .collect().map(_.getLong(0)).toSet should not be drawIds
    // the aliased-item form keeps the alias resolvable
    engine.sql("SELECT count(s.id) AS n FROM samp_t s " +
      "USING SAMPLE 10 ROWS REPEATABLE (7)")
      .collect()(0).getLong(0) shouldBe 10L
    // JOIN ... USING (cols) must pass through untouched
    engine.sql(
      """SELECT count(*) AS n FROM samp_t a JOIN samp_t b USING (id)""")
      .collect()(0).getLong(0) shouldBe 100L
    // DuckDB's reservoir(N ROWS) function form: accepted, and with a
    // seed it takes the seeded-random path
    engine.sql("SELECT count(*) AS n FROM samp_t " +
      "USING SAMPLE reservoir(10 ROWS)").collect()(0).getLong(0) shouldBe 10L
    engine.sql("SELECT id FROM samp_t " +
      "USING SAMPLE reservoir(10 ROWS) REPEATABLE (7)")
      .collect().map(_.getLong(0)).toSet shouldBe drawIds
    // unsupported spec fails loudly
    an[Exception] should be thrownBy engine.sql(
      "SELECT * FROM samp_t USING SAMPLE xyz(10 ROWS)")
    engine.close()
  }

  test("PIVOT statement lowers to the DataFrame pivot (IN list, discovery, implicit groups)") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L), ("a", "x", 5L))
      .toDF("k", "p", "v").createOrReplaceTempView("piv_t")
    // explicit IN list + explicit GROUP BY
    val r1 = engine.sql(
      "PIVOT piv_t ON p IN ('x', 'y') USING sum(v) GROUP BY k")
      .orderBy("k").collect()
    r1.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq shouldBe
      Seq(("a", 6L, 2L), ("b", 3L, -1L))
    // discovered values + implicit group (all columns not in ON/USING)
    val r2 = engine.sql("PIVOT piv_t ON p USING sum(v)").orderBy("k").collect()
    r2.map(_.getString(0)).toSeq shouldBe Seq("a", "b")
    r2(0).schema.fieldNames.toSeq shouldBe Seq("k", "x", "y")
    engine.close()
  }

  test("UNPIVOT statement lowers to Spark's UNPIVOT clause, dropping NULL measures") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, Some(10.0), Some(20.0)), (2L, Some(30.0), None))
      .toDF("id", "m1", "m2").createOrReplaceTempView("unp_t")
    val rows = engine.sql(
      "UNPIVOT unp_t ON m1, m2 INTO NAME metric VALUE val")
      .orderBy("id", "metric").collect()
    rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq shouldBe
      Seq((1L, "m1", 10.0), (1L, "m2", 20.0), (2L, "m1", 30.0))
    engine.close()
  }

  test("EXPLAIN [ANALYZE] returns the formatted plan as rows through the dialect") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("exp_t")
    val plan = engine.sql("EXPLAIN SELECT v, count(*) AS n FROM exp_t GROUP BY v")
      .collect().map(_.getString(0)).mkString("\n")
    plan should include("Physical Plan")
    plan should include("HashAggregate")
    // the inner statement goes through the full dialect (FROM-first here)
    val sugar = engine.sql("EXPLAIN FROM exp_t SELECT id WHERE id = 1")
      .collect().map(_.getString(0)).mkString("\n")
    sugar should include("Physical Plan")
    val analyzed = engine.sql("EXPLAIN ANALYZE SELECT count(*) AS n FROM exp_t")
      .collect().map(_.getString(0)).mkString("\n")
    analyzed should include("Physical Plan")
    engine.close()
  }

  test("SET/RESET map TimeZone and spark.* confs; foreign knobs fail loudly") {
    val engine = new Engine(spark)
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      engine.sql("SET TimeZone = 'America/New_York'").collect()
      spark.conf.get("spark.sql.session.timeZone") shouldBe "America/New_York"
      engine.sql("SET spark.sql.session.timeZone TO 'UTC'").collect()
      spark.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
      val e = intercept[IllegalArgumentException] {
        engine.sql("SET threads = 4")
      }
      e.getMessage should include("spark.* confs")
    } finally spark.conf.set("spark.sql.session.timeZone", before)
    engine.close()
  }

  test("PREPARE/EXECUTE/DEALLOCATE bind positional parameters quote-aware") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "c", 40.0))
      .toDF("id", "cat", "v").createOrReplaceTempView("prep_t")
    // $N form, used twice and out of order; a literal '$1' must survive
    engine.sql(
      "PREPARE pq AS SELECT id, cat, '$1' AS tag FROM prep_t " +
        "WHERE v >= $2 AND cat = $1 ORDER BY id")
    val r1 = engine.sql("EXECUTE pq('a', 15)").collect()
    r1.map(_.getLong(0)).toSeq shouldBe Seq(3L)
    r1.head.getString(2) shouldBe "$1" // quoted region untouched
    // ? form in order; arguments may contain nested parens
    engine.sql("PREPARE pq2 AS SELECT count(*) AS n FROM prep_t WHERE cat = ? AND v < ?")
    engine.sql("EXECUTE pq2(lower(UPPER('a')), (15 + 10))")
      .collect()(0).getLong(0) shouldBe 1L
    // re-dispatch: a prepared FROM-first statement runs through the dialect
    engine.sql("PREPARE pq3 AS FROM prep_t SELECT id WHERE id = $1")
    engine.sql("EXECUTE pq3(4)").collect()(0).getLong(0) shouldBe 4L
    // missing argument and unknown name fail loudly
    an[Exception] should be thrownBy engine.sql("EXECUTE pq('a')")
    an[Exception] should be thrownBy engine.sql("EXECUTE nope(1)")
    engine.sql("DEALLOCATE pq")
    an[Exception] should be thrownBy engine.sql("EXECUTE pq('a', 15)")
    engine.close()
  }

  test("CREATE TABLE AS / INSERT INTO / DROP TABLE session DDL round-trip") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .createOrReplaceTempView("ddl_src")
    engine.sql("CREATE TABLE ddl_t AS SELECT k, s FROM ddl_src WHERE k <= 2")
    engine.sql("SELECT COUNT(*) c FROM ddl_t").collect()(0).getLong(0) shouldBe 2
    // CTAS is a snapshot: mutating the source view must not leak in
    Seq((9L, "z")).toDF("k", "s").createOrReplaceTempView("ddl_src")
    engine.sql("SELECT COUNT(*) c FROM ddl_t").collect()(0).getLong(0) shouldBe 2
    // plain CREATE on an existing name fails; OR REPLACE / IF NOT EXISTS work
    an[Exception] should be thrownBy
      engine.sql("CREATE TABLE ddl_t AS SELECT 1 AS one")
    engine.sql("CREATE TABLE IF NOT EXISTS ddl_t AS SELECT 1 AS one")
    engine.sql("SELECT COUNT(*) c FROM ddl_t").collect()(0).getLong(0) shouldBe 2
    // positional INSERT casts to the target schema
    engine.sql("INSERT INTO ddl_t SELECT 7, 'x'").collect()(0)
      .getLong(0) shouldBe 1
    // column-list INSERT fills unlisted columns with NULL
    engine.sql("INSERT INTO ddl_t (s) VALUES ('only_s')")
    val rows = engine.sql("SELECT k, s FROM ddl_t ORDER BY s NULLS LAST")
      .collect()
    rows.length shouldBe 4
    rows.map(r => Option(r.get(1)).orNull).toSet shouldBe
      Set("a", "b", "x", "only_s")
    rows.find(_.getString(1) == "only_s").get.isNullAt(0) shouldBe true
    // OR REPLACE swaps the snapshot wholesale
    engine.sql("CREATE OR REPLACE TABLE ddl_t AS SELECT 5 AS k")
    engine.sql("SELECT k FROM ddl_t").collect()(0).getInt(0) shouldBe 5
    engine.sql("DROP TABLE ddl_t")
    an[Exception] should be thrownBy engine.sql("SELECT * FROM ddl_t")
    an[Exception] should be thrownBy engine.sql("DROP TABLE ddl_t")
    engine.sql("DROP TABLE IF EXISTS ddl_t") // no-op, no throw
    engine.close()
  }

  test("UPDATE / DELETE session DML mutate engine-created snapshots") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v").createOrReplaceTempView("dml_src")
    engine.sql("CREATE TABLE dml_t AS SELECT * FROM dml_src")
    // predicate-guarded multi-column UPDATE; schema stays stable
    engine.sql("UPDATE dml_t SET v = v * 2, s = upper(s) WHERE k <= 2")
      .collect()(0).getLong(0) shouldBe 2
    val rows = engine.sql("SELECT k, s, v FROM dml_t ORDER BY k").collect()
    rows.map(_.getString(1)).toSeq shouldBe Seq("A", "B", "c", "d")
    rows.map(_.getDouble(2)).toSeq shouldBe Seq(20.0, 40.0, 30.0, 40.0)
    // expression referencing another column + no WHERE touches every row
    engine.sql("UPDATE dml_t SET v = v + k").collect()(0)
      .getLong(0) shouldBe 4
    engine.sql("SELECT SUM(v) sv FROM dml_t").collect()(0)
      .getDouble(0) shouldBe (21.0 + 42.0 + 33.0 + 44.0)
    // unknown SET column fails loudly
    an[IllegalArgumentException] should be thrownBy
      engine.sql("UPDATE dml_t SET nope = 1")
    // DELETE with predicate reports the exact count and keeps the rest
    engine.sql("DELETE FROM dml_t WHERE k % 2 = 0").collect()(0)
      .getLong(0) shouldBe 2
    engine.sql("SELECT COUNT(*) c FROM dml_t").collect()(0)
      .getLong(0) shouldBe 2
    // a NULL predicate row is NOT deleted (SQL three-valued logic)
    engine.sql("UPDATE dml_t SET s = NULL WHERE k = 1")
    engine.sql("DELETE FROM dml_t WHERE s = 'zzz'").collect()(0)
      .getLong(0) shouldBe 0
    engine.sql("SELECT COUNT(*) c FROM dml_t").collect()(0)
      .getLong(0) shouldBe 2
    // bare DELETE empties the table but keeps it defined
    engine.sql("DELETE FROM dml_t").collect()(0).getLong(0) shouldBe 2
    engine.sql("SELECT COUNT(*) c FROM dml_t").collect()(0)
      .getLong(0) shouldBe 0
    // a literal containing ' WHERE ' must NOT split the SET clause
    engine.sql("INSERT INTO dml_t SELECT 8, 'h', 8.0")
    engine.sql("UPDATE dml_t SET s = 'a WHERE b' WHERE k = 8")
      .collect()(0).getLong(0) shouldBe 1
    engine.sql("SELECT s FROM dml_t WHERE k = 8").collect()(0)
      .getString(0) shouldBe "a WHERE b"
    engine.sql("DELETE FROM dml_t WHERE s = 'a WHERE b'").collect()(0)
      .getLong(0) shouldBe 1
    // TRUNCATE is the bare-DELETE spelling; RENAME moves the snapshot
    engine.sql("INSERT INTO dml_t SELECT 9, 'i', 1.0")
    engine.sql("TRUNCATE TABLE dml_t").collect()(0).getLong(0) shouldBe 1
    engine.sql("SELECT COUNT(*) c FROM dml_t").collect()(0)
      .getLong(0) shouldBe 0
    engine.sql("INSERT INTO dml_t SELECT 10, 'j', 2.0")
    engine.sql("ALTER TABLE dml_t RENAME TO dml_r")
    engine.sql("SELECT k FROM dml_r").collect()(0).getLong(0) shouldBe 10
    an[Exception] should be thrownBy engine.sql("SELECT * FROM dml_t")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("ALTER TABLE dml_missing RENAME TO x2")
    engine.sql("ALTER TABLE dml_r RENAME TO dml_t")
    // UPDATE/DELETE only touch engine-created tables, never views/topics
    engine.sql("CREATE VIEW dml_v AS SELECT 1 AS one")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("UPDATE dml_v SET one = 2")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("DELETE FROM dml_v")
    engine.sql("DROP VIEW dml_v")
    engine.sql("DROP TABLE dml_t")
    engine.close()
  }

  test("CREATE TABLE (schema) + COPY FROM load an empty table from files") {
    import spark.implicits._
    val engine = new Engine(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_copyfrom").toString
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$dir/rows.csv")
    Seq((3L, "c", 3.5)).toDF("k", "s", "v")
      .write.mode("overwrite").parquet(s"$dir/more.parquet")
    // DECIMAL keeps its parens through the column-list regex; VARCHAR maps
    engine.sql("CREATE TABLE ld (k BIGINT, s VARCHAR, v DECIMAL(12,2))")
    engine.sql("SELECT COUNT(*) c FROM ld").collect()(0).getLong(0) shouldBe 0
    engine.sql(s"COPY ld FROM '$dir/rows.csv'").collect()(0)
      .getLong(0) shouldBe 2
    engine.sql(s"COPY ld FROM '$dir/more.parquet'").collect()(0)
      .getLong(0) shouldBe 1
    val rows = engine.sql("SELECT k, s, CAST(v AS DOUBLE) vd FROM ld ORDER BY k")
      .collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L)
    rows.map(_.getDouble(2)).toSeq shouldBe Seq(1.5, 2.5, 3.5)
    // schema enforcement: the declared DECIMAL type is the table's type
    engine.sql("DESCRIBE ld").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
      .apply("v").toLowerCase should include("decimal(12,2)")
    // COPY FROM into a non-engine table fails loudly
    an[IllegalArgumentException] should be thrownBy
      engine.sql(s"COPY missing_tbl FROM '$dir/rows.csv'")
    engine.sql("DROP TABLE ld")
    engine.close()
  }

  test("EXPORT DATABASE / IMPORT DATABASE round-trip tables, views, macros") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_exportdb").toString
    val engine = new Engine(spark)
    Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("k", "v")
      .createOrReplaceTempView("exp_src")
    engine.sql("CREATE MACRO twice(x) AS x * 2")
    engine.sql("CREATE TABLE exp_t AS SELECT k, v FROM exp_src")
    engine.sql("CREATE VIEW exp_v AS SELECT SUM(v) sv FROM exp_t")
    engine.sql("CREATE SEQUENCE exp_seq START 5 INCREMENT 3")
    engine.sql("SELECT nextval('exp_seq') AS a").collect() // 5
    engine.sql("SELECT nextval('exp_seq') AS a").collect() // 8; next = 11
    val exported = engine.sql(s"EXPORT DATABASE '$dir'").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    exported shouldBe Set(("macro", "twice"), ("table", "exp_t"),
      ("view", "exp_v"), ("sequence", "exp_seq"))
    new java.io.File(s"$dir/schema.sql").exists() shouldBe true
    new java.io.File(s"$dir/exp_t.parquet").exists() shouldBe true
    // a FRESH session (no exp_t/exp_v/twice) replays the manifest
    engine.sql("DROP VIEW exp_v")
    engine.sql("DROP TABLE exp_t")
    engine.sql("DROP MACRO twice")
    val engine2 = new Engine(spark)
    engine2.sql(s"IMPORT DATABASE '$dir'").collect()(0)
      .getLong(0) shouldBe 4
    // the sequence resumes at its exported CONTINUATION point
    engine2.sql("SELECT nextval('exp_seq') AS a").collect()(0)
      .getLong(0) shouldBe 11L
    engine2.sql("SELECT COUNT(*) c FROM exp_t").collect()(0)
      .getLong(0) shouldBe 3
    engine2.sql("SELECT sv FROM exp_v").collect()(0)
      .getDouble(0) shouldBe 12.0
    engine2.sql("SELECT twice(21) t").collect()(0).getInt(0) shouldBe 42
    // imported tables are snapshots: the exported parquet dir can go away
    engine2.sql("DROP TABLE exp_t")
    engine2.sql("DROP VIEW exp_v")
    engine2.sql("DROP MACRO twice")
    // a view body with a line comment and a '--' INSIDE a literal must
    // survive the manifest's one-line collapse
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_exportdb2").toString
    engine2.sql("CREATE VIEW exp_c AS SELECT 1 AS a, -- note\n" +
      "  '--not-a-comment' AS b")
    engine2.sql(s"EXPORT DATABASE '$dir2'")
    engine2.sql("DROP VIEW exp_c")
    val engine3 = new Engine(spark)
    engine3.sql(s"IMPORT DATABASE '$dir2'")
    val row = engine3.sql("SELECT a, b FROM exp_c").collect()(0)
    row.getInt(0) shouldBe 1
    row.getString(1) shouldBe "--not-a-comment"
    engine3.sql("DROP VIEW exp_c")
    engine.close(); engine2.close(); engine3.close()
  }

  test("EXPORT DATABASE: dependent views replay in topological order; " +
      "quote state carries across manifest lines") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_exportdb_topo").toString
    val engine = new Engine(spark)
    Seq((1L, 5.0), (2L, 7.0)).toDF("k", "v")
      .createOrReplaceTempView("topo_src")
    engine.sql("CREATE TABLE topo_t AS SELECT k, v FROM topo_src")
    // 'a_dep' sorts BEFORE 'z_base' alphabetically but depends on it —
    // the manifest must still emit z_base first
    engine.sql("CREATE VIEW z_base AS SELECT SUM(v) sv FROM topo_t")
    engine.sql("CREATE VIEW a_dep AS SELECT sv * 2 AS dv FROM z_base")
    // a string literal SPANNING lines whose continuation line contains
    // '--': the collapse must keep it (quote state across newlines)
    engine.sql("CREATE VIEW m_lit AS SELECT 'x\n--keep' AS s, sv FROM z_base")
    engine.sql(s"EXPORT DATABASE '$dir'").collect()
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "schema.sql"))
    manifest.indexOf("VIEW z_base") should be < manifest.indexOf("VIEW a_dep")
    manifest should include("--keep")
    engine.sql("DROP VIEW a_dep"); engine.sql("DROP VIEW m_lit")
    engine.sql("DROP VIEW z_base"); engine.sql("DROP TABLE topo_t")
    val engine2 = new Engine(spark)
    engine2.sql(s"IMPORT DATABASE '$dir'")
    engine2.sql("SELECT dv FROM a_dep").collect()(0)
      .getDouble(0) shouldBe 24.0
    engine2.sql("SELECT s FROM m_lit").collect()(0)
      .getString(0) shouldBe "x --keep"
    engine2.sql("DROP VIEW a_dep"); engine2.sql("DROP VIEW m_lit")
    engine2.sql("DROP VIEW z_base"); engine2.sql("DROP TABLE topo_t")
    engine.close(); engine2.close()
  }

  test("CREATE TABLE (coldefs): VARCHAR/TEXT map to STRING in the TYPE " +
      "position only — a column NAMED text keeps its name") {
    val engine = new Engine(spark)
    engine.sql("CREATE TABLE cd_t (text VARCHAR, varchar TEXT, " +
      "n DECIMAL(10,2), tags ARRAY<STRING>)")
    val schema = engine.sql("SELECT * FROM cd_t").schema
    schema.fieldNames.toSeq shouldBe Seq("text", "varchar", "n", "tags")
    schema("text").dataType.simpleString shouldBe "string"
    schema("varchar").dataType.simpleString shouldBe "string"
    schema("n").dataType.simpleString shouldBe "decimal(10,2)"
    engine.sql("DROP TABLE cd_t")
    engine.close()
  }

  test("UPDATE resolves SET column names case-insensitively") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "vAl")
      .createOrReplaceTempView("upd_src")
    engine.sql("CREATE TABLE upd_t AS SELECT k, vAl FROM upd_src")
    engine.sql("UPDATE upd_t SET VAL = vAl + 1 WHERE k = 1").collect()(0)
      .getLong(0) shouldBe 1L
    // canonical spelling survives the rewrite
    val df = engine.sql("SELECT * FROM upd_t ORDER BY k")
    df.schema.fieldNames.toSeq shouldBe Seq("k", "vAl")
    df.collect().map(_.getDouble(1)).toSeq shouldBe Seq(11.0, 20.0)
    an[IllegalArgumentException] should be thrownBy
      engine.sql("UPDATE upd_t SET missing = 1")
    engine.sql("DROP TABLE upd_t")
    engine.close()
  }

  test("UPDATE ... FROM joins the source relation into the SET expressions") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "v", "tag").createOrReplaceTempView("uf_src")
    Seq((1L, 5.0), (3L, 7.0), (9L, 99.0)).toDF("k", "delta")
      .createOrReplaceTempView("uf_delta")
    engine.sql("CREATE TABLE uf_t AS SELECT k, v, tag FROM uf_src")
    engine.sql("CREATE TABLE uf_d AS SELECT k, delta FROM uf_delta")
    // matched rows take the joined expression; unmatched pass through
    engine.sql("UPDATE uf_t SET v = uf_t.v + d.delta FROM uf_d d " +
      "WHERE uf_t.k = d.k").collect()(0).getLong(0) shouldBe 2L
    engine.sql("SELECT v FROM uf_t ORDER BY k").collect()
      .map(_.getDouble(0)).toSeq shouldBe Seq(15.0, 20.0, 37.0)
    // a WHERE with extra predicates narrows the join
    engine.sql("UPDATE uf_t SET tag = 'hit' FROM uf_d d " +
      "WHERE uf_t.k = d.k AND d.delta > 6").collect()(0)
      .getLong(0) shouldBe 1L
    engine.sql("SELECT tag FROM uf_t ORDER BY k").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("a", "b", "hit")
    // a quoted ' FROM ' inside a SET literal stays a plain UPDATE
    engine.sql("UPDATE uf_t SET tag = ' FROM d' WHERE k = 1").collect()(0)
      .getLong(0) shouldBe 1L
    engine.sql("SELECT tag FROM uf_t WHERE k = 1").collect()(0)
      .getString(0) shouldBe " FROM d"
    engine.sql("DROP TABLE uf_t"); engine.sql("DROP TABLE uf_d")
    engine.close()
  }

  test("ALTER TABLE ADD / DROP / RENAME COLUMN rewrite the snapshot") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
      .createOrReplaceTempView("alt_src")
    engine.sql("CREATE TABLE alt_t AS SELECT k, tag FROM alt_src")
    // ADD with DEFAULT backfills existing rows; typed via the coldef map
    engine.sql("ALTER TABLE alt_t ADD COLUMN note VARCHAR DEFAULT 'n/a'")
    engine.sql("ALTER TABLE alt_t ADD score DOUBLE")
    val r = engine.sql("SELECT * FROM alt_t ORDER BY k").collect()
    r.map(_.getString(2)).toSeq shouldBe Seq("n/a", "n/a")
    r.foreach(_.isNullAt(3) shouldBe true)
    engine.sql("ALTER TABLE alt_t ADD COLUMN IF NOT EXISTS note VARCHAR")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("ALTER TABLE alt_t ADD COLUMN note VARCHAR")
    // RENAME COLUMN keeps data; DROP removes it
    engine.sql("ALTER TABLE alt_t RENAME COLUMN note TO remark")
    engine.sql("SELECT remark FROM alt_t WHERE k = 1").collect()(0)
      .getString(0) shouldBe "n/a"
    engine.sql("ALTER TABLE alt_t DROP COLUMN score")
    engine.sql("SELECT * FROM alt_t").schema.fieldNames.toSeq shouldBe
      Seq("k", "tag", "remark")
    engine.sql("ALTER TABLE alt_t DROP COLUMN IF EXISTS ghost")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("ALTER TABLE alt_t DROP COLUMN ghost")
    // a PRIMARY KEY member cannot be dropped but follows a rename
    engine.sql("CREATE TABLE alt_pk (id BIGINT PRIMARY KEY, v INT)")
    an[Exception] should be thrownBy
      engine.sql("ALTER TABLE alt_pk DROP COLUMN id")
    engine.sql("ALTER TABLE alt_pk RENAME COLUMN id TO uid")
    engine.sql("INSERT INTO alt_pk VALUES (1, 10)")
    engine.sql("INSERT OR IGNORE INTO alt_pk VALUES (1, 99)")
      .collect()(0).getLong(0) shouldBe 0L // key followed the rename
    engine.sql("DROP TABLE alt_t"); engine.sql("DROP TABLE alt_pk")
    engine.close()
  }

  test("DELETE ... USING removes rows with any source match") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "tag")
      .createOrReplaceTempView("du_src")
    Seq((2L, true), (3L, false), (9L, true)).toDF("k", "kill")
      .createOrReplaceTempView("du_kill")
    engine.sql("CREATE TABLE du_t AS SELECT k, tag FROM du_src")
    engine.sql("CREATE TABLE du_k AS SELECT k, kill FROM du_kill")
    engine.sql("DELETE FROM du_t USING du_k o " +
      "WHERE du_t.k = o.k AND o.kill").collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT k FROM du_t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(1L, 3L, 4L)
    // a quoted ' USING ' inside the predicate stays a plain DELETE
    engine.sql("DELETE FROM du_t WHERE tag = ' USING x'").collect()(0)
      .getLong(0) shouldBe 0L
    engine.sql("DROP TABLE du_t"); engine.sql("DROP TABLE du_k")
    engine.close()
  }

  test("INSERT ... ON CONFLICT upserts: DO NOTHING, DO UPDATE with " +
      "excluded refs, OR REPLACE / OR IGNORE sugar") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("oc_src")
    engine.sql("CREATE TABLE oc_t AS SELECT k, name, v FROM oc_src")
    // DO NOTHING: existing key 2 stays, new key 3 lands
    engine.sql("INSERT INTO oc_t VALUES (2, 'B', 99.0), (3, 'c', 30.0) " +
      "ON CONFLICT (k) DO NOTHING").collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT name, v FROM oc_t WHERE k = 2").collect()(0)
      .toSeq shouldBe Seq("b", 20.0)
    // DO UPDATE with excluded.<col> in the SET expressions
    engine.sql("INSERT INTO oc_t VALUES (2, 'B2', 200.0), (4, 'd', 40.0) " +
      "ON CONFLICT (k) DO UPDATE SET v = oc_t.v + excluded.v")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT name, v FROM oc_t WHERE k = 2").collect()(0)
      .toSeq shouldBe Seq("b", 220.0)
    // a quoted 'excluded.v' literal in the SET rhs is NOT rewritten
    engine.sql("INSERT INTO oc_t VALUES (2, 'zz', 1.0) " +
      "ON CONFLICT (k) DO UPDATE SET name = 'excluded.v'")
      .collect()(0).getLong(0) shouldBe 0L
    engine.sql("SELECT name FROM oc_t WHERE k = 2").collect()(0)
      .getString(0) shouldBe "excluded.v"
    // OR REPLACE: every non-key column takes the incoming value
    engine.sql("INSERT OR REPLACE INTO oc_t VALUES (3, 'C!', 33.0) " +
      "ON CONFLICT (k)").collect()(0).getLong(0) shouldBe 0L
    engine.sql("SELECT name, v FROM oc_t WHERE k = 3").collect()(0)
      .toSeq shouldBe Seq("C!", 33.0)
    // OR IGNORE sugar == DO NOTHING
    engine.sql("INSERT OR IGNORE INTO oc_t VALUES (3, 'zzz', 0.0) " +
      "ON CONFLICT (k)").collect()(0).getLong(0) shouldBe 0L
    engine.sql("SELECT name FROM oc_t WHERE k = 3").collect()(0)
      .getString(0) shouldBe "C!"
    engine.sql("SELECT count(*) AS n FROM oc_t").collect()(0)
      .getLong(0) shouldBe 4L
    // a JOIN ... ON inside the INSERT body is NOT a conflict clause, and
    // a quoted 'ON CONFLICT' literal never splits the body
    Seq((7L, 7L)).toDF("x", "y").createOrReplaceTempView("oc_j")
    engine.sql("INSERT INTO oc_t SELECT a.x, 'j', 70.0 FROM oc_j a " +
      "JOIN oc_j b ON a.x = b.y").collect()(0).getLong(0) shouldBe 1L
    engine.sql("INSERT INTO oc_t SELECT 8, 'ON CONFLICT (k)', 80.0 " +
      "ON CONFLICT (k) DO NOTHING").collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT name FROM oc_t WHERE k = 8").collect()(0)
      .getString(0) shouldBe "ON CONFLICT (k)"
    // duplicate conflict keys within one batch fail loudly
    an[Exception] should be thrownBy engine.sql(
      "INSERT INTO oc_t VALUES (9, 'x', 1.0), (9, 'y', 2.0) " +
        "ON CONFLICT (k) DO NOTHING")
    // OR REPLACE without a conflict target: no PK declared on a CTAS table
    val ex = intercept[IllegalArgumentException] {
      engine.sql("INSERT OR REPLACE INTO oc_t VALUES (5, 'e', 50.0)")
    }
    ex.getMessage should include("no PRIMARY KEY declared")
    engine.sql("DROP TABLE oc_t")
    engine.close()
  }

  test("declared PRIMARY KEY drives INSERT OR REPLACE / bare ON CONFLICT; " +
      "NOT NULL / UNIQUE constraint tokens are accepted") {
    val engine = new Engine(spark)
    engine.sql("CREATE TABLE pk_t (k BIGINT PRIMARY KEY, " +
      "name VARCHAR NOT NULL, v DOUBLE UNIQUE)")
    engine.sql("SELECT * FROM pk_t").schema.fieldNames.toSeq shouldBe
      Seq("k", "name", "v")
    engine.sql("INSERT INTO pk_t VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    // OR REPLACE with no clause resolves the declared PK
    engine.sql("INSERT OR REPLACE INTO pk_t VALUES (2, 'B!', 99.0)")
      .collect()(0).getLong(0) shouldBe 0L
    engine.sql("SELECT name, v FROM pk_t WHERE k = 2").collect()(0)
      .toSeq shouldBe Seq("B!", 99.0)
    // bare ON CONFLICT (no target) also resolves the PK
    engine.sql("INSERT INTO pk_t VALUES (1, 'x', 0.0) " +
      "ON CONFLICT DO NOTHING").collect()(0).getLong(0) shouldBe 0L
    engine.sql("SELECT name FROM pk_t WHERE k = 1").collect()(0)
      .getString(0) shouldBe "a"
    // table-level composite key form; UNIQUE parses and drops, CHECK and
    // FOREIGN KEY are enforced (round 10) — the parent must exist
    engine.sql("CREATE TABLE other_t (x INT PRIMARY KEY)")
    engine.sql("INSERT INTO other_t VALUES (1), (2)")
    engine.sql("CREATE TABLE pk_c (a INT, b INT, n BIGINT, " +
      "PRIMARY KEY (a, b), UNIQUE (n), CHECK (n > 0), " +
      "FOREIGN KEY (a) REFERENCES other_t (x))")
    engine.sql("INSERT INTO pk_c VALUES (1, 1, 10), (1, 2, 20)")
    engine.sql("INSERT OR IGNORE INTO pk_c VALUES (1, 1, 99), (2, 1, 30)")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT n FROM pk_c WHERE a = 1 AND b = 1").collect()(0)
      .getLong(0) shouldBe 10L
    // EXPORT/IMPORT round-trips the declared key (coldef CREATE + data
    // INSERT in the manifest)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pk_export").toString
    engine.sql(s"EXPORT DATABASE '$dir'")
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "schema.sql"))
    manifest should include("PRIMARY KEY (`a`, `b`)")
    engine.sql("DROP TABLE pk_c")
    val engine2 = new Engine(spark)
    engine2.sql(s"IMPORT DATABASE '$dir'")
    engine2.sql("SELECT count(*) AS n FROM pk_c").collect()(0)
      .getLong(0) shouldBe 3L
    engine2.sql("INSERT OR IGNORE INTO pk_c VALUES (1, 1, 77)")
      .collect()(0).getLong(0) shouldBe 0L // key restored by the import
    engine2.sql("DROP TABLE pk_c"); engine2.sql("DROP TABLE pk_t")
    engine2.close()
    // the PK does not survive a CTAS replace (documented)
    engine.sql("CREATE TABLE pk_t2 (k BIGINT PRIMARY KEY)")
    engine.sql("CREATE OR REPLACE TABLE pk_t2 AS SELECT 1 AS k")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("INSERT OR REPLACE INTO pk_t2 VALUES (1)")
    engine.sql("DROP TABLE pk_t2")
    engine.close()
  }

  test("CREATE VIEW is late-bound plan; DROP VIEW removes it; topic names guarded") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .createOrReplaceTempView("vw_src")
    engine.sql("CREATE VIEW vw_agg AS SELECT SUM(v) s FROM vw_src")
    engine.sql("SELECT s FROM vw_agg").collect()(0).getDouble(0) shouldBe 30.0
    an[Exception] should be thrownBy
      engine.sql("CREATE VIEW vw_agg AS SELECT 1 AS one")
    engine.sql("CREATE OR REPLACE VIEW vw_agg AS SELECT COUNT(*) c FROM vw_src")
    engine.sql("SELECT c FROM vw_agg").collect()(0).getLong(0) shouldBe 2
    // INSERT targets must be engine-created TABLES, not views
    an[IllegalArgumentException] should be thrownBy
      engine.sql("INSERT INTO vw_agg SELECT 1")
    engine.sql("DROP VIEW vw_agg")
    an[Exception] should be thrownBy engine.sql("SELECT * FROM vw_agg")
    // an ingested topic table can never be replaced or dropped
    val topic = "ddl-topic"
    engine.init(Seq(Engine.TopicSpec(topic, valueSerde = Serde.IntSerde)),
      _ => KafkaRecords.synthetic(spark, Seq(intRecord(topic, 0, 1))))
    an[Exception] should be thrownBy
      engine.sql("CREATE TABLE ddl_topic AS SELECT 1 AS one")
    an[Exception] should be thrownBy engine.sql("DROP TABLE ddl_topic")
    engine.close()
  }

  test("PRAGMA table_info/show_tables/version serve the interactive surface") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, 2.0)).toDF("k", "v").createOrReplaceTempView("prag_t")
    val info = engine.sql("PRAGMA table_info('prag_t')").collect()
    info.map(_.getString(0)) should contain allOf ("k", "v")
    engine.sql("PRAGMA show_tables").collect()
      .map(_.getString(1)) should contain("prag_t")
    engine.sql("PRAGMA version").collect()(0).getString(0) should
      include("Spark")
    an[IllegalArgumentException] should be thrownBy
      engine.sql("PRAGMA nope_setting")
    engine.close()
  }

  // --- DuckDB function-name alias surface (r12; functions/DuckAliases) ---

  private def one(engine: Engine, expr: String): Any = {
    val r = engine.sql(s"SELECT $expr AS v").collect().head
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("DuckDB list/string/temporal function names resolve to the Spark " +
      "natives with DuckDB semantics") {
    val engine = new Engine(spark)
    try {
      one(engine, "list_contains([1, 2, 3], 2)") shouldBe true
      one(engine, "list_transform([1, 2], x -> x * 10)") shouldBe Seq(10, 20)
      one(engine, "list_filter([1, 2, 3], x -> x > 1)") shouldBe Seq(2, 3)
      one(engine, "list_aggregate(['a', 'b'], 'string_agg', '|')") shouldBe "a|b"
      one(engine, "list_aggregate([3, 1, 2], 'min')") shouldBe 1
      one(engine, "list_aggregate([3, 1, 2], 'max')") shouldBe 3
      one(engine, "list_aggregate([3, NULL, 2], 'count')") shouldBe 2
      the[Exception] thrownBy
        one(engine, "list_aggregate([1], 'median')") should have message
        "list_aggregate('median') is not supported " +
          "(supported: string_agg, min, max, count)"
      // polymorphic len/length: strings AND lists (DuckDB contract)
      one(engine, "len('abcd')") shouldBe 4
      one(engine, "len([10, 20, 30])") shouldBe 3
      one(engine, "length([10, 20])") shouldBe 2
      one(engine, "length('ab')") shouldBe 2
      // string_split quotes its LITERAL separator (DuckDB is not regex)
      one(engine, "string_split('a.b.c', '.')") shouldBe Seq("a", "b", "c")
      one(engine, "string_split_regex('a1b22c', '[0-9]+')") shouldBe
        Seq("a", "b", "c")
      // 1-based extract / slice / position
      one(engine, "list_extract([10, 20, 30], 2)") shouldBe 20
      one(engine, "list_slice([1, 2, 3, 4], 2, 3)") shouldBe Seq(2, 3)
      one(engine, "list_position([10, 20], 20)") shouldBe 2L
      one(engine, "list_position([10, 20], 99)") shouldBe 0L
      // list_distinct drops NULLs (DuckDB); list_unique counts them out
      one(engine, "list_sort(list_distinct([2, 2, NULL, 1]))") shouldBe
        Seq(1, 2)
      one(engine, "list_unique([2, 2, NULL, 1])") shouldBe 2
      // array_to_string is NULL on an empty list (list_aggregate
      // string_agg semantics), where Spark's array_join returns ''
      one(engine, "array_to_string(['x', 'y'], '-')") shouldBe "x-y"
      one(engine, "array_to_string(list_filter([1], x -> x > 9), '-')")
        .asInstanceOf[AnyRef] shouldBe null
      // strftime %-token translation + epoch_ms both directions
      one(engine,
        "strftime(TIMESTAMP '2024-02-29 13:05:09', '%Y-%m-%d %H:%M:%S')"
      ) shouldBe "2024-02-29 13:05:09"
      one(engine, "strftime(TIMESTAMP '2024-02-29 13:05:09', 'T=%-H')"
      ) shouldBe "T=13"
      one(engine, "epoch_ms(TIMESTAMP '1970-01-01 00:00:01')") shouldBe 1000L
      one(engine,
        "strftime(epoch_ms(1000), '%Y-%m-%d %H:%M:%S')"
      ) shouldBe "1970-01-01 00:00:01"
      one(engine, "epoch(TIMESTAMP '1970-01-02 00:00:00')") shouldBe 86400L
      one(engine, "strlen('héllo')") shouldBe 6 // BYTES, not chars
      one(engine, "strpos('hello', 'll')") shouldBe 3
    } finally engine.close()
  }

  test("struct_pack := syntax and the json arrow operators run through " +
      "the dialect front door") {
    val engine = new Engine(spark)
    try {
      one(engine, "struct_pack(a := 1, b := 'x').b") shouldBe "x"
      one(engine, "struct_pack(o := struct_pack(i := 7)).o.i") shouldBe 7
      // -> keeps JSON text (strings stay quoted), ->> unquotes
      one(engine, """'{"k": "v"}' -> 'k'""") shouldBe "\"v\""
      one(engine, """'{"k": "v"}' ->> 'k'""") shouldBe "v"
      one(engine, """'{"a": {"b": [1, 2, 3]}}' -> 'a' ->> '$.b[2]'""") shouldBe "3"
      one(engine, """'[10, 20]' ->> 1""") shouldBe "20"
      one(engine, """'{"a": 1}' ->> 'missing'""")
        .asInstanceOf[AnyRef] shouldBe null
      one(engine, """json_extract('{"n": 1.5}', '$.n')""") shouldBe "1.5"
      one(engine, """json_extract_string('{"o": {"x": 1}}', 'o')""") shouldBe
        """{"x":1}"""
      // lambda arrows inside higher-order calls are NOT json arrows
      one(engine, "transform(array(1, 2), x -> x + 1)") shouldBe Seq(2, 3)
      // DuckDB-spelled lambdas in the aliased HOF names too
      one(engine, "list_transform(['a'], w -> upper(w))") shouldBe Seq("A")
    } finally engine.close()
  }

  test("rewriteArrows/rewriteStructPack text forms: chains, literals, " +
      "non-literal right sides pass through") {
    import SqlScan.{rewriteArrows, rewriteStructPack}
    rewriteArrows("SELECT j -> 'a' FROM t") shouldBe
      "SELECT json_extract(j, 'a') FROM t"
    rewriteArrows("SELECT j ->> '$.a[0]' FROM t") shouldBe
      "SELECT json_extract_string(j, '$.a[0]') FROM t"
    rewriteArrows("j -> 'a' ->> 'b'") shouldBe
      "json_extract_string(json_extract(j, 'a'), 'b')"
    rewriteArrows("f(x) -> 0") shouldBe "json_extract(f(x), 0)"
    // lambda context: arrows at the direct argument level of a HOF stay
    rewriteArrows("transform(l, x -> x + 1)") shouldBe
      "transform(l, x -> x + 1)"
    rewriteArrows("zip_with(a, b, (x, y) -> x + y)") shouldBe
      "zip_with(a, b, (x, y) -> x + y)"
    // a json arrow in a lambda body is forced by parenthesizing
    rewriteArrows("transform(l, x -> (x ->> 'k'))") shouldBe
      "transform(l, x -> (json_extract_string(x, 'k')))"
    // non-literal right side: untouched (fails at parse, never misread)
    rewriteArrows("a -> b") shouldBe "a -> b"
    // quoted content is inert
    rewriteArrows("SELECT '->' AS lit") shouldBe "SELECT '->' AS lit"
    rewriteStructPack("struct_pack(a := 1, b := f(x))") shouldBe
      "named_struct('a', 1, 'b', f(x))"
    rewriteStructPack("struct_pack(o := struct_pack(i := 1))") shouldBe
      "named_struct('o', named_struct('i', 1))"
    rewriteStructPack("SELECT 'struct_pack(a := 1)' AS lit") shouldBe
      "SELECT 'struct_pack(a := 1)' AS lit"
    an[IllegalArgumentException] should be thrownBy
      rewriteStructPack("struct_pack(1, 2)")
  }

  test("DuckDB temporal + json names: date_diff boundary semantics, " +
      "time_bucket, dayname, printf, json_object/type/valid/keys") {
    val engine = new Engine(spark)
    try {
      // BOUNDARY semantics (DuckDB): every pair below crosses exactly one
      // part boundary although the elapsed time is under one unit
      one(engine,
        "date_diff('year', DATE '2024-12-31', DATE '2025-01-01')") shouldBe 1L
      one(engine,
        "date_diff('month', DATE '2024-01-31', DATE '2024-02-01')") shouldBe 1L
      one(engine, // 2024-01-07 is a Sunday, 01-08 the next ISO Monday
        "date_diff('week', DATE '2024-01-07', DATE '2024-01-08')") shouldBe 1L
      one(engine, "date_diff('day', TIMESTAMP '2024-01-01 23:59:59', " +
        "TIMESTAMP '2024-01-02 00:00:01')") shouldBe 1L
      one(engine, "datediff('hour', TIMESTAMP '2024-01-01 00:59:59', " +
        "TIMESTAMP '2024-01-01 01:00:01')") shouldBe 1L
      one(engine, "date_diff('second', TIMESTAMP '2024-01-01 00:00:00.9'," +
        " TIMESTAMP '2024-01-01 00:00:01.1')") shouldBe 1L
      // signed: reversed order is negative (calendar arithmetic)
      one(engine, "date_diff('month', DATE '2025-03-01', " +
        "DATE '2024-01-15')") shouldBe -14L
      // Spark's own 2-arg datediff stays intact (parser-owned)
      one(engine,
        "datediff(DATE '2024-01-03', DATE '2024-01-01')") shouldBe 2
      // quarter part + unsupported part rejects loudly
      one(engine, "date_diff('quarter', DATE '2024-01-15', " +
        "DATE '2024-10-01')") shouldBe 3L
      an[Exception] should be thrownBy
        one(engine, "date_diff('decade', DATE '2000-01-01', DATE '2024-01-01')")
      one(engine, "dayname(DATE '2024-01-01')") shouldBe "Monday"
      one(engine, "monthname(DATE '2024-02-10')") shouldBe "February"
      one(engine, "CAST(time_bucket(INTERVAL '15 minutes', " +
        "TIMESTAMP '2024-01-01 00:37:11') AS STRING)") shouldBe
        "2024-01-01 00:30:00"
      an[Exception] should be thrownBy // calendar widths reject
        one(engine, "time_bucket(INTERVAL '2 days', TIMESTAMP '2024-01-01 00:00:00')")
      one(engine, "printf('%s=%d', 'x', 42)") shouldBe "x=42"
      one(engine, "starts_with('hello', 'he')") shouldBe true
      one(engine, "ends_with('hello', 'lo')") shouldBe true
      one(engine, """json_object('a', 1, 'b', 'two')""") shouldBe
        """{"a":1,"b":"two"}"""
      one(engine, "json_array(1, 2)") shouldBe "[1,2]"
      one(engine, """json_valid('{"a":1}')""") shouldBe true
      one(engine, "json_valid('nope')") shouldBe false
      one(engine, """json_type('{"a":1}')""") shouldBe "OBJECT"
      one(engine, """json_type('{"a":1}', 'a')""") shouldBe "UBIGINT"
      one(engine, """json_type('{"a":-1}', 'a')""") shouldBe "BIGINT"
      one(engine, "json_type('[1]')") shouldBe "ARRAY"
      one(engine, "json_type('1.5')") shouldBe "DOUBLE"
      one(engine, """json_keys('{"b":1,"a":2}')""") shouldBe Seq("b", "a")
    } finally engine.close()
  }

  test("DuckDB regexp_replace first-match default, list_sort NULLS LAST " +
      "default, list_reduce, unnest, array_agg (wave 3)") {
    val engine = new Engine(spark)
    try {
      // FIRST match by default; 'g' = all; 'i' case-insensitive; \N refs
      one(engine, "regexp_replace('aaa', 'a', 'b')") shouldBe "baa"
      one(engine, "regexp_replace('aaa', 'a', 'b', 'g')") shouldBe "bbb"
      one(engine, "regexp_replace('srcX', 'SRC', '#', 'i')") shouldBe "#X"
      one(engine,
        """regexp_replace('ab12cd', '([a-z])(\d)', '\2\1')""") shouldBe
        "a1b2cd"
      one(engine, "regexp_replace('a$b', 'x', 'y')") shouldBe "a$b"
      one(engine, "regexp_replace('ab', 'b', 'c$')") shouldBe "ac$"
      an[Exception] should be thrownBy
        one(engine, "regexp_replace('a', 'a', 'b', 'z')")
      // NULLS LAST default (DuckDB 1.0 null_order), explicit variants
      one(engine, "list_sort([3, 1, NULL, 2])") shouldBe Seq(1, 2, 3, null)
      one(engine, "list_sort([3, 1, NULL, 2], 'DESC')") shouldBe
        Seq(3, 2, 1, null)
      one(engine,
        "list_sort([3, 1, NULL, 2], 'ASC', 'NULLS FIRST')") shouldBe
        Seq(null, 1, 2, 3)
      one(engine,
        "list_sort([3, 1, NULL, 2], 'DESC', 'NULLS FIRST')") shouldBe
        Seq(null, 3, 2, 1)
      one(engine, "list_reverse_sort([3, 1, NULL, 2])") shouldBe
        Seq(3, 2, 1, null)
      // seeded fold: first element is the init, empty -> NULL (lenient)
      one(engine,
        "list_reduce(['x', 'y', 'z'], (a, b) -> a || '>' || b)") shouldBe
        "x>y>z"
      one(engine, "list_reduce([7], (a, b) -> a + b)") shouldBe 7
      one(engine, "list_reduce([1, 2, 3, 4], (a, b) -> a + b)") shouldBe 10
      // unnest flattens one level in a select list (explode)
      engine.sql("SELECT unnest([10, 20, 30]) AS u").collect()
        .map(_.getInt(0)).toSeq shouldBe Seq(10, 20, 30)
      // array_agg == collect_list
      engine.sql("SELECT array_to_string(list_sort(array_agg(c)), ',') " +
        "AS s FROM (SELECT 'b' AS c UNION ALL SELECT 'a') t")
        .collect().head.getString(0) shouldBe "a,b"
    } finally engine.close()
  }

  test("rewriteRawBackslashes: raw literal semantics with '' doubling " +
      "intact; identifiers/comments untouched") {
    import SqlScan.rewriteRawBackslashes
    rewriteRawBackslashes("""SELECT '\d+'""") shouldBe """SELECT '\\d+'"""
    rewriteRawBackslashes("""SELECT '\\d'""") shouldBe """SELECT '\\\\d'"""
    // '' doubling passes through (each segment scanned independently)
    rewriteRawBackslashes("""SELECT 'it''s \a'""") shouldBe
      """SELECT 'it''s \\a'"""
    rewriteRawBackslashes("SELECT `a\\b`") shouldBe "SELECT `a\\b`"
    rewriteRawBackslashes("SELECT 1 -- \\d comment") shouldBe
      "SELECT 1 -- \\d comment"
    // engine e2e: a DuckDB-pasted regex with \d means backslash-d
    val engine = new Engine(spark)
    try {
      one(engine, """regexp_replace('src10', '\d+', '#')""") shouldBe "src#"
      one(engine, """'a1b' LIKE '%1%' AND 'a1b' RLIKE '\d'""") shouldBe true
    } finally engine.close()
  }

  test("rewriteDateDiff renames only the quoted-part form") {
    import SqlScan.rewriteDateDiff
    rewriteDateDiff("SELECT date_diff('day', a, b)") shouldBe
      "SELECT graft_date_diff('day', a, b)"
    rewriteDateDiff("SELECT datediff('hour', a, b)") shouldBe
      "SELECT graft_date_diff('hour', a, b)"
    // unquoted Spark unit form stays parser-owned
    rewriteDateDiff("SELECT date_diff(DAY, a, b)") shouldBe
      "SELECT date_diff(DAY, a, b)"
    rewriteDateDiff("SELECT datediff(a, b)") shouldBe
      "SELECT datediff(a, b)"
    // quoted occurrences inside string literals are inert
    rewriteDateDiff("SELECT 'date_diff(''day'', x, y)'") shouldBe
      "SELECT 'date_diff(''day'', x, y)'"
  }

  test("r12 advice fixes: regexp_matches options, group_concat default " +
      "separator, NULL-preserving array_agg/list, pre-1970 floor " +
      "boundaries, lambda-taking reduce aliases in hofNames") {
    val engine = new Engine(spark)
    try {
      // regexp_matches options argument (was silently dropped)
      one(engine, "regexp_matches('ABC', 'abc')") shouldBe false
      one(engine, "regexp_matches('ABC', 'abc', 'i')") shouldBe true
      one(engine, "regexp_matches('abc', 'a.c', 'l')") shouldBe false
      one(engine, "regexp_matches('a.c', 'a.c', 'l')") shouldBe true
      an[Exception] should be thrownBy
        one(engine, "regexp_matches('a', 'a', 'z')")
      // 1-arg group_concat defaults the separator to ',' like DuckDB
      engine.sql("SELECT group_concat(c) AS v FROM " +
        "(SELECT 'a' AS c UNION ALL SELECT 'a') t")
        .collect().head.getString(0) shouldBe "a,a"
      // array_agg / list keep NULL input elements (DuckDB semantics)
      engine.sql("SELECT len(array_agg(c)) AS v FROM " +
        "(SELECT 1 AS c UNION ALL SELECT NULL) t")
        .collect().head.getInt(0) shouldBe 2
      engine.sql("SELECT list_sort(list(c)) AS v FROM " +
        "(SELECT 2 AS c UNION ALL SELECT NULL UNION ALL SELECT 1) t")
        .collect().head.getSeq[Any](0) shouldBe Seq(1, 2, null)
      // pre-1970: floor division lands negative epochs in the right
      // boundary bucket (truncation toward zero would say 0 here)
      one(engine, "date_diff('hour', TIMESTAMP '1969-12-31 23:30:00', " +
        "TIMESTAMP '1970-01-01 00:30:00')") shouldBe 1L
      one(engine, "date_diff('minute', TIMESTAMP '1969-12-31 23:59:30', " +
        "TIMESTAMP '1970-01-01 00:00:30')") shouldBe 1L
      one(engine, "date_diff('week', DATE '1969-12-28', " +
        "DATE '1969-12-29')") shouldBe 1L // Sunday -> Monday
      one(engine, "CAST(time_bucket(INTERVAL '1 hour', " +
        "TIMESTAMP '1969-12-31 23:30:00') AS STRING)") shouldBe
        "1969-12-31 23:00:00"
      // a lambda body starting with a string literal inside the reduce
      // aliases must not be misread as a JSON arrow (hofNames fix)
      one(engine, "list_reduce(['a', 'b'], (a, b) -> '>' || b)") shouldBe
        ">b"
    } finally engine.close()
  }

  test("wave 4: string similarity names (byte semantics), list_zip, " +
      "map_from_entries/cardinality, vector-distance names — values " +
      "pinned against the oracle DuckDB") {
    val engine = new Engine(spark)
    try {
      one(engine, "jaccard('duck', 'luck')") shouldBe 0.6
      one(engine, "jaccard('aaa', 'a')") shouldBe 1.0 // set-based
      one(engine, "jaccard('ab', 'AB')") shouldBe 0.0 // case-sensitive
      an[Exception] should be thrownBy one(engine, "jaccard('', 'a')")
      one(engine, "hamming('duck', 'luck')") shouldBe 1L
      one(engine, "mismatches('abcd', 'abdd')") shouldBe 1L
      an[Exception] should be thrownBy one(engine, "hamming('ab', 'abc')")
      // FULL Damerau-Levenshtein (CA->ABC=2; OSA would say 3); bytes
      // (two 3-byte chars transposed = 4 byte edits, oracle-pinned)
      one(engine, "damerau_levenshtein('CA', 'ABC')") shouldBe 2L
      one(engine, "damerau_levenshtein('ab', 'ba')") shouldBe 1L
      one(engine, "damerau_levenshtein('', 'abc')") shouldBe 3L
      one(engine, "damerau_levenshtein('a cat', 'an abct')") shouldBe 3L
      one(engine, "damerau_levenshtein('日本', '本日')") shouldBe 4L
      one(engine, "editdist3('kitten', 'sitting')") shouldBe 3
      // jaro: DuckDB returns 0.0 for ANY empty input (incl. both)
      one(engine, "round(jaro_similarity('MARTHA', 'MARHTA'), 6)"
        ) shouldBe 0.944444
      one(engine, "round(jaro_similarity('DIXON', 'DICKSONX'), 6)"
        ) shouldBe 0.766667
      one(engine, "jaro_similarity('', '')") shouldBe 0.0
      one(engine, "jaro_similarity('a', 'a')") shouldBe 1.0
      one(engine, "round(jaro_winkler_similarity('MARTHA', 'MARHTA'), 6)"
        ) shouldBe 0.961111
      one(engine, "jaro_winkler_similarity('aaaaaaaaaa', 'aaaaaaaaab')"
        ) shouldBe 0.96 // prefix cap 4
      // boost only above the 0.7 threshold (oracle-pinned)
      one(engine, "round(jaro_winkler_similarity('abqqqqqqqq', " +
        "'abzzzzzzzz'), 6)") shouldBe 0.466667
      // list_zip: pads to longest with NULLs; literal true truncates
      engine.sql("SELECT list_zip([1, 2], ['a']) AS v").collect().head
        .getSeq[org.apache.spark.sql.Row](0).map(r =>
          (r.get(0), r.get(1))) shouldBe Seq((1, "a"), (2, null))
      engine.sql("SELECT list_zip([1, 2], ['a'], true) AS v").collect()
        .head.getSeq[org.apache.spark.sql.Row](0).length shouldBe 1
      one(engine, "len(list_zip([1, 2, 3]))") shouldBe 3
      one(engine, "len(list_zip([1, 2], ['a', 'b'], [true]))") shouldBe 2
      // map_from_entries over zipped structs; cardinality
      one(engine, "cardinality(map_from_entries(" +
        "list_zip(['a', 'b'], [1, 2])))") shouldBe 2
      // vector-distance names ride the s-suite codegen'd expressions
      one(engine, "round(array_cosine_similarity([1.0, 2.0], " +
        "[2.0, 4.0]), 6)") shouldBe 1.0
      one(engine, "list_inner_product([1.0, 2.0], [3.0, 4.0])"
        ) shouldBe 11.0
      one(engine, "array_distance([1.0, 2.0], [4.0, 6.0])") shouldBe 5.0
      one(engine, "list_distance([1, 2], [4, 6])") shouldBe 5.0
    } finally engine.close()
  }

  test("ATTACH/DETACH/USE: directory-of-parquet databases — qualified " +
      "refs, default-db fallback, session shadowing, loud errors (r13)") {
    val engine = new Engine(spark)
    try {
      val dir = "/root/testdata/sf0.001"
      engine.sql(s"ATTACH '$dir' AS extdb (READ_ONLY)")
      // qualified refs rewrite before Spark ever sees the name
      engine.sql("SELECT count(*) AS n FROM extdb.region")
        .collect().head.getLong(0) shouldBe 5L
      engine.sql("SELECT count(*) AS n FROM extdb.nation n " +
        "JOIN extdb.region r ON n.n_regionkey = r.r_regionkey")
        .collect().head.getLong(0) shouldBe 25L
      // duplicate attach: IF NOT EXISTS tolerated, plain form throws
      engine.sql(s"ATTACH IF NOT EXISTS '$dir' AS extdb")
      an[Exception] should be thrownBy engine.sql(s"ATTACH '$dir' AS extdb")
      // unknown table in an attached db fails loudly with the path
      an[Exception] should be thrownBy
        engine.sql("SELECT * FROM extdb.no_such_table")
      // non-directory path rejected (native .duckdb files unsupported)
      an[Exception] should be thrownBy
        engine.sql(s"ATTACH '$dir/region.parquet' AS bad")
      // USE: unqualified fallback (probe table name can't be shadowed)
      val tmp = java.nio.file.Files.createTempDirectory("graft-attach-db")
      spark.range(7).toDF("v").write
        .parquet(s"$tmp/attach_probe_t.parquet")
      engine.sql(s"ATTACH '$tmp' AS extdb2")
      engine.sql("USE extdb2")
      engine.sql("SELECT count(*) AS n FROM attach_probe_t")
        .collect().head.getLong(0) shouldBe 7L
      // a session table SHADOWS the attached default db
      engine.sql(
        "CREATE OR REPLACE TABLE attach_probe_t AS SELECT 1 AS v")
      engine.sql("SELECT count(*) AS n FROM attach_probe_t")
        .collect().head.getLong(0) shouldBe 1L
      engine.sql("DROP TABLE attach_probe_t")
      // the current default cannot detach; unknown USE is loud
      an[Exception] should be thrownBy engine.sql("DETACH extdb2")
      an[Exception] should be thrownBy engine.sql("USE ghost_db")
      engine.sql("USE memory")
      engine.sql("DETACH extdb2")
      engine.sql("DETACH extdb")
      engine.sql("DETACH IF EXISTS extdb") // idempotent with IF EXISTS
      an[Exception] should be thrownBy engine.sql("DETACH extdb")
      // after detach the qualified name no longer resolves
      an[Exception] should be thrownBy
        engine.sql("SELECT count(*) AS n FROM extdb.region").collect()
    } finally engine.close()
  }

  test("dialect tail: INSERT DEFAULT VALUES, row-form UPDATE SET, " +
      "FROM-first CTAS (r12)") {
    val engine = new Engine(spark)
    try {
      engine.sql("CREATE OR REPLACE TABLE tail_t AS SELECT 1 AS a, 'x' AS b")
      // FROM-first CTAS spelling
      engine.sql("CREATE OR REPLACE TABLE tail_c AS FROM tail_t")
      engine.sql("SELECT * FROM tail_c").collect().length shouldBe 1
      // DEFAULT VALUES: engine tables declare no DEFAULTs -> all NULL
      engine.sql("INSERT INTO tail_t DEFAULT VALUES")
        .collect().head.getLong(0) shouldBe 1L
      engine.sql("SELECT count(*) AS n FROM tail_t WHERE a IS NULL " +
        "AND b IS NULL").collect().head.getLong(0) shouldBe 1L
      // row-form SET expands positionally; WHERE still applies
      engine.sql("UPDATE tail_t SET (a, b) = (a + 10, 'y') WHERE a = 1")
      engine.sql("SELECT a, b FROM tail_t WHERE a = 11")
        .collect().head.getString(1) shouldBe "y"
      // loud rejects: arity mismatch and row subquery
      an[IllegalArgumentException] should be thrownBy
        engine.sql("UPDATE tail_t SET (a, b) = (1) WHERE a = 11")
      an[IllegalArgumentException] should be thrownBy
        engine.sql(
          "UPDATE tail_t SET (a, b) = (SELECT 1, 'z') WHERE a = 11")
    } finally {
      engine.sql("DROP TABLE tail_t")
      engine.sql("DROP TABLE tail_c")
      engine.close()
    }
  }

  // --- wave-5 DuckDB names (r13; functions/DuckScalars, DuckListFns,
  // DuckAggs) — every value below was probed on the oracle DuckDB first

  test("wave 5: encoding/path/unicode scalar names — oracle-pinned") {
    val engine = new Engine(spark)
    try {
      one(engine, "to_hex(255)") shouldBe "FF"
      one(engine, "to_hex(-1)") shouldBe "FFFFFFFFFFFFFFFF"
      one(engine, "to_hex(from_hex('616263'))") shouldBe "616263"
      one(engine, "to_base(255, 2)") shouldBe "11111111"
      one(engine, "to_base(255, 16, 10)") shouldBe "00000000FF"
      an[Exception] should be thrownBy one(engine, "to_base(-1, 16)")
      one(engine, "format_bytes(1023)") shouldBe "1023 bytes"
      one(engine, "format_bytes(1024)") shouldBe "1.0 KiB"
      one(engine, "format_bytes(1234567)") shouldBe "1.1 MiB"
      one(engine, "format_bytes(2096128)") shouldBe "1.9 MiB" // truncates
      one(engine, "format_bytes(-1024)") shouldBe "-1.0 KiB"
      one(engine, "format_bytes(0)") shouldBe "0 bytes"
      one(engine, "format_bytes(1125899906842624)") shouldBe "1.0 PiB"
      // bar: eighth-block partials, space padding to WIDTH BYTES
      one(engine, "bar(5, 0, 10, 10)") shouldBe "\u2588" * 5
      one(engine, "bar(0, 0, 10, 10)") shouldBe " " * 10
      one(engine, "bar(2.5, 0, 10, 4)") shouldBe "\u2588 "
      one(engine, "bar(3.99, 0, 8, 4)") shouldBe "\u2588\u2589"
      one(engine, "bar(1, 0, 7, 3)") shouldBe "\u258d"
      one(engine, "bar(11, 0, 10, 10)") shouldBe "\u2588" * 10 // clamped
      one(engine, "ord('\u03bbx')") shouldBe 955
      one(engine, "unicode('')") shouldBe -1
      one(engine, "unicode('\u65e5\u672c')") shouldBe 26085
      one(engine, "strip_accents('m\u00fchleisen \u00e2\u00e9')"
        ) shouldBe "muhleisen ae"
      one(engine, "strip_accents('\u00df\u00f1\u00e7')") shouldBe "\u00dfnc"
      one(engine, "nfc_normalize('e\u0301')") shouldBe "\u00e9"
      // parse_* family: default separator splits BOTH slashes
      one(engine, "parse_path('/a//b/')") shouldBe Seq("/", "a", "b")
      one(engine, "parse_path('C:\\\\win\\\\x.txt')"
        ) shouldBe Seq("C:", "win", "x.txt")
      one(engine, "parse_dirname('/a/b/c.txt')") shouldBe "/"
      one(engine, "parse_dirname('rel/x.txt')") shouldBe "rel"
      one(engine, "parse_dirpath('/a/b/c.txt')") shouldBe "/a/b"
      one(engine, "parse_dirpath('/abs.txt')") shouldBe ""
      one(engine, "parse_filename('/a/b.tar.gz')") shouldBe "b.tar.gz"
      one(engine, "parse_filename('/a/b.tar.gz', true)") shouldBe "b.tar"
      one(engine, "parse_filename('/a/.hidden', true)") shouldBe ""
      one(engine, "parse_filename('noslash')") shouldBe "noslash"
    } finally engine.close()
  }

  test("wave 5: numeric/temporal scalar names — oracle-pinned") {
    val engine = new Engine(spark)
    try {
      one(engine, "even(2.5)") shouldBe 4.0
      one(engine, "even(-2.5)") shouldBe -4.0
      one(engine, "even(2)") shouldBe 2.0
      one(engine, "even(0.5)") shouldBe 2.0
      one(engine, "even(-3)") shouldBe -4.0
      one(engine, "signbit(-3.0)") shouldBe true
      one(engine, "signbit(4)") shouldBe false
      one(engine, "signbit(-exp(1000))") shouldBe true // -inf
      one(engine, "round(gamma(5), 6)") shouldBe 24.0
      one(engine, "round(gamma(0.5), 6)") shouldBe 1.772454
      one(engine, "round(gamma(-0.5), 6)") shouldBe -3.544908
      an[Exception] should be thrownBy one(engine, "gamma(0)")
      one(engine, "round(lgamma(5), 6)") shouldBe 3.178054
      one(engine, "round(lgamma(-0.5), 6)") shouldBe 1.265512
      one(engine, "nextafter(1.0, 2.0)") shouldBe 1.0000000000000002
      one(engine, "nextafter(0.0, 1.0)") shouldBe java.lang.Double.MIN_VALUE
      // fdiv/fmod: FLOORED division/modulo, NULL on zero divisor
      one(engine, "fdiv(7, 2)") shouldBe 3.0
      one(engine, "fdiv(-7, -2)") shouldBe 3.0
      one(engine, "fdiv(7, -2)") shouldBe -4.0
      one(engine, "fmod(-7.5, 2)") shouldBe 0.5
      one(engine, "fmod(7, -2)") shouldBe -1.0
      assert(one(engine, "fmod(7, 0)") == null)
      assert(one(engine, "fdiv(7, 0)") == null)
      one(engine, "gcd(12, 18)") shouldBe 6L
      one(engine, "gcd(-4, 6)") shouldBe 2L
      one(engine, "gcd(0, 0)") shouldBe 0L
      one(engine, "greatest_common_divisor(12, 18)") shouldBe 6L
      one(engine, "lcm(4, 6)") shouldBe 12L
      one(engine, "lcm(0, 5)") shouldBe 0L
      one(engine, "isfinite(1.0)") shouldBe true
      one(engine, "isfinite(exp(1000))") shouldBe false
      one(engine, "isfinite(DATE '2020-01-01')") shouldBe true
      one(engine, "isinf(exp(1000))") shouldBe true
      one(engine, "isinf(1.0)") shouldBe false
      one(engine, "xor(5, 3)") shouldBe 6
      // isodow Monday=1..Sunday=7; DuckDB dayofweek Sunday=0 (the Spark
      // builtin of the same name is Sunday=1 — renamed at the front door)
      one(engine, "isodow(DATE '2026-08-16')") shouldBe 7L // a Sunday
      one(engine, "dayofweek(DATE '2026-08-16')") shouldBe 0L
      one(engine, "dayofweek(DATE '2026-08-17')") shouldBe 1L
      one(engine, "julian(DATE '2000-01-01')") shouldBe 2451545.0
      one(engine, "julian(TIMESTAMP '2000-01-01 12:00:00')") shouldBe 2451545.5
      one(engine, "make_timestamp(1700000000000000)").toString should
        startWith("2023-11-14 22:13:20")
      one(engine, "make_timestamp(2023, 11, 14, 22, 13, 20.5)").toString should
        startWith("2023-11-14 22:13:20.5")
      one(engine, "(TIMESTAMP '2020-01-01 00:00:00' + to_days(3))").toString should
        startWith("2020-01-04")
      one(engine, "(TIMESTAMP '2020-01-01 00:00:00' + to_milliseconds(1500))"
        ).toString should startWith("2020-01-01 00:00:01.5")
      one(engine, "(TIMESTAMP '2020-01-01 00:00:00' + to_microseconds(250))"
        ).toString should include("00:00:00.00025")
      one(engine, "(DATE '2020-01-01' + to_months(3))").toString should
        startWith("2020-04-01")
    } finally engine.close()
  }

  test("wave 5: regexp tail — DuckDB default GROUP 0 for " +
      "regexp_extract(_all), options, name-list struct form, " +
      "full_match, escape") {
    val engine = new Engine(spark)
    try {
      // DuckDB default group is 0 = whole match (Spark builtin is 1)
      one(engine, "regexp_extract('abc123', '([a-z]+)(\\d+)')") shouldBe "abc123"
      one(engine, "regexp_extract('abc123', '([a-z]+)(\\d+)', 1)") shouldBe "abc"
      one(engine, "regexp_extract('abc123', '([a-z]+)(\\d+)', 2)") shouldBe "123"
      one(engine, "regexp_extract('abc', '(\\d)')") shouldBe "" // no match
      one(engine, "regexp_extract('A1', '[a-z]', 0, 'i')") shouldBe "A"
      // name-list form -> STRUCT
      engine.sql("SELECT regexp_extract('2023-08-15', '(\\d+)-(\\d+)', " +
        "['y', 'm']) AS v").collect().head.getStruct(0).toSeq shouldBe
        Seq("2023", "08")
      one(engine, "regexp_extract_all('a1b2', '([a-z])(\\d)')"
        ) shouldBe Seq("a1", "b2")
      one(engine, "regexp_extract_all('a1b2', '([a-z])(\\d)', 1)"
        ) shouldBe Seq("a", "b")
      one(engine, "regexp_extract_all('A1b2', '([a-z])', 1, 'i')"
        ) shouldBe Seq("A", "b")
      one(engine, "regexp_full_match('abc', '[a-c]+')") shouldBe true
      one(engine, "regexp_full_match('abcd', '[a-c]+')") shouldBe false
      one(engine, "regexp_full_match('ab', 'a.', 's')") shouldBe true
      one(engine, "regexp_escape('a.b*c')") shouldBe "a\\.b\\*c"
    } finally engine.close()
  }

  test("wave 5: list names — has_any/has_all NULL handling, intersect, " +
      "resize, select, where, grade_up, apply, range/generate_series") {
    val engine = new Engine(spark)
    try {
      one(engine, "list_has_any([1, 2], [2, 3])") shouldBe true
      one(engine, "list_has_any([1, NULL], [NULL])") shouldBe false
      one(engine, "list_has_any([], [])") shouldBe false
      one(engine, "list_has_all([1, 2, 3], [2, 3])") shouldBe true
      one(engine, "list_has_all([1], [1, NULL])") shouldBe true // NULLs skip
      one(engine, "list_has_all([1, 2], [])") shouldBe true
      one(engine, "list_sort(list_intersect([1, 2, 2, 3], [2, 3, 4]))"
        ) shouldBe Seq(2, 3)
      one(engine, "list_intersect([1, NULL, 2], [2, NULL, 3])") shouldBe Seq(2)
      one(engine, "list_resize([1, 2], 4)") shouldBe Seq(1, 2, null, null)
      one(engine, "list_resize([1, 2], 4, 0)") shouldBe Seq(1, 2, 0, 0)
      one(engine, "list_resize([1, 2, 3], 2)") shouldBe Seq(1, 2)
      one(engine, "list_resize([1, 2, 3], 0)") shouldBe Seq()
      one(engine, "list_select([10, 20, 30], [3, 1])") shouldBe Seq(30, 10)
      one(engine, "list_select([10, 20, 30], [4])") shouldBe Seq(null)
      one(engine, "list_select([10, 20, 30], [0])") shouldBe Seq(null)
      one(engine, "list_where([10, 20, 30], [true, false, true])"
        ) shouldBe Seq(10, 30)
      one(engine, "list_grade_up([3, 1, 3, NULL, 2])") shouldBe Seq(2, 5, 1, 3, 4)
      one(engine, "list_grade_up(['b', 'a'])") shouldBe Seq(2, 1)
      one(engine, "list_apply([1, 2], x -> x * 2)") shouldBe Seq(2, 4)
      one(engine, "apply([1, 2], x -> x + 1)") shouldBe Seq(2, 3)
      // range end-EXCLUSIVE, generate_series INCLUSIVE; direction guards
      one(engine, "range(5)") shouldBe Seq(0, 1, 2, 3, 4)
      one(engine, "range(2, 5)") shouldBe Seq(2, 3, 4)
      one(engine, "range(0, 10, 3)") shouldBe Seq(0, 3, 6, 9)
      one(engine, "range(5, 2, -1)") shouldBe Seq(5, 4, 3)
      one(engine, "range(5, 2)") shouldBe Seq()
      one(engine, "range(2, 2)") shouldBe Seq()
      one(engine, "range(0, 10, -1)") shouldBe Seq()
      one(engine, "range(0, 5, 0)") shouldBe Seq() // DuckDB 1.0 behavior
      assert(one(engine, "range(NULL, 5)") == null)
      one(engine, "generate_series(5)") shouldBe Seq(0, 1, 2, 3, 4, 5)
      one(engine, "generate_series(2, 5)") shouldBe Seq(2, 3, 4, 5)
      one(engine, "generate_series(0, 10, 3)") shouldBe Seq(0, 3, 6, 9)
      one(engine, "generate_series(5, 2, -1)") shouldBe Seq(5, 4, 3, 2)
      one(engine, "generate_series(5, 2)") shouldBe Seq()
    } finally engine.close()
  }

  test("wave 5: aggregate names — product, entropy, mad, quantile_cont/" +
      "disc/quantile — oracle-pinned incl. empty-group contracts") {
    val engine = new Engine(spark)
    try {
      val t = "(VALUES (1, 1.0, 'a'), (1, 2.0, 'a'), (1, 3.0, 'b'), " +
        "(1, 10.0, 'c'), (2, 2.0, 'x'), (2, NULL, 'x'), (2, 4.0, NULL)) " +
        "t(g, x, y)"
      val r = engine.sql(s"SELECT g, round(product(x), 6) AS p, " +
        s"round(entropy(y), 6) AS e, round(quantile_cont(x, 0.5), 6) AS qc, " +
        s"quantile_disc(x, 0.26) AS qd, quantile(x, 0.75) AS q3, " +
        s"round(mad(x), 6) AS md, quantile_disc(y, 0.5) AS qs " +
        s"FROM $t GROUP BY g ORDER BY g").collect()
      r(0).toSeq.drop(1) shouldBe Seq(60.0, 1.5, 2.5,
        java.math.BigDecimal.valueOf(2.0).setScale(1),
        java.math.BigDecimal.valueOf(3.0).setScale(1), 1.0, "a")
      r(1).toSeq.drop(1) shouldBe Seq(8.0, 0.0, 3.0,
        java.math.BigDecimal.valueOf(2.0).setScale(1),
        java.math.BigDecimal.valueOf(4.0).setScale(1), 1.0, "x")
      // empty-group contracts: product/mad/quantiles NULL, entropy 0.0
      val e = engine.sql("SELECT product(x) AS p, entropy(x) AS e, " +
        "mad(x) AS m, quantile_disc(x, 0.5) AS q FROM " +
        "(VALUES (1.0)) t(x) WHERE x < 0").collect().head
      e.isNullAt(0) shouldBe true
      e.getDouble(1) shouldBe 0.0
      e.isNullAt(2) shouldBe true
      e.isNullAt(3) shouldBe true
      // string median via quantile_disc
      one(engine, "(SELECT quantile_disc(s, 0.5) FROM (VALUES ('b'), " +
        "('a'), ('c')) t(s))") shouldBe "b"
      // quantile_cont array form rides Spark percentile
      one(engine, "(SELECT quantile_cont(v, [0.25, 0.5]) FROM (VALUES " +
        "(1.0), (2.0), (3.0)) t(v))") shouldBe Seq(1.5, 2.0)
    } finally engine.close()
  }
}
