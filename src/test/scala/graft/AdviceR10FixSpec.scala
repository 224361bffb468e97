package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-11 regression specs for the round-10 ADVICE findings plus the
  * VERDICT task-7 dialect-tail sweep: the parenthesized INSERT source
  * (`INSERT INTO t [BY NAME] (SELECT ...)` — DuckDB's canonical spelling),
  * FLOAT-typed variable splice width, the bare `DESCRIBE <table>` /
  * `DESCRIBE <query>` statement forms, and the opaque-scanner composition
  * decoys (getvariable/nextval text inside dollar-quoted literals). */
class AdviceR10FixSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("INSERT INTO t BY NAME (SELECT ...) — the parenthesized source " +
      "form — binds by name exactly like the bare spelling") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE bnp (a BIGINT, b VARCHAR, c DOUBLE)")
      e.sql("INSERT INTO bnp BY NAME (SELECT 2.5 AS c, 11 AS a)")
      val r = e.sql("SELECT a, b, c FROM bnp").collect()(0)
      r.getLong(0) shouldBe 11L
      r.isNullAt(1) shouldBe true
      r.getDouble(2) shouldBe 2.5
      // a paren inside a string literal in the source must not confuse
      // the balance scan
      e.sql("INSERT INTO bnp BY NAME (SELECT ')(' AS b, 12 AS a)")
      e.sql("SELECT b FROM bnp WHERE a = 12").collect()(0)
        .getString(0) shouldBe ")("
      e.sql("DROP TABLE bnp")
    } finally e.close()
  }

  test("INSERT INTO t (SELECT ...) — parenthesized source without BY NAME " +
      "— is positional insert, not a column list") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE pp (x BIGINT, y VARCHAR)")
      e.sql("INSERT INTO pp (SELECT 5, 'five')")
      val r = e.sql("SELECT x, y FROM pp").collect()(0)
      r.getLong(0) shouldBe 5L
      r.getString(1) shouldBe "five"
      // VALUES source, parenthesized
      e.sql("INSERT INTO pp (VALUES (6, 'six'), (7, 'seven'))")
      e.sql("SELECT COUNT(*) c FROM pp").collect()(0).getLong(0) shouldBe 3L
      // an actual column list still parses as a column list
      e.sql("INSERT INTO pp (y, x) SELECT 'eight', 8")
      e.sql("SELECT y FROM pp WHERE x = 8").collect()(0)
        .getString(0) shouldBe "eight"
      e.sql("DROP TABLE pp")
    } finally e.close()
  }

  test("parenthesized INSERT source composes with trailing RETURNING and " +
      "ON CONFLICT clauses (they splice back at top level)") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE pr (k BIGINT PRIMARY KEY, v VARCHAR)")
      val ret = e.sql(
        "INSERT INTO pr (SELECT 1, 'a') RETURNING k, upper(v) AS uv").collect()
      ret.length shouldBe 1
      ret(0).getLong(0) shouldBe 1L
      ret(0).getString(1) shouldBe "A"
      e.sql("INSERT INTO pr (SELECT 1, 'b') " +
        "ON CONFLICT (k) DO UPDATE SET v = excluded.v")
      e.sql("SELECT v FROM pr WHERE k = 1").collect()(0)
        .getString(0) shouldBe "b"
      // unbalanced paren fails loudly, not with a misparse
      intercept[Exception](e.sql("INSERT INTO pr (SELECT 2, 'c'"))
        .getMessage should include("unbalanced")
      e.sql("DROP TABLE pr")
    } finally e.close()
  }

  test("a FLOAT-typed variable splices back as FLOAT, not DOUBLE " +
      "(typed-literal splice contract)") {
    val e = new Engine(spark)
    try {
      e.sql("SET VARIABLE fv = CAST(1.5 AS FLOAT)")
      val df = e.sql("SELECT getvariable('fv') AS f")
      df.schema.head.dataType shouldBe org.apache.spark.sql.types.FloatType
      df.collect()(0).getFloat(0) shouldBe 1.5f
      // DOUBLE stays DOUBLE
      e.sql("SET VARIABLE dv = CAST(2.5 AS DOUBLE)")
      e.sql("SELECT getvariable('dv') AS d").schema.head.dataType shouldBe
        org.apache.spark.sql.types.DoubleType
      // FLOAT NaN round-trips at FLOAT width
      e.sql("SET VARIABLE fnan = CAST('NaN' AS FLOAT)")
      val nan = e.sql("SELECT getvariable('fnan') AS f")
      nan.schema.head.dataType shouldBe org.apache.spark.sql.types.FloatType
      nan.collect()(0).getFloat(0).isNaN shouldBe true
      e.sql("RESET VARIABLE fv")
      e.sql("RESET VARIABLE dv")
      e.sql("RESET VARIABLE fnan")
    } finally e.close()
  }

  test("bare DESCRIBE <table>, DESCRIBE 'file', and DESCRIBE <query> " +
      "route to the DuckDB-shaped describe (column_name/column_type/null)") {
    import spark.implicits._
    val e = new Engine(spark)
    try {
      Seq((1L, "a"), (2L, null.asInstanceOf[String]))
        .toDF("id", "tag").createOrReplaceTempView("desc_t")
      val bare = e.sql("DESCRIBE desc_t")
      bare.columns.toSeq shouldBe
        Seq("column_name", "column_type", "null", "key", "default", "extra")
      val byName = bare.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      byName("id") shouldBe "BIGINT"
      byName("tag") shouldBe "STRING"
      // DESC abbreviation and the TABLE keyword both route
      e.sql("DESC desc_t").collect().length shouldBe 2
      e.sql("DESCRIBE TABLE desc_t").columns.head shouldBe "column_name"
      // query form — the body goes through the full dialect (FROM-first too)
      val q = e.sql("DESCRIBE SELECT id + 1 AS nxt, upper(tag) AS u FROM desc_t")
        .collect().map(_.getString(0)).toSeq
      q shouldBe Seq("nxt", "u")
      e.sql("DESCRIBE FROM desc_t SELECT id").collect()
        .map(_.getString(0)).toSeq shouldBe Seq("id")
      // quoted file ref resolves through the engine's FROM-'file' sugar
      val dir = java.nio.file.Files.createTempDirectory("graft-desc").toString + "/t.parquet"
      Seq((1, 2.5)).toDF("k", "v").write.parquet(dir)
      val f = e.sql(s"DESCRIBE '$dir'").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      f("k") shouldBe "INT"
      f("v") shouldBe "DOUBLE"
      // Spark's own EXTENDED/FUNCTION spellings still pass through
      e.sql("DESCRIBE EXTENDED desc_t").columns.head shouldBe "col_name"
      e.sql("DESCRIBE FUNCTION abs").collect().length should be > 0
    } finally e.close()
  }

  test("decoy: getvariable/nextval text inside dollar-quoted and " +
      "single-quoted literals stays inert (the opaque scanners compose)") {
    val e = new Engine(spark)
    try {
      e.sql("SET VARIABLE dq = 99")
      // dollar-quoted literal carrying the exact call text
      e.sql("SELECT $$getvariable('dq')$$ AS s").collect()(0)
        .getString(0) shouldBe "getvariable('dq')"
      // single-quoted
      e.sql("SELECT 'getvariable(''dq'')' AS s").collect()(0)
        .getString(0) shouldBe "getvariable('dq')"
      // a REAL call next to a decoy literal: only the call splices
      val r = e.sql(
        "SELECT getvariable('dq') AS v, $$nextval('seq_decoy')$$ AS s")
        .collect()(0)
      r.getLong(0) shouldBe 99L
      r.getString(1) shouldBe "nextval('seq_decoy')"
      // nextval decoy must NOT create/advance any sequence state: a real
      // sequence then starts at its declared start
      e.sql("CREATE SEQUENCE seq_decoy START 5")
      e.sql("SELECT $$nextval('seq_decoy')$$ AS s").collect()(0)
        .getString(0) shouldBe "nextval('seq_decoy')"
      e.sql("SELECT nextval('seq_decoy') AS n").collect()(0)
        .getLong(0) shouldBe 5L
      e.sql("DROP SEQUENCE seq_decoy")
      e.sql("RESET VARIABLE dq")
    } finally e.close()
  }
}
