package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-12 invariants: the gated-output scalar lint (VERDICT r11 task 2),
  * the q130/q131 scalar respell (task 1), the ADVICE SqlScan ARRAY fixes,
  * and transaction-scope write isolation on the shared engine. */
class NewOpsR12Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // --- task 2: Verify's gated-output lint -------------------------------

  test("assertScalarOutput rejects top-level ARRAY, MAP and STRUCT " +
      "columns and passes scalar frames") {
    val nestedArr = spark.sql("SELECT 1 AS a, array(1, 2) AS xs")
    val nestedMap = spark.sql("SELECT map('k', 1) AS m")
    val nestedStruct = spark.sql("SELECT named_struct('f', 1) AS s")
    val scalar = spark.sql(
      "SELECT 1 AS a, array_join(array('x', 'y'), '|') AS joined, " +
        "named_struct('f', 1).f AS field")
    an[IllegalStateException] should be thrownBy
      Verify.assertScalarOutput("t", nestedArr)
    an[IllegalStateException] should be thrownBy
      Verify.assertScalarOutput("t", nestedMap)
    an[IllegalStateException] should be thrownBy
      Verify.assertScalarOutput("t", nestedStruct)
    noException should be thrownBy Verify.assertScalarOutput("t", scalar)
    // and the message names the offending column
    val e = intercept[IllegalStateException](
      Verify.assertScalarOutput("bad_q", nestedArr))
    e.getMessage should include("bad_q")
    e.getMessage should include("xs")
  }

  test("every registered gated query name would pass the lint by schema " +
      "(q130/q131 respelled to scalars — the r11 reds)") {
    // full-surface run is the Verify/check gate; here pin the two
    // respelled queries' schemas directly
    for (name <- Seq("q130_list_comprehension", "q131_struct_literal")) {
      val df = SparkEntry.queries(name)(spark, sf)
      noException should be thrownBy Verify.assertScalarOutput(name, df)
    }
  }

  test("q130 respell still exercises the bracket rewrites and flattens " +
      "every element in order") {
    val rows = SparkEntry.queries("q130_list_comprehension")(spark, sf)
      .collect()
    rows.length should be > 0
    // independent recompute of the flattened comprehension
    val byId = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[String]("source"))).toMap
    byId should not be empty
    rows.foreach { r =>
      val (text, source) = byId(r.getAs[Long]("doc_id"))
      val words = text.split(" ", -1).filter(_.length >= 7)
      r.getAs[String]("big_words") shouldBe
        words.map(_.toUpperCase).mkString("|")
      r.getAs[Long]("n_big") shouldBe words.length.toLong
      r.getAs[String]("lit_pair") shouldBe s"one|$source"
    }
  }

  test("q131 respell projects every struct-literal field as a scalar") {
    val byId = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[String]("source"))).toMap
    val rows = SparkEntry.queries("q131_struct_literal")(spark, sf)
      .collect()
    rows.length shouldBe byId.size
    rows.foreach { r =>
      val (text, source) = byId(r.getAs[Long]("doc_id"))
      r.getAs[String]("meta_src") shouldBe source
      r.getAs[Long]("meta_len") shouldBe text.length.toLong
      r.getAs[Long]("meta_half") shouldBe (text.length / 2).toLong
      r.getAs[Long]("lit_len") shouldBe text.length.toLong
    }
  }

  // --- ADVICE: rewriteBrackets ARRAY keyword edge cases ------------------

  test("rewriteBrackets: qualified path ending in 'array' is a subscript " +
      "on a field named array, not the constructor") {
    import SqlScan.rewriteBrackets
    rewriteBrackets("SELECT t.array[1] FROM t") shouldBe
      "SELECT t.array[1] FROM t"
    rewriteBrackets("SELECT a.b.array[2] FROM t") shouldBe
      "SELECT a.b.array[2] FROM t"
    // the unqualified constructor still lowers
    rewriteBrackets("SELECT ARRAY[1, 2] AS l") shouldBe
      "SELECT array(1, 2) AS l"
  }

  test("rewriteBrackets: ARRAY with whitespace before '[' is the " +
      "constructor (valid DuckDB), qualified + whitespace stays subscript") {
    import SqlScan.rewriteBrackets
    rewriteBrackets("SELECT ARRAY [1, 2] AS l") shouldBe
      "SELECT array(1, 2) AS l"
    rewriteBrackets("SELECT array\n  [1, 2] AS l") shouldBe
      "SELECT array(1, 2) AS l"
    // a bare list literal after a non-array token is untouched semantics
    rewriteBrackets("SELECT [1, 2] AS l") shouldBe
      "SELECT array(1, 2) AS l"
    // qualified path + whitespace: DuckDB would read t.array [1] as a
    // subscript too (identifier then index) — keep it a subscript
    rewriteBrackets("SELECT t.array [1] FROM t") shouldBe
      "SELECT t.array [1] FROM t"
  }

  test("the engine runs the whitespace ARRAY constructor and a column " +
      "named array end-to-end") {
    val eng = new Engine(spark)
    try {
      eng.sql("CREATE OR REPLACE TABLE arr_t AS " +
        "SELECT ARRAY [10, 20, 30] AS array")
      // t.array[1] must SUBSCRIPT the column named array (plain
      // subscripts keep Spark's 0-based element access — the pinned
      // engine semantics, NewOpsR11Spec), not rewrite to a call t.array(1)
      val v = eng.sql("SELECT arr_t.array[1] AS second FROM arr_t")
        .collect().head.getInt(0)
      v shouldBe 20
    } finally {
      eng.sql("DROP TABLE arr_t")
      eng.close()
    }
  }

  // --- ADVICE medium: transaction-scope write isolation -------------------

  test("a foreign thread's DML during an open transaction is rejected " +
      "loudly, not silently captured in the owner's undo scope") {
    val eng = new Engine(spark)
    try {
      eng.sql("CREATE OR REPLACE TABLE txn_iso(v INT)")
      eng.sql("INSERT INTO txn_iso VALUES (1)")
      eng.sql("BEGIN")
      eng.sql("INSERT INTO txn_iso VALUES (2)") // owner's own DML passes
      @volatile var foreign: Throwable = null
      val t = new Thread(() =>
        try eng.sql("INSERT INTO txn_iso VALUES (99)")
        catch { case e: Throwable => foreign = e })
      t.start(); t.join(30000)
      foreign should not be null
      foreign.getMessage should include("transaction opened by another")
      eng.sql("ROLLBACK")
      // rollback restores the pre-BEGIN single row; 99 never landed
      val vs = eng.sql("SELECT v FROM txn_iso ORDER BY v").collect()
        .map(_.getInt(0)).toSeq
      vs shouldBe Seq(1)
    } finally {
      eng.sql("DROP TABLE txn_iso")
      eng.close()
    }
  }

  test("COMMIT/ROLLBACK stay engine-global (a wedged transaction is " +
      "recoverable from any thread) and reads never block on a txn") {
    val eng = new Engine(spark)
    try {
      eng.sql("CREATE OR REPLACE TABLE txn_rec(v INT)")
      eng.sql("BEGIN")
      eng.sql("INSERT INTO txn_rec VALUES (7)")
      // foreign reads see the engine's current published state
      @volatile var read: Long = -1
      val r = new Thread(() =>
        read = eng.sql("SELECT count(*) AS n FROM txn_rec")
          .collect().head.getLong(0))
      r.start(); r.join(30000)
      read shouldBe 1L
      // foreign COMMIT unwedges
      @volatile var err: Throwable = null
      val c = new Thread(() =>
        try eng.sql("COMMIT") catch { case e: Throwable => err = e })
      c.start(); c.join(30000)
      err shouldBe null
      // committed: the row survives and new DML from any thread passes
      eng.sql("INSERT INTO txn_rec VALUES (8)")
      eng.sql("SELECT count(*) AS n FROM txn_rec")
        .collect().head.getLong(0) shouldBe 2L
    } finally {
      eng.sql("DROP TABLE txn_rec")
      eng.close()
    }
  }
}
