package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 wave-10 invariants: q128 SET VARIABLE / getvariable. */
class NewOpsR10jSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("variables splice as typed literals, string literals containing " +
      "the call text never rewrite, unset reads NULL, RESET unsets") {
    val e = new Engine(spark)
    try {
      e.sql("SET VARIABLE n = 41 + 1")
      e.sql("SELECT getvariable('n') AS v").collect()(0)
        .getLong(0) shouldBe 42L
      e.sql("SET VARIABLE s = 'it''s'")
      e.sql("SELECT getvariable('s') AS v").collect()(0)
        .getString(0) shouldBe "it's"
      e.sql("SET VARIABLE b = 1 = 1")
      e.sql("SELECT getvariable('b') AS v").collect()(0)
        .getBoolean(0) shouldBe true
      e.sql("SET VARIABLE f = CAST(1.5 AS DOUBLE)")
      // a variable can reference other variables at SET time (eager)
      e.sql("SET VARIABLE g = getvariable('f') * 2")
      e.sql("SELECT getvariable('g') AS v").collect()(0)
        .getDouble(0) shouldBe 3.0
      // bare decimal literals keep their DECIMAL type through the splice
      e.sql("SET VARIABLE dml = 1.5")
      e.sql("SELECT getvariable('dml') AS v").collect()(0)
        .getDecimal(0).doubleValue() shouldBe 1.5
      // decoy: the call text INSIDE a string literal must not rewrite
      e.sql("SELECT 'getvariable(''n'')' AS v").collect()(0)
        .getString(0) shouldBe "getvariable('n')"
      // unset -> NULL
      e.sql("SELECT getvariable('nope') AS v").collect()(0)
        .isNullAt(0) shouldBe true
      e.sql("RESET VARIABLE n")
      e.sql("SELECT getvariable('n') AS v").collect()(0)
        .isNullAt(0) shouldBe true
      // scalar-only: a multi-row value expression rejects
      intercept[Exception](e.sql(
        "SET VARIABLE bad = (x) FROM (VALUES (1), (2)) t(x)"))
      // PREPARE defers evaluation to EXECUTE (DuckDB semantics)
      e.sql("SET VARIABLE pv = 1")
      e.sql("PREPARE vp AS SELECT getvariable('pv') AS v")
      e.sql("SET VARIABLE pv = 2")
      e.sql("EXECUTE vp").collect()(0).getLong(0) shouldBe 2L
      e.sql("DEALLOCATE vp")
      // macro bodies resolve at CALL time, not definition time
      e.sql("CREATE OR REPLACE MACRO vplus(x) AS x + getvariable('pv')")
      e.sql("SET VARIABLE pv = 40")
      e.sql("SELECT vplus(2) AS v").collect()(0).getLong(0) shouldBe 42L
      // a stored backslash value round-trips verbatim through the splice
      // (built via chr(92) — the engine's string literals are Spark's,
      // which escape-process backslashes at input like any statement)
      e.sql("SET VARIABLE path = concat('C:', chr(92), 'new', chr(92), 't')")
      e.sql("SELECT getvariable('path') AS v").collect()(0)
        .getString(0) shouldBe "C:\\new\\t"
      // variables work inside DML
      e.sql("CREATE OR REPLACE TABLE vt (k BIGINT)")
      e.sql("SET VARIABLE lim = 5")
      e.sql("INSERT INTO vt SELECT x FROM (VALUES (1), (2), (3), (4), " +
        "(5), (6), (7), (8), (9), (10)) t(x) WHERE x <= getvariable('lim')")
      e.sql("SELECT COUNT(*) AS n FROM vt").collect()(0)
        .getLong(0) shouldBe 5L
    } finally e.close()
  }
}
