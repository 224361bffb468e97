package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-8 decoy property tests for the DML statement forms that ride the
  * shared SqlScan tokenizer: string literals containing the exact clause
  * keywords (WHERE / USING / FROM / ON CONFLICT / DO UPDATE SET / '=')
  * must never split a clause. Complements WhereScannerPropertySpec
  * (UPDATE/DELETE WHERE) and AssignmentParserPropertySpec (SET rhs) with
  * the joined/upsert forms. Seeded LCG, end-to-end through Engine.sql. */
class DmlDecoyPropertySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  test("DELETE ... USING: literals containing ' USING ' / ' WHERE ' in the " +
      "predicate or source never split the clause") {
    import spark.implicits._
    val engine = new Engine(spark)
    val r = lcg(0xdec0L)
    (0 until 50).foreach { i =>
      val decoy = s"D${i}_${math.floorMod(r.next(), 1000)} USING x WHERE y"
      Seq((1L, decoy), (2L, "keep")).toDF("k", "tag")
        .createOrReplaceTempView("dd_src")
      engine.sql("CREATE OR REPLACE TABLE dd_t AS SELECT k, tag FROM dd_src")
      // the decoy literal sits in the join predicate: only row k=1 matches
      engine.sql("DELETE FROM dd_t USING dd_src s " +
        s"WHERE dd_t.k = s.k AND s.tag = '$decoy'")
        .collect()(0).getLong(0) shouldBe 1L
      val left = engine.sql("SELECT tag FROM dd_t").collect()
      left.map(_.getString(0)).toSeq shouldBe Seq("keep")
    }
    engine.sql("DROP TABLE dd_t")
    engine.close()
  }

  test("INSERT ... ON CONFLICT: literals containing 'ON CONFLICT' and " +
      "'DO UPDATE SET' in inserted values or SET rhs never split") {
    import spark.implicits._
    val engine = new Engine(spark)
    val r = lcg(0xc0f1L)
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("oc_ps")
    (0 until 50).foreach { i =>
      val lit1 = s"X$i ON CONFLICT (k) DO NOTHING ${math.floorMod(r.next(), 100)}"
      val lit2 = s"Y$i DO UPDATE SET v = excluded.v"
      engine.sql("CREATE OR REPLACE TABLE oc_p AS SELECT k, v FROM oc_ps")
      // literal containing the clause keywords INSERTS cleanly
      engine.sql(s"INSERT INTO oc_p VALUES (2, '$lit1') " +
        "ON CONFLICT (k) DO NOTHING").collect()(0).getLong(0) shouldBe 1L
      engine.sql("SELECT v FROM oc_p WHERE k = 2").collect()(0)
        .getString(0) shouldBe lit1
      // decoy in the DO UPDATE SET rhs: concat embeds the phrase
      engine.sql(s"INSERT INTO oc_p VALUES (2, 'z') ON CONFLICT (k) " +
        s"DO UPDATE SET v = concat('$lit2', ' WHERE 1 = 2')")
        .collect()(0).getLong(0) shouldBe 0L
      engine.sql("SELECT v FROM oc_p WHERE k = 2").collect()(0)
        .getString(0) shouldBe s"$lit2 WHERE 1 = 2"
    }
    // backquoted conflict keys parse through the tokenizer
    engine.sql("CREATE OR REPLACE TABLE oc_q (`order id` BIGINT, v VARCHAR)")
    engine.sql("INSERT INTO oc_q VALUES (1, 'a')")
    engine.sql("INSERT INTO oc_q VALUES (1, 'b') " +
      "ON CONFLICT (`order id`) DO UPDATE SET v = excluded.v")
      .collect()(0).getLong(0) shouldBe 0L
    engine.sql("SELECT v FROM oc_q").collect()(0).getString(0) shouldBe "b"
    engine.sql("DROP TABLE oc_p"); engine.sql("DROP TABLE oc_q")
    engine.close()
  }

  test("MERGE decoys: literals containing ' WHEN MATCHED THEN ' / ' ON ' / " +
      "' USING ' and comments with THEN never split merge clauses") {
    import spark.implicits._
    val engine = new Engine(spark)
    val r = lcg(0x3e56eL)
    (0 until 50).foreach { i =>
      val decoy =
        s"M$i WHEN MATCHED THEN DELETE USING x ON y ${math.floorMod(r.next(), 100)}"
      Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
        .createOrReplaceTempView("mg_t0")
      Seq((1L, decoy), (3L, "new")).toDF("k", "v")
        .createOrReplaceTempView("mg_s0")
      engine.sql("CREATE OR REPLACE TABLE mg_t AS SELECT k, v FROM mg_t0")
      // the decoy literal rides the ON condition AND the UPDATE SET rhs;
      // a comment inside the WHEN chain carries THEN/WHEN keywords
      engine.sql("MERGE INTO mg_t USING mg_s0 s " +
        s"ON mg_t.k = s.k AND s.v <> 'nope WHEN MATCHED THEN DELETE' " +
        "WHEN MATCHED /* WHEN NOT MATCHED THEN DELETE */ THEN " +
        s"UPDATE SET v = concat(s.v, ' -- THEN x') " +
        "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.v)")
        .collect()(0).getLong(0) shouldBe 2L
      val got = engine.sql("SELECT k, v FROM mg_t").collect()
        .map(row => (row.getLong(0), row.getString(1))).sortBy(_._1).toSeq
      got shouldBe Seq((1L, s"$decoy -- THEN x"), (2L, "keep"),
        (3L, "new"))
    }
    engine.sql("DROP TABLE mg_t")
    engine.close()
  }

  test("RETURNING decoys: a literal containing ' RETURNING ' never splits; " +
      "a real trailing RETURNING still parses after it") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("rt_src")
    engine.sql("CREATE OR REPLACE TABLE rt_t AS SELECT k, v FROM rt_src")
    // literal decoy only: the statement returns the count frame
    engine.sql("UPDATE rt_t SET v = 'x RETURNING y' WHERE k = 1")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM rt_t").collect()(0)
      .getString(0) shouldBe "x RETURNING y"
    // literal decoy + real RETURNING: split happens at the REAL keyword
    val out = engine.sql("UPDATE rt_t SET v = 'z RETURNING w' WHERE k = 1 " +
      "RETURNING k, v").collect()
    out.length shouldBe 1
    out(0).getLong(0) shouldBe 1L
    out(0).getString(1) shouldBe "z RETURNING w"
    engine.sql("DROP TABLE rt_t")
    engine.close()
  }

  test("comment decoys: keywords and commas inside -- and /* */ comments " +
      "never split UPDATE/DELETE/ON CONFLICT/SET/EXECUTE clauses") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("cm_src")
    // block comment containing WHERE + a comma in the SET list: neither
    // splits — both rows update, the predicate applies to k=1 only
    engine.sql("CREATE OR REPLACE TABLE cm_t AS SELECT k, v FROM cm_src")
    engine.sql("UPDATE cm_t SET v = /* WHERE k = 2, v = 'x' */ 'one' " +
      "WHERE k = 1").collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM cm_t ORDER BY k").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("one", "b")
    // line comment containing USING + WHERE inside a DELETE predicate
    engine.sql("CREATE OR REPLACE TABLE cm_t AS SELECT k, v FROM cm_src")
    engine.sql("DELETE FROM cm_t USING cm_src s -- USING x WHERE y\n" +
      "WHERE cm_t.k = s.k AND s.v = 'a'").collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM cm_t").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("b")
    // ON CONFLICT with a block comment holding 'DO UPDATE SET x = 1,'
    engine.sql("CREATE OR REPLACE TABLE cm_t AS SELECT k, v FROM cm_src")
    engine.sql("INSERT INTO cm_t VALUES (1, 'z') ON CONFLICT (k) " +
      "DO UPDATE SET /* DO UPDATE SET v = 'no', k = 9 */ v = excluded.v")
      .collect()(0).getLong(0) shouldBe 0L
    engine.sql("SELECT v FROM cm_t WHERE k = 1").collect()(0)
      .getString(0) shouldBe "z"
    // EXECUTE args: a comma inside a block comment must not split the
    // argument list; the comment rides along into the substituted SQL
    engine.sql("PREPARE cm_p AS SELECT $1 + $2 AS s")
    engine.sql("EXECUTE cm_p(1 /* , 99 */, 2)").collect()(0)
      .getInt(0) shouldBe 3
    // unterminated -- comment at the tail never eats a real clause above
    engine.sql("CREATE OR REPLACE TABLE cm_t AS SELECT k, v FROM cm_src")
    engine.sql("UPDATE cm_t SET v = 'w' WHERE k = 2 -- WHERE k = 1")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM cm_t ORDER BY k").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("a", "w")
    engine.sql("DEALLOCATE cm_p")
    engine.sql("DROP TABLE cm_t")
    engine.close()
  }

  test("dollar-quoted literals and nested block comments (r10): decoy " +
      "keywords inside never split; dollar literals evaluate as strings") {
    import spark.implicits._
    val engine = new Engine(spark)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("dq_src")
    // $$…$$ literal whose body carries WHERE/SET/comma decoys: the UPDATE
    // splits at the REAL WHERE, and the stored value is the raw body
    engine.sql("CREATE OR REPLACE TABLE dq_t AS SELECT k, v FROM dq_src")
    engine.sql("UPDATE dq_t SET v = $$x WHERE k = 2, v = 'no'$$ WHERE k = 1")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM dq_t ORDER BY k").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("x WHERE k = 2, v = 'no'", "b")
    // embedded single quote needs no escaping inside a dollar quote
    engine.sql("UPDATE dq_t SET v = $$it's WHERE$$ WHERE k = 2")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM dq_t WHERE k = 2").collect()(0)
      .getString(0) shouldBe "it's WHERE"
    // tagged form: $tag$…$tag$ may carry a bare $$ in its body
    engine.sql("UPDATE dq_t SET v = $tag$has $$ inside$tag$ WHERE k = 1")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM dq_t WHERE k = 1").collect()(0)
      .getString(0) shouldBe "has $$ inside"
    // a $$ inside an ORDINARY literal is untouched by the rewrite
    engine.sql("UPDATE dq_t SET v = 'keep $$ raw' WHERE k = 1")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM dq_t WHERE k = 1").collect()(0)
      .getString(0) shouldBe "keep $$ raw"
    // DELETE USING with the decoy riding a dollar quote in the predicate
    engine.sql("CREATE OR REPLACE TABLE dq_t AS SELECT k, v FROM dq_src")
    engine.sql("DELETE FROM dq_t USING dq_src s WHERE dq_t.k = s.k " +
      "AND s.v <> $$a USING b WHERE c$$ AND s.v = 'a'")
      .collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM dq_t").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("b")
    // NESTED block comment: one comment to the scanner, so the inner
    // close does not end it and its WHERE/comma decoys never split
    engine.sql("CREATE OR REPLACE TABLE dq_t AS SELECT k, v FROM dq_src")
    engine.sql("UPDATE dq_t SET v = /* outer /* WHERE k = 2, v='x' */ " +
      "still comment */ 'n' WHERE k = 1").collect()(0).getLong(0) shouldBe 1L
    engine.sql("SELECT v FROM dq_t ORDER BY k").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("n", "b")
    // pass-through SELECT: dollar quote normalizes before Spark's parser
    engine.sql("SELECT $$plain body$$ AS s").collect()(0)
      .getString(0) shouldBe "plain body"
    // PREPARE/EXECUTE: $1 binding coexists with dollar quotes ($1 is never
    // a dollar-quote opener), and a $$ arg binds as a string
    engine.sql("PREPARE dq_p AS SELECT concat($1, $$-suffix$$) AS s")
    engine.sql("EXECUTE dq_p($$val WHERE$$)").collect()(0)
      .getString(0) shouldBe "val WHERE-suffix"
    engine.sql("DEALLOCATE dq_p")
    engine.sql("DROP TABLE dq_t")
    engine.close()
  }

  test("UPDATE ... FROM: literals containing ' FROM ' / ' WHERE ' in SET " +
      "rhs never trigger the joined form or split the predicate") {
    import spark.implicits._
    val engine = new Engine(spark)
    val r = lcg(0xf02aL)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .createOrReplaceTempView("uf_src")
    (0 until 50).foreach { i =>
      val decoy = s"F$i FROM uf_src WHERE k = 2 ${math.floorMod(r.next(), 100)}"
      engine.sql("CREATE OR REPLACE TABLE uf_t AS SELECT k, v FROM uf_src")
      // plain UPDATE whose SET rhs literal contains ' FROM ' and ' WHERE '
      engine.sql(s"UPDATE uf_t SET v = '$decoy' WHERE k = 1")
        .collect()(0).getLong(0) shouldBe 1L
      engine.sql("SELECT v FROM uf_t WHERE k = 1").collect()(0)
        .getString(0) shouldBe decoy
      engine.sql("SELECT v FROM uf_t WHERE k = 2").collect()(0)
        .getString(0) shouldBe "b"
      // genuine joined form still parses alongside the decoy literal
      engine.sql("UPDATE uf_t SET v = concat(s.v, '$ FROM x') FROM " +
        "uf_src s WHERE uf_t.k = s.k AND uf_t.k = 2")
        .collect()(0).getLong(0) shouldBe 1L
      engine.sql("SELECT v FROM uf_t WHERE k = 2").collect()(0)
        .getString(0) shouldBe "b$ FROM x"
    }
    engine.sql("DROP TABLE uf_t")
    engine.close()
  }
}
