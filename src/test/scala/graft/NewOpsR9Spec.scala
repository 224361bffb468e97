package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 specs: the MERGE INTO statement surface (DuckDB 1.4 grammar —
  * the reference's embedded engine accepts it, pom.xml duckdb 1.4.4),
  * lowered to the copy-on-write join shape. */
class NewOpsR9Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def freshEngine(): Engine = {
    val e = new Engine(spark)
    e.sql("CREATE OR REPLACE TABLE stock AS " +
      "SELECT * FROM (VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')) " +
      "AS t(id, qty, tag)")
    e.sql("CREATE OR REPLACE TABLE buy AS " +
      "SELECT * FROM (VALUES (2, 5), (3, 7), (9, 99)) AS t(id, add_qty)")
    e
  }

  private def rowsOf(e: Engine, q: String): Seq[Row] =
    e.sql(q).collect().toSeq

  test("MERGE: MATCHED UPDATE + NOT MATCHED INSERT (the basic upsert)") {
    val e = freshEngine()
    try {
      val n = e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN MATCHED THEN UPDATE SET qty = stock.qty + buy.add_qty " +
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (buy.id, buy.add_qty)")
        .collect()(0).getLong(0)
      n shouldBe 3 // 2 updates + 1 insert
      rowsOf(e, "SELECT id, qty, tag FROM stock ORDER BY id") shouldBe Seq(
        Row(1, 10, "a"), Row(2, 25, "b"), Row(3, 37, "c"), Row(9, 99, null))
    } finally e.close()
  }

  test("MERGE: clause order resolves first-applicable (conditional DELETE " +
      "before UPDATE), DO NOTHING short-circuits") {
    val e = freshEngine()
    try {
      e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN MATCHED AND buy.add_qty > 6 THEN DELETE " +
        "WHEN MATCHED AND buy.add_qty > 100 THEN UPDATE SET qty = -1 " +
        "WHEN MATCHED THEN UPDATE SET qty = stock.qty + buy.add_qty " +
        "WHEN NOT MATCHED THEN DO NOTHING")
      // id 3 (add 7 > 6) deleted; id 2 updated by the THIRD clause (second
      // never fires: 5 < 100 and first-applicable already took id 3);
      // id 9 discarded by DO NOTHING
      rowsOf(e, "SELECT id, qty FROM stock ORDER BY id") shouldBe Seq(
        Row(1, 10), Row(2, 25))
    } finally e.close()
  }

  test("MERGE: NOT MATCHED BY SOURCE prunes stale target rows") {
    val e = freshEngine()
    try {
      e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN MATCHED THEN UPDATE SET qty = buy.add_qty " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE")
      rowsOf(e, "SELECT id, qty FROM stock ORDER BY id") shouldBe Seq(
        Row(2, 5), Row(3, 7))
    } finally e.close()
  }

  test("MERGE: NOT MATCHED BY SOURCE UPDATE (flag instead of delete)") {
    val e = freshEngine()
    try {
      e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN NOT MATCHED BY SOURCE AND stock.qty < 15 THEN " +
        "UPDATE SET tag = 'stale'")
      rowsOf(e, "SELECT id, tag FROM stock ORDER BY id") shouldBe Seq(
        Row(1, "stale"), Row(2, "b"), Row(3, "c"))
    } finally e.close()
  }

  test("MERGE: INSERT * maps the source row positionally") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE t2 AS " +
        "SELECT * FROM (VALUES (1, 'x')) AS t(k, v)")
      e.sql("CREATE OR REPLACE TABLE s2 AS " +
        "SELECT * FROM (VALUES (1, 'ignored'), (7, 'new')) AS t(k, v)")
      e.sql("MERGE INTO t2 USING s2 ON t2.k = s2.k " +
        "WHEN NOT MATCHED THEN INSERT *")
      rowsOf(e, "SELECT k, v FROM t2 ORDER BY k") shouldBe Seq(
        Row(1, "x"), Row(7, "new"))
    } finally e.close()
  }

  test("MERGE: WHEN/THEN inside CASE expressions never split clauses") {
    val e = freshEngine()
    try {
      e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN MATCHED AND (CASE WHEN buy.add_qty > 6 THEN 1 ELSE 0 END) = 1 " +
        "THEN UPDATE SET qty = CASE WHEN stock.qty > 25 THEN 0 ELSE 99 END " +
        "WHEN MATCHED THEN UPDATE SET tag = 'small'")
      rowsOf(e, "SELECT id, qty, tag FROM stock ORDER BY id") shouldBe Seq(
        Row(1, 10, "a"), Row(2, 20, "small"), Row(3, 0, "c"))
    } finally e.close()
  }

  test("MERGE: a target row matching two source rows fails loud " +
      "(cardinality violation)") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE t3 AS " +
        "SELECT * FROM (VALUES (1, 0)) AS t(k, v)")
      e.sql("CREATE OR REPLACE TABLE s3 AS " +
        "SELECT * FROM (VALUES (1, 10), (1, 20)) AS t(k, v)")
      val ex = intercept[IllegalArgumentException] {
        e.sql("MERGE INTO t3 USING s3 ON t3.k = s3.k " +
          "WHEN MATCHED THEN UPDATE SET v = s3.v")
      }
      ex.getMessage should include("cardinality")
    } finally e.close()
  }

  test("MERGE: non-engine targets fail with a clear message") {
    val e = freshEngine()
    try {
      intercept[IllegalArgumentException] {
        e.sql("MERGE INTO nosuch USING buy ON nosuch.id = buy.id " +
          "WHEN MATCHED THEN DELETE")
      }.getMessage should include("not an engine-created table")
    } finally e.close()
  }

  test("MERGE RETURNING: affected rows with the virtual merge_action " +
      "column; * expands to target columns only") {
    val e = freshEngine()
    try {
      val rows = e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN MATCHED AND buy.add_qty > 6 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET qty = stock.qty + buy.add_qty " +
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (buy.id, buy.add_qty) " +
        "RETURNING merge_action, *")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .sortBy(_._2).toSeq
      rows shouldBe Seq(("UPDATE", 2, 25), ("DELETE", 3, 30),
        ("INSERT", 9, 99))
      // * alone excludes the virtual column
      val star = e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN MATCHED THEN DO NOTHING " +
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (buy.id, 1) " +
        "RETURNING *")
      star.schema.fieldNames.toSeq shouldBe Seq("id", "qty", "tag")
      star.collect().map(_.getInt(0)).sorted.toSeq shouldBe Seq(3)
    } finally e.close()
  }

  test("DML RETURNING: INSERT, UPDATE [FROM], DELETE [USING] return the " +
      "affected rows; ON CONFLICT + RETURNING fails loud") {
    val e = freshEngine()
    try {
      // INSERT ... RETURNING (post-cast inserted rows)
      val ins = e.sql("INSERT INTO stock VALUES (7, 70, 'g') " +
        "RETURNING id, qty * 2 AS dq")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      ins shouldBe Seq((7, 140))
      // UPDATE ... RETURNING (post-update values, affected rows only)
      val upd = e.sql("UPDATE stock SET qty = qty + 1 WHERE id <= 2 " +
        "RETURNING id, qty").collect()
        .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
      upd shouldBe Seq((1, 11), (2, 21))
      // UPDATE ... FROM ... RETURNING (joined update, matched rows)
      val updF = e.sql("UPDATE stock SET qty = buy.add_qty FROM buy " +
        "WHERE stock.id = buy.id RETURNING id, qty").collect()
        .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
      updF shouldBe Seq((2, 5), (3, 7))
      // DELETE ... RETURNING (the deleted rows)
      val del = e.sql("DELETE FROM stock WHERE id = 7 RETURNING *")
        .collect().map(_.getInt(0)).toSeq
      del shouldBe Seq(7)
      // DELETE ... USING ... RETURNING
      val delU = e.sql("DELETE FROM stock USING buy " +
        "WHERE stock.id = buy.id RETURNING id").collect()
        .map(_.getInt(0)).sorted.toSeq
      delU shouldBe Seq(2, 3)
      // ON CONFLICT + RETURNING: loud rejection
      intercept[IllegalArgumentException] {
        e.sql("INSERT INTO stock VALUES (1, 0, 'z') " +
          "ON CONFLICT (id) DO NOTHING RETURNING *")
      }.getMessage should include("RETURNING")
    } finally e.close()
  }

  test("transactions: ROLLBACK restores tables, views, macros, keys — " +
      "DML, DDL, MERGE and drops all undone") {
    val e = freshEngine()
    try {
      e.sql("BEGIN TRANSACTION")
      e.sql("UPDATE stock SET qty = 0")
      e.sql("DELETE FROM stock WHERE id = 1")
      e.sql("MERGE INTO stock USING buy ON stock.id = buy.id " +
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (buy.id, 1)")
      e.sql("CREATE TABLE txn_new AS SELECT 1 AS a")
      e.sql("CREATE OR REPLACE VIEW txn_v AS SELECT id FROM stock")
      e.sql("CREATE OR REPLACE MACRO txn_m(x) AS x + 1")
      e.sql("DROP TABLE buy")
      e.sql("ROLLBACK")
      // original snapshot back, bit-identical
      rowsOf(e, "SELECT id, qty, tag FROM stock ORDER BY id") shouldBe Seq(
        Row(1, 10, "a"), Row(2, 20, "b"), Row(3, 30, "c"))
      // dropped table restored, txn-created objects gone
      rowsOf(e, "SELECT count(*) AS n FROM buy")(0).getLong(0) shouldBe 3L
      intercept[Exception] { e.sql("SELECT * FROM txn_new").collect() }
      intercept[Exception] { e.sql("SELECT * FROM txn_v").collect() }
      intercept[Exception] { e.sql("SELECT txn_m(1)").collect() }
    } finally e.close()
  }

  test("transactions: COMMIT keeps the changes and releases pre-images") {
    val e = freshEngine()
    try {
      e.sql("BEGIN")
      e.sql("UPDATE stock SET qty = qty * 2 WHERE id = 1")
      e.sql("DELETE FROM stock WHERE id = 3")
      e.sql("COMMIT")
      rowsOf(e, "SELECT id, qty FROM stock ORDER BY id") shouldBe Seq(
        Row(1, 20), Row(2, 20))
      // a later ROLLBACK has nothing to roll back
      intercept[IllegalArgumentException] { e.sql("ROLLBACK") }
        .getMessage should include("no open transaction")
    } finally e.close()
  }

  test("transactions: nested BEGIN and stray COMMIT fail loud; ABORT " +
      "aliases ROLLBACK") {
    val e = freshEngine()
    try {
      intercept[IllegalArgumentException] { e.sql("COMMIT") }
        .getMessage should include("no open transaction")
      e.sql("BEGIN")
      intercept[IllegalArgumentException] { e.sql("BEGIN") }
        .getMessage should include("already active")
      e.sql("UPDATE stock SET qty = -1")
      e.sql("ABORT")
      rowsOf(e, "SELECT qty FROM stock WHERE id = 1")(0).getInt(0) shouldBe 10
    } finally e.close()
  }

  test("transactions: a rolled-back rename restores the original name") {
    val e = freshEngine()
    try {
      e.sql("BEGIN")
      e.sql("ALTER TABLE stock RENAME TO stock2")
      rowsOf(e, "SELECT count(*) AS n FROM stock2")(0).getLong(0) shouldBe 3L
      e.sql("ROLLBACK")
      rowsOf(e, "SELECT count(*) AS n FROM stock")(0).getLong(0) shouldBe 3L
      intercept[Exception] { e.sql("SELECT * FROM stock2").collect() }
    } finally e.close()
  }

  test("MERGE: source can be any dialect relation (subquery with alias)") {
    val e = freshEngine()
    try {
      e.sql("MERGE INTO stock USING " +
        "(SELECT id, add_qty * 2 AS a2 FROM buy WHERE id <= 3) d " +
        "ON stock.id = d.id " +
        "WHEN MATCHED THEN UPDATE SET qty = d.a2")
      rowsOf(e, "SELECT id, qty FROM stock ORDER BY id") shouldBe Seq(
        Row(1, 10), Row(2, 10), Row(3, 14))
    } finally e.close()
  }
}
