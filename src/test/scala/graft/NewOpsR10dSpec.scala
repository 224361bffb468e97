package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-10 FOREIGN KEY enforcement invariants (q125): atomic orphan
  * rejection, parent-side RESTRICT, MATCH SIMPLE NULLs, constraint
  * catalog lifecycle (rollback restore, drop guard, rename follow),
  * and MERGE-path enforcement. */
class NewOpsR10dSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def freshEngine(): Engine = {
    val e = new Engine(spark)
    e.sql("CREATE OR REPLACE TABLE par (pk BIGINT PRIMARY KEY, nm VARCHAR)")
    e.sql("INSERT INTO par VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    e.sql("CREATE OR REPLACE TABLE kid (id BIGINT PRIMARY KEY, " +
      "pk BIGINT REFERENCES par, v DOUBLE)")
    e.sql("INSERT INTO kid VALUES (10, 1, 1.0), (11, 2, 2.0)")
    e
  }

  test("orphan INSERT rejects atomically; NULL key passes MATCH SIMPLE") {
    val e = freshEngine()
    try {
      val ex = intercept[Exception](
        e.sql("INSERT INTO kid VALUES (12, 99, 3.0), (13, 1, 4.0)"))
      ex.getMessage should include("FOREIGN KEY")
      // atomic: the valid row of the rejected batch did NOT land
      e.sql("SELECT COUNT(*) AS n FROM kid").collect()(0).getLong(0) shouldBe 2
      e.sql("INSERT INTO kid VALUES (14, NULL, 5.0)")
      e.sql("SELECT COUNT(*) AS n FROM kid").collect()(0).getLong(0) shouldBe 3
    } finally e.close()
  }

  test("parent-side RESTRICT: DELETE and key UPDATE of a referenced row " +
      "reject; unreferenced rows mutate fine") {
    val e = freshEngine()
    try {
      intercept[Exception](e.sql("DELETE FROM par WHERE pk = 1"))
        .getMessage should include("still reference")
      intercept[Exception](e.sql("UPDATE par SET pk = 100 WHERE pk = 2"))
        .getMessage should include("still reference")
      e.sql("DELETE FROM par WHERE pk = 3") // unreferenced: fine
      e.sql("SELECT COUNT(*) AS n FROM par").collect()(0).getLong(0) shouldBe 2
      // child UPDATE to an orphan key rejects; to a live key passes
      intercept[Exception](e.sql("UPDATE kid SET pk = 50 WHERE id = 10"))
        .getMessage should include("FOREIGN KEY")
      e.sql("UPDATE kid SET pk = 2 WHERE id = 10")
      e.sql("SELECT pk FROM kid WHERE id = 10").collect()(0).getLong(0) shouldBe 2
    } finally e.close()
  }

  test("MERGE INTO enforces FKs: an orphan-inserting merge rejects and " +
      "the target snapshot is untouched") {
    val e = freshEngine()
    try {
      e.sql("CREATE OR REPLACE TABLE src (id BIGINT, pk BIGINT, v DOUBLE)")
      e.sql("INSERT INTO src VALUES (20, 77, 9.0)")
      val ex = intercept[Exception](e.sql(
        "MERGE INTO kid USING src ON kid.id = src.id " +
          "WHEN NOT MATCHED THEN INSERT VALUES (src.id, src.pk, src.v)"))
      ex.getMessage should include("FOREIGN KEY")
      e.sql("SELECT COUNT(*) AS n FROM kid").collect()(0).getLong(0) shouldBe 2
    } finally e.close()
  }

  test("DROP TABLE of a referenced parent refuses until the child goes; " +
      "rename follows on both sides") {
    val e = freshEngine()
    try {
      intercept[Exception](e.sql("DROP TABLE par"))
        .getMessage should include("FOREIGN KEY")
      e.sql("ALTER TABLE par RENAME TO par2")
      // the child's constraint re-pointed: orphan insert still rejects
      intercept[Exception](e.sql("INSERT INTO kid VALUES (15, 42, 0.0)"))
        .getMessage should include("par2")
      e.sql("ALTER TABLE kid RENAME COLUMN pk TO parent_pk")
      intercept[Exception](e.sql(
        "INSERT INTO kid VALUES (16, 43, 0.0)"))
        .getMessage should include("parent_pk")
      e.sql("DROP TABLE kid")
      e.sql("DROP TABLE par2") // no children left: fine
    } finally e.close()
  }

  test("ROLLBACK restores CHECK and FOREIGN KEY enforcement dropped " +
      "inside the transaction") {
    val e = freshEngine()
    try {
      e.sql("CREATE OR REPLACE TABLE chk (k BIGINT CHECK (k >= 0))")
      e.sql("BEGIN")
      e.sql("DROP TABLE kid")
      e.sql("DROP TABLE chk")
      e.sql("ROLLBACK")
      // both constraints survive the rolled-back DROP
      intercept[Exception](e.sql("INSERT INTO kid VALUES (17, 88, 0.0)"))
        .getMessage should include("FOREIGN KEY")
      intercept[Exception](e.sql("INSERT INTO chk VALUES (-1)"))
        .getMessage should include("CHECK")
    } finally e.close()
  }

  test("EXPORT/IMPORT round-trips CHECK and FOREIGN KEY enforcement, " +
      "with FK parents replayed before children") {
    val e = freshEngine()
    try {
      e.sql("CREATE OR REPLACE TABLE achk (k BIGINT CHECK (k >= 0))")
      e.sql("INSERT INTO achk VALUES (5)")
      val dirPath = java.nio.file.Files
        .createTempDirectory("graft_fk_export")
      graft.streaming.StreamingOps.trackTempDir(dirPath)
      val dir = dirPath.toString
      e.sql(s"EXPORT DATABASE '$dir'")
      val manifest = java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "schema.sql"))
      manifest should include("CHECK (k >= 0)")
      manifest should include("FOREIGN KEY (`pk`) REFERENCES par (`pk`)")
      // child `kid` must replay AFTER parent `par` despite k < p sorting
      manifest.indexOf("CREATE OR REPLACE TABLE par ") should
        be < manifest.indexOf("CREATE OR REPLACE TABLE kid ")
      val e2 = new Engine(spark)
      try {
        e2.sql(s"IMPORT DATABASE '$dir'")
        e2.sql("SELECT COUNT(*) AS n FROM kid").collect()(0)
          .getLong(0) shouldBe 2
        // enforcement survived the round-trip on both constraint classes
        intercept[Exception](e2.sql("INSERT INTO kid VALUES (20, 99, 0.0)"))
          .getMessage should include("FOREIGN KEY")
        intercept[Exception](e2.sql("INSERT INTO achk VALUES (-2)"))
          .getMessage should include("CHECK")
        intercept[Exception](e2.sql("DELETE FROM par WHERE pk = 1"))
          .getMessage should include("still reference")
      } finally e2.close()
    } finally e.close()
  }

  test("every sibling DML path enforces too: ON CONFLICT inserts, " +
      "DELETE USING, CREATE OR REPLACE of a referenced parent") {
    val e = freshEngine()
    try {
      // INSERT OR REPLACE (the insertOnConflict path) rejects orphans
      val ex1 = intercept[Exception](
        e.sql("INSERT OR REPLACE INTO kid VALUES (12, 99, 3.0)"))
      ex1.getMessage should include("FOREIGN KEY")
      e.sql("SELECT COUNT(*) AS n FROM kid").collect()(0).getLong(0) shouldBe 2
      // ON CONFLICT DO UPDATE that breaks a CHECK rejects (battery runs)
      e.sql("CREATE OR REPLACE TABLE chk2 (k BIGINT PRIMARY KEY, " +
        "v DOUBLE CHECK (v >= 0))")
      e.sql("INSERT INTO chk2 VALUES (1, 5.0)")
      intercept[Exception](e.sql("INSERT INTO chk2 VALUES (1, 0.0) " +
        "ON CONFLICT (k) DO UPDATE SET v = -9"))
        .getMessage should include("CHECK")
      // DELETE USING of a referenced parent row rejects (RESTRICT)
      e.sql("CREATE OR REPLACE TABLE hits (k BIGINT)")
      e.sql("INSERT INTO hits VALUES (1)")
      intercept[Exception](e.sql(
        "DELETE FROM par USING hits WHERE par.pk = hits.k"))
        .getMessage should include("still reference")
      // CREATE OR REPLACE of a referenced parent refuses like DROP
      intercept[Exception](e.sql(
        "CREATE OR REPLACE TABLE par AS SELECT 99 AS pk"))
        .getMessage should include("FOREIGN KEY")
      intercept[Exception](e.sql(
        "CREATE OR REPLACE TABLE par (pk BIGINT)"))
        .getMessage should include("FOREIGN KEY")
      // an UPDATE touching only a payload column still succeeds
      e.sql("UPDATE kid SET v = v + 1 WHERE id = 10")
    } finally e.close()
  }

  test("CHECK-referenced columns refuse RENAME and DROP (no stale " +
      "constraint text can brick the table)") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE ck (a BIGINT CHECK (a > 0), b BIGINT)")
      e.sql("INSERT INTO ck VALUES (1, 2)")
      intercept[Exception](e.sql("ALTER TABLE ck RENAME a TO a2"))
        .getMessage should include("CHECK")
      intercept[Exception](e.sql("ALTER TABLE ck DROP COLUMN a"))
        .getMessage should include("CHECK")
      // non-constrained columns still rename/drop fine, and DML works
      e.sql("ALTER TABLE ck RENAME b TO b2")
      e.sql("INSERT INTO ck VALUES (2, 3)")
      e.sql("SELECT COUNT(*) AS n FROM ck").collect()(0).getLong(0) shouldBe 2
    } finally e.close()
  }

  test("self-referencing key: same-batch targets resolve, orphans reject") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE tree (id BIGINT PRIMARY KEY, " +
        "parent_id BIGINT REFERENCES tree(id))")
      // root (NULL parent) + a child referencing the root, one statement
      e.sql("INSERT INTO tree VALUES (1, NULL), (2, 1)")
      e.sql("SELECT COUNT(*) AS n FROM tree").collect()(0).getLong(0) shouldBe 2
      intercept[Exception](e.sql("INSERT INTO tree VALUES (3, 999)"))
        .getMessage should include("FOREIGN KEY")
      // deleting a referenced node rejects; the leaf deletes fine
      intercept[Exception](e.sql("DELETE FROM tree WHERE id = 1"))
        .getMessage should include("still reference")
      e.sql("DELETE FROM tree WHERE id = 2")
      e.sql("DELETE FROM tree WHERE id = 1")
    } finally e.close()
  }
}
