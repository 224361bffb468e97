package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Every SparkEntry query must run at sf0.001 and (for queries with an SQL
  * oracle) produce sorted column names matching what the oracle SQL aliases
  * — the driver's comparator sorts columns by name before hashing. */
class QueriesSmokeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      df.count() should be >= 0L
    }
  }
}
