package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Plan-shape assertions for the round-9 continuation waves (x50-x52,
  * m24-m29, s36-s39, d32-d33, p10-p12, q116-q119): the scale properties
  * claimed in SURVEY §8.3 for these operators, asserted against physical
  * plans so a refactor that silently loses one fails CI. */
class PlanR9ContSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("x51 canary sweep prunes documents BELOW the token explode") {
    val s = planString(
      SparkEntry.queries("x51_canary_tracking")(spark, sfDir))
    s should include("Generate")
    s should include("Contains")
    // the contains() prune is on the scan side of the explode: it appears
    // deeper in the printed tree (children print after parents)
    s.indexOf("Generate") should be < s.indexOf("Contains")
  }

  test("q116/q119 event windows are partitioned, never a single task") {
    Seq("q116_watermark_audit", "q119_transitions").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val s = planString(df)
      withClue(q) {
        // the analytic window hash-partitions on its key; the only
        // 1-partition exchange allowed is the bounded presentation merge
        // ABOVE the aggregation, never below the window
        val winIdx = s.indexOf("Window")
        winIdx should be > 0
        s.substring(winIdx) should not include "SinglePartition"
      }
    }
  }

  test("s36/s37/s38/s39 plan no cartesian or nested-loop blowups") {
    Seq("s36_retrain_migration", "s37_serving_load", "s38_cell_distortion",
      "s39_embedding_coverage").foreach { q =>
      val s = planString(SparkEntry.queries(q)(spark, sfDir))
      withClue(q) { s should not include "CartesianProduct" }
    }
  }

  test("d33 corpus checksum is a pure scan+agg (no join anywhere)") {
    val s = planString(SparkEntry.queries("d33_corpus_checksum")(spark, sfDir))
    s should not include "Join"
    s should include("partial_bit_xor")
  }

  test("m24/m28/m29 media audits are map-only up to the presentation sort") {
    Seq("m24_letterbox", "m28_dominant_colors", "m29_sharpness").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count() // finalize AQE
      val shuffles = planOf(df).collect { case e: ShuffleExchangeLike => e }
      withClue(q) { shuffles.length should be <= 1 }
    }
  }

  test("p10 snapshot diff joins once on doc_id and never nested-loops") {
    val s = planString(SparkEntry.queries("p10_snapshot_diff")(spark, sfDir))
    s should include("FullOuter")
    s should not include "BroadcastNestedLoopJoin"
    s should not include "CartesianProduct"
  }
}
