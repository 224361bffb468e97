package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Plan-shape assertions for the round-10 waves (s43/s44, d36-d38,
  * x54/x55, m31-m33, q125/q126): the scale claims in their doc comments,
  * pinned against physical plans so a refactor that silently loses one
  * fails CI. */
class PlanR10Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("s44 multi-probe candidates come from an EQUI-join on the probe " +
      "signature — no cartesian, no nested loop over the corpus") {
    val s = planString(SparkEntry.queries("s44_multiprobe_lsh")(spark, sfDir))
    s should not include "CartesianProduct"
    s should not include "BroadcastNestedLoopJoin"
  }

  test("x55 is map-only rules plus ONE aggregation shuffle on doc_id " +
      "(plus the bounded presentation sort)") {
    val df = SparkEntry.queries("x55_c4_line_rules")(spark, sfDir)
    val shuffles = planOf(df).collect { case e: ShuffleExchangeLike => e }
    // agg exchange + presentation range sort; never a join shuffle
    shuffles.length should be <= 3
    planString(df) should not include "Join"
  }

  test("x54 encoding audit plans no join at all (scan + agg only)") {
    planString(SparkEntry.queries("x54_encoding_audit")(spark, sfDir))
      .should(not include "Join")
  }

  test("m32/m33 decode stages are typed map-only passes; the only join " +
      "is m32's single doc_id equi-join (no cartesian)") {
    val m32 = planString(SparkEntry.queries("m32_caption_align")(spark, sfDir))
    m32 should not include "CartesianProduct"
    m32 should include("DeserializeToObject") // the typed decode stage
    val m33 = planString(
      SparkEntry.queries("m33_interlaced_png")(spark, sfDir))
    m33 should not include "Join"
    m33 should include("DeserializeToObject")
  }

  test("d37/d38 sketch chains plan no cartesian (candidates from " +
      "postings/equi-joins only)") {
    Seq("d37_bbit_minhash", "d38_source_minhash").foreach { q =>
      val s = planString(SparkEntry.queries(q)(spark, sfDir))
      withClue(q) {
        s should not include "CartesianProduct"
        s should not include "BroadcastNestedLoopJoin"
      }
    }
  }

  test("d36 KMV bottom-k prunes map-side below the source exchange " +
      "(WindowGroupLimit), never a global single-partition window") {
    val s = planString(SparkEntry.queries("d36_kmv_cardinality")(spark, sfDir))
    val winIdx = s.indexOf("Window")
    winIdx should be > 0
    s.substring(winIdx) should not include "SinglePartition"
  }

  test("s43 MaxSim scoring joins on (label, sub-index) equi-keys — " +
      "no cartesian between query and corpus sub-vectors") {
    val s = planString(
      SparkEntry.queries("s43_maxsim_multivector")(spark, sfDir))
    s should not include "CartesianProduct"
    s should not include "BroadcastNestedLoopJoin"
  }
}
