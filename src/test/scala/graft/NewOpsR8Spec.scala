package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-8 specs: the p02 streaming pipeline's ingest leg must be
  * executor-side end to end (parquet-staged readStream file source,
  * never a driver-materialized MemoryStream/LocalRelation). */
class NewOpsR8Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("stageAndStream opens a STREAMING file source over a distributed " +
      "parquet stage — no LocalRelation in the ingest plan") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"doc $i")).toDF("id", "txt")
    val stream = graft.streaming.StreamingOps.stageAndStream(df, numFiles = 3)
    stream.isStreaming shouldBe true
    val plan = stream.queryExecution.analyzed.toString
    plan should include("FileSource[")
    plan should not include "LocalRelation"
    stream.schema.fieldNames.toSeq shouldBe Seq("id", "txt")
  }

  test("p02 ingest leg runs executor-side: result green at sf0.001 with " +
      "streaming semantics intact (twins deduped, gate applied)") {
    val out = queries.Pipeline.queries("p02_pipeline_streaming")(spark, sfDir)
      .collect()
    out.length should be > 0
    // no corpus-sized LocalTableScan anywhere in the RESULT lineage either:
    // the summary reads back the parquet file sink
    val phys = queries.Pipeline.queries("p02_pipeline_streaming")(spark, sfDir)
      .queryExecution.executedPlan.toString
    phys should not include "LocalTableScan"
    // per-source accounting is sane: kept <= corpus docs, tokens positive
    out.foreach { r =>
      r.getLong(1) should be > 0L   // n_kept
      r.getLong(2) should be > 0L   // kept_tokens
    }
  }
}
