package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The driver keeps only a bounded stdout TAIL and parses the bench summary
  * from it — a summary line whose START falls outside the window parses as
  * nothing (this killed BENCH_r01–r03). This spec pins the contract: the
  * summary line built from the REAL query registry stays under 2 KB, is the
  * last line, and still parses after tail-window truncation. */
class BenchLineSpec extends AnyFunSuite with Matchers {
  private val mapper = new ObjectMapper()

  // Real registry names, worst-case plausible values (100+ s each) so the
  // rendered width is an upper bound on any real run.
  private def realResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.456)

  test("summary line from the real query registry fits the 2000-char tail") {
    // the driver's tail field in BENCH_r05.json is exactly 2000 chars —
    // the summary plus newline must START inside that window
    val (_, summary) = Bench.renderLines(realResults, Nil, "/root/testdata/sf0.1")
    withClue(s"len=${summary.length}: ") { summary.length should be < 1950 }
  }

  test("summary parses, has total first, and every value is attributable") {
    val (_, summary) = Bench.renderLines(realResults, Seq("q99_fake"), "/sf")
    summary should startWith("""{"metric":"total",""")
    val node = mapper.readTree(summary)
    node.get("metric").asText() shouldBe "total"
    node.get("unit").asText() shouldBe "sec"
    node.get("value").asDouble() shouldBe (123.456 * realResults.size) +- 0.1
    node.get("errors").get(0).asText() shouldBe "q99_fake"
    // past ~170 queries the capped rung engages: every key but "_rest" is a
    // distinct real query's short key, and kept + _rest re-sums the total
    val qs = node.get("queries")
    val keys = qs.fieldNames()
    var sum = 0.0
    var realKeys = 0
    val seen = scala.collection.mutable.Set.empty[String]
    while (keys.hasNext) {
      val k = keys.next()
      sum += qs.get(k).asDouble()
      if (k != "_rest") { realKeys += 1; seen.add(k) shouldBe true }
    }
    seen.size shouldBe realKeys // no short-key collisions among kept entries
    sum shouldBe (123.456 * realResults.size) +- realResults.size * 0.06
    qs.size() should be >= 100 // the window still carries the headline set
  }

  test("capped rung preserves the LARGEST entries and aggregates the tail") {
    // 300 synthetic queries, strictly decreasing times: the cap must keep
    // the biggest ones and fold the rest into _rest exactly
    val results = (1 to 300)
      .map(i => (f"q${i}%03d_synthetic_name" -> (301 - i) * 0.5))
    val (_, summary) = Bench.renderLines(results, Nil, "/sf")
    summary.length should be < 1950
    val node = mapper.readTree(summary)
    val qs = node.get("queries")
    qs.has("_rest") shouldBe true
    // the single largest query always survives the cap
    qs.has("q001") shouldBe true
    var sum = 0.0
    val it = qs.fieldNames()
    while (it.hasNext) { sum += qs.get(it.next()).asDouble() }
    sum shouldBe results.map(_._2).sum +- results.size * 0.06
  }

  test("summary survives a bounded tail window (driver truncation replay)") {
    val (detail, summary) = Bench.renderLines(realResults, Nil, "/sf")
    // stdout stream as the driver sees it: chatter, the detail line, summary last
    val stdout = ("x" * 10000) + "\n" + detail + "\n" + summary + "\n"
    val tail = stdout.takeRight(4096) // driver's bounded tail window
    val lastLine = tail.split('\n').filter(_.trim.nonEmpty).last
    val node = mapper.readTree(lastLine) // must parse — start not truncated
    node.get("metric").asText() shouldBe "total"
  }

  test("detail keeps full names at 3 dp; failed queries report -1") {
    val (detail, _) = Bench.renderLines(
      Seq("q01_agg_pricing" -> 1.25, "q02_scan_filter_agg" -> -1.0),
      Seq("q02_scan_filter_agg"), "/sf")
    val node = mapper.readTree(detail)
    node.get("queries").get("q01_agg_pricing").asDouble() shouldBe 1.25
    node.get("queries").get("q02_scan_filter_agg").asDouble() shouldBe -1.0
    node.get("value").asDouble() shouldBe 1.25 // -1 not summed
  }
}
