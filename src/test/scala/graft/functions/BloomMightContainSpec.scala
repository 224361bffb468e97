package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Property coverage for the native bloom probe: whatever key set the
  * filter is built from, `graft_bloom_contains` NEVER reports a member as
  * absent (the property d16's exactness rests on), and distinct filters in
  * one query never alias through the cache (identity keying). */
class BloomMightContainSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  // deterministic-seed sampler (the FixedPointSumPropertySpec convention;
  // no scalatestplus bridge in the offline dependency set)
  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach(f)
    }

  private def filterB64(keys: Seq[Long], expected: Long): String = {
    import spark.implicits._
    val bf = keys.toDF("k").stat.bloomFilter("k", math.max(expected, 1L), 0.03)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  test("property: members are never reported absent") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    forAll(gen, 15) { keys =>
      val b64 = filterB64(keys, keys.length.toLong)
      val hits = keys.toDF("k")
        .filter(expr(s"graft_bloom_contains(unbase64('$b64'), k)"))
        .count()
      hits shouldBe keys.length.toLong
    }
  }

  test("two filters in one query never alias through the per-thread cache") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // Disjoint key sets; each row probes BOTH filters. If the cache keyed
    // on anything weaker than the literal's identity (e.g. a size or
    // boundary fingerprint), same-sized filters could cross-answer.
    val a = (0L until 500L).map(_ * 7919L)
    val b = (0L until 500L).map(_ * 7919L + 1L)
    val fa = filterB64(a, 500)
    val fb = filterB64(b, 500)
    val out = a.toDF("k").select(
      expr(s"graft_bloom_contains(unbase64('$fa'), k)").as("inA"),
      expr(s"graft_bloom_contains(unbase64('$fb'), k)").as("inB"))
      .collect()
    out.forall(_.getBoolean(0)) shouldBe true // every member found in A
    // near-zero false positives against B (fpp 0.03 over 500 probes)
    out.count(_.getBoolean(1)) should be < 50
  }

  test("interpreted (non-codegen) eval path agrees with codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val keys = (0L until 200L).map(_ * 104729L)
    val b64 = filterB64(keys, 200)
    val df = (keys ++ keys.map(_ + 1L)).toDF("k")
      .withColumn("hit", expr(s"graft_bloom_contains(unbase64('$b64'), k)"))
    val codegen = df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      interp shouldBe codegen
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
