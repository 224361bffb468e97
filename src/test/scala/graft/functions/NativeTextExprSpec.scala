package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Every native codegen'd expression must be BIT-IDENTICAL to the
  * interpreted composable form it replaced — verified over the real
  * documents corpus so the DuckDB-oracle contract is preserved. */
class NativeTextExprSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
  }

  private val md5iLambda = "CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)"

  test("graft_shingles equals the transform/concat composition") {
    val w = "split(text, ' ')"
    val composed = s"array_distinct(transform(sequence(1, size($w) - 2), i -> " +
      s"concat(element_at($w, i), ' ', element_at($w, i+1), ' ', element_at($w, i+2))))"
    val diff = docs.filter(expr(s"size($w) >= 3"))
      .select(expr("graft_shingles(text)").as("a"), expr(composed).as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_char_ngrams equals the transform/substring composition") {
    val composed = "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
    val diff = docs.filter(expr("length(text) >= 3"))
      .select(expr("graft_char_ngrams(text)").as("a"), expr(composed).as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_char_ngrams counts code points, not UTF-16 units") {
    import spark.implicits._
    val composed = "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
    // supplementary-plane emoji (surrogate pair), combining marks, CJK
    val rows = Seq("ab😀cd", "héllo wörld", "日本語テキスト", "😀😁😂😃")
      .toDF("text")
    val diff = rows
      .select(expr("graft_char_ngrams(text)").as("a"), expr(composed).as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_winnow equals the transform/slice window-min composition") {
    val hv = "transform(sequence(1, length(text) - 7), i -> " +
      "CAST(conv(substr(md5(substr(text, i, 8)), 1, 8), 16, 10) AS BIGINT)" +
      " % 1000000007)"
    val composed = s"array_distinct(transform(sequence(1, size($hv) - 3), " +
      s"t -> array_min(slice($hv, t, 4))))"
    val diff = docs.filter(expr("length(text) >= 11"))
      .select(expr("graft_winnow(text, 8, 4, 1000000007)").as("a"),
        expr(composed).as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_winnow is code-point (not UTF-16) indexed and guards short text") {
    import spark.implicits._
    val hv = "transform(sequence(1, length(text) - 7), i -> " +
      "CAST(conv(substr(md5(substr(text, i, 8)), 1, 8), 16, 10) AS BIGINT)" +
      " % 1000000007)"
    val composed = s"array_distinct(transform(sequence(1, size($hv) - 3), " +
      s"t -> array_min(slice($hv, t, 4))))"
    GraftFunctions.register(spark)
    val rows = Seq("ab😀cd😁ef😂gh😃ij kl", "héllo wörld hellö wõrld",
      "日本語テキストの重複検出テスト", "short", "exactly11ch").toDF("text")
    val diff = rows.filter(expr("length(text) >= 11"))
      .select(expr("graft_winnow(text, 8, 4, 1000000007)").as("a"),
        expr(composed).as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
    // below k+w-1 code points -> empty, no exception
    rows.filter(expr("length(text) < 11"))
      .select(expr("graft_winnow(text, 8, 4, 1000000007)").as("a"))
      .collect().foreach(_.getSeq[Long](0) shouldBe empty)
  }

  test("graft_md5i_array equals per-element md5 conv") {
    val diff = docs
      .select(expr("graft_shingles(text)").as("sh"))
      .select(expr("graft_md5i_array(sh)").as("a"),
        expr(s"transform(sh, s -> $md5iLambda)").as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_minhash equals array_min over the affine transform") {
    val (a, b, p) = (523L, 1009L, 1000000007L)
    val diff = docs
      .select(expr("graft_md5i_array(graft_shingles(text))").as("hv"))
      .filter(expr("size(hv) > 0"))
      .select(expr(s"graft_minhash(hv, $a, $b, $p)").as("x"),
        expr(s"array_min(transform(hv, h -> ($a * (h % $p) + $b) % $p))").as("y"))
      .filter(expr("x != y"))
    diff.count() shouldBe 0L
  }

  test("graft_pairs equals the transform/slice composition") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Seq(1L, 5L, 9L, 12L), Seq(3L), Seq.empty[Long], Seq(2L, 4L))
      .toDF("ds")
    val composed = "flatten(transform(ds, (x, i) -> " +
      "transform(slice(ds, i + 2, size(ds)), y -> named_struct('d1', x, 'd2', y))))"
    val diff = df.select(expr("graft_pairs(ds)").as("a"), expr(composed).as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_icount equals size(array_intersect) on real shingle pairs") {
    GraftFunctions.register(spark)
    // cross-join a bounded slice of real shingle arrays so empty,
    // disjoint, partial and identical overlaps all occur
    val sh = docs.filter(expr("size(split(text, ' ')) >= 3")).limit(30)
      .select(expr("graft_shingles(text)").as("sh"))
    val pairs = sh.select(col("sh").as("sh1"))
      .crossJoin(sh.select(col("sh").as("sh2")))
    val diff = pairs.select(
        expr("graft_icount(sh1, sh2)").as("a"),
        expr("size(array_intersect(sh1, sh2))").as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_icount matches array_intersect null/dup semantics") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq[String]("a", "b", "a", null), Seq[String]("a", null, "c")),
      (Seq[String]("a", "b"), Seq[String]("c")),
      (Seq[String](), Seq[String]("a")),
      (Seq[String](null, null), Seq[String](null)),
      (Seq[String]("x", "y", "y"), Seq[String]("y", "y", "x"))
    ).toDF("sh1", "sh2")
    val diff = df.select(
        expr("graft_icount(sh1, sh2)").as("a"),
        expr("size(array_intersect(sh1, sh2))").as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_simhash equals the 32 per-bit aggregate folds") {
    val composed = (0 until 32).map { j =>
      s"(CASE WHEN aggregate(wv, 0, (a, h) -> a + (CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j}L ELSE 0L END)"
    }.mkString("(", " + ", ")")
    val diff = docs
      .select(expr("graft_md5i_array(array_distinct(split(text, ' ')))").as("wv"))
      .select(expr("graft_simhash(wv)").as("a"), expr(composed).as("b"))
      .filter(expr("a != b"))
    diff.count() shouldBe 0L
  }

  test("graft_dot equals the aggregate/zip_with fold (incl. int literal arrays)") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val lits = (1 to 64).map(i => if (i % 3 == 0) -1 else 1).mkString("array(", ",", ")")
    val composed = s"aggregate(zip_with(embedding, $lits, (x, h) -> CAST(x AS DOUBLE) * CAST(h AS DOUBLE)), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    val out = e.select(expr(s"graft_dot(embedding, $lits)").as("a"), expr(composed).as("b"))
      .collect()
    out.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("graft_token_stats equals the three interpreted aggregates") {
    val stops = Seq("the", "a", "of", "to", "in", "and", "is", "it")
    val stopArgs = stops.map(w => s"'$w'").mkString(", ")
    val stopArr = stops.map(w => s"'$w'").mkString("array(", ",", ")")
    val w = "split(text, ' +')"
    val diff = docs.select(
        expr(s"graft_token_stats(text, $stopArgs)").as("ts"),
        expr(s"size($w)").as("n_tokens"),
        expr(s"size(filter($w, x -> array_contains($stopArr, x)))").as("n_stop"),
        expr(s"aggregate(transform($w, x -> length(x)), 0, (a, x) -> a + x)").as("sum_len"))
      .filter(expr("ts.n_tokens != n_tokens OR ts.n_stop != n_stop OR ts.sum_len != sum_len"))
    diff.count() shouldBe 0L
  }

  test("graft_lm_fold equals the aggregate/element_at composition") {
    import spark.implicits._
    val bgArr = "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"
    // model over the corpus + a unicode stress row; plus a doc with a
    // bigram MISSING from the model must null-poison in both forms
    val base = docs.select(col("text"))
      .unionAll(Seq("héllo wörld 😀😁 日本語", "ab").toDF("text"))
      .filter(expr("length(text) >= 2"))
    val model = base.select(explode(expr(bgArr)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .select(col("bg"), expr("cast(cnt * 1000 + length(bg) as bigint)").as("v"))
      .agg(map_from_entries(collect_list(struct(col("bg"), col("v")))).as("m"))
    val scored = base.unionAll(Seq("ZZ@@##unseen").toDF("text"))
      .crossJoin(broadcast(model))
      .select(
        expr("graft_lm_fold(text, m)").as("a"),
        expr(s"aggregate($bgArr, 0L, (acc, g) -> acc + element_at(m, g))").as("b"))
    scored.filter(expr("a IS DISTINCT FROM b")).count() shouldBe 0L
    // the unseen-bigram row really exercised the null branch
    scored.filter(expr("a IS NULL")).count() should be >= 1L
  }

  test("graft_l2 equals the aggregate/zip_with composition on real embeddings") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b")).limit(500)
    val composed =
      "aggregate(zip_with(va, vb, (x, y) -> (cast(x as double) - cast(y as double)) " +
        "* (cast(x as double) - cast(y as double))), 0.0D, (acc, v) -> acc + v)"
    pairs.select(expr("graft_l2(va, vb)").as("n"), expr(composed).as("c"))
      .filter(expr("n IS DISTINCT FROM c")).count() shouldBe 0L
  }

  test("graft_pq_adc equals the per-subspace graft_l2 slice sum") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = e.selectExpr("size(embedding)").head().getInt(0)
    val m = 4
    val sub = dim / m
    val k = 3
    // synthetic codebooks: deterministic doubles, m x k x sub
    val books: Seq[Seq[Seq[Double]]] = (0 until m).map(j =>
      (0 until k).map(c => (0 until sub).map(i =>
        ((j + 1) * 0.25 + c * 0.125 + i * 0.0625))))
    val booksLit = typedlit(books)
    val codes = array((0 until m).map(j => lit((j * 7 + 3) % k)): _*)
    val sliceSum = (0 until m).map { j =>
      val cent = typedlit(books(j)((j * 7 + 3) % k))
      call_function("graft_l2",
        expr(s"slice(embedding, ${j * sub + 1}, $sub)"), cent)
    }.reduce(_ + _)
    e.limit(200).select(
        call_function("graft_pq_adc", col("embedding"), codes, booksLit).as("n"),
        sliceSum.as("c"))
      .filter(expr("n IS DISTINCT FROM c")).count() shouldBe 0L
  }

  test("graft_pq_adc rejects an out-of-range code with a descriptive error") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = e.selectExpr("size(embedding)").head().getInt(0)
    val m = 4
    val sub = dim / m
    val k = 3
    val books: Seq[Seq[Seq[Double]]] = (0 until m).map(j =>
      (0 until k).map(c => (0 until sub).map(i =>
        ((j + 1) * 0.25 + c * 0.125 + i * 0.0625))))
    // subspace 2 carries a corrupt code (k, one past the last centroid)
    val codes = array(lit(0), lit(1), lit(k), lit(2))
    val ex = intercept[Exception] {
      e.limit(5).select(
          call_function("graft_pq_adc", col("embedding"), codes,
            typedlit(books)).as("d"))
        .collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    withClue(msgs) {
      msgs should include("graft_pq_adc")
      msgs should include(s"code $k out of range [0, $k) in subspace 2")
    }
  }

  test("graft_lm_fold: row-variant models never hit a stale thread cache") {
    import spark.implicits._
    // Two models with IDENTICAL size, boundary keys and boundary values —
    // only an interior entry differs. The old boundary-fingerprint cache
    // validation reused model A's index for model B; content-complete
    // validation must score each row against its own model. One partition
    // forces both rows through the same executor thread (same cache slot).
    val rows = Seq(
      ("abc", Map("ab" -> 1L, "bc" -> 10L, "zz" -> 7L)),
      ("abc", Map("ab" -> 1L, "bc" -> 20L, "zz" -> 7L))).toDF("text", "m")
      .repartition(1)
    val got = rows.select(expr("graft_lm_fold(text, m)").as("v"))
      .as[Long].collect().sorted
    got shouldBe Array(11L, 21L)
  }

  test("graft_cdc_chunks: lossless partition, short-text identity, resync") {
    import spark.implicits._
    // lossless: chunks concatenate back to the text; every chunk non-empty
    val base = docs.select(col("text"))
      .unionAll(Seq("héllo wörld 😀😁 日本語 and some more text here", "short").toDF("text"))
      .select(col("text"), expr("graft_cdc_chunks(text)").as("ch"))
    base.filter(expr("array_join(ch, '') <> text OR exists(ch, c -> length(c) = 0)"))
      .count() shouldBe 0L
    // < 8 code points -> single whole-text chunk
    base.filter(expr("length(text) < 8 AND (size(ch) <> 1 OR ch[0] <> text)"))
      .count() shouldBe 0L
    // the CDC property: an insertion near the start only disturbs a
    // bounded prefix — the chunker re-synchronizes, so the tail chunk
    // multiset of the edited doc overlaps the original's (fixed-width
    // chunking shifts EVERY downstream chunk instead)
    val doc = docs.select(col("text")).as[String].collect()
      .find(_.length > 200).get
    val edited = doc.substring(0, 10) + "XYZ" + doc.substring(10)
    val Seq(a, b) = Seq(doc, edited).toDF("text")
      .select(expr("graft_cdc_chunks(text)").as("ch")).as[Seq[String]].collect().toSeq
    val shared = a.toSet.intersect(b.toSet)
    withClue(s"orig ${a.size} chunks, edited ${b.size}, shared ${shared.size}: ") {
      shared.nonEmpty shouldBe true
      // the final chunk (far from the edit) must be identical
      a.last shouldBe b.last
    }
  }

  test("graft_char_grams equals the transform/substring composition") {
    import spark.implicits._
    val base = docs.select(col("text"))
      .unionAll(Seq("héllo wörld 😀😁 日本語", "ab", "x", "").toDF("text"))
    Seq(2, 3, 5).foreach { n =>
      // guard: sequence(1, stop) runs DESCENDING when stop < 1, so the
      // composition needs an explicit empty case for short strings
      val composed =
        s"""CASE WHEN length(text) >= $n
           | THEN transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n))
           | ELSE CAST(array() AS array<string>) END""".stripMargin
      val diff = base.select(
          expr(s"graft_char_grams(text, $n)").as("a"), expr(composed).as("b"))
        .filter(expr("a IS DISTINCT FROM b"))
      withClue(s"n=$n: ") { diff.count() shouldBe 0L }
    }
  }
}
