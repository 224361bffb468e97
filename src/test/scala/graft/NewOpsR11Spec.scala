package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-11 invariants: d40, the sig-level certificate twin of d04's
  * simhash pair enumeration (VERDICT r10 task 2). */
class NewOpsR11Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("d40 certificate equals a brute-force per-distance recount over " +
      "collected signatures AND aggregates d04's enumeration exactly") {
    val sigs = spark.read
      .parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id",
        "graft_simhash(graft_md5i_array(array_distinct(split(text, ' ')))) AS sim")
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    sigs.length should be > 10
    // brute force: every doc pair, exact hamming distance
    val pairs = for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 1
    } yield (h, Set(sigs(i)._1, sigs(j)._1),
        Set(sigs(i)._2, sigs(j)._2).toSeq.sorted)
    def expect(h: Int) = {
      val p = pairs.filter(_._1 == h)
      (p.size.toLong, p.flatMap(_._2).distinct.size.toLong,
        p.map(_._3).distinct.size.toLong)
    }
    val rows = SparkEntry.queries("d40_simhash_cert")(spark, sf).collect()
    rows.length shouldBe 2 // both distance rows always present
    val byH = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // hamming-0 groups are per-signature, hamming-1 groups per sig pair —
    // both are what the distinct-signature sets of the brute pairs count
    byH(0L) shouldBe expect(0)
    byH(1L) shouldBe expect(1)
    // the certificate must aggregate the full enumeration: d04's rows
    // grouped by hamming give the same pair counts
    val enum_ = SparkEntry.queries("d04_dedup_simhash")(spark, sf).collect()
    val enumByH = enum_.groupBy(_.getInt(2)).map { case (h, rs) =>
      h.toLong -> rs.length.toLong
    }
    byH(0L)._1 shouldBe enumByH.getOrElse(0L, 0L)
    byH(1L)._1 shouldBe enumByH.getOrElse(1L, 0L)
  }

  test("d40's plan never touches doc-level rows past the signature " +
      "aggregation (no join carries doc_id)") {
    val df = SparkEntry.queries("d40_simhash_cert")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // doc_id may appear only below the first aggregate (the signature
    // count); no join condition or join output may carry it
    import org.apache.spark.sql.catalyst.plans.logical.Join
    df.queryExecution.optimizedPlan.collect { case j: Join => j }
      .foreach { j =>
        j.output.map(_.name) should not contain "doc_id"
      }
    // and the result is bounded: 2 rows regardless of corpus size
    df.count() shouldBe 2L
  }

  test("read_parquet/read_csv/read_json table functions: single path, " +
      "glob, bracketed list, _auto aliases, joins, and glob freshness") {
    import spark.implicits._
    val e = new Engine(spark)
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-tfn").toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
        .write.parquet(s"$root/a.parquet")
      Seq((3L, "c")).toDF("id", "tag").write.parquet(s"$root/b.parquet")
      Seq((1L, "x")).toDF("id", "lab").write.option("header", "true")
        .csv(s"$root/t.csv")
      Seq((2L, 9.5)).toDF("id", "w").write.json(s"$root/t.json")
      // single path
      e.sql(s"SELECT count(*) AS n FROM read_parquet('$root/a.parquet')")
        .collect()(0).getLong(0) shouldBe 2L
      // glob expands in Spark's file index
      e.sql(s"SELECT count(*) AS n FROM read_parquet('$root/*.parquet')")
        .collect()(0).getLong(0) shouldBe 3L
      // bracketed list
      e.sql(s"SELECT count(*) AS n FROM read_parquet(" +
        s"['$root/a.parquet', '$root/b.parquet'])")
        .collect()(0).getLong(0) shouldBe 3L
      // csv (header) + _auto alias + json, composed in one join query
      val j = e.sql(
        s"SELECT p.id, c.lab, jj.w FROM read_parquet('$root/a.parquet') p " +
          s"JOIN read_csv_auto('$root/t.csv') c ON p.id = c.id " +
          s"JOIN read_json('$root/t.json') jj ON true ORDER BY p.id")
        .collect()
      j.length shouldBe 1
      j(0).getString(1) shouldBe "x"
      j(0).getDouble(2) shouldBe 9.5
      // glob freshness: a part landing under the glob re-registers
      Seq((4L, "d"), (5L, "e")).toDF("id", "tag")
        .write.parquet(s"$root/c.parquet")
      e.sql(s"SELECT count(*) AS n FROM read_parquet('$root/*.parquet')")
        .collect()(0).getLong(0) shouldBe 5L
      // FROM-first spelling composes with the rewrite
      e.sql(s"FROM read_parquet('$root/a.parquet') SELECT max(id) AS m")
        .collect()(0).getLong(0) shouldBe 2L
      // decoy: the call text inside a string literal stays inert
      e.sql(s"SELECT 'FROM read_parquet(''x'')' AS s").collect()(0)
        .getString(0) shouldBe "FROM read_parquet('x')"
    } finally e.close()
  }

  test("rewriteBrackets: list literals, ARRAY[..], comprehensions with " +
      "IF (including if() decoys), nesting, subscripts, quote inertness") {
    import SqlScan.rewriteBrackets
    // literals
    rewriteBrackets("SELECT [1, 2, 3] AS l") shouldBe
      "SELECT array(1, 2, 3) AS l"
    rewriteBrackets("SELECT ARRAY[1, 2] AS l") shouldBe
      "SELECT array(1, 2) AS l"
    // comprehension, no predicate
    rewriteBrackets("[x + 1 FOR x IN l]") shouldBe
      "transform(l, x -> x + 1)"
    // comprehension with IF
    rewriteBrackets("[upper(w) FOR w IN ws IF length(w) > 3]") shouldBe
      "transform(filter(ws, w -> length(w) > 3), w -> upper(w))"
    // an if() FUNCTION in the list expression must not split
    rewriteBrackets("[x FOR x IN if(c, a, b)]") shouldBe
      "transform(if(c, a, b), x -> x)"
    rewriteBrackets("[x FOR x IN if(c, a, b) IF x > 2]") shouldBe
      "transform(filter(if(c, a, b), x -> x > 2), x -> x)"
    // nesting rewrites inside-out
    rewriteBrackets("[[y FOR y IN x] FOR x IN l]") shouldBe
      "transform(l, x -> transform(x, y -> y))"
    rewriteBrackets("[size([w FOR w IN d IF w > 0]) FOR d IN ds]") shouldBe
      "transform(ds, d -> size(transform(filter(d, w -> w > 0), w -> w)))"
    // subscripts preserved (identifier, ')', ']', string-literal bases)
    rewriteBrackets("SELECT w[i], f(x)[0], m['k'], 'ab'[1]") shouldBe
      "SELECT w[i], f(x)[0], m['k'], 'ab'[1]"
    rewriteBrackets("a[0][1]") shouldBe "a[0][1]"
    // a literal as a function ARGUMENT is a literal, not a subscript
    rewriteBrackets("array_contains([1,2], x)") shouldBe
      "array_contains(array(1,2), x)"
    // quoted text is inert (globs in paths, FOR/IF inside strings)
    rewriteBrackets("SELECT '[1,2]', \"c[0]\" FROM read_parquet('d/[ab].parquet')") shouldBe
      "SELECT '[1,2]', \"c[0]\" FROM read_parquet('d/[ab].parquet')"
    rewriteBrackets("['FOR', 'IF']") shouldBe "array('FOR', 'IF')"
    // unbalanced fails loudly
    an[Exception] should be thrownBy rewriteBrackets("SELECT [1, 2")
    // DuckDB list slicing (1-based inclusive; open ends) -> Spark slice()
    rewriteBrackets("l[2:4]") shouldBe
      "slice(l, (2), greatest(0, (4) - (2) + 1))"
    rewriteBrackets("l[:2]") shouldBe
      "slice(l, 1, greatest(0, (2) - 1 + 1))"
    rewriteBrackets("l[2:]") shouldBe
      "slice(l, (2), greatest(0, size(l) - (2) + 1))"
    // function-call base, string literal inside its parens
    rewriteBrackets("split(t, ' ')[2:3]") shouldBe
      "slice(split(t, ' '), (2), greatest(0, (3) - (2) + 1))"
    // parenthesized and chained bases
    rewriteBrackets("(a)[1:2]") shouldBe
      "slice((a), (1), greatest(0, (2) - (1) + 1))"
    rewriteBrackets("m.arr[2:]") shouldBe
      "slice(m.arr, (2), greatest(0, size(m.arr) - (2) + 1))"
    // plain subscripts still untouched next to slices
    rewriteBrackets("l[2:3][0]") shouldBe
      "slice(l, (2), greatest(0, (3) - (2) + 1))[0]"
  }

  test("rewriteBraces: struct literals, MAP literals, nesting, bare and " +
      "quoted keys, quote inertness, loud rejects") {
    import SqlScan.rewriteBraces
    rewriteBraces("SELECT {'a': 1, 'b': x} AS s") shouldBe
      "SELECT named_struct('a', 1, 'b', x) AS s"
    // bare identifier keys normalize to string keys
    rewriteBraces("{a: 1, b_2: f(x, y)}") shouldBe
      "named_struct('a', 1, 'b_2', f(x, y))"
    // MAP literal form consumes the keyword
    rewriteBraces("SELECT MAP {'k': v, 'k2': 2}") shouldBe
      "SELECT map('k', v, 'k2', 2)"
    // nesting rewrites inside-out
    rewriteBraces("{'o': {'i': 1}}") shouldBe
      "named_struct('o', named_struct('i', 1))"
    // values with commas inside calls/subscripts don't split fields
    rewriteBraces("{'a': f(x, y), 'b': l[g(1, 2)]}") shouldBe
      "named_struct('a', f(x, y), 'b', l[g(1, 2)])"
    // escaped-quote keys
    rewriteBraces("{'it''s': 1}") shouldBe "named_struct('it\\'s', 1)"
    // braces in strings/comments stay inert
    rewriteBraces("SELECT '{not: struct}' AS s") shouldBe
      "SELECT '{not: struct}' AS s"
    // loud rejects
    an[Exception] should be thrownBy rewriteBraces("SELECT {}")
    an[Exception] should be thrownBy rewriteBraces("SELECT {1, 2}")
    an[Exception] should be thrownBy rewriteBraces("SELECT {'a': 1")
  }

  test("struct and MAP literals run end-to-end through the engine") {
    import spark.implicits._
    val e = new Engine(spark)
    try {
      Seq((1L, "src-a")).toDF("id", "src").createOrReplaceTempView("st_t")
      val r = e.sql(
        "SELECT {'s': src, 'n': id * 2}.n AS n2, " +
          "MAP {'x': 1, 'y': 2}['y'] AS my, " +
          "{'outer': {'inner': id}} AS o FROM st_t").collect()(0)
      r.getLong(0) shouldBe 2L
      r.getInt(1) shouldBe 2
      r.getStruct(2).getStruct(0).getLong(0) shouldBe 1L
    } finally e.close()
  }

  test("list slicing runs end-to-end and matches DuckDB's 1-based " +
      "inclusive semantics") {
    import spark.implicits._
    val e = new Engine(spark)
    try {
      Seq((1L, "a b c d e")).toDF("id", "txt")
        .createOrReplaceTempView("sl_t")
      val r = e.sql(
        "SELECT split(txt, ' ')[2:4] AS mid, split(txt, ' ')[:2] AS head, " +
          "split(txt, ' ')[4:] AS tail FROM sl_t").collect()(0)
      r.getSeq[String](0) shouldBe Seq("b", "c", "d")
      r.getSeq[String](1) shouldBe Seq("a", "b")
      r.getSeq[String](2) shouldBe Seq("d", "e")
      // out-of-range end clamps like DuckDB (greatest(0,..) + slice clamp)
      e.sql("SELECT split(txt, ' ')[4:99] AS t FROM sl_t").collect()(0)
        .getSeq[String](0) shouldBe Seq("d", "e")
      e.sql("SELECT split(txt, ' ')[9:] AS t FROM sl_t").collect()(0)
        .getSeq[String](0) shouldBe Seq.empty
    } finally e.close()
  }

  test("list comprehensions run end-to-end through the engine dialect") {
    import spark.implicits._
    val e = new Engine(spark)
    try {
      Seq((1L, "alpha beta gg"), (2L, "x longerword y"))
        .toDF("id", "txt").createOrReplaceTempView("lc_t")
      val r = e.sql(
        "SELECT id, [upper(w) FOR w IN split(txt, ' ') IF length(w) >= 4] " +
          "AS ws, [id, id * 2] AS pair FROM lc_t ORDER BY id").collect()
      r(0).getSeq[String](1) shouldBe Seq("ALPHA", "BETA")
      r(1).getSeq[String](1) shouldBe Seq("LONGERWORD")
      r(0).getSeq[Long](2) shouldBe Seq(1L, 2L)
      // subscript still works through the same front door (0-based Spark)
      e.sql("SELECT split(txt, ' ')[0] AS w0 FROM lc_t WHERE id = 1")
        .collect()(0).getString(0) shouldBe "alpha"
    } finally e.close()
  }

  test("maintenance statements (CHECKPOINT / VACUUM / ANALYZE) and " +
      "COMMENT ON run through the dialect; comments surface in DESCRIBE") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE mt (k BIGINT, v VARCHAR)")
      e.sql("INSERT INTO mt SELECT 1, 'a'")
      e.sql("INSERT INTO mt SELECT 2, 'b'")
      e.sql("CHECKPOINT").collect().length shouldBe 1
      e.sql("FORCE CHECKPOINT").collect().length shouldBe 1
      e.sql("VACUUM").collect().length shouldBe 1
      val anRows = e.sql("ANALYZE mt").collect()
      anRows.length shouldBe 1
      anRows(0).getString(0) shouldBe "mt"
      anRows(0).getLong(1) shouldBe 2L
      e.sql("ANALYZE").collect().map(_.getString(0)) should contain("mt")
      e.sql("VACUUM ANALYZE mt").collect()(0).getLong(1) shouldBe 2L
      // column comments surface in DESCRIBE's extra; NULL unsets
      e.sql("COMMENT ON COLUMN mt.v IS 'the payload'")
      def extraOf(c: String) = e.sql("DESCRIBE mt").collect()
        .find(_.getString(0) == c).get
      extraOf("v").getString(5) shouldBe "the payload"
      extraOf("k").isNullAt(5) shouldBe true
      e.sql("COMMENT ON TABLE mt IS 'a table'").collect().length shouldBe 1
      e.sql("COMMENT ON COLUMN mt.v IS NULL")
      extraOf("v").isNullAt(5) shouldBe true
      // target-shape mismatches reject loudly
      an[Exception] should be thrownBy e.sql("COMMENT ON COLUMN mt IS 'x'")
      an[Exception] should be thrownBy
        e.sql("COMMENT ON TABLE mt.v IS 'x'")
      e.sql("DROP TABLE mt")
    } finally e.close()
  }

  test("SPARK_GRAFT_BENCH_SKIP names are honored by Bench's selection " +
      "filter semantics (set-difference, not substring)") {
    // the env var itself cannot be set from inside the JVM; pin the
    // filter contract Bench applies so a rename breaks loudly here
    val names = SparkEntry.queries.keySet
    names should contain("d04_dedup_simhash")
    names should contain("d40_simhash_cert")
    val skip = Set("d04_dedup_simhash")
    val selected = names.filter(n => !skip.contains(n))
    selected should contain("d40_simhash_cert")
    selected should not contain "d04_dedup_simhash"
  }
}
