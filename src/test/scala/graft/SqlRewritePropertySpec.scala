package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-fuzz for the composed pre-parser rewrite stack (r12 VERDICT
  * task 1): ~10 text transforms now stand between the user's SQL and
  * Spark's parser, and a masking or ordering bug in any of them corrupts
  * statements SILENTLY. Seeded LCG generation (the repo's property-spec
  * convention), hundreds of cases per property, three layers:
  *
  *  (a) NO-OP OUTSIDE TRIGGERS — SQL-shaped strings built from an
  *      alphabet containing no rewrite trigger pass through every
  *      transform (and the composed chain) byte-identical;
  *  (b) OPAQUE PROTECTION — trigger text placed ONLY inside comments
  *      (incl. nested block comments), quoted identifiers, and
  *      dollar-quoted literals never rewrites;
  *  (c) STABILITY — the composed chain (minus the raw-backslash leaf,
  *      which is non-idempotent BY DESIGN and applied exactly once at
  *      the parse boundary) is idempotent on trigger-bearing input, and
  *      randomized comment/whitespace-decorated variants of real queries
  *      return the SAME ROWS through the full `Engine.sql` path.
  */
class SqlRewritePropertySpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private lazy val engine = new Engine(spark)

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  /** The SqlScan slice of the Engine.sql chain, innermost-first order
    * exactly as `Engine.sqlDispatch` composes it (raw-backslash leaf
    * excluded — see the class doc). */
  private def chain(s: String): String =
    SqlScan.rewriteBuiltinRenames(SqlScan.rewriteRegexpReplace(
      SqlScan.rewriteDateDiff(SqlScan.rewriteArrows(
        SqlScan.rewriteStructPack(SqlScan.rewriteBraces(
          SqlScan.rewriteBrackets(s)))))))

  private val rewrites: Seq[(String, String => String)] = Seq(
    "rewriteDollarQuotes" -> SqlScan.rewriteDollarQuotes,
    "rewriteBrackets" -> SqlScan.rewriteBrackets,
    "rewriteBraces" -> SqlScan.rewriteBraces,
    "rewriteStructPack" -> SqlScan.rewriteStructPack,
    "rewriteArrows" -> SqlScan.rewriteArrows,
    "rewriteDateDiff" -> SqlScan.rewriteDateDiff,
    "rewriteRegexpReplace" -> SqlScan.rewriteRegexpReplace,
    "rewriteBuiltinRenames" -> SqlScan.rewriteBuiltinRenames,
    "rewriteRawBackslashes" -> SqlScan.rewriteRawBackslashes)

  // ---- (a) no-op outside triggers ------------------------------------------

  test("every rewrite and the composed chain are identity on SQL with no " +
      "trigger anywhere (500 cases)") {
    val r = lcg(0x5eed1313L)
    def word(): String = {
      val len = 1 + math.floorMod(r.next(), 7).toInt
      (0 until len).map(_ => ('a' + math.floorMod(r.next(), 26)).toChar)
        .mkString
    }
    // atoms from an alphabet with NO trigger: no [ ] { } -> backslash $,
    // and words too short to spell a trigger function name
    def atom(): String = math.floorMod(r.next(), 8) match {
      case 0 => word()
      case 1 => math.floorMod(r.next(), 10000).toString
      case 2 => s"'${word()} ${word()}'"
      case 3 => s""""${word()} ${word()}""""
      case 4 => s"`${word()} ${word()}`"
      case 5 => s"${word()}(${word()}, ${word()})"
      case 6 => s"(${word()} + ${word()})"
      case _ => s"${word()} = ${word()}"
    }
    (0 until 500).foreach { _ =>
      val sql = s"SELECT ${atom()}, ${atom()} FROM ${word()} WHERE ${atom()}"
      rewrites.foreach { case (name, f) =>
        withClue(s"$name on: $sql") { f(sql) shouldBe sql }
      }
      withClue(s"chain on: $sql") { chain(sql) shouldBe sql }
    }
  }

  // ---- (b) opaque protection -----------------------------------------------

  test("trigger text inside comments, quoted identifiers, and dollar " +
      "quotes never rewrites (500 cases)") {
    val r = lcg(0xbadc0deL)
    val payloads = Seq(
      "[1, 2, 3]", "l[2]", "l[1:3]", "{'k': 1}", "{a: x}",
      "struct_pack(k := 1)", "j -> 'a'", "j ->> 'b'",
      "date_diff('day', a, b)", "datediff('hour', a, b)",
      "regexp_replace(s, p, q)", "x -> x + 1",
      "regexp_extract(s, p)", "regexp_extract_all(s, p)",
      "dayofweek(d)", "[u for u in l]", "back\\slash \\d")
    def payload(): String =
      payloads(math.floorMod(r.next(), payloads.length).toInt)
    def word(): String = {
      val len = 1 + math.floorMod(r.next(), 6).toInt
      (0 until len).map(_ => ('a' + math.floorMod(r.next(), 26)).toChar)
        .mkString
    }
    // trigger text appears ONLY inside an opaque region; note NO
    // single-quoted atom here — a '' literal is opaque to the structural
    // rewrites but NOT to the raw-backslash leaf (tested separately)
    def opaque(): String = math.floorMod(r.next(), 6) match {
      case 0 => s"-- ${payload()}\n"
      case 1 => s"/* ${payload()} */"
      case 2 => s"/* ${word()} /* ${payload()} */ ${word()} */" // nested
      case 3 => s""""${payload()}""""
      case 4 => s"`${payload()}`"
      case _ =>
        val tag = word()
        "$" + tag + "$" + payload() + "$" + tag + "$"
    }
    (0 until 500).foreach { _ =>
      val sql = s"SELECT ${word()} ${opaque()} , ${word()} ${opaque()} " +
        s"FROM ${word()}"
      rewrites.filterNot(_._1 == "rewriteDollarQuotes").foreach {
        case (name, f) =>
          withClue(s"$name on: $sql") { f(sql) shouldBe sql }
      }
      // maskOpaque is the shared scanner: length-preserving, stable, and
      // the masked text must not leak payload characters
      val masked = SqlScan.maskOpaque(sql)
      masked.length shouldBe sql.length
      SqlScan.maskOpaque(masked) shouldBe masked
      masked should not include "struct_pack"
      masked should not include "->"
    }
  }

  test("the raw-backslash leaf touches ONLY single-quoted literal " +
      "content (300 cases)") {
    val r = lcg(0xdeadbee1L)
    def word(): String = {
      val len = 1 + math.floorMod(r.next(), 6).toInt
      (0 until len).map(_ => ('a' + math.floorMod(r.next(), 26)).toChar)
        .mkString
    }
    (0 until 300).foreach { _ =>
      val w1 = word(); val w2 = word()
      // backslashes outside '' literals: identity
      val inert = s"SELECT `$w1\\d` -- \\n $w2\n , " +
        s""""$w1\\w" /* \\s */ FROM $w2"""
      SqlScan.rewriteRawBackslashes(inert) shouldBe inert
      // backslashes inside a '' literal double EXACTLY once; the
      // surrounding text is untouched
      val sql = s"SELECT '$w1\\d$w2' FROM $w1"
      SqlScan.rewriteRawBackslashes(sql) shouldBe
        s"SELECT '$w1\\\\d$w2' FROM $w1"
    }
  }

  // ---- (c) stability -------------------------------------------------------

  test("the composed chain is idempotent on trigger-bearing SQL " +
      "(500 cases)") {
    val r = lcg(0x1de9070L)
    def word(): String = {
      val len = 1 + math.floorMod(r.next(), 6).toInt
      (0 until len).map(_ => ('a' + math.floorMod(r.next(), 26)).toChar)
        .mkString
    }
    def triggered(): String = math.floorMod(r.next(), 10) match {
      case 0 => s"[${math.floorMod(r.next(), 9)}, ${word()}, 'x']"
      case 1 => s"${word()}[${1 + math.floorMod(r.next(), 5).toInt}]"
      case 2 => s"${word()}[1:${2 + math.floorMod(r.next(), 5).toInt}]"
      case 3 => s"{'${word()}': ${word()}, '${word()}': 1}"
      case 4 => s"struct_pack(${word()} := ${word()})"
      case 5 => s"${word()} -> '${word()}'"
      case 6 => s"${word()} ->> '${word()}'"
      case 7 => s"date_diff('day', ${word()}, ${word()})"
      case 8 => s"regexp_replace(${word()}, '${word()}', '${word()}')"
      case _ => s"transform(${word()}, x -> x + 1)"
    }
    (0 until 500).foreach { _ =>
      val sql = s"SELECT ${triggered()}, ${triggered()} AS ${word()} " +
        s"FROM ${word()} WHERE ${triggered()} = ${word()}"
      val once = chain(sql)
      withClue(s"chain unstable on: $sql\nonce: $once") {
        chain(once) shouldBe once
      }
    }
  }

  test("comment/whitespace-decorated variants of real queries return the " +
      "same rows through the full Engine.sql path (10 bases x 20 variants)") {
    engine.sql("CREATE OR REPLACE TABLE fuzz_region AS SELECT * FROM " +
      "'/root/testdata/sf0.001/region.parquet'")
    try {
      val bases = Seq(
        "SELECT r_regionkey, r_name FROM fuzz_region ORDER BY r_regionkey",
        "SELECT len(['a', 'b', 'c']) AS n, [10, 20, 30][2] AS e " +
          "FROM fuzz_region ORDER BY n LIMIT 1",
        "SELECT struct_pack(k := r_regionkey, v := r_name).k AS k " +
          "FROM fuzz_region ORDER BY k",
        """SELECT '{"a": {"b": 3}}'->'a'->>'b' AS v, r_regionkey """ +
          "FROM fuzz_region ORDER BY r_regionkey",
        "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-05') " +
          "AS d, count(*) AS n FROM fuzz_region GROUP BY d",
        "SELECT regexp_replace(r_name, '[AEIOU]', '#', 'g') AS m " +
          "FROM fuzz_region ORDER BY m",
        "SELECT r_regionkey FROM fuzz_region WHERE " +
          "list_contains([0, 2, 4], r_regionkey) ORDER BY r_regionkey",
        "SELECT {'k': r_regionkey}.k AS k FROM fuzz_region ORDER BY k",
        "SELECT transform([1, 2, 3], x -> x * r_regionkey) AS t " +
          "FROM fuzz_region ORDER BY r_regionkey",
        "SELECT upper(r_name) AS u, length(r_name) AS l " +
          "FROM fuzz_region ORDER BY u")
      val decorations = Seq(
        " /* [1,2] -> 'x' struct_pack {a: 1} \\d */ ",
        " -- date_diff('day', x, y) ->> 'k'\n ",
        "   ", "\n\t ", " /* nested /* [9] */ ok */ ")
      val r = lcg(0xfacadeL)
      bases.foreach { base =>
        val expected = engine.sql(base).collect().map(_.toString).toSeq
        expected should not be empty
        (0 until 20).foreach { _ =>
          // inject decorations only at spaces OUTSIDE string literals
          // (the bases' only opaque regions are plain '' literals);
          // arrows are written space-free in the bases — a comment
          // between an arrow and its operand fails LOUD at parse, never
          // silently
          var inQuote = false
          val variant = base.map { c =>
            if (c == '\'') { inQuote = !inQuote; c.toString }
            else if (c == ' ' && !inQuote &&
                math.floorMod(r.next(), 3) == 0)
              decorations(math.floorMod(r.next(), decorations.length).toInt)
            else c.toString
          }.mkString
          withClue(s"variant: $variant") {
            engine.sql(variant).collect().map(_.toString).toSeq shouldBe
              expected
          }
        }
      }
    } finally engine.sql("DROP TABLE fuzz_region")
  }
}
