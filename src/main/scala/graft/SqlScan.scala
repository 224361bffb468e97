package graft

/** The ONE shared quote/paren-aware SQL tokenizer behind every textual
  * clause split in the engine dialect (UPDATE/DELETE/SET splitting, the
  * INSERT ... ON CONFLICT clause, EXECUTE argument lists, FROM-first
  * rewriting, USING SAMPLE). All scans obey the same discipline:
  *
  *  - a single-quoted literal, double-quoted literal, or backquoted
  *    identifier is opaque — keywords and separators inside never match;
  *  - parenthesized regions are opaque to top-level scans — a WHERE in a
  *    subquery or a ',' in a call never splits an outer clause;
  *  - `--` line comments and `/* */` block comments (which NEST, per the
  *    Postgres grammar DuckDB follows) are opaque — a keyword or
  *    separator inside a comment embedded in a statement never splits a
  *    clause;
  *  - dollar-quoted literals (`$$…$$`, `$tag$…$tag$`) are opaque, and
  *    [[rewriteDollarQuotes]] normalizes them to standard literals at the
  *    dialect front door (Spark's parser has no dollar-quoting);
  *  - keyword hits require identifier boundaries on both sides, so
  *    `WHERE_x` or `fooWHERE` never match.
  *
  * Consolidating the statement forms on this object (round 8) retires the
  * per-statement regex surgery the round-7 review flagged: any new
  * statement form composes these scans instead of hand-rolling escapes.
  */
private[graft] object SqlScan {

  /** If a comment starts at `i` (outside quotes), its EXCLUSIVE end index
    * (`--` runs to end of line; block comments NEST per the Postgres
    * grammar DuckDB follows — `/* /* */ */` is ONE comment; an
    * unterminated block comment runs to end of string, matching how the
    * downstream parser would treat it); -1 if no comment starts here. */
  private def commentEnd(s: String, i: Int): Int =
    if (i + 1 < s.length && s.charAt(i) == '-' && s.charAt(i + 1) == '-') {
      val nl = s.indexOf('\n', i + 2)
      if (nl < 0) s.length else nl + 1
    } else if (i + 1 < s.length && s.charAt(i) == '/' && s.charAt(i + 1) == '*') {
      var depth = 1
      var j = i + 2
      while (j + 1 < s.length && depth > 0) {
        if (s.charAt(j) == '/' && s.charAt(j + 1) == '*') { depth += 1; j += 2 }
        else if (s.charAt(j) == '*' && s.charAt(j + 1) == '/') { depth -= 1; j += 2 }
        else j += 1
      }
      if (depth > 0) s.length else j
    } else -1

  /** If a dollar-quoted literal (`$$…$$` or `$tag$…$tag$`, the Postgres
    * form DuckDB accepts) starts at `i` (outside quotes/comments), its
    * EXCLUSIVE end index; an unterminated literal runs to end of string;
    * -1 if none starts here. A tag never starts with a digit, so the
    * `$N` positional-parameter syntax (bindParams) can't be mistaken for
    * an opener. */
  private def dollarQuoteEnd(s: String, i: Int): Int = {
    if (i >= s.length || s.charAt(i) != '$') return -1
    var j = i + 1
    while (j < s.length &&
        (Character.isLetterOrDigit(s.charAt(j)) || s.charAt(j) == '_')) j += 1
    if (j >= s.length || s.charAt(j) != '$') return -1
    if (j > i + 1 && Character.isDigit(s.charAt(i + 1))) return -1
    val delim = s.substring(i, j + 1)
    val close = s.indexOf(delim, j + 1)
    if (close < 0) s.length else close + delim.length
  }

  /** Opaque region (comment or dollar-quoted literal) starting at `i` →
    * exclusive end; -1 if none. Every top-level scan steps over these. */
  private def opaqueEnd(s: String, i: Int): Int = {
    val ce = commentEnd(s, i)
    if (ce >= 0) ce else dollarQuoteEnd(s, i)
  }

  /** Rewrite dollar-quoted literals into standard single-quoted literals
    * (embedded quotes doubled) — Spark's parser has no dollar-quoting, so
    * the engine dialect normalizes them once at the `sql()` front door.
    * Quote/comment-aware (a `$$` inside a string or comment is untouched)
    * and idempotent (the output contains no dollar quotes outside
    * ordinary literals). */
  def rewriteDollarQuotes(s: String): String = {
    if (s.indexOf('$') < 0) return s
    val sb = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { sb.append(c); if (c == quote) quote = 0; i += 1 }
      else {
        val ce = commentEnd(s, i)
        if (ce >= 0) { sb.append(s.substring(i, ce)); i = ce }
        else {
          val de = dollarQuoteEnd(s, i)
          if (de >= 0) {
            val open = s.indexOf('$', i + 1) + 1 // end of the $tag$ opener
            val closeLen = if (de == s.length && s.indexOf(s.substring(i, open), open) < 0) 0
              else open - i
            val inner = s.substring(open, de - closeLen)
            sb.append('\'').append(inner.replace("'", "''")).append('\'')
            i = de
          } else {
            if (c == '\'' || c == '"' || c == '`') quote = c
            sb.append(c); i += 1
          }
        }
      }
    }
    sb.toString
  }

  /** Length-preserving mask: characters INSIDE quoted strings, backquoted
    * identifiers, comments, and dollar-quoted literals are replaced by
    * spaces (the delimiters stay) so a regex scan can never match opaque
    * content while match positions still align with the original text. */
  def maskOpaque(s: String): String = {
    val a = s.toCharArray
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0 else a(i) = ' '
        i += 1
      } else {
        val oe = opaqueEnd(s, i)
        if (oe >= 0) {
          var j = i
          while (j < oe) { a(j) = ' '; j += 1 }
          i = oe
        } else {
          if (c == '\'' || c == '"' || c == '`') quote = c
          i += 1
        }
      }
    }
    new String(a)
  }

  /** First top-level occurrence of any of `kws` at or after `from`,
    * as (index, matchedKeyword). */
  def findTopLevelKeyword(s: String, from: Int,
                          kws: Seq[String]): Option[(Int, String)] = {
    val upper = s.toUpperCase
    var i = from
    var depth = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        i += 1
      } else {
        val ce = opaqueEnd(s, i)
        if (ce >= 0) i = ce
        else {
          c match {
            case '\'' | '"' | '`' => quote = c
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
              if (depth == 0 && (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_')) {
                val hit = kws.find { kw =>
                  upper.startsWith(kw, i) && {
                    val e = i + kw.length
                    e >= s.length || (!Character.isLetterOrDigit(s.charAt(e)) && s.charAt(e) != '_')
                  }
                }
                if (hit.isDefined) return Some((i, hit.get))
              }
          }
          i += 1
        }
      }
    }
    None
  }

  /** Split on top-level commas (EXECUTE args, column lists, SET lists).
    * Comment text is carried through to the containing piece verbatim —
    * the downstream SQL parser understands comments; only the SPLIT must
    * not happen inside one. */
  def splitTopLevelCommas(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        sb.append(c); if (c == quote) quote = 0
        i += 1
      } else {
        val ce = opaqueEnd(s, i)
        if (ce >= 0) { sb.append(s.substring(i, ce)); i = ce }
        else {
          c match {
            case '\'' | '"' | '`' => quote = c; sb.append(c)
            case '(' => depth += 1; sb.append(c)
            case ')' => depth -= 1; sb.append(c)
            case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
            case _ => sb.append(c)
          }
          i += 1
        }
      }
    }
    if (sb.nonEmpty || out.nonEmpty) out += sb.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  /** Split "body [WHERE predicate]" at the FIRST top-level WHERE.
    * Returns (before, Some(predicate)) or (body, None). */
  def splitAtTopLevelWhere(s: String): (String, Option[String]) =
    findTopLevelKeyword(s, 0, Seq("WHERE")) match {
      case Some((i, kw)) =>
        (s.substring(0, i).trim, Some(s.substring(i + kw.length).trim))
      case None => (s.trim, None)
    }

  /** Parse `c = expr, ...` SET assignments: top-level commas separate
    * assignments, the first top-level '=' splits column from expression
    * ('==' never starts a SET rhs boundary in DuckDB's grammar). */
  def parseAssignments(ctx: String, setsRaw: String): Seq[(String, String)] =
    splitTopLevelCommas(setsRaw).map { a =>
      var i = 0; var depth = 0; var quote: Char = 0; var at = -1
      while (i < a.length && at < 0) {
        val c = a.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0; i += 1 }
        else {
          val ce = opaqueEnd(a, i)
          if (ce >= 0) i = ce
          else {
            c match {
              case '\'' | '"' | '`' => quote = c
              case '(' => depth += 1
              case ')' => depth -= 1
              case '=' if depth == 0 => at = i
              case _ =>
            }
            i += 1
          }
        }
      }
      require(at > 0, s"$ctx: malformed SET assignment '$a'")
      // the lhs is an IDENTIFIER position: a comment riding before/after
      // the column name must not pollute it (the rhs is expression text —
      // the SQL parser handles comments there)
      (stripComments(a.substring(0, at)).trim
        .stripPrefix("`").stripSuffix("`"),
        a.substring(at + 1).trim)
    }

  /** Remove `--` and block comments outside quoted regions — for
    * identifier positions where comment text would pollute the token. */
  def stripComments(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { sb.append(c); if (c == quote) quote = 0; i += 1 }
      else {
        val ce = commentEnd(s, i)
        if (ce >= 0) { sb.append(' '); i = ce }
        else {
          val de = dollarQuoteEnd(s, i)
          if (de >= 0) { sb.append(s.substring(i, de)); i = de }
          else {
            if (c == '\'' || c == '"' || c == '`') quote = c
            sb.append(c); i += 1
          }
        }
      }
    }
    sb.toString
  }

  /** Index of the ')' matching the '(' at `open` (quote-aware), or -1. */
  def matchingParen(s: String, open: Int): Int = {
    var i = open
    var depth = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else {
        val ce = opaqueEnd(s, i)
        if (ce >= 0) i = ce
        else {
          c match {
            case '\'' | '"' | '`' => quote = c
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) return i
            case _ =>
          }
          i += 1
        }
      }
    }
    -1
  }

  /** Structured `ON CONFLICT [(keys)] [DO NOTHING | DO UPDATE SET ...]`.
    * `action` is None for the bare form (PRIMARY-KEY sugar target),
    * Some("NOTHING"), or Some("UPDATE SET <assignments>"). Keys may be
    * backquoted; quoting is stripped here (the engine resolves
    * case-insensitively against the target schema). */
  final case class ConflictClause(keys: Seq[String], action: Option[String])

  def parseConflictClause(clause: String): Option[ConflictClause] = {
    val s = clause.trim
    val head = "(?is)^ON\\s+CONFLICT\\b".r.findFirstIn(s)
    if (head.isEmpty) return None
    var rest = s.substring(head.get.length).trim
    var keys = Seq.empty[String]
    if (rest.startsWith("(")) {
      val close = matchingParen(rest, 0)
      if (close < 0) return None
      keys = splitTopLevelCommas(rest.substring(1, close))
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      rest = rest.substring(close + 1).trim
    }
    rest = rest.stripSuffix(";").trim
    if (rest.isEmpty) Some(ConflictClause(keys, None))
    else if ("(?is)^DO\\s+NOTHING\\s*$".r.findFirstIn(rest).isDefined)
      Some(ConflictClause(keys, Some("NOTHING")))
    else
      "(?is)^DO\\s+(UPDATE\\s+SET\\s+.+)$".r.findFirstMatchIn(rest)
        .map(m => ConflictClause(keys, Some(m.group(1).trim)))
  }

  /** Matching ']' for the '[' at `open` (quote/comment/dollar-aware).
    * Bracket depth only: brackets and parens nest properly in well-formed
    * SQL, so every ']' seen at depth was opened at or below `open`. */
  def matchingBracket(s: String, open: Int): Int = {
    var i = open
    var depth = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else {
        val ce = opaqueEnd(s, i)
        if (ce >= 0) i = ce
        else {
          c match {
            case '\'' | '"' | '`' => quote = c
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) return i
            case _ =>
          }
          i += 1
        }
      }
    }
    -1
  }

  /** Quick paren-balance check for candidate clause splits (quote-aware,
    * never negative, ends at zero). */
  private def parenBalanced(s: String): Boolean = {
    var i = 0; var depth = 0; var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else {
        val ce = opaqueEnd(s, i)
        if (ce >= 0) i = ce
        else {
          c match {
            case '\'' | '"' | '`' => quote = c
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth < 0) return false
            case _ =>
          }
          i += 1
        }
      }
    }
    depth == 0
  }

  private val forHead = "(?is)^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s+IN\\s+(.+)$".r

  /** DuckDB bracket syntax → Spark, at the engine dialect's front door:
    *   `[a, b, c]` / `ARRAY[a, b, c]`  → `array(a, b, c)`
    *   `[E FOR v IN L]`                → `transform(L, v -> E)`
    *   `[E FOR v IN L IF P]`           → `transform(filter(L, v -> P), v -> E)`
    * (docs.duckdb.org/sql/data_types/list + list comprehensions.)
    * Subscripts stay untouched: a '[' directly after an identifier char,
    * ')', ']', a closing quote, or '`' is indexing, the standard lexer
    * disambiguation — except the `ARRAY[...]` constructor, whose keyword
    * is consumed. Nested structures rewrite inside-out, so the FOR/IF
    * clause scan only ever sees one comprehension level. The IF split
    * scans candidates right-to-left and takes the first whose both sides
    * are paren-balanced, so an `if(...)` FUNCTION inside the list
    * expression never splits. Slicing `base[a:b]` IS rewritten — 1-based
    * INCLUSIVE ends, either end omissible, lowered to
    * `slice(base, a, b - a + 1)` (negative indices unsupported; an
    * unidentifiable base is left as-is for Spark's parser to reject
    * loudly). A qualified path ending in `array` (`t.array[1]`) is a
    * subscript on a field named array, NOT the ARRAY constructor; and
    * `ARRAY [1,2]` with whitespace before '[' is the constructor, same
    * as the MAP-brace rule. */
  def rewriteBrackets(s: String): String = {
    if (!s.contains('[')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ce = opaqueEnd(s, i)
      if (ce >= 0) { sb.append(s.substring(i, ce)); i = ce }
      else if (c == '\'' || c == '"' || c == '`') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != c) j += 1
        sb.append(s.substring(i, math.min(j + 1, s.length)))
        i = j + 1
      } else if (c == '[') {
        val close = matchingBracket(s, i)
        require(close > i, s"unbalanced '[' in: $s")
        val inner = rewriteBrackets(s.substring(i + 1, close))
        // ADJACENT previous char decides: `w[i]` is a subscript, but
        // `SELECT [1]` (whitespace between) is a literal — the standard
        // lexer disambiguation needs adjacency, not just the last token
        val prev = if (i > 0) s.charAt(i - 1) else 0.toChar
        // '}' counts: a subscript directly after a struct/map literal
        // (MAP {'k': v}['k']) indexes the literal rewriteBraces lowers next
        val subscript = i > 0 &&
          (Character.isLetterOrDigit(prev) || prev == '_' ||
            prev == ')' || prev == ']' || prev == '}' || prev == '`' ||
            prev == '\'' || prev == '"')
        // the ARRAY[...] constructor: consume the keyword, emit array(...)
        // — but a qualified path (`t.array[1]`) is a subscript on a field
        // NAMED array, and `ARRAY [1,2]` (whitespace, valid DuckDB) is the
        // constructor too, mirroring the MAP-brace rule
        val tail = sb.reverseIterator.takeWhile(ch =>
          Character.isLetterOrDigit(ch) || ch == '_').mkString.reverse
        def charBefore(tokenLen: Int, extra: Int = 0): Char = {
          val at = sb.length - tokenLen - extra - 1
          if (at >= 0) sb.charAt(at) else 0.toChar
        }
        val wsLen = sb.reverseIterator.takeWhile(ch =>
          ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r').length
        val wsTail = if (wsLen == 0) "" else
          sb.toString.dropRight(wsLen).reverseIterator.takeWhile(ch =>
            Character.isLetterOrDigit(ch) || ch == '_').mkString.reverse
        if (subscript && tail.equalsIgnoreCase("array") &&
            charBefore(tail.length) != '.') {
          sb.setLength(sb.length - tail.length)
          sb.append("array(").append(inner).append(")")
        } else if (!subscript && wsTail.equalsIgnoreCase("array")) {
          if (charBefore(wsTail.length, wsLen) != '.') {
            sb.setLength(sb.length - wsTail.length - wsLen)
            sb.append("array(").append(inner).append(")")
          } else {
            // qualified `t.array [1]`: a subscript on a field named
            // array with insignificant whitespace (DuckDB parses the
            // postfix index regardless of spacing) — keep the index
            sb.append('[').append(inner).append(']')
          }
        } else if (subscript) {
          // DuckDB list slicing `base[a:b]` (1-based, INCLUSIVE ends; either
          // end omissible) -> Spark slice(base, a, b - a + 1). The base is
          // the postfix chain just emitted (identifier/.-path, trailing
          // call/subscript groups); if the backward scan can't identify it
          // safely (quotes inside a group), the slice is left as-is and
          // Spark's parser rejects it loudly. Plain `base[i]` stays Spark
          // subscript syntax untouched. Negative indices: not supported.
          val colon = {
            var k = 0; var d = 0; var found = -1
            while (k < inner.length && found < 0) {
              inner.charAt(k) match {
                case '(' | '[' => d += 1
                case ')' | ']' => d -= 1
                case ':' if d == 0 => found = k
                case '\'' | '"' | '`' =>
                  val q = inner.charAt(k)
                  k += 1
                  while (k < inner.length && inner.charAt(k) != q) k += 1
                case _ =>
              }
              k += 1
            }
            found
          }
          val baseLen = if (colon < 0) -1 else {
            // backward scan over the emitted base chain, on a MASKED view
            // (quoted content blanked) so parens inside string literals
            // never skew the group matching
            val l = trailingOperandLen(maskOpaque(sb.toString))
            if (l == 0) -1 else l
          }
          if (colon >= 0 && baseLen > 0) {
            val base = sb.substring(sb.length - baseLen)
            sb.setLength(sb.length - baseLen)
            val a0 = inner.substring(0, colon).trim
            val b0 = inner.substring(colon + 1).trim
            val a = if (a0.isEmpty) "1" else s"($a0)"
            val len =
              if (b0.isEmpty) s"greatest(0, size($base) - $a + 1)"
              else s"greatest(0, ($b0) - $a + 1)"
            sb.append(s"slice($base, $a, $len)")
          } else sb.append('[').append(inner).append(']')
        } else {
          findTopLevelKeyword(inner, 0, Seq("FOR")) match {
            case None =>
              sb.append("array(").append(inner).append(")")
            case Some((at, _)) =>
              val body = inner.substring(0, at).trim
              require(body.nonEmpty, s"list comprehension with empty body: [$inner]")
              forHead.findFirstMatchIn(inner.substring(at + 3)) match {
                case None => throw new IllegalArgumentException(
                  s"malformed list comprehension (expected FOR v IN ...): [$inner]")
                case Some(m) =>
                  val v = m.group(1)
                  val rest = m.group(2).trim
                  // candidate IF splits, right-to-left, first balanced one
                  var ifs = List.empty[Int]
                  var from = 0
                  var scanning = true
                  while (scanning) findTopLevelKeyword(rest, from, Seq("IF")) match {
                    case Some((p, _)) => ifs ::= p; from = p + 2
                    case None => scanning = false
                  }
                  val split = ifs.find { p =>
                    val l = rest.substring(0, p).trim
                    val r = rest.substring(p + 2).trim
                    l.nonEmpty && r.nonEmpty && parenBalanced(l) && parenBalanced(r)
                  }
                  split match {
                    case Some(p) =>
                      val lst = rest.substring(0, p).trim
                      val pred = rest.substring(p + 2).trim
                      sb.append(s"transform(filter($lst, $v -> $pred), $v -> $body)")
                    case None =>
                      sb.append(s"transform($rest, $v -> $body)")
                  }
              }
          }
        }
        i = close + 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Matching '}' for the '{' at `open` (quote/comment/dollar-aware). */
  def matchingBrace(s: String, open: Int): Int = {
    var i = open
    var depth = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else {
        val ce = opaqueEnd(s, i)
        if (ce >= 0) i = ce
        else {
          c match {
            case '\'' | '"' | '`' => quote = c
            case '{' => depth += 1
            case '}' => depth -= 1; if (depth == 0) return i
            case _ =>
          }
          i += 1
        }
      }
    }
    -1
  }

  /** Split on commas at zero paren/bracket/brace depth (struct-literal
    * fields, where values may carry calls, subscripts, or nested
    * literals). Quote/comment-aware like every scan here. */
  private def splitStructFields(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { sb.append(c); if (c == quote) quote = 0; i += 1 }
      else {
        val ce = opaqueEnd(s, i)
        if (ce >= 0) { sb.append(s.substring(i, ce)); i = ce }
        else {
          c match {
            case '\'' | '"' | '`' => quote = c; sb.append(c)
            case '(' | '[' | '{' => depth += 1; sb.append(c)
            case ')' | ']' | '}' => depth -= 1; sb.append(c)
            case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
            case _ => sb.append(c)
          }
          i += 1
        }
      }
    }
    if (sb.nonEmpty || out.nonEmpty) out += sb.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  private val structField =
    "(?s)^\\s*(?:'((?:[^']|'')*)'|([A-Za-z_][A-Za-z0-9_]*))\\s*:\\s*(.+)$".r

  /** DuckDB brace syntax → Spark, at the engine dialect's front door:
    *   `{'k': v, ...}`      → `named_struct('k', v, ...)`   (struct literal)
    *   `MAP {'k': v, ...}`  → `map('k', v, ...)`            (map literal)
    * (docs.duckdb.org/sql/data_types/struct + /map.) Keys may be quoted
    * or bare identifiers (normalized to string literals). Values rewrite
    * recursively (a nested struct/map inside a value lowers too). Braces
    * inside quoted strings, comments, and dollar quotes are untouched.
    * Empty braces reject loudly (DuckDB has no empty struct literal). */
  def rewriteBraces(s: String): String = {
    if (!s.contains('{')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ce = opaqueEnd(s, i)
      if (ce >= 0) { sb.append(s.substring(i, ce)); i = ce }
      else if (c == '\'' || c == '"' || c == '`') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != c) j += 1
        sb.append(s.substring(i, math.min(j + 1, s.length)))
        i = j + 1
      } else if (c == '{') {
        val close = matchingBrace(s, i)
        require(close > i, s"unbalanced '{' in: $s")
        val inner = rewriteBraces(s.substring(i + 1, close))
        val fields = splitStructFields(inner)
        require(fields.nonEmpty, "empty struct literal {} is not supported")
        val kvs = fields.map {
          case structField(quoted, bare, v) =>
            val key = if (quoted != null) quoted.replace("''", "'") else bare
            s"'${key.replace("'", "\\'")}', ${v.trim}"
          case other => throw new IllegalArgumentException(
            s"malformed struct field (expected 'key': value): $other")
        }
        // MAP {'k': v} map-literal form: consume the keyword (and the
        // whitespace between it and the brace)
        var ws = 0
        while (ws < sb.length && sb.charAt(sb.length - 1 - ws).isWhitespace) ws += 1
        val tail = sb.view.slice(0, sb.length - ws).reverseIterator
          .takeWhile(ch => Character.isLetterOrDigit(ch) || ch == '_')
          .mkString.reverse
        val fn = if (tail.equalsIgnoreCase("map")) {
          sb.setLength(sb.length - ws - tail.length)
          "map"
        } else "named_struct"
        sb.append(fn).append('(').append(kvs.mkString(", ")).append(')')
        i = close + 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Length of the trailing operand at the END of `masked` — an
    * identifier/.-path with any trailing call/subscript groups and quoted
    * tokens, scanned backward; 0 if none can be identified safely.
    * `masked` must be maskOpaque'd so parens inside string literals never
    * skew the group matching. Shared by the slice-base scan
    * (rewriteBrackets) and the arrow-operand scan (rewriteArrows). */
  private def trailingOperandLen(masked: String): Int = {
    var k = masked.length - 1
    var ok = true
    var done = false
    while (!done && ok && k >= 0) {
      val ch = masked.charAt(k)
      if (ch == ')' || ch == ']') {
        val open = if (ch == ')') '(' else '['
        var d = 0; var m = k
        while (m >= 0 && { val c2 = masked.charAt(m)
          if (c2 == ch) d += 1 else if (c2 == open) d -= 1
          d != 0 }) m -= 1
        if (m < 0) ok = false else k = m - 1
      } else if (Character.isLetterOrDigit(ch) || ch == '_' ||
          ch == '.' || ch == '`' || ch == '\'' || ch == '"') {
        // quote delimiters survive masking: step over the whole
        // quoted token (its interior is blanked, ends at the twin)
        if (ch == '\'' || ch == '"') {
          var m = k - 1
          while (m >= 0 && masked.charAt(m) != ch) m -= 1
          if (m < 0) ok = false else k = m - 1
        } else k -= 1
      } else done = true
    }
    if (!ok || k == masked.length - 1) 0 else masked.length - 1 - k
  }

  /** DuckDB `struct_pack(k := v, ...)` → `named_struct('k', v, ...)`.
    * The `:=` named-argument syntax never reaches a function-registry
    * builder (Spark's parser rejects it), so it lowers here at the
    * dialect front door. Quote/comment-aware; nested struct_pack in
    * values lowers recursively; a qualified `x.struct_pack(` is left
    * alone (member call on a struct field, not the constructor). */
  def rewriteStructPack(s: String): String = {
    val masked = maskOpaque(s)
    val at = {
      val re = "(?i)\\bstruct_pack\\s*\\(".r
      re.findAllMatchIn(masked)
        .find(m => m.start == 0 || masked.charAt(m.start - 1) != '.')
    }
    at match {
      case None => s
      case Some(m) =>
        val open = m.end - 1
        val close = matchingParen(s, open)
        require(close > open, s"unbalanced struct_pack( in: $s")
        val inner = rewriteStructPack(s.substring(open + 1, close))
        val innerMasked = maskOpaque(inner)
        // split POSITIONS come from the masked text, and the raw text is
        // sliced at the SAME offsets — two independent (trimmed) splits
        // misalign as soon as a comment precedes an argument, which made
        // the value substring index land inside the comment (silent
        // corruption, caught by SqlRewritePropertySpec)
        val spans = {
          var depth = 0
          var last = 0
          val out = Seq.newBuilder[(Int, Int)]
          var i = 0
          while (i < innerMasked.length) {
            innerMasked.charAt(i) match {
              case '(' | '[' => depth += 1
              case ')' | ']' => depth -= 1
              case ',' if depth == 0 => out += ((last, i)); last = i + 1
              case _ => ()
            }
            i += 1
          }
          out += ((last, innerMasked.length))
          out.result()
        }
        val kvs = spans.map { case (a, b) =>
          val arg = inner.substring(a, b)
          val argMasked = innerMasked.substring(a, b)
          val idx = argMasked.indexOf(":=")
          require(idx >= 0,
            s"struct_pack argument must be name := expr (got '${arg.trim}')")
          // read the key from the MASKED text: comments around a legal
          // key collapse to spaces (a comment SPLITTING the identifier
          // still fails loudly below)
          val key = argMasked.substring(0, idx).trim
          require(key.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"struct_pack key must be a bare identifier (got '$key')")
          s"'$key', ${arg.substring(idx + 2).trim}"
        }
        require(kvs.nonEmpty, "struct_pack() needs at least one field")
        s.substring(0, m.start) +
          "named_struct(" + kvs.mkString(", ") + ")" +
          rewriteStructPack(s.substring(close + 1))
    }
  }

  /** DuckDB/standard-SQL single-quoted literals are RAW ('\d' is
    * backslash-d); Spark's default parser processes C escapes and would
    * silently turn the regex '\d' into 'd'. Double every backslash
    * inside single-quoted literals so Spark's escape processing undoes
    * the doubling — raw semantics with standard '' quote doubling fully
    * intact (the escapedStringLiterals conf would break '' — it switches
    * the lexer to Hive \' escaping). Applied ONCE at the final parse
    * leaf of the default query chain (never on stored statement bodies,
    * so EXECUTE/macro/view re-entries cannot double-double). Backquoted
    * identifiers, comments, and dollar quotes are untouched; NOT
    * idempotent by design — call sites must parse the result, not feed
    * it back through. */
  def rewriteRawBackslashes(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ce = opaqueEnd(s, i)
      if (ce >= 0) { sb.append(s.substring(i, ce)); i = ce }
      else if (c == '\'') {
        sb.append(c); i += 1
        while (i < s.length && s.charAt(i) != '\'') {
          if (s.charAt(i) == '\\') sb.append("\\\\") else sb.append(s.charAt(i))
          i += 1
        }
        if (i < s.length) { sb.append('\''); i += 1 }
      } else if (c == '"' || c == '`') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != c) j += 1
        sb.append(s.substring(i, math.min(j + 1, s.length)))
        i = j + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** DuckDB `date_diff('part', a, b)` / `datediff('part', a, b)`: Spark's
    * PARSER special-cases these names (timestampdiff family — the unit
    * must be an UNQUOTED identifier) before function resolution, so the
    * alias builder never sees the quoted-part spelling. Rename exactly
    * the quoted-first-arg form to graft_date_diff (registered in
    * DuckAliases with DuckDB boundary semantics); the unquoted Spark
    * forms pass through to the parser untouched. Quote/comment-aware via
    * the masked view. */
  def rewriteDateDiff(s: String): String = {
    val lower = s.toLowerCase
    if (!lower.contains("date_diff") && !lower.contains("datediff")) return s
    val masked = maskOpaque(s)
    val re = "(?i)\\b(date_diff|datediff)\\s*\\(\\s*'".r
    val out = new StringBuilder
    var last = 0
    for (m <- re.findAllMatchIn(masked)) {
      if (m.start == 0 || (masked.charAt(m.start - 1) != '.' &&
          masked.charAt(m.start - 1) != '_')) {
        out.append(s.substring(last, m.start)).append("graft_date_diff")
        // keep everything from the '(' on (the match consumed up to the
        // opening quote; re-emit from the paren)
        val paren = s.indexOf('(', m.start)
        out.append(s.substring(paren, m.end))
        last = m.end
      }
    }
    out.append(s.substring(last))
    out.toString
  }

  /** DuckDB `regexp_replace` (FIRST-match default, 'g' option, `\N`
    * backrefs) differs from Spark's always-all/$N builtin. The SQL-text
    * name is renamed to graft_regexp_replace (DuckAliases registers the
    * DuckDB-exact expression there); overriding the builtin name in the
    * registry is NOT an option — Spark 4's DataFrame-API
    * functions.regexp_replace resolves through the registry by name and
    * would be hijacked too. Quote/comment-aware; qualified names left
    * alone. */
  def rewriteRegexpReplace(s: String): String = {
    if (!s.toLowerCase.contains("regexp_replace")) return s
    val masked = maskOpaque(s)
    val re = "(?i)\\bregexp_replace\\s*\\(".r
    val out = new StringBuilder
    var last = 0
    for (m <- re.findAllMatchIn(masked)) {
      if (m.start == 0 || (masked.charAt(m.start - 1) != '.' &&
          masked.charAt(m.start - 1) != '_')) {
        out.append(s.substring(last, m.start)).append("graft_regexp_replace")
        val paren = s.indexOf('(', m.start)
        out.append(s.substring(paren, m.end))
        last = m.end
      }
    }
    out.append(s.substring(last))
    out.toString
  }

  /** Builtin names whose DuckDB semantics DIFFER from the Spark builtin
    * of the same spelling, renamed at the dialect front door to graft_
    * spellings that DuckScalars registers with the DuckDB contract:
    *  - regexp_extract / regexp_extract_all default to GROUP 0 (the whole
    *    match) in DuckDB where Spark defaults to group 1 — a silently
    *    wrong answer on verbatim DuckDB SQL, and DuckDB additionally has
    *    an options argument and a capture-NAME-list form;
    *  - dayofweek is Sunday=0..Saturday=6 in DuckDB, Sunday=1..7 in
    *    Spark.
    * Same mask-and-rename mechanics as [[rewriteRegexpReplace]]
    * (overriding the builtin registry name would hijack the DataFrame
    * API, which resolves functions.regexp_extract by NAME in Spark 4). */
  def rewriteBuiltinRenames(s: String): String = {
    val lower = s.toLowerCase
    if (!lower.contains("regexp_extract") && !lower.contains("dayofweek"))
      return s
    val masked = maskOpaque(s)
    val re = "(?i)\\b(regexp_extract_all|regexp_extract|dayofweek)\\s*\\(".r
    val out = new StringBuilder
    var last = 0
    for (m <- re.findAllMatchIn(masked)) {
      if (m.start == 0 || (masked.charAt(m.start - 1) != '.' &&
          masked.charAt(m.start - 1) != '_')) {
        out.append(s.substring(last, m.start))
          .append("graft_").append(m.group(1).toLowerCase)
        val paren = s.indexOf('(', m.start)
        out.append(s.substring(paren, m.end))
        last = m.end
      }
    }
    out.append(s.substring(last))
    out.toString
  }

  /** Higher-order functions whose direct arguments are lambdas: a `->` at
    * the immediate argument level of one of these calls is a LAMBDA and
    * must not be read as the DuckDB JSON arrow. (A json arrow inside a
    * lambda body can be forced by parenthesizing: `x -> (x ->> 'k')`.) */
  private val hofNames = Set(
    "transform", "filter", "aggregate", "reduce", "exists", "forall",
    "zip_with", "map_zip_with", "map_filter", "transform_keys",
    "transform_values", "array_sort",
    "list_transform", "array_transform", "list_filter", "array_filter",
    "list_reduce", "array_reduce")

  /** DuckDB JSON arrow operators → function calls, at the dialect front
    * door (docs.duckdb.org/data/json/json_functions):
    *   `j -> 'path'`  → `json_extract(j, 'path')`         (JSON text out)
    *   `j ->> 'path'` → `json_extract_string(j, 'path')`  (VARCHAR out)
    *   `j -> 0`       → `json_extract(j, 0)`              (array index)
    * Chains associate left (`j->'a'->>'b'` nests). Disambiguation from
    * Spark lambda arrows is by FUNCTION CONTEXT (like DuckDB itself, whose
    * binder resolves `->` per surrounding function): an arrow whose
    * innermost enclosing call is a higher-order function is a lambda and
    * passes through. The arrow's right side must be a string or integer
    * literal; anything else passes through untouched (fails at parse, not
    * silently misread). Runs AFTER rewriteBrackets/rewriteBraces, so
    * generated comprehension lambdas are already inside transform/filter
    * calls and skip naturally. */
  def rewriteArrows(s: String): String = {
    if (!s.contains("->")) return s
    val sb = new StringBuilder
    var callStack = List.empty[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ce = opaqueEnd(s, i)
      if (ce >= 0) { sb.append(s.substring(i, ce)); i = ce }
      else if (c == '\'' || c == '"' || c == '`') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != c) j += 1
        sb.append(s.substring(i, math.min(j + 1, s.length)))
        i = j + 1
      } else if (c == '(') {
        val callee = sb.reverseIterator.takeWhile(ch =>
          Character.isLetterOrDigit(ch) || ch == '_').mkString.reverse
        callStack = callee.toLowerCase :: callStack
        sb.append(c); i += 1
      } else if (c == ')') {
        if (callStack.nonEmpty) callStack = callStack.tail
        sb.append(c); i += 1
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '>' &&
          !callStack.headOption.exists(hofNames.contains)) {
        val asText = i + 2 < s.length && s.charAt(i + 2) == '>'
        var j = i + (if (asText) 3 else 2)
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        // right side: string literal (with '' doubling) or integer run
        val rhsEnd =
          if (j < s.length && s.charAt(j) == '\'') {
            var k = j + 1
            var closed = -1
            while (closed < 0 && k < s.length) {
              if (s.charAt(k) == '\'') {
                if (k + 1 < s.length && s.charAt(k + 1) == '\'') k += 2
                else closed = k + 1
              } else k += 1
            }
            closed
          } else if (j < s.length && s.charAt(j).isDigit) {
            var k = j
            while (k < s.length && s.charAt(k).isDigit) k += 1
            k
          } else -1
        // left side: the operand chain just emitted (minus trailing ws)
        var ws = 0
        while (ws < sb.length && sb.charAt(sb.length - 1 - ws).isWhitespace)
          ws += 1
        val opLen =
          if (rhsEnd < 0) 0
          else trailingOperandLen(maskOpaque(sb.substring(0, sb.length - ws)))
        if (opLen > 0) {
          val start = sb.length - ws - opLen
          val operand = sb.substring(start, sb.length - ws)
          sb.setLength(start)
          sb.append(if (asText) "json_extract_string(" else "json_extract(")
            .append(operand).append(", ")
            .append(s.substring(j, rhsEnd)).append(")")
          i = rhsEnd
        } else { sb.append(c); i += 1 } // not a json arrow — pass through
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
