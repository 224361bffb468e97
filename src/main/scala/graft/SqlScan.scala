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
}
