package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB `regexp_replace(s, pattern, replacement [, options])` — the
  * semantics Spark's RegExpReplace does NOT have:
  *   - replaces the FIRST match by default; the `'g'` option replaces all
  *     (Spark always replaces all);
  *   - backreferences are `\1`..`\9` (Spark/Java use `$1`), translated
  *     here; a literal `$` in the replacement needs no escaping;
  *   - options: `g` global, `i` case-insensitive, `s` dotall ('.' matches
  *     newline), `m` multiline anchors, `c` case-sensitive (cancels i);
  *     unknown options reject loudly.
  * Pinned against DuckDB 1.0 (`regexp_replace('aaa','a','b')` = 'baa').
  * Registered over the SQL name in the engine dialect; the DataFrame-API
  * `functions.regexp_replace` (Spark semantics) is untouched — it builds
  * the Catalyst expression directly and never consults the registry. */
case class RegexpReplaceDuck(first: Expression, second: Expression,
    third: Expression, options: String)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_replace"

  private val global = options.contains('g')
  private val flagBits = {
    var bits = 0
    options.foreach {
      case 'g' => // handled above
      case 'i' => bits |= Pattern.CASE_INSENSITIVE
      case 's' => bits |= Pattern.DOTALL
      case 'm' => bits |= Pattern.MULTILINE
      case 'c' => bits &= ~Pattern.CASE_INSENSITIVE
      case f => throw new IllegalArgumentException(
        s"regexp_replace: unsupported option '$f' (supported: g i s m c)")
    }
    bits
  }

  // per-instance single-entry caches; pattern/replacement are almost
  // always literals, so these compile once per partition
  @transient private var lastPat: String = _
  @transient private var compiled: Pattern = _
  @transient private var lastRepl: String = _
  @transient private var javaRepl: String = _

  /** DuckDB `\N` backrefs → Java `$N`; Java-significant chars in the
    * replacement (`$`, stray `\`) are escaped to stay literal. */
  private def toJavaReplacement(r: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      r.charAt(i) match {
        case '\\' if i + 1 < r.length && r.charAt(i + 1).isDigit =>
          sb.append('$').append(r.charAt(i + 1)); i += 2
        case '\\' if i + 1 < r.length =>
          sb.append('\\').append('\\').append(r.charAt(i + 1)); i += 2
        case '$' => sb.append('\\').append('$'); i += 1
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  override protected def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val pat = p.toString
    if (compiled == null || pat != lastPat) {
      compiled = Pattern.compile(pat, flagBits); lastPat = pat
    }
    val repl = r.toString
    if (javaRepl == null || repl != lastRepl) {
      javaRepl = toJavaReplacement(repl); lastRepl = repl
    }
    val m = compiled.matcher(s.toString)
    UTF8String.fromString(
      if (global) m.replaceAll(javaRepl) else m.replaceFirst(javaRepl))
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
