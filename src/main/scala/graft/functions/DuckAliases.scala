package graft.functions

import org.apache.spark.sql.catalyst.analysis.{UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB scalar-function NAME surface at the dialect front door.
  *
  * The reference's query contract is "DuckDB SQL, unrestricted" — the
  * statement text goes to DuckDB verbatim (kwack KwackEngine.java:232), so
  * a user pasting DuckDB-spelled SQL expects `list_contains`, `len`,
  * `string_split`, `strftime`, `epoch_ms`, `json_extract`, … to resolve.
  * The engine already covers the SEMANTICS with Spark spellings; this
  * table maps the DuckDB names onto the same (codegen'd, Catalyst-native)
  * expressions at analysis time — an alias is a zero-cost rename, never a
  * UDF, so plans stay inside whole-stage codegen.
  *
  * Aliases that need more than a rename:
  *  - polymorphic `len`/`length` (DuckDB: strings AND lists) dispatch on
  *    the resolved child type via [[RuntimeReplaceable]];
  *  - `string_split` is a LITERAL separator in DuckDB but a regex in
  *    Spark — the separator is regex-quoted;
  *  - `strftime`/`strptime` translate C-style % tokens to a Java pattern;
  *  - `json_extract`/`->`/`->>` are a dedicated expression
  *    ([[JsonPathExtract]]) because Spark's get_json_object unquotes
  *    strings where DuckDB's json_extract keeps JSON text;
  *  - `struct_pack(k := v)` named-arg syntax can't reach a registry
  *    builder — SqlScan.rewriteStructPack lowers it to named_struct.
  */
object DuckAliases {

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toIndexedSeq, isDistinct = false)

  private def litStr(e: Expression): Option[String] = e match {
    case Literal(v: UTF8String, StringType) => Some(v.toString)
    case Literal(v: String, StringType) => Some(v)
    case _ => None
  }

  private def requireLitStr(e: Expression, what: String): String =
    litStr(e).getOrElse(throw new IllegalArgumentException(
      s"$what must be a string literal"))

  /** DuckDB len()/length() work on strings AND lists/maps; Spark's length
    * is string-only. Dispatch on the resolved child type. */
  case class PolyLen(child: Expression) extends RuntimeReplaceable
      with UnaryLike[Expression] {
    override lazy val replacement: Expression = child.dataType match {
      case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
      case _ => Length(child)
    }
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** DuckDB epoch_ms is overloaded: BIGINT millis -> TIMESTAMP and
    * TIMESTAMP -> BIGINT millis. */
  case class PolyEpochMs(child: Expression) extends RuntimeReplaceable
      with UnaryLike[Expression] {
    override lazy val replacement: Expression = child.dataType match {
      case _: TimestampType | _: TimestampNTZType | _: DateType =>
        UnixMillis(Cast(child, TimestampType))
      case _ => MillisToTimestamp(child)
    }
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** DuckDB epoch(): TIMESTAMP -> BIGINT seconds, BIGINT -> TIMESTAMP. */
  case class PolyEpoch(child: Expression) extends RuntimeReplaceable
      with UnaryLike[Expression] {
    override lazy val replacement: Expression = child.dataType match {
      case _: TimestampType | _: TimestampNTZType | _: DateType =>
        UnixSeconds(Cast(child, TimestampType))
      case _ => SecondsToTimestamp(child)
    }
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** C-style strftime/strptime format -> Java DateTimeFormatter pattern.
    * Literal runs containing pattern-reserved letters are single-quoted
    * (quotes doubled), so "Week %W of %Y" style formats stay literal. */
  private[graft] def cFormatToJava(fmt: String): String = {
    val tok = Map(
      'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
      'd' -> "dd", 'f' -> "SSSSSS", 'g' -> "SSS", 'H' -> "HH",
      'I' -> "hh", 'j' -> "DDD", 'm' -> "MM", 'M' -> "mm",
      'p' -> "a", 'S' -> "ss", 'y' -> "yy", 'Y' -> "yyyy",
      'Z' -> "zzz", 'z' -> "XXX")
    val noPad = Map(
      'd' -> "d", 'H' -> "H", 'I' -> "h", 'j' -> "D", 'm' -> "M",
      'M' -> "m", 'S' -> "s", 'y' -> "y")
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(c => Character.isLetter(c) || c == '\''))
        out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val n = fmt.charAt(i + 1)
        if (n == '%') { lit.append('%'); i += 2 }
        else if (n == '-' && i + 2 < fmt.length &&
            noPad.contains(fmt.charAt(i + 2))) {
          flushLit(); out.append(noPad(fmt.charAt(i + 2))); i += 3
        } else tok.get(n) match {
          case Some(j) => flushLit(); out.append(j); i += 2
          case None => throw new IllegalArgumentException(
            s"unsupported strftime token %$n in '$fmt'")
        }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }

  private def quotedSplit(str: Expression, sep: Expression): Expression =
    litStr(sep) match {
      case Some(s) =>
        fn("split", str, Literal(java.util.regex.Pattern.quote(s)))
      case None => // non-literal separator: regex-quote at runtime
        fn("split", str,
          fn("concat", Literal("\\Q"), sep, Literal("\\E")))
    }

  /** DuckDB array_to_string returns NULL for an empty list (it is
    * list_aggregate string_agg); Spark's array_join returns ''. */
  private def arrayToString(l: Expression, sep: Expression): Expression =
    If(EqualTo(Size(l, legacySizeOfNull = false), Literal(0)),
      Literal.create(null, StringType), ArrayJoin(l, sep, None))

  private def listAggregate(a: Seq[Expression]): Expression =
    requireLitStr(a(1), "list_aggregate function name").toLowerCase match {
      case "string_agg" =>
        arrayToString(a(0), if (a.length > 2) a(2) else Literal(","))
      case "min" => fn("array_min", a(0))
      case "max" => fn("array_max", a(0))
      case "count" => // non-NULL elements, like the aggregate count(x)
        Size(ArrayCompact(a(0)), legacySizeOfNull = false)
      case other => throw new IllegalArgumentException(
        s"list_aggregate('$other') is not supported " +
          "(supported: string_agg, min, max, count)")
    }

  /** DuckDB list_slice/array_slice: 1-based INCLUSIVE ends (the bracket
    * slice l[a:b] lowered by SqlScan uses the same arithmetic). */
  private def listSlice(a: Seq[Expression]): Expression =
    fn("slice", a(0), a(1),
      fn("greatest", Literal(0), Add(Subtract(a(2), a(1)), Literal(1))))

  /** Exact integer FLOOR division by a positive literal width:
    * `(x - pmod(x, w)) div w`. IntegralDivide alone truncates toward
    * zero, which mis-buckets negative (pre-1970) epoch values; pmod is
    * always non-negative so the numerator is the floored multiple. */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  /** DuckDB date_diff/datediff('part', start, end): the SIGNED number of
    * PART BOUNDARIES crossed from start to end (date_diff('year',
    * Dec 31, Jan 1) = 1 — boundary semantics, NOT Spark timestampdiff's
    * full-elapsed-units), pinned against DuckDB 1.0. Calendar parts use
    * field arithmetic; fixed-width parts count FLOORED-epoch steps
    * (floor division, not truncation, so pre-1970 instants land in the
    * right boundary bucket — epoch seconds are negative there and
    * round-toward-zero would over-count by one). */
  private def dateDiff(a: Seq[Expression]): Expression = {
    val part = requireLitStr(a(0), "date_diff part").toLowerCase
    val (s, e) = (a(1), a(2))
    def years = Subtract(fn("year", e), fn("year", s))
    def secsAt(width: Long, x: Expression) =
      floorDiv(fn("unix_seconds", Cast(x, TimestampType)), width)
    val out: Expression = part match {
      case "year" => years
      case "quarter" =>
        Add(Multiply(years, Literal(4)),
          Subtract(fn("quarter", e), fn("quarter", s)))
      case "month" =>
        Add(Multiply(years, Literal(12)),
          Subtract(fn("month", e), fn("month", s)))
      case "week" => // ISO weeks start Monday in both engines
        Subtract(secsAt(604800L, fn("date_trunc", Literal("week"), e)),
          secsAt(604800L, fn("date_trunc", Literal("week"), s)))
      case "day" => fn("datediff", Cast(e, DateType), Cast(s, DateType))
      case "hour" => Subtract(secsAt(3600L, e), secsAt(3600L, s))
      case "minute" => Subtract(secsAt(60L, e), secsAt(60L, s))
      case "second" => Subtract(secsAt(1L, e), secsAt(1L, s))
      case "millisecond" =>
        Subtract(
          floorDiv(fn("unix_micros", Cast(e, TimestampType)), 1000L),
          floorDiv(fn("unix_micros", Cast(s, TimestampType)), 1000L))
      case "microsecond" =>
        Subtract(fn("unix_micros", Cast(e, TimestampType)),
          fn("unix_micros", Cast(s, TimestampType)))
      case other => throw new IllegalArgumentException(
        s"date_diff('$other') is not supported (supported: year, quarter, " +
          "month, week, day, hour, minute, second, millisecond, microsecond)")
    }
    Cast(out, LongType) // DuckDB returns BIGINT for every part
  }

  /** DuckDB time_bucket(INTERVAL, ts): floor-align ts to the bucket
    * width. Supported for positive sub-day widths that divide a day —
    * there DuckDB's 2000-01-01 origin and the Unix epoch align on every
    * midnight, so epoch-floor arithmetic is exact. Wider/calendar
    * buckets (weeks, months) reject loudly. */
  private def timeBucket(a: Seq[Expression]): Expression = {
    val micros = a(0) match {
      case Literal(v: Long, _: DayTimeIntervalType) => v
      // `INTERVAL '15 minutes'` parses as a CalendarInterval in Spark
      case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval,
          CalendarIntervalType) if ci.months == 0 && ci.days == 0 =>
        ci.microseconds
      case _ => throw new IllegalArgumentException(
        "time_bucket expects a literal sub-day INTERVAL width")
    }
    require(micros > 0 && 86400000000L % micros == 0,
      s"time_bucket width must be a positive divisor of one day " +
        s"(got ${micros}us) — calendar-width buckets are not supported")
    fn("timestamp_micros",
      Multiply(floorDiv(fn("unix_micros", Cast(a(1), TimestampType)),
        micros), Literal(micros)))
  }

  /** DuckDB list_sort(l [, 'ASC'|'DESC' [, 'NULLS FIRST'|'NULLS LAST']]).
    * Defaults ASC + NULLS LAST (DuckDB default null_order). The four
    * combinations map onto array_sort / sort_array / reverse. */
  private def listSort(a: Seq[Expression]): Expression = {
    val dir = if (a.length > 1)
      requireLitStr(a(1), "list_sort direction").trim.toUpperCase else "ASC"
    val nulls = if (a.length > 2)
      requireLitStr(a(2), "list_sort null order").trim.toUpperCase
      else if (dir == "DESC") "NULLS LAST" else "NULLS LAST"
    (dir, nulls) match {
      case ("ASC", "NULLS LAST") => fn("array_sort", a(0))
      case ("ASC", "NULLS FIRST") => SortArray(a(0), Literal(true))
      case ("DESC", "NULLS LAST") => SortArray(a(0), Literal(false))
      case ("DESC", "NULLS FIRST") =>
        fn("reverse", fn("array_sort", a(0)))
      case other => throw new IllegalArgumentException(
        s"list_sort: unsupported order $other (ASC|DESC, NULLS FIRST|LAST)")
    }
  }

  /** DuckDB list_reduce(l, (acc, x) -> ...): no initial value — the first
    * element seeds the fold over the rest. An EMPTY list yields NULL here
    * (element_at semantics) where DuckDB raises — documented lenience. */
  private def listReduce(a: Seq[Expression]): Expression = {
    val l = a(0)
    val id = org.apache.spark.sql.catalyst.expressions
      .UnresolvedNamedLambdaVariable(Seq("graft_reduce_acc"))
    ArrayAggregate(
      fn("slice", l, Literal(2),
        fn("greatest", Literal(0),
          Subtract(Size(l, legacySizeOfNull = false), Literal(1)))),
      fn("element_at", l, Literal(1)),
      a(1),
      LambdaFunction(id, Seq(id)))
  }

  /** DuckDB array_agg/list keep NULL input elements where Spark's
    * collect_list silently drops them: collect `struct(v)` (non-NULL for
    * every input row) and transform-unwrap, so a NULL element comes back
    * as a NULL list slot exactly like the oracle. */
  private def nullSafeArrayAgg(a: Seq[Expression]): Expression = {
    val v = UnresolvedNamedLambdaVariable(Seq("graft_aa"))
    ArrayTransform(
      fn("collect_list", CreateNamedStruct(Seq(Literal("v"), a(0)))),
      LambdaFunction(UnresolvedExtractValue(v, Literal("v")), Seq(v)))
  }

  /** DuckDB regexp_matches(s, pattern [, options]): options translate to
    * Java inline flags prefixed onto the pattern — 'i' case-insensitive,
    * 's' dot-matches-newline (DuckDB's default; RE2 option name), 'm'/'n'
    * newline-sensitive multiline, 'c' case-sensitive (the default, a
    * no-op), 'l' literal (regex-quote the pattern). Unknown option chars
    * fail loudly rather than silently ignoring the flag. */
  private def regexpMatches(a: Seq[Expression]): Expression = {
    if (a.length <= 2) RLike(a(0), a(1))
    else {
      val opts = requireLitStr(a(2), "regexp_matches options")
      var literalMode = false
      val flags = opts.distinct.flatMap {
        case 'i' => "i"
        case 's' => "s"
        case 'm' | 'n' | 'p' => "m"
        case 'c' => ""
        case 'l' => literalMode = true; ""
        case 'g' => "" // 'g' is meaningful for replace, a no-op for match
        case other => throw new IllegalArgumentException(
          s"regexp_matches option '$other' is not supported " +
            "(supported: i, c, s, m, n, p, l, g)")
      }
      val pat0 = if (literalMode)
        fn("concat", Literal("\\Q"), a(1), Literal("\\E")) else a(1)
      val pat = if (flags.isEmpty) pat0
        else fn("concat", Literal(s"(?$flags)"), pat0)
      RLike(a(0), pat)
    }
  }

  /** DuckDB list_zip(l1, ..., lN [, truncate]): element-wise zip into a
    * list of structs with fields list_1..list_N. Pads to the LONGEST list
    * with NULLs by default; a literal boolean last argument truncates to
    * the shortest instead. Built as a left fold of ZipWith (which itself
    * pads with NULLs, so the default shape is free); truncate mode slices
    * every input to the common min length first. */
  private def listZip(a: Seq[Expression]): Expression = {
    val (lists, trunc) = a.last match {
      case Literal(b: Boolean, BooleanType) if a.length > 1 =>
        (a.dropRight(1), b)
      case _ => (a, false)
    }
    require(lists.nonEmpty, "list_zip expects at least one list argument")
    val inputs = if (!trunc) lists else {
      val minLen = lists.map(l => Size(l, legacySizeOfNull = false))
        .reduceLeft[Expression]((x, y) => fn("least", x, y))
      lists.map(l => fn("slice", l, Literal(1),
        fn("greatest", Literal(0), minLen)))
    }
    val x1 = UnresolvedNamedLambdaVariable(Seq("graft_z1"))
    val first: Expression = ArrayTransform(inputs.head,
      LambdaFunction(CreateNamedStruct(Seq(Literal("list_1"), x1)), Seq(x1)))
    inputs.tail.zipWithIndex.foldLeft(first) { case (acc, (l, idx)) =>
      val k = idx + 2
      val s = UnresolvedNamedLambdaVariable(Seq(s"graft_zs$k"))
      val z = UnresolvedNamedLambdaVariable(Seq(s"graft_zz$k"))
      val fields = (1 until k).flatMap(j => Seq(Literal(s"list_$j"),
        UnresolvedExtractValue(s, Literal(s"list_$j")): Expression)) ++
        Seq(Literal(s"list_$k"), z)
      ZipWith(acc, l, LambdaFunction(CreateNamedStruct(fields), Seq(s, z)))
    }
  }

  private def jsonOptions: Expression =
    CreateMap(Seq(Literal("ignoreNullFields"), Literal("false")))

  /** DuckDB json_object('k', v, ...) — field names must be foldable
    * (named_struct's requirement); null values render as JSON null. */
  private def jsonObject(a: Seq[Expression]): Expression = {
    require(a.nonEmpty && a.length % 2 == 0,
      "json_object expects key/value pairs")
    fn("to_json", fn("named_struct", a: _*), jsonOptions)
  }

  /** name -> builder for every DuckDB-spelled alias; registered alongside
    * GraftFunctions.builders on the engine session and via
    * GraftExtensions, so the REPL, API, thrift attach, and tests all see
    * the same name surface. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // --- list functions (docs.duckdb.org/sql/functions/list) ----------
    "list_contains" -> (a => fn("array_contains", a(0), a(1))),
    "list_has" -> (a => fn("array_contains", a(0), a(1))),
    "array_has" -> (a => fn("array_contains", a(0), a(1))),
    // concrete HOF classes: a lambda child must sit DIRECTLY under a
    // higher-order expression (the analyzer rejects it under an alias
    // UnresolvedFunction before ever resolving the rename)
    "list_transform" -> (a => ArrayTransform(a(0), a(1))),
    "array_transform" -> (a => ArrayTransform(a(0), a(1))),
    "list_filter" -> (a => ArrayFilter(a(0), a(1))),
    "array_filter" -> (a => ArrayFilter(a(0), a(1))),
    "list_aggregate" -> listAggregate,
    "list_aggr" -> listAggregate,
    "array_aggregate" -> listAggregate,
    "array_aggr" -> listAggregate,
    "list_value" -> (a => CreateArray(a)),
    "list_pack" -> (a => CreateArray(a)),
    "list_append" -> (a => fn("array_append", a(0), a(1))),
    "list_prepend" -> (a => fn("array_prepend", a(1), a(0))),
    "array_push_back" -> (a => fn("array_append", a(0), a(1))),
    "array_push_front" -> (a => fn("array_prepend", a(0), a(1))),
    // 1-based, 0 when absent — identical contracts (DuckDB 1.x; newer
    // DuckDB returns NULL there, a versioned divergence we pin to the
    // oracle's 1.0 behavior)
    "list_position" -> (a => ArrayPosition(a(0), a(1))),
    "list_indexof" -> (a => ArrayPosition(a(0), a(1))),
    // DuckDB list_distinct also drops NULL elements
    "list_distinct" -> (a => ArrayDistinct(ArrayCompact(a(0)))),
    "list_unique" -> (a =>
      Size(ArrayDistinct(ArrayCompact(a(0))), legacySizeOfNull = false)),
    // DuckDB default null_order is NULLS LAST (pinned vs 1.0:
    // list_sort([3,1,NULL,2]) = [1,2,3,NULL]) — Spark array_sort matches;
    // sort_array would put NULLs first
    "list_sort" -> listSort,
    "list_reverse_sort" -> (a => SortArray(a(0), Literal(false))),
    "list_concat" -> (a => fn("concat", a: _*)),
    "list_cat" -> (a => fn("concat", a: _*)),
    "array_cat" -> (a => fn("concat", a: _*)),
    "list_slice" -> listSlice,
    "array_slice" -> listSlice,
    "list_reduce" -> listReduce,
    "array_reduce" -> listReduce,
    "unnest" -> (a => fn("explode", a(0))), // select-list flatten, 1 level
    // DuckDB array_agg/list KEEP NULL input elements; Spark collect_list
    // drops them — wrap each value in a struct (never NULL at the top)
    // and unwrap after collection so NULLs survive the aggregation
    "array_agg" -> nullSafeArrayAgg,
    "list" -> nullSafeArrayAgg,
    // 1-based extract, like Spark element_at
    "list_extract" -> (a => fn("element_at", a(0), a(1))),
    "list_element" -> (a => fn("element_at", a(0), a(1))),
    "array_extract" -> (a => fn("element_at", a(0), a(1))),
    "list_reverse" -> (a => fn("reverse", a(0))),
    "array_to_string" -> (a => arrayToString(a(0), a(1))),
    // --- polymorphic length/epoch --------------------------------------
    "len" -> (a => PolyLen(a(0))),
    "length" -> (a => PolyLen(a(0))), // extends builtin to lists/maps
    "array_length" -> (a => Size(a(0), legacySizeOfNull = false)),
    "list_length" -> (a => Size(a(0), legacySizeOfNull = false)),
    "epoch_ms" -> (a => PolyEpochMs(a(0))),
    "epoch" -> (a => PolyEpoch(a(0))),
    // --- string functions ----------------------------------------------
    "string_split" -> (a => quotedSplit(a(0), a(1))),
    "str_split" -> (a => quotedSplit(a(0), a(1))),
    "string_to_array" -> (a => quotedSplit(a(0), a(1))),
    "string_split_regex" -> (a => fn("split", a(0), a(1))),
    "str_split_regex" -> (a => fn("split", a(0), a(1))),
    "regexp_split_to_array" -> (a => fn("split", a(0), a(1))),
    "regexp_matches" -> regexpMatches, // partial match, both engines
    // DuckDB replaces the FIRST match by default ('g' = all) and uses
    // \N backrefs — a dedicated expression. Registered under a graft_
    // name and renamed from SQL text by SqlScan.rewriteRegexpReplace:
    // overriding the BUILTIN name would hijack the DataFrame API too
    // (Spark 4's functions.regexp_replace resolves through the registry
    // by name — observed breaking x17/x50/x54 before this split)
    "graft_regexp_replace" -> (a => RegexpReplaceDuck(a(0), a(1), a(2),
      if (a.length > 3) requireLitStr(a(3), "regexp_replace options")
      else "")),
    "strpos" -> (a => StringInstr(a(0), a(1))),
    "strlen" -> (a => OctetLength(a(0))), // DuckDB strlen = BYTES
    "ucase" -> (a => fn("upper", a(0))),
    "lcase" -> (a => fn("lower", a(0))),
    // 1-arg DuckDB group_concat/string_agg defaults the separator to ','
    // (Spark's string_agg default is '' — must be passed explicitly)
    "group_concat" -> (a => fn("string_agg", a(0),
      if (a.length > 1) a(1) else Literal(","))),
    // --- temporal --------------------------------------------------------
    "strftime" -> (a => fn("date_format", a(0),
      Literal(cFormatToJava(requireLitStr(a(1), "strftime format"))))),
    "strptime" -> (a => fn("to_timestamp", a(0),
      Literal(cFormatToJava(requireLitStr(a(1), "strptime format"))))),
    // the quoted-part DuckDB forms are renamed to this by
    // SqlScan.rewriteDateDiff (Spark's parser owns the bare names)
    "graft_date_diff" -> dateDiff,
    "dayname" -> (a => fn("date_format", a(0), Literal("EEEE"))),
    "monthname" -> (a => fn("date_format", a(0), Literal("MMMM"))),
    "time_bucket" -> timeBucket,
    // --- string extras ---------------------------------------------------
    "printf" -> (a => fn("format_string", a: _*)), // both are C printf
    "starts_with" -> (a => fn("startswith", a(0), a(1))),
    "ends_with" -> (a => fn("endswith", a(0), a(1))),
    "prefix" -> (a => fn("startswith", a(0), a(1))),
    "suffix" -> (a => fn("endswith", a(0), a(1))),
    // --- struct / json ---------------------------------------------------
    "struct_extract" -> (a => UnresolvedExtractValue(a(0), a(1))),
    "json_object" -> jsonObject,
    // homogeneous element types only (Spark arrays are typed; a mixed
    // DuckDB json_array coerces to strings here — documented divergence)
    "json_array" -> (a => fn("to_json", CreateArray(a), jsonOptions)),
    "json_valid" -> (a => JsonValid(a(0))),
    "json_type" -> (a =>
      JsonTypeOf(a(0), if (a.length > 1) a(1) else Literal("$"))),
    "json_keys" -> (a => JsonKeys(a(0))),
    "json_extract" -> (a => JsonPathExtract(a(0), a(1), asText = false)),
    "json_extract_path" ->
      (a => JsonPathExtract(a(0), a(1), asText = false)),
    "json_extract_string" ->
      (a => JsonPathExtract(a(0), a(1), asText = true)),
    "json_extract_path_text" ->
      (a => JsonPathExtract(a(0), a(1), asText = true)),
    // --- string similarity (wave 4; byte semantics pinned vs oracle) ----
    "jaccard" -> (a => JaccardSim(a(0), a(1))),
    "hamming" -> (a => HammingDist(a(0), a(1))),
    "mismatches" -> (a => HammingDist(a(0), a(1))),
    "damerau_levenshtein" -> (a => DamerauLevenshtein(a(0), a(1))),
    "jaro_similarity" -> (a => JaroSim(a(0), a(1))),
    "jaro_winkler_similarity" -> (a => JaroWinklerSim(a(0), a(1))),
    "editdist3" -> (a => fn("levenshtein", a(0), a(1))),
    // --- list zip / vector distance (wave 4) ----------------------------
    "list_zip" -> listZip,
    // the fixed-size ARRAY and LIST spellings share one engine type; the
    // s-suite's codegen'd expressions are the exact semantics (index-order
    // double accumulation). DuckDB's *_distance is the ROOTED L2 —
    // L2Distance is squared, so wrap in sqrt.
    "array_cosine_similarity" -> (a => CosineSimilarity(dArr(a(0)), dArr(a(1)))),
    "list_cosine_similarity" -> (a => CosineSimilarity(dArr(a(0)), dArr(a(1)))),
    "array_inner_product" -> (a => DotProduct(dArr(a(0)), dArr(a(1)))),
    "list_inner_product" -> (a => DotProduct(dArr(a(0)), dArr(a(1)))),
    "array_distance" -> (a => fn("sqrt", L2Distance(dArr(a(0)), dArr(a(1))))),
    "list_distance" -> (a => fn("sqrt", L2Distance(dArr(a(0)), dArr(a(1))))))

  /** DOUBLE-array coercion for the vector-distance aliases: a literal like
    * `[0.0, 3.0]` parses as array<decimal>, which the codegen'd s-suite
    * expressions reject; the cast is a no-op (optimizer-eliminated) when
    * the input is already array<double>. DuckDB computes these in double
    * for LIST inputs — pinned by q135. */
  private def dArr(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))
}
