package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB `json_extract` / `->` (asText=false) and `json_extract_string` /
  * `->>` (asText=true) — docs.duckdb.org/data/json/json_functions.
  *
  * Spark's built-in get_json_object UNQUOTES string results, which matches
  * DuckDB's `->>` but not `->`: DuckDB json_extract returns JSON text
  * (strings stay quoted, objects/arrays stay JSON), so `j->'a' = '"x"'`
  * comparisons and arrow chains behave differently. This expression keeps
  * DuckDB's contract exactly:
  *  - asText=false: the extracted node rendered AS JSON ('"x"', '3',
  *    '{"k":1}'); a JSON null renders as 'null'.
  *  - asText=true: string nodes unquoted, scalars as text, objects/arrays
  *    as JSON text; a JSON null is SQL NULL.
  *  - missing path, or unparsable input → SQL NULL (DuckDB raises on
  *    malformed JSON CASTS but is NULL-lenient through extraction of
  *    missing keys; we choose NULL for both — documented lenience).
  *
  * Path forms: '$.a.b[0]' / '$."quoted key"' JSONPath subset, bare key
  * 'a', integer index, and '/a/b/0' JSON-Pointer. Wildcards are rejected
  * loudly (DuckDB returns a LIST there — unsupported).
  *
  * Arrow chains re-parse at each level (json_extract returns JSON text) —
  * fine for the presentation-layer paths this serves; not a hot-loop
  * primitive (CodegenFallback, evaluated per row without codegen).
  */
case class JsonPathExtract(left: Expression, right: Expression,
    asText: Boolean) extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (asText) "json_extract_string" else "json_extract"

  @transient private lazy val mapper = new ObjectMapper()

  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val root =
      try mapper.readTree(json.toString)
      catch { case _: Exception => null }
    if (root == null) return null
    val node = navigateNode(root, path.toString)
    if (node == null || node.isMissingNode) return null
    if (asText) {
      if (node.isNull) null
      else if (node.isTextual) UTF8String.fromString(node.textValue)
      else UTF8String.fromString(mapper.writeValueAsString(node))
    } else UTF8String.fromString(mapper.writeValueAsString(node))
  }

  private[functions] def navigateNode(root: JsonNode, path: String): JsonNode = {
    require(!path.contains("*"),
      s"json path wildcards are not supported (got '$path' — DuckDB " +
        "returns a LIST there; extract a concrete index instead)")
    if (path.startsWith("/")) root.at(path) // JSON Pointer
    else if (path.startsWith("$")) {
      var node = root
      var i = 1
      while (i < path.length && node != null && !node.isMissingNode) {
        path.charAt(i) match {
          case '.' =>
            i += 1
            if (i < path.length && path.charAt(i) == '"') {
              val end = path.indexOf('"', i + 1)
              require(end > i, s"unterminated quoted key in path '$path'")
              node = node.path(path.substring(i + 1, end))
              i = end + 1
            } else {
              var j = i
              while (j < path.length && path.charAt(j) != '.' &&
                path.charAt(j) != '[') j += 1
              node = node.path(path.substring(i, j))
              i = j
            }
          case '[' =>
            val end = path.indexOf(']', i)
            require(end > i, s"unterminated [index] in path '$path'")
            val idx = path.substring(i + 1, end).trim.toInt
            // negative index: from the end, DuckDB-style
            node =
              if (idx >= 0) node.path(idx) else node.path(node.size + idx)
            i = end + 1
          case c => throw new IllegalArgumentException(
            s"unexpected '$c' at offset $i in json path '$path'")
        }
      }
      node
    } else if (path.nonEmpty && path.forall(_.isDigit)) {
      root.path(path.toInt) // bare integer index
    } else root.path(path) // bare key
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** DuckDB `json_valid(j)` — true iff the text parses as JSON. NULL in,
  * NULL out (pinned against DuckDB 1.0). */
case class JsonValid(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "json_valid"
  @transient private lazy val mapper = new ObjectMapper()
  override protected def nullSafeEval(json: Any): Any =
    try { mapper.readTree(json.toString); true }
    catch { case _: Exception => false }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** DuckDB `json_type(j [, path])` — the JSON type NAME of the (navigated)
  * node, DuckDB spellings pinned against 1.0: OBJECT, ARRAY, VARCHAR,
  * BOOLEAN, DOUBLE, NULL, and integers split UBIGINT (>= 0) / BIGINT
  * (negative). Missing path or unparsable input → SQL NULL (lenient,
  * like the sibling extraction expressions). */
case class JsonTypeOf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_type"
  @transient private lazy val helper = JsonPathExtract(left, right, asText = true)
  @transient private lazy val mapper = new ObjectMapper()
  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val root = try mapper.readTree(json.toString)
      catch { case _: Exception => null }
    if (root == null) return null
    val p = path.toString
    val node = if (p == "$") root else helper.navigateNode(root, p)
    if (node == null || node.isMissingNode) return null
    UTF8String.fromString {
      if (node.isObject) "OBJECT"
      else if (node.isArray) "ARRAY"
      else if (node.isTextual) "VARCHAR"
      else if (node.isBoolean) "BOOLEAN"
      else if (node.isIntegralNumber)
        if (node.asLong() >= 0 || node.bigIntegerValue.signum >= 0) "UBIGINT"
        else "BIGINT"
      else if (node.isNumber) "DOUBLE"
      else "NULL"
    }
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** DuckDB `json_keys(j)` — the object's key list in document order
  * (Jackson preserves insertion order, matching DuckDB). Non-objects and
  * unparsable input → SQL NULL. */
case class JsonKeys(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType)
  override def nullable: Boolean = true
  override def prettyName: String = "json_keys"
  @transient private lazy val mapper = new ObjectMapper()
  override protected def nullSafeEval(json: Any): Any = {
    val root = try mapper.readTree(json.toString)
      catch { case _: Exception => null }
    if (root == null || !root.isObject) return null
    val it = root.fieldNames()
    val buf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    while (it.hasNext) buf += UTF8String.fromString(it.next())
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
