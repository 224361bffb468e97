package graft

import java.util.Base64

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.schema.AvroSchemaCompiler

/** Streaming JSON-lines projection of a query result (the reference's
  * output shape: one JSON object per row, reference: KwackEngine.java:274-302
  * toJson + KwackMain.java:157-163).
  *
  *  - binary -> Base64 string (reference Blob handling, KwackEngine.java:296)
  *  - union-tagged structs collapse to the ACTIVE branch value, so a union
  *    of [string,int] holding 5 prints as 5, not {"tag":"u2","u2":5}
  *    (reference behavior: ProtobufTest.java:103; SURVEY.md §7.3)
  *  - rows stream via toLocalIterator — no driver-side collect of the full
  *    result (100 TB note in SURVEY.md §7.3).
  */
object JsonOutput {
  import scala.jdk.CollectionConverters._

  def lines(df: DataFrame): Iterator[String] = {
    val schema = df.schema
    df.toLocalIterator().asScala.map(r => rowToJson(r, schema))
  }

  private def isUnion(md: Metadata): Boolean =
    md.contains(AvroSchemaCompiler.UnionFlag) &&
      md.getBoolean(AvroSchemaCompiler.UnionFlag)

  /** Structural fallback: field metadata is dropped by the row-encoder
    * serialization path, so also recognize the engine's tagged-union shape
    * (leading `tag: STRING` + >=2 branches) directly. */
  private def isUnionShape(st: StructType): Boolean =
    st.fields.length >= 3 && st.fields.head.name == "tag" &&
      st.fields.head.dataType == StringType

  def rowToJson(row: Row, schema: StructType): String = {
    val sb = new StringBuilder("{")
    var first = true
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!first) sb.append(',')
      first = false
      appendString(sb, f.name)
      sb.append(':')
      appendValue(sb, row.get(i), f.dataType, f.metadata)
    }
    sb.append('}').toString()
  }

  private def appendValue(sb: StringBuilder, v: Any, dt: DataType, md: Metadata): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case st: StructType if isUnion(md) || isUnionShape(st) =>
        val row = v.asInstanceOf[Row]
        val tag = if (row.isNullAt(0)) null else row.getString(0)
        val idx = if (tag == null) -1
          else st.fields.indexWhere(_.name == tag)
        if (idx < 0) appendStruct(sb, row, st) // not actually a union: plain struct
        else appendValue(sb, row.get(idx), st.fields(idx).dataType, st.fields(idx).metadata)
      case st: StructType =>
        appendStruct(sb, v.asInstanceOf[Row], st)
      case at: ArrayType =>
        sb.append('[')
        val items = v.asInstanceOf[scala.collection.Seq[Any]]
        items.zipWithIndex.foreach { case (x, i) =>
          if (i > 0) sb.append(',')
          appendValue(sb, x, at.elementType, Metadata.empty)
        }
        sb.append(']')
      case mt: MapType =>
        sb.append('{')
        val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
        var first = true
        m.foreach { case (k, x) =>
          if (!first) sb.append(',')
          first = false
          appendString(sb, String.valueOf(k)); sb.append(':')
          appendValue(sb, x, mt.valueType, Metadata.empty)
        }
        sb.append('}')
      case BinaryType =>
        appendString(sb, Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
      case StringType => appendString(sb, v.toString)
      case FloatType | DoubleType =>
        val d = v match { case f: java.lang.Float => f.toDouble; case x => x.asInstanceOf[Double] }
        // bare NaN/Infinity is invalid JSON; quote like Jackson's default
        // (reference output mapper: util/Jackson.java)
        if (java.lang.Double.isFinite(d)) sb.append(v.toString)
        else appendString(sb, v.toString)
      case BooleanType | IntegerType | LongType | ShortType | ByteType =>
        sb.append(v.toString)
      case _: DecimalType => sb.append(v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case DateType | TimestampType | TimestampNTZType => appendString(sb, v.toString)
      case _ => appendString(sb, v.toString)
    }
  }

  private def appendStruct(sb: StringBuilder, row: Row, st: StructType): Unit = {
    sb.append('{')
    st.fields.zipWithIndex.foreach { case (f, i) =>
      if (i > 0) sb.append(',')
      appendString(sb, f.name); sb.append(':')
      appendValue(sb, row.get(i), f.dataType, f.metadata)
    }
    sb.append('}')
  }

  private def appendString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
