package graft.serde

import java.nio.ByteBuffer
import java.time.{Instant, LocalDate}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.schema.AvroSchemaCompiler

/** Decoded Avro datum -> external row values aligned with the compiled
  * StructType (capability mirror of the reference's value transform —
  * reference: transformer/avro/AvroTransformer.java:151-253):
  * ByteBuffer/Fixed -> bytes, Utf8/UUID -> String, logical decimal ->
  * BigDecimal, date/time/timestamp -> java.time, union branch resolved via
  * GenericData.resolveUnion into the tagged struct convention.
  */
object AvroValueReader {

  def toRow(record: GenericRecord, schema: Schema, structType: StructType): Row = {
    val vals = structType.fields.map { sf =>
      val f = schema.getField(sf.name)
      if (f == null) null
      else convert(record.get(f.pos()), f.schema(), sf.dataType)
    }
    Row(vals.toIndexedSeq: _*)
  }

  def convert(datum: Any, schema: Schema, dt: DataType): Any = {
    if (datum == null) return null
    import Schema.Type._
    schema.getType match {
      case UNION =>
        val branches = schema.getTypes.asScala.toSeq
        val idx = GenericData.get().resolveUnion(schema, datum)
        val branch = branches(idx)
        // the union SHAPE decides the decode path (>=2 non-null branches =>
        // the compiler produced a tagged struct) — never the field names,
        // which an ordinary record could coincidentally share
        val isTagged = branches.count(_.getType != NULL) >= 2
        dt match {
          case st: StructType if isTagged =>
            val tag = s"u$idx"
            val vals = st.fields.map {
              case StructField("tag", _, _, _) => tag
              case sf if sf.name == tag => convert(datum, branch, sf.dataType)
              case _ => null
            }
            Row(vals.toIndexedSeq: _*)
          case _ => // nullable-flattened union
            convert(datum, branch, dt)
        }

      case RECORD =>
        toRow(datum.asInstanceOf[GenericRecord], schema, dt.asInstanceOf[StructType])

      case ENUM => datum match {
        case e: GenericEnumSymbol[_] => e.toString
        case s => s.toString
      }

      case ARRAY =>
        val at = dt.asInstanceOf[ArrayType]
        datum.asInstanceOf[java.util.Collection[Any]].asScala
          .map(convert(_, schema.getElementType, at.elementType)).toSeq

      case MAP =>
        val mt = dt.asInstanceOf[MapType]
        datum.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, v) =>
          k.toString -> convert(v, schema.getValueType, mt.valueType)
        }.toMap

      case FIXED | BYTES =>
        val bytes = datum match {
          case bb: ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case gf: GenericFixed => gf.bytes()
          case a: Array[Byte] => a
        }
        schema.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }

      case STRING => datum match {
        case u: Utf8 => u.toString
        case s => s.toString // covers java UUID from specific/reflect data
      }

      case INT =>
        val v = datum.asInstanceOf[Number].intValue()
        schema.getLogicalType match {
          case _: LogicalTypes.Date => LocalDate.ofEpochDay(v.toLong)
          case _: LogicalTypes.TimeMillis => v.toLong * 1000L // micros-of-day
          case _ => v
        }

      case LONG =>
        val v = datum.asInstanceOf[Number].longValue()
        schema.getLogicalType match {
          case _: LogicalTypes.TimeMicros => v
          case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis =>
            Instant.ofEpochMilli(v)
          case _: LogicalTypes.TimestampMicros | _: LogicalTypes.LocalTimestampMicros =>
            Instant.ofEpochSecond(Math.floorDiv(v, 1000000L),
              Math.floorMod(v, 1000000L) * 1000L)
          case _: LogicalTypes.TimestampNanos => // truncate ns -> us
            Instant.ofEpochSecond(Math.floorDiv(v, 1000000000L),
              Math.floorMod(v, 1000000000L) / 1000L * 1000L)
          case _ => v
        }

      case FLOAT => datum.asInstanceOf[Number].floatValue()
      case DOUBLE => datum.asInstanceOf[Number].doubleValue()
      case BOOLEAN => datum.asInstanceOf[Boolean]
      case NULL => null
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }
}
