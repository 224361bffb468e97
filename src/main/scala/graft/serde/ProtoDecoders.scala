package graft.serde

import java.nio.{ByteBuffer, ByteOrder}
import java.time.{Instant, LocalDate}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.schema.{ProtoSchema, ProtoSchemaCompiler}
import graft.schema.ProtoSchema._

/** Protobuf wire-format decoder driven by the parsed .proto model.
  *
  * protobuf-java is not on this classpath, so the binary format (varint /
  * fixed32 / fixed64 / length-delimited, packed repeated, map entries) is
  * decoded directly. Capability mirror of the reference's message->row
  * transform (reference: transformer/protobuf/ProtobufTransformer.java:
  * 275-429): well-known Decimal/Date/TimeOfDay/Timestamp conversions
  * (383-429), oneof branch resolution into the tagged union struct
  * (329-371), ByteString->bytes, enum->name string.
  *
  * Proto3 presence semantics: plain scalar fields absent on the wire decode
  * to their default (0 / "" / false / empty), as protobuf-java surfaces to
  * the reference's appender; message, wrapper, oneof, and `optional` fields
  * decode to null when absent.
  *
  * Schema compilation is memoized per JVM (executor-side), mirroring the
  * reference's deserializer caches (KwackEngine.java:137-138,516-519).
  */
object ProtoDecoders {

  private val cache =
    new ConcurrentHashMap[(String, Option[String]), (ProtoFile, PMessage, StructType)]()

  private def compiled(schemaText: String, msgName: Option[String]): (ProtoFile, PMessage, StructType) =
    cache.computeIfAbsent((schemaText, msgName), { case (text, name) =>
      val file = ProtoSchema.parse(text)
      val msg = name.flatMap(file.resolveMessage).getOrElse(file.firstMessage)
      (file, msg, ProtoSchemaCompiler.compileMessage(file, msg, Set.empty))
    })

  /** Returns (sparkType, decode fn). Throws on unparseable/recursive schema
    * (callers fall back to binary like the reference, KwackEngine.java:363-376). */
  def make(schemaText: String, msgName: Option[String], skip: Int): (DataType, Array[Byte] => Any) = {
    val (_, _, st) = compiled(schemaText, msgName)
    val fn: Array[Byte] => Any = bytes => {
      val (file, msg, struct) = compiled(schemaText, msgName)
      val payload = stripFrame(bytes, skip)
      decodeMessage(payload, msg, file, struct)
    }
    (st, fn)
  }

  /** Payloads may arrive framed (registry wire format with message indexes)
    * or raw (external schema without SR — reference: ProtobufNoSRTest). */
  private def stripFrame(bytes: Array[Byte], skip: Int): Array[Byte] = {
    if (bytes.length > skip + 5 && bytes(skip) == WireFormat.Magic) {
      val f = WireFormat.parse(bytes, skip, withIndexes = true)
      val out = new Array[Byte](f.payload.remaining())
      f.payload.duplicate().get(out)
      out
    } else if (skip > 0) java.util.Arrays.copyOfRange(bytes, skip, bytes.length)
    else bytes
  }

  // ---- wire primitives ---------------------------------------------------

  private def readVarint(buf: ByteBuffer): Long = {
    var shift = 0; var result = 0L
    var b = buf.get()
    while ((b & 0x80) != 0) {
      result |= (b & 0x7fL) << shift; shift += 7; b = buf.get()
    }
    result | ((b & 0x7fL) << shift)
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def readLengthDelimited(buf: ByteBuffer): Array[Byte] = {
    val len = readVarint(buf).toInt
    val out = new Array[Byte](len)
    buf.get(out)
    out
  }

  private def skipField(buf: ByteBuffer, wireType: Int): Unit = wireType match {
    case 0 => readVarint(buf)
    case 1 => buf.position(buf.position() + 8)
    case 2 => val len = readVarint(buf).toInt; buf.position(buf.position() + len)
    case 5 => buf.position(buf.position() + 4)
    case other => throw new IllegalArgumentException(s"unknown wire type $other")
  }

  private def unsigned64(v: Long): java.math.BigDecimal =
    new java.math.BigDecimal(new java.math.BigInteger(java.lang.Long.toUnsignedString(v)))

  /** One scalar occurrence from the wire (non-packed). */
  private def readScalar(buf: ByteBuffer, wireType: Int, scalar: String): Any = scalar match {
    case "double" => java.lang.Double.longBitsToDouble(buf.order(ByteOrder.LITTLE_ENDIAN).getLong)
    case "float" => java.lang.Float.intBitsToFloat(buf.order(ByteOrder.LITTLE_ENDIAN).getInt)
    case "int32" => readVarint(buf).toInt
    case "int64" => readVarint(buf)
    case "uint32" => readVarint(buf) & 0xffffffffL
    case "uint64" => unsigned64(readVarint(buf))
    case "sint32" => zigzag(readVarint(buf)).toInt
    case "sint64" => zigzag(readVarint(buf))
    case "fixed32" => buf.order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
    case "fixed64" => unsigned64(buf.order(ByteOrder.LITTLE_ENDIAN).getLong)
    case "sfixed32" => buf.order(ByteOrder.LITTLE_ENDIAN).getInt
    case "sfixed64" => buf.order(ByteOrder.LITTLE_ENDIAN).getLong
    case "bool" => readVarint(buf) != 0L
    case "string" => new String(readLengthDelimited(buf), "UTF-8")
    case "bytes" => readLengthDelimited(buf)
    case other => throw new IllegalArgumentException(s"unknown scalar $other")
  }

  private def packable(scalar: String): Boolean =
    scalar != "string" && scalar != "bytes"

  // ---- message decode ----------------------------------------------------

  /** Decoded occurrences: field number -> values in wire order, plus the
    * ordinal of each field's LAST occurrence (oneof resolution needs
    * cross-field wire order — proto semantics keep the last field SEEN,
    * not the last field declared). */
  private final case class RawMsg(values: Map[Int, Vector[Any]],
                                  lastSeen: Map[Int, Int]) {
    def apply(num: Int): Vector[Any] = values.getOrElse(num, Vector.empty)
  }

  private def rawFields(bytes: Array[Byte], msg: PMessage, file: ProtoFile): RawMsg = {
    val byNumber = msg.fields.map(f => f.number -> f).toMap
    val buf = ByteBuffer.wrap(bytes)
    val acc = scala.collection.mutable.Map[Int, Vector[Any]]().withDefaultValue(Vector.empty)
    val lastSeen = scala.collection.mutable.Map[Int, Int]()
    var ord = 0
    while (buf.hasRemaining) {
      val tag = readVarint(buf)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(num) match {
        case None => skipField(buf, wt)
        case Some(f) =>
          lastSeen(num) = ord
          ord += 1
          f.tpe match {
            case PScalar(s) if f.repeated && wt == 2 && packable(s) =>
              // packed repeated
              val packed = ByteBuffer.wrap(readLengthDelimited(buf))
              while (packed.hasRemaining) acc(num) = acc(num) :+ readScalar(packed, 0, s)
            case PScalar(s) => acc(num) = acc(num) :+ readScalar(buf, wt, s)
            case PNamed(n) if file.resolveEnum(n).isDefined =>
              val e = file.resolveEnum(n).get
              if (f.repeated && wt == 2) {
                val packed = ByteBuffer.wrap(readLengthDelimited(buf))
                while (packed.hasRemaining)
                  acc(num) = acc(num) :+ enumName(e, readVarint(packed).toInt)
              } else acc(num) = acc(num) :+ enumName(e, readVarint(buf).toInt)
            case _ => // message / map entry / well-known: length-delimited
              acc(num) = acc(num) :+ readLengthDelimited(buf)
          }
      }
    }
    RawMsg(acc.toMap, lastSeen.toMap)
  }

  private def enumName(e: PEnum, number: Int): String =
    e.values.find(_._2 == number).map(_._1).getOrElse(number.toString)

  /** Decode one message payload into a Row aligned with `st`. */
  def decodeMessage(bytes: Array[Byte], msg: PMessage, file: ProtoFile, st: StructType): Row = {
    val raw = rawFields(bytes, msg, file)
    val emittedOneofs = scala.collection.mutable.Set[String]()
    val values = scala.collection.mutable.ArrayBuffer[Any]()
    var sfIdx = 0
    msg.fields.foreach { f =>
      f.oneofName match {
        case Some(o) =>
          if (!emittedOneofs(o)) {
            emittedOneofs += o
            val unionType = st.fields(sfIdx).dataType.asInstanceOf[StructType]
            values += decodeOneof(msg, file, o, raw, unionType)
            sfIdx += 1
          }
        case None =>
          val sf = st.fields(sfIdx)
          values += decodeField(f, file, raw(f.number), sf.dataType)
          sfIdx += 1
      }
    }
    Row(values.toIndexedSeq: _*)
  }

  private def decodeOneof(msg: PMessage, file: ProtoFile, oneof: String,
                          raw: RawMsg, unionType: StructType): Any = {
    val branches = msg.fields.filter(_.oneofName.contains(oneof))
    // last occurrence ON THE WIRE wins (proto oneof semantics — not
    // declaration order)
    val present = branches.filter(b => raw(b.number).nonEmpty)
    val active = present.sortBy(b => raw.lastSeen.getOrElse(b.number, -1)).lastOption
    active match {
      case None => null
      case Some(b) =>
        val branchIdx = unionType.fieldIndex(b.name)
        val branchType = unionType.fields(branchIdx).dataType
        val v = convertSingle(b, file, raw(b.number).last, branchType)
        val vals = unionType.fields.zipWithIndex.map {
          case (StructField("tag", _, _, _), _) => b.name
          case (_, i) if i == branchIdx => v
          case _ => null
        }
        Row(vals.toIndexedSeq: _*)
    }
  }

  private def decodeField(f: PField, file: ProtoFile, occ: Vector[Any], dt: DataType): Any = {
    f.tpe match {
      case PMap(k, v) =>
        val mt = dt.asInstanceOf[MapType]
        occ.map { e =>
          val entryBytes = e.asInstanceOf[Array[Byte]]
          decodeMapEntry(entryBytes, k, v, f, file, mt)
        }.toMap
      case _ if f.repeated =>
        val at = dt.asInstanceOf[ArrayType]
        occ.map(convertSingle(f, file, _, at.elementType))
      case _ =>
        if (occ.isEmpty) defaultValue(f, file, dt)
        else convertSingle(f, file, occ.last, dt)
    }
  }

  private def decodeMapEntry(bytes: Array[Byte], k: PScalar, v: PType, f: PField,
                             file: ProtoFile, mt: MapType): (Any, Any) = {
    val buf = ByteBuffer.wrap(bytes)
    var key: Any = defaultScalar(k.name)
    var value: Any = null
    while (buf.hasRemaining) {
      val tag = readVarint(buf)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      if (num == 1) key = readScalar(buf, wt, k.name)
      else if (num == 2) v match {
        case PScalar(s) => value = readScalar(buf, wt, s)
        case PNamed(n) if file.resolveEnum(n).isDefined =>
          value = enumName(file.resolveEnum(n).get, readVarint(buf).toInt)
        case PNamed(n) =>
          value = convertMessage(n, f, file, readLengthDelimited(buf), mt.valueType)
        case _ => skipField(buf, wt)
      }
      else skipField(buf, wt)
    }
    if (value == null) v match {
      case PScalar(s) => value = defaultScalar(s)
      case _ =>
    }
    (key, value)
  }

  private def convertSingle(f: PField, file: ProtoFile, rawVal: Any, dt: DataType): Any =
    f.tpe match {
      case PScalar(_) => rawVal
      case PNamed(n) if file.resolveEnum(n).isDefined => rawVal
      case PNamed(n) => convertMessage(n, f, file, rawVal.asInstanceOf[Array[Byte]], dt)
      case PMap(_, _) => rawVal // handled in decodeField
    }

  /** Nested message payload -> value: well-known conversions or nested Row
    * (reference conversions: ProtobufTransformer.java:383-429). */
  private def convertMessage(typeName: String, f: PField, file: ProtoFile,
                             bytes: Array[Byte], dt: DataType): Any = {
    // user-defined messages take precedence over well-known names (matches
    // the compiler's resolution order)
    file.resolveMessage(typeName) match {
      case Some(sub) =>
        return decodeMessage(bytes, sub, file, dt.asInstanceOf[StructType])
      case None =>
    }
    ProtoSchemaCompiler.wellKnownName(typeName) match {
      case Some(wk) =>
        val wkMsg = ProtoSchemaCompiler.wellKnownMessages(wk)
        val emptyFile = ProtoFile("", Map.empty, Map.empty)
        val raw = rawFields(bytes, wkMsg, emptyFile)
        def fld(num: Int): Option[Any] = raw(num).lastOption
        def longAt(num: Int): Long = fld(num).map {
          case n: java.lang.Number => n.longValue()
          case other => other.toString.toLong
        }.getOrElse(0L)
        wk match {
          case "google.protobuf.Timestamp" =>
            Instant.ofEpochSecond(longAt(1), longAt(2) / 1000L * 1000L)
          case "google.type.Date" =>
            LocalDate.of(longAt(1).toInt, math.max(1, longAt(2).toInt), math.max(1, longAt(3).toInt))
          case "google.type.TimeOfDay" =>
            (longAt(1) * 3600L + longAt(2) * 60L + longAt(3)) * 1000000L + longAt(4) / 1000L
          case "confluent.type.Decimal" =>
            val unscaled = fld(1).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array[Byte](0))
            val scale = f.options.get("scale").map(_.toInt)
              .orElse(fld(3).map(_.asInstanceOf[Int])).getOrElse(0)
            val bd = new java.math.BigDecimal(new java.math.BigInteger(unscaled), scale)
            dt match {
              case d: DecimalType => bd.setScale(d.scale)
              case _ => bd
            }
          case wrapper => // wrapper types: unwrap field 1 (default if absent)
            val inner = ProtoSchemaCompiler.wellKnownMessages(wrapper)
              .fields.head.tpe.asInstanceOf[PScalar]
            fld(1).getOrElse(defaultScalar(inner.name))
        }
      case None =>
        throw new IllegalArgumentException(s"unresolved message $typeName")
    }
  }

  private def defaultScalar(name: String): Any = name match {
    case "double" => 0.0d
    case "float" => 0.0f
    case "int32" | "sint32" | "sfixed32" => 0
    case "int64" | "sint64" | "sfixed64" => 0L
    case "uint32" | "fixed32" => 0L
    case "uint64" | "fixed64" => java.math.BigDecimal.ZERO
    case "bool" => false
    case "string" => ""
    case "bytes" => Array.emptyByteArray
    case _ => null
  }

  /** Proto3 absent-field semantics. */
  private def defaultValue(f: PField, file: ProtoFile, dt: DataType): Any = {
    if (f.optional) return null
    f.tpe match {
      case PScalar(s) => defaultScalar(s)
      case PNamed(n) =>
        file.resolveEnum(n) match {
          case Some(e) => e.values.find(_._2 == 0).map(_._1).orNull // default = number 0
          case None => null // absent message (incl. well-known/wrappers) -> null
        }
      case PMap(_, _) => Map.empty[Any, Any]
    }
  }
}
