package graft.schema

import org.apache.spark.sql.types._

import ProtoSchema._

/** Protobuf message -> Spark StructType compiler.
  *
  * Capability mirror of the reference's descriptor compiler (reference:
  * transformer/protobuf/ProtobufTransformer.java:64-273), re-expressed on
  * Spark's type system:
  *
  *  - well-known types: `confluent.type.Decimal` -> DecimalType(p,s) taken
  *    from the field's (confluent.field_meta) params (reference:
  *    ProtobufTransformer.java:149-170), `google.type.Date` -> DateType,
  *    `google.type.TimeOfDay` -> micros-of-day long (Spark has no TIME),
  *    `google.protobuf.Timestamp` -> TimestampType (ns truncated to us —
  *    reference maps it to TIMESTAMP_NS, ProtobufTransformer.java:186);
  *  - wrapper types (Int32Value etc.) unwrap to nullable scalars
  *    (reference: ProtobufTransformer.java:213-237);
  *  - oneof -> tagged union struct STRUCT(tag STRING, <branch> T ...) with
  *    the member field names as branch names (Spark has no UNION type;
  *    reference: ProtobufTransformer.java:100-106);
  *  - map<k,v> -> MapType (reference map-entry detection:
  *    ProtobufTransformer.java:251-265); repeated -> ArrayType;
  *  - uint32/fixed32 -> LongType (widened); uint64/fixed64 ->
  *    DecimalType(20,0) (exact, mirrors the BigInteger the reference
  *    surfaces — ProtobufTest.java:98);
  *  - enum -> StringType with symbols in metadata;
  *  - recursive messages are rejected (the reference's recursion guard:
  *    ProtobufTransformer.java ctx.visit cycle check).
  */
object ProtoSchemaCompiler {
  import AvroSchemaCompiler.{EnumSymbols, TimeUnit, UnionFlag}

  final case class FieldType(dataType: DataType, nullable: Boolean,
                             metadata: Metadata = Metadata.empty)

  /** Well-known message layouts, used both for typing here and decoding in
    * ProtoDecoders (imports are not resolved; these are built in). */
  val wellKnownMessages: Map[String, PMessage] = {
    def m(fq: String, fields: (String, Int, String)*): (String, PMessage) =
      fq -> PMessage(fq.split('.').last, fq, fields.map { case (n, num, t) =>
        PField(n, num, if (scalarTypes(t)) PScalar(t) else PNamed(t),
          repeated = false, optional = false, None, Map.empty)
      }.toSeq, Nil)
    Map(
      m("google.protobuf.Timestamp", ("seconds", 1, "int64"), ("nanos", 2, "int32")),
      m("google.type.Date", ("year", 1, "int32"), ("month", 2, "int32"), ("day", 3, "int32")),
      m("google.type.TimeOfDay", ("hours", 1, "int32"), ("minutes", 2, "int32"),
        ("seconds", 3, "int32"), ("nanos", 4, "int32")),
      m("confluent.type.Decimal", ("value", 1, "bytes"), ("precision", 2, "uint32"),
        ("scale", 3, "int32")),
      m("google.protobuf.DoubleValue", ("value", 1, "double")),
      m("google.protobuf.FloatValue", ("value", 1, "float")),
      m("google.protobuf.Int64Value", ("value", 1, "int64")),
      m("google.protobuf.UInt64Value", ("value", 1, "uint64")),
      m("google.protobuf.Int32Value", ("value", 1, "int32")),
      m("google.protobuf.UInt32Value", ("value", 1, "uint32")),
      m("google.protobuf.BoolValue", ("value", 1, "bool")),
      m("google.protobuf.StringValue", ("value", 1, "string")),
      m("google.protobuf.BytesValue", ("value", 1, "bytes")))
  }

  /** Resolve a type reference to a well-known fqName, by suffix (field decls
    * may or may not be fully qualified). User-defined types take precedence —
    * callers check file resolution first. */
  def wellKnownName(ref: String): Option[String] =
    wellKnownMessages.keys.find(fq => fq == ref || fq.endsWith("." + ref))

  def scalarSpark(name: String): DataType = name match {
    case "double" => DoubleType
    case "float" => FloatType
    case "int32" | "sint32" | "sfixed32" => IntegerType
    case "int64" | "sint64" | "sfixed64" => LongType
    case "uint32" | "fixed32" => LongType
    case "uint64" | "fixed64" => DecimalType(20, 0)
    case "bool" => BooleanType
    case "string" => StringType
    case "bytes" => BinaryType
    case other => throw new IllegalArgumentException(s"unknown proto scalar $other")
  }

  def compile(file: ProtoFile, msgName: Option[String]): StructType = {
    val msg = msgName.flatMap(file.resolveMessage)
      .getOrElse(file.firstMessage)
    compileMessage(file, msg, Set.empty)
  }

  def compileMessage(file: ProtoFile, msg: PMessage, seen: Set[String]): StructType = {
    if (seen(msg.fqName))
      throw new IllegalArgumentException(s"recursive schema at ${msg.fqName}")
    val seen2 = seen + msg.fqName
    val fields = scala.collection.mutable.ArrayBuffer[StructField]()
    val emitted = scala.collection.mutable.Set[String]()
    msg.fields.foreach { f =>
      f.oneofName match {
        case Some(o) =>
          if (!emitted(o)) {
            emitted += o
            val branches = msg.fields.filter(_.oneofName.contains(o))
            val bf = branches.map { b =>
              val ft = fieldType(file, b, seen2)
              StructField(b.name, ft.dataType, nullable = true, ft.metadata)
            }
            fields += StructField(o,
              StructType(StructField("tag", StringType, nullable = false) +: bf),
              nullable = true,
              new MetadataBuilder().putBoolean(UnionFlag, true).build())
          }
        case None =>
          val ft = fieldType(file, f, seen2)
          fields += StructField(f.name, ft.dataType, ft.nullable, ft.metadata)
      }
    }
    StructType(fields.toSeq)
  }

  def fieldType(file: ProtoFile, f: PField, seen: Set[String]): FieldType = {
    val base: FieldType = f.tpe match {
      case PScalar(s) => FieldType(scalarSpark(s), nullable = f.optional)
      case PMap(k, v) =>
        val vt = typeOf(file, v, f.options, seen)
        FieldType(MapType(scalarSpark(k.name), vt.dataType, vt.nullable),
          nullable = false)
      case n: PNamed => typeOf(file, n, f.options, seen).copy(nullable = true)
    }
    if (f.repeated && !f.tpe.isInstanceOf[PMap])
      FieldType(ArrayType(base.dataType, containsNull = false), nullable = false)
    else base
  }

  private def typeOf(file: ProtoFile, t: PType, options: Map[String, String],
                     seen: Set[String]): FieldType = t match {
    case PScalar(s) => FieldType(scalarSpark(s), nullable = false)
    case PMap(k, v) =>
      val vt = typeOf(file, v, options, seen)
      FieldType(MapType(scalarSpark(k.name), vt.dataType, vt.nullable), nullable = false)
    case PNamed(n) =>
      file.resolveEnum(n) match {
        case Some(e) =>
          FieldType(StringType, nullable = false,
            new MetadataBuilder()
              .putStringArray(EnumSymbols, e.values.map(_._1).toArray).build())
        case None =>
          file.resolveMessage(n) match {
            case Some(m) => FieldType(compileMessage(file, m, seen), nullable = true)
            case None => wellKnownName(n) match {
              case Some("google.protobuf.Timestamp") => FieldType(TimestampType, nullable = true)
              case Some("google.type.Date") => FieldType(DateType, nullable = true)
              case Some("google.type.TimeOfDay") =>
                FieldType(LongType, nullable = true,
                  new MetadataBuilder().putString(TimeUnit, "time-micros-of-day").build())
              case Some("confluent.type.Decimal") =>
                val p = options.get("precision").map(_.toInt).getOrElse(38)
                val s = options.get("scale").map(_.toInt).getOrElse(0)
                FieldType(DecimalType(p, s), nullable = true)
              case Some(wrapper) => // Int32Value etc: unwrap to nullable scalar
                val inner = wellKnownMessages(wrapper).fields.head.tpe.asInstanceOf[PScalar]
                FieldType(scalarSpark(inner.name), nullable = true)
              case None =>
                throw new IllegalArgumentException(s"unresolved proto type $n")
            }
          }
      }
  }
}
