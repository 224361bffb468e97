package graft.schema

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.spark.sql.types._

/** Avro schema -> Spark StructType compiler.
  *
  * Capability mirror of the reference's Avro ColumnDef compiler
  * (reference: transformer/avro/AvroTransformer.java:38-149), re-expressed
  * on Spark's type system:
  *
  *  - nullable 2-branch unions flatten to a nullable field;
  *  - multi-branch unions become a tagged struct
  *    STRUCT(tag STRING, u<i> T<i> ...) — Spark has no UNION type
  *    (SURVEY.md §7.3); branch names u<i> use the original union index
  *    (reference: AvroTransformer.java:77);
  *  - enum -> string with symbols carried in field metadata;
  *  - logical decimal -> DecimalType(p,s); uuid -> string;
  *  - date -> DateType; time-millis/micros -> LongType micro-of-day
  *    (Spark has no TIME type); timestamp-millis/micros -> TimestampType;
  *    timestamp-nanos -> TimestampType truncated to micros;
  *  - fixed/bytes -> BinaryType;
  *  - recursive record schemas are rejected (IllegalArgumentException), as
  *    the reference does via its cycle check (schema/StructColumnDef.java).
  */
object AvroSchemaCompiler {

  val UnionFlag = "graft.union"
  val EnumSymbols = "graft.enum.symbols"
  val UuidFlag = "graft.uuid"
  val TimeUnit = "graft.time"

  final case class Compiled(dataType: DataType, nullable: Boolean,
                            metadata: Metadata = Metadata.empty)

  /** Top-level entry: records become a StructType of their fields; any other
    * schema compiles to a single-column wrapper handled by the engine. */
  def compile(schema: Schema): Compiled = toType(schema, Set.empty)

  def isUnionStruct(f: StructField): Boolean =
    f.metadata.contains(UnionFlag) && f.metadata.getBoolean(UnionFlag)

  private def toType(schema: Schema, seen: Set[String]): Compiled = {
    import Schema.Type._
    schema.getType match {
      case RECORD =>
        val name = schema.getFullName
        if (seen.contains(name))
          throw new IllegalArgumentException(s"recursive schema at $name")
        val seen2 = seen + name
        val fields = schema.getFields.asScala.map { f =>
          val c = toType(f.schema(), seen2)
          StructField(f.name(), c.dataType, c.nullable, c.metadata)
        }
        Compiled(StructType(fields.toSeq), nullable = false)

      case UNION =>
        val branches = schema.getTypes.asScala.toSeq
        val nullIdx = branches.indexWhere(_.getType == NULL)
        val nonNull = branches.zipWithIndex.filter(_._1.getType != NULL)
        if (nonNull.isEmpty) Compiled(BinaryType, nullable = true)
        else if (nonNull.size == 1) {
          val c = toType(nonNull.head._1, seen)
          c.copy(nullable = c.nullable || nullIdx >= 0)
        } else {
          val bf = nonNull.map { case (b, i) =>
            val c = toType(b, seen)
            StructField(s"u$i", c.dataType, nullable = true, c.metadata)
          }
          val st = StructType(StructField("tag", StringType, nullable = false) +: bf)
          Compiled(st, nullable = nullIdx >= 0,
            new MetadataBuilder().putBoolean(UnionFlag, true).build())
        }

      case ENUM =>
        val md = new MetadataBuilder()
          .putStringArray(EnumSymbols, schema.getEnumSymbols.asScala.toArray)
          .build()
        Compiled(StringType, nullable = false, md)

      case ARRAY =>
        val c = toType(schema.getElementType, seen)
        Compiled(ArrayType(c.dataType, c.nullable), nullable = false)

      case MAP =>
        val c = toType(schema.getValueType, seen)
        Compiled(MapType(StringType, c.dataType, c.nullable), nullable = false)

      case FIXED | BYTES =>
        schema.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            Compiled(DecimalType(d.getPrecision, d.getScale), nullable = false)
          case _ => Compiled(BinaryType, nullable = false)
        }

      case STRING =>
        val isUuid = schema.getLogicalType != null &&
          schema.getLogicalType.getName == "uuid"
        val md = if (isUuid) new MetadataBuilder().putBoolean(UuidFlag, true).build()
          else Metadata.empty
        Compiled(StringType, nullable = false, md)

      case INT =>
        schema.getLogicalType match {
          case _: LogicalTypes.Date => Compiled(DateType, nullable = false)
          case _: LogicalTypes.TimeMillis =>
            Compiled(LongType, nullable = false,
              new MetadataBuilder().putString(TimeUnit, "time-micros-of-day").build())
          case _ => Compiled(IntegerType, nullable = false)
        }

      case LONG =>
        schema.getLogicalType match {
          case _: LogicalTypes.TimeMicros =>
            Compiled(LongType, nullable = false,
              new MetadataBuilder().putString(TimeUnit, "time-micros-of-day").build())
          case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros |
               _: LogicalTypes.TimestampNanos |
               _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
            Compiled(TimestampType, nullable = false)
          case _ => Compiled(LongType, nullable = false)
        }

      case FLOAT => Compiled(FloatType, nullable = false)
      case DOUBLE => Compiled(DoubleType, nullable = false)
      case BOOLEAN => Compiled(BooleanType, nullable = false)
      case NULL => Compiled(BinaryType, nullable = true)
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }
}
