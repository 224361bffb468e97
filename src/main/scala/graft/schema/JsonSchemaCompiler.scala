package graft.schema

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** JSON Schema -> Spark StructType compiler.
  *
  * Capability mirror of the reference's JSON-Schema ColumnDef compiler
  * (reference: transformer/json/JsonTransformer.java:46-256):
  *  - integer -> LongType, number -> DoubleType (reference: BIGINT/DOUBLE);
  *  - enum/const -> StringType with symbols in metadata;
  *  - oneOf/anyOf with a null branch flattens to nullable; multi-branch ->
  *    tagged union struct (u<i> = index among non-null branches);
  *  - allOf -> merged object (property union, required union — reference
  *    merge algorithm at JsonTransformer.java:129-234);
  *  - additionalProperties with a schema and no properties -> MAP;
  *  - $ref resolution by $id anchor or #/definitions|$defs pointer, with
  *    cycle detection: recursive schemas throw IllegalArgumentException
  *    (reference test: JsonSchemaTest.java:153-162).
  */
object JsonSchemaCompiler {

  private val mapper = new ObjectMapper()

  final case class Compiled(dataType: DataType, nullable: Boolean,
                            metadata: Metadata = Metadata.empty)

  def compile(schemaText: String): Compiled = {
    val root = mapper.readTree(schemaText)
    val anchors = collectAnchors(root)
    toType(root, root, anchors, Set.empty)
  }

  /** Index of $id values -> nodes for ref resolution (also used by the
    * value reader for decode-time $ref dereferencing). */
  def collectAnchors(root: JsonNode): Map[String, JsonNode] = {
    val out = scala.collection.mutable.Map[String, JsonNode]()
    def walk(n: JsonNode): Unit = {
      if (n.isObject) {
        val id = n.get("$id")
        if (id != null && id.isTextual) out(id.asText()) = n
        n.properties().asScala.foreach(e => walk(e.getValue))
      } else if (n.isArray) n.asScala.foreach(walk)
    }
    walk(root)
    out.toMap
  }

  def resolveRef(root: JsonNode, anchors: Map[String, JsonNode], ref: String): JsonNode = {
    if (anchors.contains(ref)) anchors(ref)
    else if (ref.startsWith("#/")) {
      ref.substring(2).split("/").foldLeft(root) { (n, seg) =>
        val next = n.get(seg)
        if (next == null) throw new IllegalArgumentException(s"unresolvable \\$$ref $ref")
        next
      }
    } else throw new IllegalArgumentException(s"unresolvable \\$$ref $ref")
  }

  private def typeOf(n: JsonNode): Option[String] = {
    val t = n.get("type")
    if (t == null) None
    else if (t.isTextual) Some(t.asText())
    else None // array-form "type" handled in toType
  }

  /** Array-form "type" (["integer","null"] etc.), the standard nullable
    * shorthand: flattens like a oneOf of bare type schemas. */
  private def typeArray(n: JsonNode): Option[Seq[String]] = {
    val t = n.get("type")
    if (t != null && t.isArray) Some(t.asScala.map(_.asText()).toSeq) else None
  }

  private def toType(node: JsonNode, root: JsonNode, anchors: Map[String, JsonNode],
                     activeRefs: Set[String]): Compiled = {
    // $ref
    val refNode = node.get("$ref")
    if (refNode != null && refNode.isTextual) {
      val ref = refNode.asText()
      if (activeRefs.contains(ref))
        throw new IllegalArgumentException(s"recursive schema via \\$$ref $ref")
      return toType(resolveRef(root, anchors, ref), root, anchors, activeRefs + ref)
    }

    // enum / const
    val enumNode = node.get("enum")
    if (enumNode != null && enumNode.isArray) {
      val symbols = enumNode.asScala.map(_.asText()).toArray
      return Compiled(StringType, nullable = false,
        new MetadataBuilder().putStringArray(AvroSchemaCompiler.EnumSymbols, symbols).build())
    }
    if (node.get("const") != null) return Compiled(StringType, nullable = false)

    // array-form "type": ["integer","null"] etc — flatten like oneOf
    typeArray(node).foreach { types =>
      val nonNull = types.filterNot(_ == "null")
      val hasNull = types.contains("null")
      if (nonNull.isEmpty) return Compiled(BinaryType, nullable = true)
      def bare(t: String): Compiled = {
        val n2 = node.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        n2.put("type", t)
        toType(n2, root, anchors, activeRefs)
      }
      if (nonNull.size == 1) {
        val c = bare(nonNull.head)
        return c.copy(nullable = c.nullable || hasNull)
      }
      val bf = nonNull.zipWithIndex.map { case (t, i) =>
        val c = bare(t)
        StructField(s"u$i", c.dataType, nullable = true, c.metadata)
      }
      return Compiled(
        StructType(StructField("tag", StringType, nullable = false) +: bf),
        nullable = hasNull,
        new MetadataBuilder().putBoolean(AvroSchemaCompiler.UnionFlag, true).build())
    }

    // oneOf / anyOf
    val branchesNode = Option(node.get("oneOf")).orElse(Option(node.get("anyOf")))
    branchesNode.foreach { bn =>
      val branches = bn.asScala.toSeq
      val isNull = (n: JsonNode) => typeOf(n).contains("null")
      val nonNull = branches.filterNot(isNull)
      val hasNull = branches.exists(isNull)
      if (nonNull.isEmpty) return Compiled(BinaryType, nullable = true)
      if (nonNull.size == 1) {
        val c = toType(nonNull.head, root, anchors, activeRefs)
        return c.copy(nullable = c.nullable || hasNull)
      }
      val bf = nonNull.zipWithIndex.map { case (b, i) =>
        val c = toType(b, root, anchors, activeRefs)
        StructField(s"u$i", c.dataType, nullable = true, c.metadata)
      }
      return Compiled(
        StructType(StructField("tag", StringType, nullable = false) +: bf),
        nullable = hasNull,
        new MetadataBuilder().putBoolean(AvroSchemaCompiler.UnionFlag, true).build())
    }

    // allOf: merged object (property union; required union)
    val allOf = node.get("allOf")
    if (allOf != null && allOf.isArray) {
      val parts = allOf.asScala.toSeq.map { p =>
        val refN = p.get("$ref")
        if (refN != null && refN.isTextual) {
          val ref = refN.asText()
          if (activeRefs.contains(ref))
            throw new IllegalArgumentException(s"recursive schema via \\$$ref $ref")
          resolveRef(root, anchors, ref)
        } else p
      }
      val fields = scala.collection.mutable.LinkedHashMap[String, StructField]()
      val required = scala.collection.mutable.Set[String]()
      parts.foreach { p =>
        Option(p.get("required")).foreach(_.asScala.foreach(r => required += r.asText()))
        Option(p.get("properties")).foreach { props =>
          props.properties().asScala.foreach { e =>
            val c = toType(e.getValue, root, anchors, activeRefs)
            fields(e.getKey) = StructField(e.getKey, c.dataType, c.nullable, c.metadata)
          }
        }
      }
      val merged = fields.values.map(f =>
        f.copy(nullable = f.nullable || !required.contains(f.name))).toSeq
      return Compiled(StructType(merged), nullable = false)
    }

    typeOf(node) match {
      case Some("object") =>
        val props = node.get("properties")
        if (props != null && props.size() > 0) {
          val required = Option(node.get("required"))
            .map(_.asScala.map(_.asText()).toSet).getOrElse(Set.empty)
          // toSeq BEFORE map: properties() is a Set, and mapping a Set
          // scrambles declaration order
          val fields = props.properties().asScala.toSeq.map { e =>
            val c = toType(e.getValue, root, anchors, activeRefs)
            StructField(e.getKey, c.dataType,
              c.nullable || !required.contains(e.getKey), c.metadata)
          }
          Compiled(StructType(fields), nullable = false)
        } else {
          val ap = node.get("additionalProperties")
          if (ap != null && ap.isObject) {
            val c = toType(ap, root, anchors, activeRefs)
            Compiled(MapType(StringType, c.dataType, c.nullable), nullable = false)
          } else Compiled(MapType(StringType, StringType, valueContainsNull = true),
            nullable = false)
        }
      case Some("array") =>
        val items = node.get("items")
        val c = if (items != null) toType(items, root, anchors, activeRefs)
          else Compiled(StringType, nullable = true)
        Compiled(ArrayType(c.dataType, c.nullable), nullable = false)
      case Some("string") => Compiled(StringType, nullable = false)
      case Some("integer") => Compiled(LongType, nullable = false)
      case Some("number") => Compiled(DoubleType, nullable = false)
      case Some("boolean") => Compiled(BooleanType, nullable = false)
      case Some("null") => Compiled(BinaryType, nullable = true)
      case _ => Compiled(StringType, nullable = true) // untyped -> raw json text
    }
  }
}
