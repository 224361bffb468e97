package graft.serde

/** Per-topic key/value serde specification, mirroring the reference's
  * grammar (reference: KwackConfig.java:495-690; CLI -k/-v
  * KwackMain.java:78-100):
  *
  *   binary | string | short | int | long | float | double | uuid
  *   | json                       (schemaless json -> single rowval column)
  *   | latest                     (latest schema registry version)
  *   | <id>                       (numeric schema registry id)
  *   | avro:<schema|@file>
  *   | json:<schema|@file>[;tag:<src[->dst]>]
  *   | proto:<schema|@file>[;msg:<name>]
  *
  * Defaults: key = binary, value = latest (KwackConfig.java:534-535).
  */
sealed trait Serde extends Serializable
object Serde {
  sealed abstract class Primitive(val name: String) extends Serde
  case object BinarySerde extends Primitive("binary")
  case object StringSerde extends Primitive("string")
  case object ShortSerde extends Primitive("short")
  case object IntSerde extends Primitive("int")
  case object LongSerde extends Primitive("long")
  case object FloatSerde extends Primitive("float")
  case object DoubleSerde extends Primitive("double")
  case object UuidSerde extends Primitive("uuid")
  /** Schemaless JSON: raw document into a single `rowval` string column. */
  case object SchemalessJson extends Serde
  /** Latest registered schema for the topic's subject. */
  case object Latest extends Serde
  /** Specific schema registry id. */
  final case class ById(id: Int) extends Serde
  /** External schema (registered into the in-process registry at init). */
  final case class External(schemaType: String, schemaText: String,
                            messageName: Option[String] = None,
                            tags: Map[String, String] = Map.empty) extends Serde

  def parse(spec: String): Serde = {
    val primitives: Map[String, Serde] = Map(
      "binary" -> BinarySerde, "string" -> StringSerde, "short" -> ShortSerde,
      "int" -> IntSerde, "long" -> LongSerde, "float" -> FloatSerde,
      "double" -> DoubleSerde, "uuid" -> UuidSerde)
    spec match {
      case p if primitives.contains(p) => primitives(p)
      case "json" => SchemalessJson
      case "latest" => Latest
      case id if id.forall(_.isDigit) && id.nonEmpty => ById(id.toInt)
      case ext =>
        val colon = ext.indexOf(':')
        require(colon > 0, s"unparseable serde spec: $spec")
        val kind = ext.substring(0, colon)
        require(Set("avro", "json", "proto").contains(kind), s"unknown serde kind: $kind")
        val rest = ext.substring(colon + 1)
        // attributes after ';' — msg: for proto, tag: for json key->value
        // copy. Inline schema text can itself contain ';' (proto statements),
        // so only TRAILING `msg:`/`tag:` segments are attributes.
        val parts = rest.split(";")
        var attrStart = parts.length
        while (attrStart > 1 && parts(attrStart - 1).trim.matches("(?s)(msg|tag):.*"))
          attrStart -= 1
        val schemaRef = parts.take(attrStart).mkString(";")
        val attrs = parts.drop(attrStart).map { a0 =>
          val a = a0.trim
          val i = a.indexOf(':'); (a.substring(0, i), a.substring(i + 1))
        }
        val schemaText =
          if (schemaRef.startsWith("@"))
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(schemaRef.substring(1))), "UTF-8")
          else schemaRef
        val msg = attrs.collectFirst { case ("msg", v) => v }
        val tags = attrs.collect { case ("tag", v) =>
          v.split("->") match {
            case Array(src, dst) => src -> dst
            case Array(src) => src -> src
          }
        }.toMap
        External(kind, schemaText, msg, tags)
    }
  }
}
