package graft.schema

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** Confluent Schema Registry REST client implementing [[SchemaRegistry]].
  *
  * Speaks the public Schema Registry v1 REST protocol the reference engine
  * consumes through the Confluent client library
  * (reference: KwackEngine.java:409-430 — getLatestSchemaMetadata /
  * getSchemaById; KwackConfig.java:59-63 — comma-separated
  * `schema.registry.url` list):
  *
  *   - `POST /subjects/{subject}/versions`   register → `{"id": N}`
  *   - `GET  /schemas/ids/{id}`              → `{"schema", "schemaType"?}`
  *   - `GET  /schemas/ids/{id}/versions`     → `[{"subject","version"}, …]`
  *   - `GET  /subjects/{subject}/versions/latest`
  *                      → `{"subject","version","id","schemaType"?,"schema"}`
  *
  * `schemaType` is omitted on the wire for AVRO (the registry's historical
  * default) — absent means AVRO on read, and we still send it on write
  * (modern registries accept it; the field is ignored by old ones only for
  * AVRO, which is exactly the omission case).
  *
  * Multiple base URLs (comma-separated) are tried in order; connection-level
  * failures fail over to the next URL, HTTP 404 resolves to `None`, and any
  * other HTTP error surfaces as an exception (a wrong answer from a live
  * registry should stop ingest, not silently fall back to binary).
  *
  * The instance is Serializable for executor-side use: only the URL list and
  * timeout travel; the HTTP plumbing and memo caches are rebuilt lazily per
  * JVM. Lookups are memoized by id and (subject, text) — schema ids are
  * immutable in the registry protocol, so the cache never invalidates
  * (mirrors the reference's schema cache, KwackEngine.java:137-138).
  */
final class HttpSchemaRegistry(urls: Seq[String], timeoutMs: Int = 30000)
    extends SchemaRegistry {
  require(urls.nonEmpty, "at least one registry URL required")

  def this(commaSeparated: String) =
    this(commaSeparated.split(',').map(_.trim).filter(_.nonEmpty).toSeq)

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val byIdCache = new ConcurrentHashMap[Int, RegisteredSchema]()
  @transient private lazy val registerCache = new ConcurrentHashMap[(String, String, String), Int]()

  override def register(subject: String, schemaType: String, schemaText: String): Int =
    registerCache.computeIfAbsent((subject, schemaType, schemaText), { _ =>
      val body = JsonNodeFactory.instance.objectNode()
      body.put("schema", schemaText)
      body.put("schemaType", normalizeType(schemaType))
      val resp = request("POST", s"/subjects/${enc(subject)}/versions",
        Some(mapper.writeValueAsString(body)))
        .getOrElse(throw new IllegalStateException(
          s"registry returned 404 registering subject $subject"))
      resp.get("id").asInt()
    })

  override def getById(id: Int): Option[RegisteredSchema] = {
    Option(byIdCache.get(id)).orElse {
      request("GET", s"/schemas/ids/$id").map { node =>
        // /schemas/ids/{id} carries no subject/version; a secondary lookup
        // recovers them (best-effort — an id can outlive its subjects).
        val (subject, version) =
          request("GET", s"/schemas/ids/$id/versions") match {
            case Some(arr) if arr.isArray && arr.size() > 0 =>
              (arr.get(0).get("subject").asText(), arr.get(0).get("version").asInt())
            case _ => ("", -1)
          }
        val rs = RegisteredSchema(id, subject, version,
          typeOf(node), node.get("schema").asText())
        byIdCache.put(id, rs)
        rs
      }
    }
  }

  override def getLatest(subject: String): Option[RegisteredSchema] =
    request("GET", s"/subjects/${enc(subject)}/versions/latest").map { node =>
      val rs = RegisteredSchema(node.get("id").asInt(), subject,
        node.get("version").asInt(), typeOf(node), node.get("schema").asText())
      byIdCache.put(rs.id, rs)
      rs
    }

  private def normalizeType(t: String): String = t.toUpperCase match {
    case "PROTO" => "PROTOBUF"
    case other => other
  }

  /** Absent schemaType means AVRO (registry wire-protocol default). */
  private def typeOf(node: JsonNode): String =
    Option(node.get("schemaType")).map(_.asText()).getOrElse("AVRO")

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** Run one request against the URL list: connection failures fail over,
    * 404 → None, 2xx → parsed body, anything else → exception. */
  private def request(method: String, path: String,
                      body: Option[String] = None): Option[JsonNode] = {
    var lastConnectFailure: Throwable = null
    urls.foreach { base =>
      try {
        val conn = URI.create(base.stripSuffix("/") + path).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        try {
          conn.setRequestMethod(method)
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          conn.setRequestProperty("Accept", "application/vnd.schemaregistry.v1+json")
          body.foreach { b =>
            conn.setDoOutput(true)
            conn.setRequestProperty("Content-Type", "application/vnd.schemaregistry.v1+json")
            conn.getOutputStream.write(b.getBytes(UTF_8))
          }
          val code = conn.getResponseCode
          if (code == 404) return None
          if (code >= 200 && code < 300)
            return Some(mapper.readTree(readAll(conn.getInputStream)))
          val err = Option(conn.getErrorStream).map(readAll).getOrElse("")
          throw new IllegalStateException(s"registry $method $path: HTTP $code $err")
        } finally conn.disconnect()
      } catch {
        case e: java.io.IOException => lastConnectFailure = e // try next URL
      }
    }
    throw new IllegalStateException(
      s"no registry URL reachable for $method $path", lastConnectFailure)
  }

  private def readAll(in: InputStream): String = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    new String(out.toByteArray, UTF_8)
  }
}
