package graft.schema

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process HTTP stub speaking the Schema Registry v1 REST subset that
  * [[HttpSchemaRegistry]] consumes, backed by an [[InMemorySchemaRegistry]].
  * Zero egress: binds 127.0.0.1 on an ephemeral port.
  *
  * Faithful wire quirk: `schemaType` is OMITTED from responses for AVRO
  * schemas (the registry's historical default), so the client's
  * absent-means-AVRO path is exercised by every Avro fixture.
  */
final class RegistryStubServer {
  val backing = new InMemorySchemaRegistry
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  @volatile var requestLog: List[String] = Nil

  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private val PostVersions = "/subjects/([^/]+)/versions".r
  private val GetLatest = "/subjects/([^/]+)/versions/latest".r
  private val GetById = "/schemas/ids/(\\d+)".r
  private val GetByIdVersions = "/schemas/ids/(\\d+)/versions".r

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath
    requestLog = s"${ex.getRequestMethod} $path" :: requestLog
    (ex.getRequestMethod, path) match {
      case ("POST", PostVersions(subject)) =>
        val body = mapper.readTree(ex.getRequestBody)
        val st = Option(body.get("schemaType")).map(_.asText()).getOrElse("AVRO")
        val id = backing.register(subject, st, body.get("schema").asText())
        val resp = JsonNodeFactory.instance.objectNode()
        resp.put("id", id)
        reply(ex, 200, mapper.writeValueAsString(resp))
      case ("GET", GetByIdVersions(id)) =>
        backing.getById(id.toInt) match {
          case Some(rs) =>
            val arr = JsonNodeFactory.instance.arrayNode()
            val e = arr.addObject()
            e.put("subject", rs.subject)
            e.put("version", rs.version)
            reply(ex, 200, mapper.writeValueAsString(arr))
          case None => notFound(ex)
        }
      case ("GET", GetById(id)) =>
        backing.getById(id.toInt) match {
          case Some(rs) =>
            val resp = JsonNodeFactory.instance.objectNode()
            resp.put("schema", rs.schemaText)
            if (rs.schemaType != "AVRO") resp.put("schemaType", rs.schemaType)
            reply(ex, 200, mapper.writeValueAsString(resp))
          case None => notFound(ex)
        }
      case ("GET", GetLatest(subject)) =>
        backing.getLatest(subject) match {
          case Some(rs) =>
            val resp = JsonNodeFactory.instance.objectNode()
            resp.put("subject", rs.subject)
            resp.put("version", rs.version)
            resp.put("id", rs.id)
            if (rs.schemaType != "AVRO") resp.put("schemaType", rs.schemaType)
            resp.put("schema", rs.schemaText)
            reply(ex, 200, mapper.writeValueAsString(resp))
          case None => notFound(ex)
        }
      case _ => notFound(ex)
    }
  } catch {
    case e: Exception => reply(ex, 500, s"""{"error_code":50001,"message":"${e.getMessage}"}""")
  }

  private def notFound(ex: HttpExchange): Unit =
    reply(ex, 404, """{"error_code":40403,"message":"not found"}""")

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
