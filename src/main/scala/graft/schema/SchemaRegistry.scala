package graft.schema

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Schema registry abstraction.
  *
  * The reference resolves schemas from a Confluent Schema Registry (or a
  * mock in-process one for external `avro:`/`json:`/`proto:` schemas —
  * reference: KwackEngine.java:392-430). This engine is registry-agnostic:
  * an in-memory implementation serves external schemas and tests;
  * [[HttpSchemaRegistry]] speaks the Confluent v1 REST protocol against a
  * live (or stubbed) registry through the same trait.
  *
  * Implementations must be usable from executors (the deserializer memoizes
  * per-partition; see serde package), mirroring the reference's
  * deserializer/schema caches (KwackEngine.java:137-138,516-519).
  */
trait SchemaRegistry extends Serializable {
  /** Register a schema under a subject; idempotent per (subject, text). */
  def register(subject: String, schemaType: String, schemaText: String): Int
  def getById(id: Int): Option[RegisteredSchema]
  def getLatest(subject: String): Option[RegisteredSchema]
}

final case class RegisteredSchema(id: Int, subject: String, version: Int,
                                  schemaType: String, schemaText: String)

/** In-process registry; ids are assigned in registration order starting at 1
  * (like the reference's mock registry). */
final class InMemorySchemaRegistry extends SchemaRegistry {
  private val nextId = new AtomicInteger(0)
  private val byId = new ConcurrentHashMap[Int, RegisteredSchema]()
  private val bySubject = new ConcurrentHashMap[String, List[RegisteredSchema]]()

  def register(subject: String, schemaType: String, schemaText: String): Int = synchronized {
    val existing = Option(bySubject.get(subject)).getOrElse(Nil)
      .find(r => r.schemaType == schemaType && r.schemaText == schemaText)
    existing.map(_.id).getOrElse {
      val id = nextId.incrementAndGet()
      val version = Option(bySubject.get(subject)).map(_.size).getOrElse(0) + 1
      val rs = RegisteredSchema(id, subject, version, schemaType, schemaText)
      byId.put(id, rs)
      bySubject.merge(subject, List(rs), (a, b) => b ++ a)
      id
    }
  }

  def getById(id: Int): Option[RegisteredSchema] = Option(byId.get(id))

  def getLatest(subject: String): Option[RegisteredSchema] =
    Option(bySubject.get(subject)).flatMap(_.sortBy(-_.version).headOption)
}
