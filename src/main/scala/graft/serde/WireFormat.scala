package graft.serde

import java.nio.ByteBuffer

/** Confluent wire format framing: magic byte 0, 4-byte big-endian schema id,
  * then (for protobuf) zigzag-varint message indexes, then the payload.
  *
  * The reference PREPENDS this frame to raw bytes when using external
  * schemas so stock deserializers can be reused (reference:
  * KwackEngine.java:454-477); `skip.bytes` drops leading payload bytes
  * before parsing (471-474).
  */
object WireFormat {
  val Magic: Byte = 0x0

  final case class Framed(schemaId: Int, messageIndexes: Seq[Int], payload: ByteBuffer)

  def writeVarint(out: java.io.ByteArrayOutputStream, value: Int): Unit = {
    var v = (value << 1) ^ (value >> 31) // zigzag
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
  }

  /** Frame a payload (used by tests and the external-schema write path).
    * PROTOBUF payloads must pass messageIndexes (at least Seq(0)): the
    * proto parse path always reads the index block, so a proto frame
    * written with the Nil default would be misparsed. */
  def frame(schemaId: Int, payload: Array[Byte], messageIndexes: Seq[Int] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 10)
    out.write(Magic.toInt)
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    if (messageIndexes.nonEmpty) {
      // single [0] has a compact special form: one zero byte
      if (messageIndexes == Seq(0)) out.write(0)
      else {
        writeVarint(out, messageIndexes.size)
        messageIndexes.foreach(writeVarint(out, _))
      }
    }
    out.write(payload)
    out.toByteArray
  }

  private def readZigzagVarint(buf: ByteBuffer): Int = {
    var shift = 0; var result = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      result |= (b & 0x7f) << shift; shift += 7; b = buf.get()
    }
    result |= (b & 0x7f) << shift
    (result >>> 1) ^ -(result & 1)
  }

  /** Parse a framed record; `skipBytes` leading bytes are dropped first.
    * `withIndexes` = true for protobuf payloads. */
  def parse(bytes: Array[Byte], skipBytes: Int = 0, withIndexes: Boolean = false): Framed = {
    val buf = ByteBuffer.wrap(bytes, skipBytes, bytes.length - skipBytes)
    val magic = buf.get()
    require(magic == Magic, s"unknown magic byte $magic")
    val id = buf.getInt
    val idx =
      if (!withIndexes) Nil
      else {
        val n = readZigzagVarint(buf)
        if (n == 0) Seq(0) else (0 until n).map(_ => readZigzagVarint(buf))
      }
    Framed(id, idx, buf.slice())
  }

  /** Peek just the schema id (for the rowinfo ksi/vsi columns — reference:
    * KwackEngine.java:1039-1045). Returns None for unframed payloads. */
  def schemaId(bytes: Array[Byte], skipBytes: Int = 0): Option[Int] =
    if (bytes == null || bytes.length < skipBytes + 5 || bytes(skipBytes) != Magic) None
    else Some(ByteBuffer.wrap(bytes, skipBytes + 1, 4).getInt)
}
