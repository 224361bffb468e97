package graft.serde

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal protobuf wire writer for tests. */
final class W {
  val out = new ByteArrayOutputStream()
  def varint(v: Long): W = {
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt); this
  }
  def tag(num: Int, wt: Int): W = varint((num.toLong << 3) | wt)
  def ld(bytes: Array[Byte]): W = { varint(bytes.length); out.write(bytes); this }
  def str(num: Int, s: String): W = { tag(num, 2); ld(s.getBytes("UTF-8")) }
  def int(num: Int, v: Long): W = { tag(num, 0); varint(v) }
  def fixed64bits(num: Int, v: Long): W = {
    tag(num, 1)
    out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()); this
  }
  def fixed32bits(num: Int, v: Int): W = {
    tag(num, 5)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()); this
  }
  def double(num: Int, v: Double): W = fixed64bits(num, java.lang.Double.doubleToLongBits(v))
  def float(num: Int, v: Float): W = fixed32bits(num, java.lang.Float.floatToIntBits(v))
  def msg(num: Int, body: W): W = { tag(num, 2); ld(body.bytes) }
  def bytes: Array[Byte] = out.toByteArray
}
