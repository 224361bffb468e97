package graft.media

/** Pure-JVM multi-frame "video" container (GVID): the smallest real
  * container that exercises the video half of a multimodal pipeline —
  * frame extraction, per-frame decode, scene segmentation — with a fully
  * deterministic codec (the sandbox ships no video libraries; the brief's
  * contract is real Spark-side plumbing over a deterministic format).
  *
  * Layout (big-endian, mirroring the RIFF/BMP header discipline of the
  * audio/image codecs):
  *   "GVID" magic | u16 frameCount | frameCount x (u32 byteLen | BMP frame)
  *
  * Each frame is a complete BMP payload (reference semantics for opaque
  * media columns: kwack stores BYTES/binary verbatim and leaves decode to
  * the reader, KwackEngine.java column mapping) — so frame decode goes
  * through the SAME real ImageCodecs.decodeBmp used by m02/m04.
  */
object VideoCodecs {

  final case class Video(frames: Seq[ImageCodecs.Image])

  def encodeGvid(frames: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(frames.nonEmpty && frames.size <= 0xffff, "1..65535 frames")
    val bmps = frames.map { case (w, h, px) => ImageCodecs.encodeBmp(w, h, px) }
    val total = 6 + bmps.map(4 + _.length).sum
    val out = java.nio.ByteBuffer.allocate(total)
    out.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
    out.putShort(frames.size.toShort)
    bmps.foreach { b => out.putInt(b.length); out.put(b) }
    out.array()
  }

  def decodeGvid(bytes: Array[Byte]): Video = {
    require(bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'V' &&
      bytes(2) == 'I' && bytes(3) == 'D', "not a GVID payload")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    buf.position(4)
    val n = buf.getShort & 0xffff
    val frames = (0 until n).map { i =>
      require(buf.remaining >= 4, s"truncated GVID frame header $i")
      val len = buf.getInt
      require(len > 0 && buf.remaining >= len, s"truncated GVID frame $i")
      val fb = new Array[Byte](len)
      buf.get(fb)
      ImageCodecs.decodeBmp(fb)
    }
    require(!buf.hasRemaining, "trailing bytes after final GVID frame")
    Video(frames)
  }
}
