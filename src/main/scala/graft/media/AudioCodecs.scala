package graft.media

import java.nio.charset.StandardCharsets

/** Pure-JVM audio container codec: 16-bit PCM WAV (RIFF). Parsed
  * byte-for-byte from the public RIFF/WAVE layout — no codec libraries —
  * so the audio decode stage of the multimodal queries operates on real
  * containers, symmetric with ImageCodecs for the image path.
  *
  * The decoder validates the RIFF/WAVE magic, walks chunks (skipping
  * ancillary ones, honoring the spec's odd-size padding byte), requires
  * PCM 16-bit, and returns interleaved frames exactly as stored. */
object AudioCodecs {

  /** Decoded PCM audio: format fields plus interleaved samples
    * (frame-major, channel-interleaved — as stored). */
  final case class Audio(sampleRate: Int, channels: Int,
                         samples: Array[Short])

  /** Encode interleaved 16-bit PCM as a canonical WAV (RIFF + fmt + data). */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      "sample count must be a multiple of channel count")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    putTag(out, 0, "RIFF")
    putIntLE(out, 4, 36 + dataLen)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt ")
    putIntLE(out, 16, 16) // fmt chunk size
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, channels)
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * channels * 2) // byte rate
    putShortLE(out, 32, channels * 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    putTag(out, 36, "data")
    putIntLE(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + i * 2) = samples(i).toByte
      out(44 + i * 2 + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  /** Parse a PCM-16 WAV back to its format fields + interleaved samples. */
  def decodeWav(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a WAV payload")
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val len = getIntLE(bytes, pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          // the canonical PCM fmt chunk is 16 bytes; a shorter declared
          // length would make the field reads below silently consume the
          // NEXT chunk's bytes — fail loudly instead
          require(len >= 16, s"short fmt chunk (len $len < 16)")
          require(getShortLE(bytes, pos + 8) == 1, "non-PCM WAV not supported")
          channels = getShortLE(bytes, pos + 10)
          sampleRate = getIntLE(bytes, pos + 12)
          require(getShortLE(bytes, pos + 22) == 16,
            "only 16-bit PCM supported")
        case "data" =>
          require(channels > 0, "WAV data chunk before fmt")
          data = new Array[Short](len / 2)
          var i = 0
          while (i < data.length) {
            data(i) = ((bytes(pos + 8 + i * 2) & 0xff) |
              (bytes(pos + 8 + i * 2 + 1) << 8)).toShort
            i += 1
          }
        case _ => // ancillary chunk (LIST, cue, ...): skip
      }
      pos += 8 + len + (len & 1) // RIFF pads odd-size chunks
    }
    require(data != null, "WAV missing data chunk")
    Audio(sampleRate, channels, data)
  }

  private def putTag(a: Array[Byte], off: Int, t: String): Unit = {
    val b = t.getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(b, 0, a, off, 4)
  }
  private def tag(a: Array[Byte], off: Int): String =
    new String(a, off, 4, StandardCharsets.US_ASCII)
  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
    a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
  }
  private def putShortLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
  }
  private def getIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)
  private def getShortLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)
}
