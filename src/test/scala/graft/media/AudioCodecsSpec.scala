package graft.media

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AudioCodecsSpec extends AnyFunSuite with Matchers {
  import AudioCodecs._

  private def samples(n: Int, seed: Long): Array[Short] =
    Array.tabulate(n)(i => ((i.toLong * 13 + seed) % 2001 - 1000).toShort)

  test("WAV round-trips PCM-16 through the RIFF layout") {
    for ((rate, ch, frames) <- Seq((8000, 1, 500), (12000, 2, 749),
        (16000, 1, 1), (44100, 2, 3))) {
      val px = samples(frames * ch, rate + ch)
      val a = decodeWav(encodeWav(rate, ch, px))
      (a.sampleRate, a.channels) shouldBe (rate, ch)
      a.samples shouldBe px
    }
  }

  test("decoder skips ancillary chunks and honors odd-size padding") {
    val base = encodeWav(8000, 1, samples(10, 3))
    // splice a 3-byte LIST chunk (padded to 4) between fmt and data
    val insert = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(36) ++ insert ++ base.drop(36)
    // RIFF size field must cover the splice
    val lenPos = 4
    val newLen = spliced.length - 8
    spliced(lenPos) = newLen.toByte
    spliced(lenPos + 1) = (newLen >>> 8).toByte
    val a = decodeWav(spliced)
    a.samples shouldBe samples(10, 3)
  }

  test("decoder rejects foreign, truncated, or non-PCM payloads") {
    an[IllegalArgumentException] should be thrownBy
      decodeWav("definitely not audio data here".getBytes)
    an[IllegalArgumentException] should be thrownBy
      decodeWav(encodeWav(8000, 1, samples(100, 1)).take(60))
    val nonPcm = encodeWav(8000, 1, samples(4, 1))
    nonPcm(20) = 3 // audio format = IEEE float
    an[IllegalArgumentException] should be thrownBy decodeWav(nonPcm)
  }
}
