package graft.media

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VideoCodecsSpec extends AnyFunSuite with Matchers {
  import VideoCodecs._

  private def frame(w: Int, h: Int, seed: Int): (Int, Int, Array[Byte]) =
    (w, h, Array.tabulate(w * h * 3)(i => ((i * 7 + seed) % 251).toByte))

  test("GVID round-trips frame count, dimensions, and pixels") {
    val frames = Seq(frame(8, 8, 1), frame(8, 8, 1), frame(8, 8, 1000))
    val v = decodeGvid(encodeGvid(frames))
    v.frames should have size 3
    v.frames.zip(frames).foreach { case (img, (w, h, px)) =>
      (img.width, img.height) shouldBe (w, h)
      img.rgb shouldBe px
    }
  }

  test("decoder rejects foreign, truncated, and trailing-byte payloads") {
    an[IllegalArgumentException] should be thrownBy
      decodeGvid("not a video".getBytes)
    val ok = encodeGvid(Seq(frame(8, 8, 3)))
    an[IllegalArgumentException] should be thrownBy
      decodeGvid(ok.take(ok.length - 5))
    an[IllegalArgumentException] should be thrownBy
      decodeGvid(ok ++ Array[Byte](0))
  }

  test("frame payloads are real BMPs (cross-decodable by ImageCodecs)") {
    val enc = encodeGvid(Seq(frame(9, 11, 42)))
    // skip GVID header + length prefix; the rest starts a valid BMP
    val bmpLen = java.nio.ByteBuffer.wrap(enc, 6, 4).getInt
    val bmp = enc.slice(10, 10 + bmpLen)
    val img = ImageCodecs.decodeBmp(bmp)
    (img.width, img.height) shouldBe (9, 11)
  }
}
